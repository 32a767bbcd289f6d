package graft.bench

import graft.Sessions

/** Build-wall vs query-wall vs SERVE-wall split for the persisted ANN
  * index families (r8 verdict #1 + r9 verdict #1 evidence rows): the
  * whole point of the artifact is that the corpus-scan build cost is
  * paid ONCE and each query batch pays only the query half — this main
  * measures build, the in-corpus gate query, and an out-of-corpus
  * 8-vector serve batch per family on the same fixture so BENCH_NOTES
  * can record the ratios. The serve batch is the DEPLOYMENT shape: new
  * ids, probe keys derived against the stored quantizers, the batch
  * side broadcast — unlike the gate query halves, whose lsh/ivf forms
  * emit all-corpus pair lists ("gate shape, not a query-batch shape").
  *   runMain graft.bench.AnnIndexBench [sfDir]
  */
object AnnIndexBench {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions.col
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.quietBenignWarnings()
    val emb = graft.Tables.embeddings(spark, dir)
    val n = graft.Tables.embeddingsRows(spark, dir)
    val dim = graft.Tables.EmbeddingDim
    // serve batch: 8 new vectors under ids disjoint from the corpus
    // (embeddings reused as payloads — serving only reads (id, vector))
    val batch = emb.filter(col("vec_id") < 8)
      .select((col("vec_id") + 1000000000L).as("query_id"), col("embedding"))
    val parts = Seq("lsh", "ivf", "pq", "sq8", "ivfpq").map { fam =>
      val ixDir = java.nio.file.Files
        .createTempDirectory(s"annix_bench_$fam").toString
      val t0 = System.nanoTime()
      graft.Graft.buildAnnIndex(emb, ixDir, fam, dim, n)
      val buildSec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val t1 = System.nanoTime()
      val rows = graft.Graft.annIndexTopK(spark, ixDir, emb).count()
      val querySec = (System.nanoTime() - t1) / 1e9
      spark.catalog.clearCache()
      val t2 = System.nanoTime()
      val serveRows = graft.Graft.annIndexServe(spark, ixDir, batch, emb).count()
      val serveSec = (System.nanoTime() - t2) / 1e9
      spark.catalog.clearCache()
      def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
      s""""${fam}_build_sec":${f(buildSec)},"${fam}_query_sec":${f(querySec)},"${fam}_rows":$rows,"${fam}_serve_sec":${f(serveSec)},"${fam}_serve_rows":$serveRows"""
    }
    spark.stop()
    println(s"""{"dir":"$dir","n":$n,${parts.mkString(",")}}""")
  }
}
