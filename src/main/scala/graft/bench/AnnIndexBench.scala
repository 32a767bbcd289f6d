package graft.bench

import graft.Sessions

/** Build-wall vs query-wall split for the persisted ANN index families
  * (r8 verdict #1's evidence row): the whole point of the artifact is
  * that the corpus-scan build cost is paid ONCE and each query batch
  * pays only the query half — this main measures both sides per family
  * on the same fixture so BENCH_NOTES can record the ratio.
  *   runMain graft.bench.AnnIndexBench [sfDir]
  */
object AnnIndexBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.quietBenignWarnings()
    val emb = graft.Tables.embeddings(spark, dir)
    val n = graft.Tables.embeddingsRows(spark, dir)
    val dim = graft.Tables.EmbeddingDim
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
      def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
      s""""${fam}_build_sec":${f(buildSec)},"${fam}_query_sec":${f(querySec)},"${fam}_rows":$rows"""
    }
    spark.stop()
    println(s"""{"dir":"$dir","n":$n,${parts.mkString(",")}}""")
  }
}
