package graft.bench

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.operators.{AnnIndex, DedupIndex, RagServe}

/** Per-batch serve walls for the artifact-backed RAG compositions (r10
  * verdict #3): hybrid RRF and MMR for an 8-query out-of-corpus batch,
  * exact twin (full corpus-text shingle scan + full embedding rescan)
  * vs the loaded-artifact path (stored shingle sets + ANN candidates +
  * exact rerank), after the one-time index builds.
  *   runMain graft.bench.RagServeBench [sfDir]
  */
object RagServeBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.quietBenignWarnings()
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def timed(body: => Long): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    val NQ = 8
    val docs = graft.Tables.documents(spark, dir).filter(col("doc_id") >= NQ)
    val emb = graft.Tables.embeddings(spark, dir).filter(col("vec_id") >= NQ)
    val nEmb = graft.Tables.embeddingsRows(spark, dir) - NQ
    val queries = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") < NQ).select(col("doc_id"), col("text"))
      .join(graft.Tables.embeddings(spark, dir).filter(col("vec_id") < NQ)
        .select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
      .select((col("doc_id") + 5000000L).as("query_id"), col("text"),
        col("embedding"))
      .localCheckpoint(true)

    val annDir = java.nio.file.Files.createTempDirectory("rag_ann").toString
    val dedupDir = java.nio.file.Files.createTempDirectory("rag_dx").toString
    val tb0 = System.nanoTime()
    AnnIndex.buildIvf(emb, annDir, graft.Tables.EmbeddingDim, nEmb)
    DedupIndex.build(docs, dedupDir, -1L)
    val buildSec = (System.nanoTime() - tb0) / 1e9
    spark.catalog.clearCache()

    val parts = scala.collection.mutable.ListBuffer[String]()
    parts += s""""n":${nEmb + NQ},"build_sec":${f(buildSec)}"""
    def run(name: String)(body: => Long): Unit = {
      val s = timed(body)
      spark.catalog.clearCache()
      parts += s""""${name}_sec":${f(s)}"""
    }
    run("hybrid_exact")(
      RagServe.hybridExact(docs, emb, queries).count())
    run("hybrid_from_ix") {
      val ix = DedupIndex.load(spark, dedupDir)
      RagServe.hybridFromIndexes(spark, annDir, ix, emb, queries).count()
    }
    run("mmr_exact") {
      val (df, pins) = RagServe.mmrExactPinned(emb, queries)
      val c = df.count(); pins.foreach(_.unpersist()); c
    }
    run("mmr_from_ix") {
      val (df, pins) = RagServe.mmrFromIndexPinned(spark, annDir, emb, queries)
      val c = df.count(); pins.foreach(_.unpersist()); c
    }
    spark.stop()
    println(s"""{"dir":"$dir",${parts.mkString(",")}}""")
  }
}
