package graft.bench

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.operators.{AnnIndex, DedupIndex}

/** Per-leg breakdown of a big orchestrated ingest batch (r15 verdict
  * #3 follow-up): IngestBatchBench measured wall(100k) ≈ 3.6× the
  * linear-in-increment prediction, so ONE of the three legs (dedup
  * append / ivfpq append / corpus publish) is superlinear in the
  * increment. This isolates them: build the surface, append one batch
  * of the given size to EACH artifact separately, report per-leg
  * walls.
  *
  *   runMain graft.bench.IngestLegsBench [fixtureDir] [sizesCsv]
  */
object IngestLegsBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sizes = args.lift(1).getOrElse("10000,100000")
      .split(',').map(_.trim.toLong).filter(_ > 0)
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.quietBenignWarnings()
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val parts = scala.collection.mutable.ListBuffer[String]()

    val docs = graft.Tables.documents(spark, dir)
    val emb = graft.Tables.embeddings(spark, dir)
    val (nDocs, nEmb) = (docs.count(), emb.count())
    parts += s""""documents":$nDocs,"embeddings":$nEmb"""

    val dedupDir = java.nio.file.Files
      .createTempDirectory("il_dedup").toString
    DedupIndex.build(docs, dedupDir, nDocs)
    spark.catalog.clearCache()
    val annDir = java.nio.file.Files
      .createTempDirectory("il_ivfpq").toString
    AnnIndex.buildIvfPq(emb, annDir, graft.Tables.EmbeddingDim,
      m = 8, k = 64, nHint = nEmb)
    spark.catalog.clearCache()
    val corpusDir = java.nio.file.Files
      .createTempDirectory("il_corpus").toString
    docs.select(col("doc_id"), col("text")).write.mode("overwrite")
      .parquet(s"$corpusDir/batch-seed")

    var salt = 4000000000L
    var batchId = 100L
    sizes.foreach { size =>
      val docInc = docs.limit(size.toInt)
        .select((col("doc_id") + lit(salt)).as("doc_id"), col("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docInc.count()
      val embInc = emb.limit(size.toInt)
        .select((col("vec_id") + lit(salt)).as("vec_id"), col("embedding"),
          col("label"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      embInc.count()
      salt += 10000000L
      batchId += 1
      val (_, dSec) = timed(DedupIndex.append(docInc, dedupDir, batchId))
      spark.catalog.clearCache()
      val (_, aSec) = timed(AnnIndex.appendIvfPq(embInc, annDir, batchId))
      spark.catalog.clearCache()
      val (_, cSec) = timed(docInc.write.mode("overwrite")
        .parquet(s"$corpusDir/batch-$batchId"))
      parts += s""""dedup_append_${size}_sec":${f(dSec)}"""
      parts += s""""ivfpq_append_${size}_sec":${f(aSec)}"""
      parts += s""""corpus_publish_${size}_sec":${f(cSec)}"""
      docInc.unpersist(); embInc.unpersist()
    }
    spark.stop()
    println(s"""{"dir":"$dir",${parts.mkString(",")}}""")
  }
}
