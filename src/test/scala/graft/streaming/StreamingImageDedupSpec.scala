package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.operators.Multimodal

/** Streaming image near-dup ≡ batch m5: once every image has flowed
  * through (decoded per micro-batch by the same MediaDecoder as the
  * batch path), the distinct (earlier, later, hamming) match set must
  * equal the batch Hamming-banded pipeline's verified pairs,
  * regardless of micro-batch splits. Planted byte-identical clones
  * (phash equal, hamming 0) guarantee matches at any corpus size.
  */
class StreamingImageDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("streaming match set equals batch m5 pairs across micro-batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_imgdedup_stream").toString
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val n = Tables.documentsRows(spark, sf)
    // byte-identical clones of the first 5 docs under ids above the
    // corpus (the re-encoded-image shape; ids nondecreasing across the
    // three files, so dup_of < doc_id matches batch doc_a < doc_b)
    val clones = docs.filter(col("doc_id") < 5)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    docs.filter(col("doc_id") < n / 2).coalesce(1)
      .write.mode("append").parquet(dir)
    docs.filter(col("doc_id") >= n / 2).coalesce(1)
      .write.mode("append").parquet(dir)
    clones.coalesce(1).write.mode("append").parquet(dir)

    // decode per micro-batch with the SAME decoder as the batch path
    val features = Multimodal.decodeFeatures(
        Multimodal.mediaFromDocuments(CorpusIngest.readDocs(spark, dir)),
        Multimodal.LocalityFakeMediaDecoder)
      .toDF().select(col("doc_id"), col("phash"))
    val q = StreamImageDedup.nearDupMatches(features)
      .writeStream.outputMode("append").format("memory")
      .queryName("imgdedup_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ckpt_imgdedup").toString)
      .start()
    val batches = try {
      q.processAllAvailable()
      q.recentProgress.count(_.numInputRows > 0)
    } finally q.stop()
    assert(batches >= 3, s"expected >= 3 micro-batches, got $batches")

    val streamed = spark.table("imgdedup_stream")
      .select("dup_of", "doc_id", "hamming").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val all = docs.unionAll(clones)
    val batchFeatures = Multimodal.decodeFeatures(
        Multimodal.mediaFromDocuments(all),
        Multimodal.LocalityFakeMediaDecoder)
      .toDF().select(col("doc_id"), col("phash"))
    val batch = Multimodal.phashNearDupPairs(batchFeatures)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    spark.catalog.clearCache()
    assert(batch.size >= 5, s"planted clones missing from batch: ${batch.size}")
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(5)}; " +
        s"batch-only: ${(batch -- streamed).take(5)}")
  }
}
