package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.operators.TextOps

/** Streaming corpus ingest must equal the batch pipeline: duplicates
  * re-ingested in LATER micro-batches are dropped by the fingerprint
  * state, and the quality gate filters identically.
  */
class CorpusIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("cross-batch dedup + quality gate equal the batch twin") {
    val dir = Files.createTempDirectory("graft_ingest").toString
    val docs = Tables.documents(spark, sf)
    // batch 1: the corpus; batch 2 (arrives later): 20 re-crawled docs —
    // same text, new doc_ids — plus 5 genuinely new short docs
    docs.coalesce(1).write.mode("append").parquet(dir)
    docs.filter(col("doc_id") < 20)
      .select((col("doc_id") + 7000).as("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))
      .coalesce(1).write.mode("append").parquet(dir)
    val extra = (0 until 5).map(i => (8000L + i, s"tiny doc $i", "en", "s", 10L))
    import spark.implicits._
    extra.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(dir)

    val got = EventStreams.runToMemory(spark,
      CorpusIngest.ingest(CorpusIngest.readDocs(spark, dir)), "corpus_ingest")

    // batch twin over the SAME landed files
    val batch = spark.read.schema(CorpusIngest.docSchema).parquet(dir)
      .withColumn("text_fp", TextOps.fingerprint(col("text")))
      .dropDuplicates("text_fp")
      .withColumn("n_tok", size(TextOps.tokens(col("text"))).cast("bigint"))
      .filter(col("n_tok") >= 5)

    // dedup keeps an arbitrary doc per fingerprint — compare on the
    // deterministic surface: the fingerprint set and per-lang sizes
    val gotFps = got.select("text_fp").collect().map(_.getLong(0)).toSet
    val batchFps = batch.select("text_fp").collect().map(_.getLong(0)).toSet
    assert(gotFps == batchFps)
    // the 20 re-crawled duplicates (which arrived in a LATER batch) are
    // gone; the 5 tiny docs are filtered by the quality gate (3 tokens)
    val survivors = got.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors.forall(_ < 7000), "re-crawled duplicates must be dropped")
    assert(got.count() == batch.count())
  }
}
