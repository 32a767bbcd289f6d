package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.operators.DedupIndex

/** Streaming dedup-artifact ingest ≡ one-shot build: after two
  * micro-batches flow through [[StreamDedupIngest.ingestSink]], the
  * artifact's signatures, verified pair graph AND merged components
  * must equal a one-shot [[DedupIndex.build]] on the union corpus —
  * cross-batch pairs included (batch 2 verifies against seed + batch 1
  * through the published corpus dirs). Micro-batch splits must be
  * invisible to the artifact, exactly like the ANN index's chunked ≡
  * one-shot identity.
  */
class StreamDedupIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("streamed ingest across micro-batches equals the one-shot build") {
    val all = Tables.documents(spark, sf).select("doc_id", "text")
    // seed = doc_id % 10 != 0 (the d16 cut); the increments land as two
    // files: every 20th doc, then the remaining 10th-but-not-20th docs —
    // cross-batch near-dups exist across all three slices
    val seed = all.filter(col("doc_id") % 10 =!= 0)
    val inc1 = all.filter(col("doc_id") % 20 === 0)
    val inc2 = all.filter(col("doc_id") % 10 === 0 && col("doc_id") % 20 =!= 0)

    val ixDir = Files.createTempDirectory("graft_sdi_ix").toString
    DedupIndex.build(seed, ixDir, -1L)
    val corpusDir = Files.createTempDirectory("graft_sdi_corpus").toString
    seed.coalesce(1).write.parquet(s"$corpusDir/batch-seed")
    val landing = Files.createTempDirectory("graft_sdi_landing").toString
    inc1.coalesce(1).write.mode("append").parquet(landing)
    inc2.coalesce(1).write.mode("append").parquet(landing)

    val q = StreamDedupIngest.ingestSink(
      StreamDedupIngest.readDocs(spark, landing), ixDir, corpusDir,
      Files.createTempDirectory("graft_sdi_ckpt").toString)
    try q.processAllAvailable() finally q.stop()

    val streamed = DedupIndex.load(spark, ixDir)
    val oneShotDir = Files.createTempDirectory("graft_sdi_oneshot").toString
    DedupIndex.build(all, oneShotDir, -1L)
    val oneShot = DedupIndex.load(spark, oneShotDir)
    assert(streamed.manifest.n == oneShot.manifest.n)
    assert(rows(streamed.signatures.select(col("doc_id"),
        concat_ws(",", col("sig")).as("s")))
      == rows(oneShot.signatures.select(col("doc_id"),
        concat_ws(",", col("sig")).as("s"))))
    assert(rows(streamed.pairs) == rows(oneShot.pairs),
      "streamed pair graph must equal the one-shot build (cross-batch pairs included)")
    assert(rows(streamed.components) == rows(oneShot.components),
      "streamed component merge must equal the one-shot solve")
    // the published corpus matches what the artifact describes
    val published = spark.read.parquet(s"$corpusDir/batch-*").count()
    assert(published == oneShot.manifest.n)
    spark.catalog.clearCache()
  }

  test("in-stream compaction (compactEvery) keeps the identity and bounds dir counts") {
    val all = Tables.documents(spark, sf).select("doc_id", "text")
    val seed = all.filter(col("doc_id") % 10 =!= 0)
    val ixDir = Files.createTempDirectory("graft_sdic_ix").toString
    DedupIndex.build(seed, ixDir, -1L)
    val corpusDir = Files.createTempDirectory("graft_sdic_corpus").toString
    seed.coalesce(1).write.parquet(s"$corpusDir/batch-seed")
    val landing = Files.createTempDirectory("graft_sdic_landing").toString
    // four single-file micro-batches; compaction fires on batches 2, 4
    (0 until 4).foreach(r => all
      .filter(col("doc_id") % 10 === 0 && col("doc_id") % 40 === r * 10)
      .coalesce(1).write.mode("append").parquet(landing))

    val q = StreamDedupIngest.ingestSink(
      StreamDedupIngest.readDocs(spark, landing), ixDir, corpusDir,
      Files.createTempDirectory("graft_sdic_ckpt").toString,
      compactEvery = 2)
    try q.processAllAvailable() finally q.stop()

    val streamed = DedupIndex.load(spark, ixDir)
    val oneShotDir = Files.createTempDirectory("graft_sdic_oneshot").toString
    DedupIndex.build(all, oneShotDir, -1L)
    val oneShot = DedupIndex.load(spark, oneShotDir)
    assert(streamed.manifest.n == oneShot.manifest.n)
    assert(rows(streamed.pairs) == rows(oneShot.pairs),
      "in-stream compaction must not change the pair graph")
    assert(rows(streamed.components) == rows(oneShot.components))
    // dir counts bounded: the last compaction (batch 4) folded
    // everything staged before it; at most slab + post-slab deltas live
    assert(streamed.manifest.params("sig_deltas") <= 2,
      s"sig window after in-stream compaction: ${streamed.manifest.params}")
    val corpus = StreamDedupIngest.readCorpus(spark, corpusDir)
    assert(corpus.count() == oneShot.manifest.n,
      "compacted corpus must describe the same document set")
    spark.catalog.clearCache()
  }

  test("poison-pill unblock: re-ingest of a taken-down id folds and retries") {
    // r13 ADVICE: a FRESH batch carrying an id deleted earlier was
    // refused while the tombstone window is live, and Structured
    // Streaming re-delivers the same batch on every restart — the
    // stream wedged until a manual compaction. The sink now folds the
    // window and retries the batch once.
    val all = Tables.documents(spark, sf).select("doc_id", "text")
    val seed = all.filter(col("doc_id") < 40)
    val ixDir = Files.createTempDirectory("graft_pp_ix").toString
    DedupIndex.build(seed, ixDir, -1L)
    val corpusDir = Files.createTempDirectory("graft_pp_corpus").toString
    seed.coalesce(1).write.parquet(s"$corpusDir/batch-seed")
    // takedown of doc 3: live tombstone window
    val spark0 = spark
    import spark0.implicits._
    assert(DedupIndex.delete(Seq(3L).toDF("doc_id"), ixDir) == 1L)
    // a fresh batch re-ingests doc 3 (re-crawl after the takedown's
    // content was republished — the realistic poison-pill shape)
    val landing = Files.createTempDirectory("graft_pp_landing").toString
    all.filter(col("doc_id") === 3L || col("doc_id") === 45L)
      .coalesce(1).write.mode("append").parquet(landing)
    val q = StreamDedupIngest.ingestSink(
      StreamDedupIngest.readDocs(spark, landing), ixDir, corpusDir,
      Files.createTempDirectory("graft_pp_ckpt").toString)
    try q.processAllAvailable() finally q.stop()
    // the stream did not wedge: the fold emptied the window, the batch
    // applied, and doc 3 is ingested again
    val ix = DedupIndex.load(spark, ixDir)
    assert(ix.manifest.params("tomb_deltas") == 0L,
      "the unblock must have folded the tombstone window")
    assert(ix.signatures.filter(col("doc_id") === 3L).count() == 1L,
      "the re-ingested id must be live again")
    assert(ix.signatures.filter(col("doc_id") === 45L).count() == 1L)
    assert(ix.manifest.n == 41L) // 40 - 1 deleted + 2 ingested
    spark.catalog.clearCache()
  }
}
