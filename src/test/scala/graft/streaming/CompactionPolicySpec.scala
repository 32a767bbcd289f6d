package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.{Tables, TestSpark}
import graft.operators.{AnnIndex, CompactionPolicy, DedupIndex}

/** Threshold-based artifact compaction (r11 verdict #4): the in-stream
  * maintenance trigger can key on the manifest's LIVE window (delta
  * count incl. pending tombstones, or bytes above the base slabs)
  * instead of a batch cadence a bursty stream blows past. Pinned: the
  * delta window stays bounded under a long synthetic stream, contents
  * keep equaling the one-shot build, and the policy's trigger algebra.
  */
class CompactionPolicySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("trigger algebra: any satisfied bound fires; bytes stay lazy") {
    val p = CompactionPolicy(every = 3, maxDeltas = 5, maxBytes = 100L)
    assert(p.enabled)
    assert(p.triggers(3, 1, 0L), "cadence hit")
    assert(p.triggers(1, 5, 0L), "delta bound hit")
    assert(p.triggers(1, 1, 100L), "byte bound hit")
    assert(!p.triggers(1, 4, 99L))
    assert(!CompactionPolicy().enabled)
    // bytes must not be evaluated when a cheaper condition triggers
    var evaluated = false
    def bytes: Long = { evaluated = true; 100L }
    assert(CompactionPolicy(maxDeltas = 1).triggers(1, 1, bytes))
    assert(!evaluated, "byte thunk evaluated although maxDeltas fired")
  }

  test("dedup sink: maxDeltas bounds the live window under a long stream") {
    val all = Tables.documents(spark, sf).select("doc_id", "text")
    val seed = all.filter(col("doc_id") % 10 =!= 0)
    val ixDir = Files.createTempDirectory("graft_cp_ix").toString
    DedupIndex.build(seed, ixDir, -1L)
    val corpusDir = Files.createTempDirectory("graft_cp_corpus").toString
    seed.coalesce(1).write.parquet(s"$corpusDir/batch-seed")
    val landing = Files.createTempDirectory("graft_cp_landing").toString
    // six single-file micro-batches — a "long" stream for a cadence of
    // none: only the live-window bound triggers folds
    (0 until 6).foreach(r => all
      .filter(col("doc_id") % 10 === 0 && col("doc_id") % 60 === r * 10)
      .coalesce(1).write.mode("append").parquet(landing))

    val q = StreamDedupIngest.ingestSink(
      StreamDedupIngest.readDocs(spark, landing), ixDir, corpusDir,
      Files.createTempDirectory("graft_cp_ckpt").toString,
      policy = CompactionPolicy(maxDeltas = 2))
    try q.processAllAvailable() finally q.stop()

    val streamed = DedupIndex.load(spark, ixDir)
    // every batch pushes the window to 2 -> the policy folds it back:
    // the live window never outgrows the bound
    assert(streamed.manifest.params("sig_deltas") <= 2,
      s"live window must stay bounded: ${streamed.manifest.params}")
    val oneShotDir = Files.createTempDirectory("graft_cp_oneshot").toString
    DedupIndex.build(all, oneShotDir, -1L)
    val oneShot = DedupIndex.load(spark, oneShotDir)
    assert(streamed.manifest.n == oneShot.manifest.n)
    assert(rows(streamed.pairs) == rows(oneShot.pairs))
    assert(rows(streamed.components) == rows(oneShot.components))
    spark.catalog.clearCache()
  }

  test("ivfpq sink: byte bound folds the code deltas; contents unchanged") {
    val emb = Tables.embeddings(spark, sf)
    val nEmb = Tables.embeddingsRows(spark, sf)
    val dim = Tables.EmbeddingDim
    val ixDir = Files.createTempDirectory("graft_cp_pq").toString
    AnnIndex.buildIvfPq(emb.filter(col("vec_id") >= 12), ixDir, dim,
      m = 8, k = 64, nHint = nEmb - 12)
    val landing = Files.createTempDirectory("graft_cp_pq_landing").toString
    (0 until 3).foreach(r => emb
      .filter(col("vec_id") >= r * 4 && col("vec_id") < (r + 1) * 4)
      .coalesce(1).write.mode("append").parquet(landing))

    // 1-byte bound: every batch crosses it, so every batch folds —
    // the window never exceeds slab + the current batch's delta
    val q = StreamEmbedDedup.indexAppendSink(
      spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1)
        .parquet(landing),
      ixDir, Files.createTempDirectory("graft_cp_pq_ckpt").toString,
      policy = CompactionPolicy(maxBytes = 1L))
    try q.processAllAvailable() finally q.stop()

    val mf = AnnIndex.readManifest(spark, ixDir)
    assert(mf.params("deltas") == 1L,
      s"byte-bound policy must fold every batch: ${mf.params}")
    assert(mf.n == nEmb)
    // contents equal the batch append path on the same increments
    val ctlDir = Files.createTempDirectory("graft_cp_pq_ctl").toString
    AnnIndex.buildIvfPq(emb.filter(col("vec_id") >= 12), ctlDir, dim,
      m = 8, k = 64, nHint = nEmb - 12)
    (0 until 3).foreach(r => AnnIndex.appendIvfPq(
      emb.filter(col("vec_id") >= r * 4 && col("vec_id") < (r + 1) * 4),
      ctlDir))
    assert(rows(AnnIndex.loadIvfPq(spark, ixDir).codes) ==
      rows(AnnIndex.loadIvfPq(spark, ctlDir).codes))
    spark.catalog.clearCache()
  }
}
