package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.{Graft, Tables, TestSpark}
import graft.operators.{AnnIndex, ArtifactIO, DedupIndex}

/** Cross-artifact takedown orchestration (r13 verdict #1): ONE removal
  * queue drives the dedup artifact AND the ANN index AND the published
  * corpus from a single checkpoint; a crash injected between two
  * artifacts' commits converges on restart (per-artifact replay
  * guards); and [[StreamTakedownAll.takedownStatus]] verifies all
  * artifacts excluded the same id set — the check N independent sinks
  * never had. */
class StreamTakedownAllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"stall_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def idFiles(landing: String, batches: Seq[Seq[Long]]): Unit = {
    val spark0 = spark
    import spark0.implicits._
    batches.foreach(b =>
      b.toDF("id").coalesce(1).write.mode("append").parquet(landing))
  }

  /** dedup artifact + ivfpq index + seeded corpus over the same docs. */
  private def buildSurface(tag: String): (String, String, String) = {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 60)
    val emb = Tables.embeddings(spark, sf).filter(col("vec_id") < 60)
    val dedupDir = tmp(s"${tag}_dedup")
    DedupIndex.build(docs, dedupDir, 60L)
    val annDir = tmp(s"${tag}_ann")
    AnnIndex.buildIvfPq(emb, annDir, Tables.EmbeddingDim, m = 8, k = 64,
      nHint = 60L)
    val corpusDir = tmp(s"${tag}_corpus")
    docs.write.mode("overwrite").parquet(s"$corpusDir/batch-seed")
    (dedupDir, annDir, corpusDir)
  }

  test("one queue drives all artifacts; status reports zero divergence") {
    val (dedupDir, annDir, corpusDir) = buildSurface("all")
    val landing = tmp("all_landing")
    idFiles(landing, Seq(Seq(0L, 2L), Seq(5L, 999999999L)))
    val q = Graft.streamTakedownAll(spark, landing, Seq(dedupDir),
      Seq(annDir), Seq(corpusDir), tmp("all_ckpt"))
    try q.processAllAvailable() finally q.stop()

    val spark0 = spark
    import spark0.implicits._
    val queue = Seq(0L, 2L, 5L, 999999999L).toDF("id")
    val status = Graft.takedownStatus(spark, queue, Seq(dedupDir),
      Seq(annDir), Seq(corpusDir)).collect()
    assert(status.length == 3)
    assert(status.forall(_.getAs[Long]("n_visible") == 0L),
      s"every artifact must have excluded the queue: ${status.mkString(";")}")
    // per-artifact state equals the batch delete of the union set
    assert(DedupIndex.load(spark, dedupDir).signatures
      .filter(col("doc_id").isInCollection(Seq(0L, 2L, 5L))).isEmpty)
    assert(AnnIndex.loadIvfPq(spark, annDir).codes
      .filter(col("vec_id").isInCollection(Seq(0L, 2L, 5L))).isEmpty)
    assert(StreamDedupIngest.readCorpus(spark, corpusDir)
      .filter(col("doc_id").isInCollection(Seq(0L, 2L, 5L))).isEmpty)
    // one shared high-water mark: every artifact recorded batch 1
    assert(ArtifactIO.readManifest(spark, dedupDir)
      .params("last_delete_batch") == 1L)
    assert(ArtifactIO.readManifest(spark, annDir)
      .params("last_delete_batch") == 1L)
    assert(ArtifactIO.readManifest(spark, corpusDir)
      .params("last_delete_batch") == 1L)
    spark.catalog.clearCache()
  }

  test("crash between two artifacts' commits: restart converges, status clean") {
    val (dedupDir, annDir, corpusDir) = buildSurface("crash")
    val landing = tmp("crash_landing")
    idFiles(landing, Seq(Seq(1L, 3L)))
    val ckpt = tmp("crash_ckpt")
    def sink() = Graft.streamTakedownAll(spark, landing, Seq(dedupDir),
      Seq(annDir), Seq(corpusDir), ckpt)
    // the crash fires right after the FIRST artifact's (dedup) commit —
    // the exact between-two-commits window the orchestration makes safe
    StreamTakedownAll.crashHookForTests = Some(() =>
      throw new RuntimeException("injected crash between artifact commits"))
    val q1 = sink()
    try intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination(10000)
      ()
    } finally {
      StreamTakedownAll.crashHookForTests = None
      if (q1.isActive) q1.stop()
    }
    // mid-crash state is DIVERGENT — and takedownStatus SHOWS it
    val spark0 = spark
    import spark0.implicits._
    val queue = Seq(1L, 3L).toDF("id")
    val mid = Graft.takedownStatus(spark, queue, Seq(dedupDir),
      Seq(annDir), Seq(corpusDir)).collect()
      .map(r => r.getAs[String]("kind") -> r.getAs[Long]("n_visible")).toMap
    assert(mid("dedup") == 0L, "the committed artifact excluded the batch")
    assert(mid("ivfpq") == 2L && mid("corpus") == 2L,
      s"the crash left the rest divergent (the hazard): $mid")
    // restart on the SAME checkpoint: the batch replays; the committed
    // artifact no-ops on its guard, the rest apply — convergence
    val q2 = sink()
    try q2.processAllAvailable() finally q2.stop()
    val after = Graft.takedownStatus(spark, queue, Seq(dedupDir),
      Seq(annDir), Seq(corpusDir)).collect()
    assert(after.forall(_.getAs[Long]("n_visible") == 0L),
      s"restart must converge every artifact: ${after.mkString(";")}")
    // no double-application: dedup's n dropped exactly once
    assert(ArtifactIO.readManifest(spark, dedupDir).n == 58L)
    spark.catalog.clearCache()
  }

  test("orchestrated sink: flat family + policy folds, windows stay empty") {
    // a flat-family (lsh) artifact rides the same queue, and an enabled
    // policy folds every artifact whose live window trips the bound —
    // the orchestrated stream never accretes anti-join debt
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 60)
    val emb = Tables.embeddings(spark, sf).filter(col("vec_id") < 60)
    val dedupDir = tmp("pol_dedup")
    DedupIndex.build(docs, dedupDir, 60L)
    val lshDir = tmp("pol_lsh")
    AnnIndex.buildLsh(emb, lshDir, Tables.EmbeddingDim, 60L)
    val landing = tmp("pol_landing")
    idFiles(landing, Seq(Seq(0L, 2L), Seq(5L)))
    val q = Graft.streamTakedownAll(spark, landing, Seq(dedupDir),
      Seq(lshDir), Nil, tmp("pol_ckpt"),
      policy = graft.operators.CompactionPolicy(maxDeltas = 1))
    try q.processAllAvailable() finally q.stop()
    val spark0 = spark
    import spark0.implicits._
    val queue = Seq(0L, 2L, 5L).toDF("id")
    val status = Graft.takedownStatus(spark, queue, Seq(dedupDir),
      Seq(lshDir), Nil).collect()
    assert(status.forall(_.getAs[Long]("n_visible") == 0L),
      s"flat family must converge too: ${status.mkString(";")}")
    // the policy folded in-stream: no pending tombstones anywhere, the
    // lsh fold ran as the frozen-quantizer version swap
    val mfD = ArtifactIO.readManifest(spark, dedupDir)
    val mfL = ArtifactIO.readManifest(spark, lshDir)
    assert(mfD.params("tomb_deltas") == 0L,
      s"dedup window must be folded in-stream: ${mfD.params}")
    assert(mfL.params("tomb_deltas") == 0L && mfL.params("version") >= 1L,
      s"lsh window must be folded via the version swap: ${mfL.params}")
    spark.catalog.clearCache()
  }

  test("batch takedownAll: one call, every artifact, status clean") {
    val (dedupDir, annDir, corpusDir) = buildSurface("batch")
    val spark0 = spark
    import spark0.implicits._
    val ids = Seq(4L, 9L).toDF("id")
    Graft.takedownAll(spark, ids, Seq(dedupDir), Seq(annDir),
      Seq(corpusDir))
    val status = Graft.takedownStatus(spark, ids, Seq(dedupDir),
      Seq(annDir), Seq(corpusDir)).collect()
    assert(status.length == 3 &&
      status.forall(_.getAs[Long]("n_visible") == 0L),
      s"batch apply must converge every artifact: ${status.mkString(";")}")
    // idempotent: re-applying the same ids is a no-op everywhere
    Graft.takedownAll(spark, ids, Seq(dedupDir), Seq(annDir),
      Seq(corpusDir))
    assert(ArtifactIO.readManifest(spark, dedupDir).n == 58L)
    spark.catalog.clearCache()
  }

  test("corpus takedown: instant exclusion, physical drop at compaction") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 40)
    val corpusDir = tmp("corpus_solo")
    docs.filter(col("doc_id") < 20).write.mode("overwrite")
      .parquet(s"$corpusDir/batch-0")
    docs.filter(col("doc_id") >= 20).write.mode("overwrite")
      .parquet(s"$corpusDir/batch-1")
    val spark0 = spark
    import spark0.implicits._
    // never-compacted corpus: the first takedown creates the manifest
    assert(Graft.corpusDelete(spark, corpusDir,
      Seq(7L, 23L, 999999999L).toDF("doc_id")) == 2L)
    val live = StreamDedupIngest.readCorpus(spark, corpusDir)
    assert(live.filter(col("doc_id").isInCollection(Seq(7L, 23L))).isEmpty)
    assert(live.count() == 38L)
    // repeat delete of gone ids: no-op, no commit
    val mf = ArtifactIO.readManifest(spark, corpusDir)
    assert(Graft.corpusDelete(spark, corpusDir, Seq(7L).toDF("doc_id")) == 0L)
    assert(ArtifactIO.readManifest(spark, corpusDir) == mf)
    // a batch published AFTER the fold boundary carries a doc that is
    // then taken down: the fold must NOT blanket-reset the window (the
    // doc's rows are not in the folded slab — a reset would resurface
    // them); surviving tombstones carry forward as a fresh delta
    val late = Tables.documents(spark, sf)
      .filter(col("doc_id") >= 40 && col("doc_id") < 50)
    late.coalesce(1).write.mode("overwrite").parquet(s"$corpusDir/batch-2")
    assert(Graft.corpusDelete(spark, corpusDir,
      Seq(45L).toDF("doc_id")) == 1L)
    // fold covers only batches <= 1; doc 45 lives in batch-2
    StreamDedupIngest.compactCorpus(spark, corpusDir, upTo = 1L)
    val mf2 = ArtifactIO.readManifest(spark, corpusDir)
    assert(mf2.params("tomb_deltas") == 1L && mf2.params("tomb_rows") == 1L,
      s"the un-folded tombstone must carry forward: ${mf2.params}")
    val folded = StreamDedupIngest.readCorpus(spark, corpusDir)
    assert(folded.filter(col("doc_id") === 45L).isEmpty,
      "a takedown in a live batch must survive the fold")
    assert(rows(folded) == rows(docs.unionByName(late).filter(
      !col("doc_id").isInCollection(Seq(7L, 23L, 45L)))))
    // a fold that covers EVERYTHING genuinely empties the window
    StreamDedupIngest.compactCorpus(spark, corpusDir, upTo = 2L)
    val mf3 = ArtifactIO.readManifest(spark, corpusDir)
    assert(mf3.params("tomb_deltas") == 0L && mf3.params("tomb_rows") == 0L)
    assert(StreamDedupIngest.readCorpus(spark, corpusDir)
      .filter(col("doc_id") === 45L).isEmpty)
    spark.catalog.clearCache()
  }
}
