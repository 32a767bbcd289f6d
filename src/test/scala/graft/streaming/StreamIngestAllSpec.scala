package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.{Graft, Tables, TestSpark}
import graft.operators.{AnnIndex, ArtifactIO, DedupIndex}

/** Cross-artifact ingest orchestration (r14 verdict #1): ONE crawl
  * stream (doc + embedding per row) lands in the dedup artifact AND
  * the ANN index AND the published corpus from a single checkpoint; a
  * crash injected between the dedup commit and the index append — the
  * exact window the old two-sink layout left a document deduplicated
  * but unsearchable — converges on restart via the per-artifact replay
  * guards; and [[StreamIngestAll.ingestStatus]] verifies every
  * artifact ingested the same id set. */
class StreamIngestAllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"singest_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  /** (doc_id, text, embedding) crawl rows — documents joined with
    * their embeddings on the shared pipeline id space. */
  private def crawlRows(lo: Long, hi: Long): DataFrame =
    Tables.documents(spark, sf)
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .join(Tables.embeddings(spark, sf)
          .select(col("vec_id").as("doc_id"), col("embedding")),
        Seq("doc_id"))
      .select(col("doc_id"), col("text"), col("embedding"))

  /** dedup artifact + ivfpq index + seeded corpus over base ids < 40. */
  private def buildSurface(tag: String): (String, String, String) = {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 40)
    val emb = Tables.embeddings(spark, sf).filter(col("vec_id") < 40)
    val dedupDir = tmp(s"${tag}_dedup")
    DedupIndex.build(docs, dedupDir, 40L)
    val annDir = tmp(s"${tag}_ann")
    AnnIndex.buildIvfPq(emb, annDir, Tables.EmbeddingDim, m = 8, k = 64,
      nHint = 40L)
    val corpusDir = tmp(s"${tag}_corpus")
    // the corpus is schema-consistent with what the sink publishes
    docs.select(col("doc_id"), col("text")).write.mode("overwrite")
      .parquet(s"$corpusDir/batch-seed")
    (dedupDir, annDir, corpusDir)
  }

  private def crawlFiles(landing: String,
      batches: Seq[(Long, Long)]): Unit =
    batches.foreach { case (lo, hi) =>
      crawlRows(lo, hi).coalesce(1).write.mode("append").parquet(landing)
    }

  test("one crawl stream lands in all artifacts; status reports " +
    "convergence and one shared high-water mark") {
    val (dedupDir, annDir, corpusDir) = buildSurface("all")
    val landing = tmp("all_landing")
    crawlFiles(landing, Seq((40L, 43L), (43L, 46L)))
    val q = Graft.streamIngestAll(spark, landing, Seq(dedupDir),
      Seq(annDir), Seq(corpusDir), tmp("all_ckpt"))
    try q.processAllAvailable() finally q.stop()

    val queue = crawlRows(40L, 46L).select(col("doc_id").as("id"))
    val status = Graft.ingestStatus(spark, queue, Seq(dedupDir),
      Seq(annDir), Seq(corpusDir)).collect()
    assert(status.length == 3)
    val nQueue = status.head.getAs[Long]("n_queue")
    assert(nQueue == 6L)
    assert(status.forall(_.getAs[Long]("n_live") == nQueue),
      s"every artifact must hold the full crawl set: ${status.mkString(";")}")
    // one shared high-water mark: both index artifacts recorded batch 1
    assert(ArtifactIO.readManifest(spark, dedupDir).params("last_batch")
      == 1L)
    assert(ArtifactIO.readManifest(spark, annDir).params("last_batch")
      == 1L)
    // the corpus published one dir per batch
    assert(StreamDedupIngest.readCorpus(spark, corpusDir)
      .filter(col("doc_id") >= 40L).count() == 6L)
    // the dedup artifact's view equals the same appends run directly
    val ctl = tmp("all_ctl")
    DedupIndex.build(Tables.documents(spark, sf)
      .filter(col("doc_id") < 40), ctl, 40L)
    DedupIndex.append(crawlRows(40L, 43L).drop("embedding"), ctl)
    DedupIndex.append(crawlRows(43L, 46L).drop("embedding"), ctl)
    val (a, b) = (DedupIndex.load(spark, dedupDir),
      DedupIndex.load(spark, ctl))
    assert(a.pairs.collect().map(_.toString).sorted.toSeq
      == b.pairs.collect().map(_.toString).sorted.toSeq)
    spark.catalog.clearCache()
  }

  test("crash between the dedup commit and the index append: status " +
    "names the divergence; restart converges without double-apply") {
    val (dedupDir, annDir, corpusDir) = buildSurface("crash")
    val landing = tmp("crash_landing")
    crawlFiles(landing, Seq((40L, 42L)))
    val ckpt = tmp("crash_ckpt")
    def sink() = Graft.streamIngestAll(spark, landing, Seq(dedupDir),
      Seq(annDir), Seq(corpusDir), ckpt)
    // the crash fires right after the dedup append's commit — the exact
    // deduplicated-but-unsearchable window the orchestration makes safe
    StreamIngestAll.crashHookForTests = Some(() =>
      throw new RuntimeException("injected crash between artifact commits"))
    val q1 = sink()
    try intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination(10000)
      ()
    } finally {
      StreamIngestAll.crashHookForTests = None
      if (q1.isActive) q1.stop()
    }
    // mid-crash state is DIVERGENT — and ingestStatus SHOWS it
    val queue = crawlRows(40L, 42L).select(col("doc_id").as("id"))
    val mid = Graft.ingestStatus(spark, queue, Seq(dedupDir),
      Seq(annDir), Seq(corpusDir)).collect()
      .map(r => r.getAs[String]("kind") -> r.getAs[Long]("n_live")).toMap
    assert(mid("dedup") == 2L, "the committed artifact holds the batch")
    assert(mid("ivfpq") == 0L && mid("corpus") == 0L,
      s"the crash left the rest behind (the hazard): $mid")
    // restart on the SAME checkpoint: the batch replays; the committed
    // artifact no-ops on its guard, the rest apply — convergence
    val q2 = sink()
    try q2.processAllAvailable() finally q2.stop()
    val after = Graft.ingestStatus(spark, queue, Seq(dedupDir),
      Seq(annDir), Seq(corpusDir)).collect()
    assert(after.forall(_.getAs[Long]("n_live") == 2L),
      s"restart must converge every artifact: ${after.mkString(";")}")
    // no double-application anywhere: dedup n grew exactly once, and
    // the index holds exactly one code set per appended vector
    assert(ArtifactIO.readManifest(spark, dedupDir).n == 42L)
    assert(AnnIndex.loadIvfPq(spark, annDir).codes
      .filter(col("vec_id") >= 40L)
      .groupBy(col("vec_id"), col("sub")).count()
      .filter(col("count") > 1).isEmpty,
      "a replayed append must not duplicate code rows")
    spark.catalog.clearCache()
  }

  test("policy folds in-stream: index windows fold and the corpus slab " +
    "advances on the same decision") {
    val (dedupDir, annDir, corpusDir) = buildSurface("pol")
    val landing = tmp("pol_landing")
    crawlFiles(landing, Seq((40L, 43L), (43L, 46L), (46L, 49L)))
    val q = Graft.streamIngestAll(spark, landing, Seq(dedupDir),
      Seq(annDir), Seq(corpusDir), tmp("pol_ckpt"),
      policy = graft.operators.CompactionPolicy(maxDeltas = 2))
    try q.processAllAvailable() finally q.stop()
    val mfD = ArtifactIO.readManifest(spark, dedupDir)
    val mfA = ArtifactIO.readManifest(spark, annDir)
    assert(mfD.params("sig_deltas") <= 2L,
      s"the dedup window must have folded in-stream: ${mfD.params}")
    assert(mfA.params("deltas") <= 2L,
      s"the ann code window must have folded in-stream: ${mfA.params}")
    assert(StreamDedupIngest.mergedUpto(spark, corpusDir).exists(_ >= 0L),
      "the corpus slab must have advanced with the index folds")
    // content stands after the folds: everything crawled is live
    val queue = crawlRows(40L, 49L).select(col("doc_id").as("id"))
    val status = Graft.ingestStatus(spark, queue, Seq(dedupDir),
      Seq(annDir), Seq(corpusDir)).collect()
    assert(status.forall(_.getAs[Long]("n_live") == 9L),
      s"folds must not lose crawled docs: ${status.mkString(";")}")
    spark.catalog.clearCache()
  }

  test("artifactHealth: both convergence reports in one frame, " +
    "row-for-row consistent with the separate status calls (r15 #7)") {
    val (dedupDir, annDir, corpusDir) = buildSurface("health")
    // ingest 40..48, then take down 4 of the base ids
    Graft.ingestAll(spark, crawlRows(40, 48), batchId = 1L,
      Seq(dedupDir), Seq(annDir), Seq(corpusDir))
    val takeQ = spark.range(0, 4).select(col("id"))
    Graft.takedownAll(spark, takeQ, Seq(dedupDir), Seq(annDir),
      Seq(corpusDir))
    val ingQ = spark.range(40, 48).select(col("id"))
    val health = Graft.artifactHealth(spark, ingQ, takeQ,
      Seq(dedupDir), Seq(annDir), Seq(corpusDir)).collect()
      .map(r => r.getAs[String]("artifact") -> r).toMap
    assert(health.size == 3)
    // one frame must agree with the two separate scans, artifact by
    // artifact
    val ing = Graft.ingestStatus(spark, ingQ, Seq(dedupDir),
      Seq(annDir), Seq(corpusDir)).collect()
      .map(r => r.getAs[String]("artifact") ->
        r.getAs[Long]("n_live")).toMap
    val tak = Graft.takedownStatus(spark, takeQ, Seq(dedupDir),
      Seq(annDir), Seq(corpusDir)).collect()
      .map(r => r.getAs[String]("artifact") ->
        r.getAs[Long]("n_visible")).toMap
    health.foreach { case (a, r) =>
      assert(r.getAs[Long]("n_ingest_queue") == 8L)
      assert(r.getAs[Long]("n_takedown_queue") == 4L)
      assert(r.getAs[Long]("n_live") == ing(a),
        s"health n_live must match ingestStatus for $a")
      assert(r.getAs[Long]("n_visible") == tak(a),
        s"health n_visible must match takedownStatus for $a")
    }
    // and the converged state reads as documented: all ingested ids
    // live everywhere, all taken-down ids visible nowhere
    assert(health.values.forall(_.getAs[Long]("n_live") == 8L))
    assert(health.values.forall(_.getAs[Long]("n_visible") == 0L))
    spark.catalog.clearCache()
  }

  test("batch ingestAll: one call, every artifact; a replayed batchId " +
    "no-ops on the shared guard") {
    val (dedupDir, annDir, corpusDir) = buildSurface("batch")
    val crawl = crawlRows(40L, 44L)
    Graft.ingestAll(spark, crawl, batchId = 100L, Seq(dedupDir),
      Seq(annDir), Seq(corpusDir))
    val queue = crawl.select(col("doc_id").as("id"))
    val status = Graft.ingestStatus(spark, queue, Seq(dedupDir),
      Seq(annDir), Seq(corpusDir)).collect()
    assert(status.length == 3 &&
      status.forall(_.getAs[Long]("n_live") == 4L),
      s"batch apply must land everywhere: ${status.mkString(";")}")
    // replaying the same batchId is a durable no-op on the index
    // artifacts (corpus re-publish overwrites its own dir — idempotent)
    Graft.ingestAll(spark, crawl, batchId = 100L, Seq(dedupDir),
      Seq(annDir), Seq(corpusDir))
    assert(ArtifactIO.readManifest(spark, dedupDir).n == 44L)
    assert(AnnIndex.readManifest(spark, annDir).n == 44L)
    spark.catalog.clearCache()
  }

  test("poison pill: a re-crawled taken-down id folds the window and " +
    "proceeds instead of wedging the stream") {
    val (dedupDir, annDir, corpusDir) = buildSurface("pill")
    // take down id 5 across the surface, leaving live tombstone windows
    val spark0 = spark
    import spark0.implicits._
    Graft.takedownAll(spark, Seq(5L).toDF("id"), Seq(dedupDir),
      Seq(annDir), Seq(corpusDir))
    assert(ArtifactIO.readManifest(spark, dedupDir)
      .params("tomb_deltas") == 1L)
    // the re-crawl arrives carrying id 5 again
    val landing = tmp("pill_landing")
    crawlRows(5L, 6L).coalesce(1).write.mode("append").parquet(landing)
    val q = Graft.streamIngestAll(spark, landing, Seq(dedupDir),
      Seq(annDir), Seq(corpusDir), tmp("pill_ckpt"))
    try q.processAllAvailable() finally q.stop()
    // both index artifacts folded their window and re-ingested the id
    val queue = Seq(5L).toDF("id")
    val status = Graft.ingestStatus(spark, queue, Seq(dedupDir),
      Seq(annDir), Seq(corpusDir)).collect()
    assert(status.forall(_.getAs[Long]("n_live") == 1L),
      s"the re-crawl must land everywhere after the unblock: " +
        status.mkString(";"))
    spark.catalog.clearCache()
  }
}
