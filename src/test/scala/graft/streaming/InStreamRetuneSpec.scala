package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.{Graft, Tables, TestSpark}
import graft.operators.{AnnIndex, ArtifactIO, RecallPolicy}
import graft.queries.SimilarityQueries

/** Policy-driven auto-retune in-stream (r14 verdict #5): recallCheck
  * wired into the takedown sink behind a [[RecallPolicy]]. A benign
  * takedown batch passes the scheduled check without a rebuild; a
  * planted neighborhood takedown trips it, [[AnnIndex.rebuildAndTune]]
  * runs INSIDE the stream, and the next batch serves at knobs
  * re-measured against the new geometry. */
class InStreamRetuneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val NQ = 8

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"retune_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("planted neighborhood takedown trips the policy in-stream; the " +
    "next batch serves at re-tuned knobs; benign batches do not rebuild") {
    val corpus = Tables.embeddings(spark, sf).filter(col("vec_id") >= NQ)
    val nCorpus = Tables.embeddingsRows(spark, sf) - NQ
    val queries = Tables.embeddings(spark, sf).filter(col("vec_id") < NQ)
      .select((col("vec_id") + 1000000L).as("query_id"), col("embedding"))
      .localCheckpoint(true)
    val dim = Tables.EmbeddingDim
    val dir = tmp("ivfpq")
    AnnIndex.buildIvfPq(corpus, dir, dim, m = 8, k = 64, nHint = nCorpus)
    assert(AnnIndex.tuneIndex(spark, dir, corpus, queries,
      targetRecall = 0.85).targetMet)

    // the live store the policy measures against: the caller's
    // embedding table restricted to ids the index still serves —
    // re-evaluated at every check (the thunk contract)
    def store() = corpus.join(
      AnnIndex.loadIvfPq(spark, dir).codes.select(col("vec_id")).distinct(),
      Seq("vec_id"), "left_semi")
    val landing = tmp("landing")
    val ckpt = tmp("ckpt")
    val q = Graft.streamAnnTakedown(spark, landing, dir, ckpt,
      recall = RecallPolicy(every = 1, driftBoundM = 50L,
        targetRecall = 0.85, store = Some(() => store()),
        sample = Some(() => queries)))
    try {
      // batch 0+1: benign takedowns — vectors in NO query's top-10
      // neighborhood; truth and serving shift together, recall holds,
      // the scheduled check passes without a rebuild
      val victims = SimilarityQueries.cosineTopKServe(corpus, queries, 10)
        .select(col("neighbor_id").as("vec_id")).distinct()
        .localCheckpoint(true)
      val benign = corpus.select(col("vec_id"))
        .join(victims, Seq("vec_id"), "left_anti")
        .orderBy(col("vec_id")).limit(4).localCheckpoint(true)
      benign.limit(2).coalesce(1).write.mode("append").parquet(landing)
      q.processAllAvailable()
      benign.exceptAll(benign.limit(2)).coalesce(1)
        .write.mode("append").parquet(landing) // batch 1: check runs
      q.processAllAvailable()
      val mfBenign = AnnIndex.readManifest(spark, dir)
      assert(!mfBenign.params.contains("version"),
        s"a benign takedown must not trigger a rebuild: ${mfBenign.params}")

      // batch 2: the planted shift — every query's true neighborhood
      // taken down; recall at the tuned point collapses, the policy
      // rebuilds + re-tunes inside the stream
      victims.coalesce(1).write.mode("append").parquet(landing)
      q.processAllAvailable()
    } finally q.stop()
    val mf = AnnIndex.readManifest(spark, dir)
    assert(mf.params.get("version").exists(_ >= 1L),
      s"the planted takedown must have triggered the in-stream rebuild: " +
        s"${mf.params}")
    assert(mf.params.contains("tuned_recall_m") &&
      mf.params.contains("tuned_n_probe"),
      s"the retune must re-record knobs against the new geometry: " +
        s"${mf.params}")
    // the next batch serves at the re-tuned operating point: the same
    // scheduled measurement now reports zero-ish drift on the recorded
    // sample
    val after = AnnIndex.recallCheck(spark, dir, store(), queries)
    assert(!after.drifted && after.sampleMatches,
      s"post-retune serving must be back at a measured point: $after")
    spark.catalog.clearCache()
  }

  test("the ORCHESTRATED takedown sink carries the same policy: a " +
    "planted takedown through takedownAll retunes the ANN leg") {
    val corpus = Tables.embeddings(spark, sf).filter(col("vec_id") >= NQ)
    val nCorpus = Tables.embeddingsRows(spark, sf) - NQ
    val queries = Tables.embeddings(spark, sf).filter(col("vec_id") < NQ)
      .select((col("vec_id") + 1000000L).as("query_id"), col("embedding"))
      .localCheckpoint(true)
    val dir = tmp("all_ivfpq")
    AnnIndex.buildIvfPq(corpus, dir, Tables.EmbeddingDim, m = 8, k = 64,
      nHint = nCorpus)
    assert(AnnIndex.tuneIndex(spark, dir, corpus, queries,
      targetRecall = 0.85).targetMet)
    val docs = Tables.documents(spark, sf)
    val dedupDir = tmp("all_dedup")
    graft.operators.DedupIndex.build(docs, dedupDir, 500L)
    def store() = corpus.join(
      AnnIndex.loadIvfPq(spark, dir).codes.select(col("vec_id")).distinct(),
      Seq("vec_id"), "left_semi")
    val landing = tmp("all_landing")
    // batch 0 is never due (batchId > 0 gate): a benign warm-up batch,
    // then the planted neighborhood takedown as batch 1
    val victims = graft.queries.SimilarityQueries
      .cosineTopKServe(corpus, queries, 10)
      .select(col("neighbor_id").as("vec_id")).distinct()
      .localCheckpoint(true)
    corpus.select(col("vec_id")).join(victims, Seq("vec_id"), "left_anti")
      .orderBy(col("vec_id")).limit(2)
      .select(col("vec_id").as("id"))
      .coalesce(1).write.mode("append").parquet(landing)
    val q = Graft.streamTakedownAll(spark, landing, Seq(dedupDir),
      Seq(dir), Nil, tmp("all_ckpt"),
      recall = RecallPolicy(every = 1, targetRecall = 0.85,
        store = Some(() => store()), sample = Some(() => queries)))
    try {
      q.processAllAvailable()
      victims.select(col("vec_id").as("id")).coalesce(1)
        .write.mode("append").parquet(landing)
      q.processAllAvailable()
    } finally q.stop()
    val mf = AnnIndex.readManifest(spark, dir)
    assert(mf.params.get("version").exists(_ >= 1L) &&
      mf.params.contains("tuned_recall_m"),
      s"the orchestrated sink must retune its ANN leg: ${mf.params}")
    spark.catalog.clearCache()
  }
}
