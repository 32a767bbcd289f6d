package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.{Tables, TestSpark}
import graft.operators.{AnnIndex, ArtifactIO, DedupIndex}

/** Streaming takedown contract: a takedown-request stream applied to a
  * persisted artifact equals the batch delete of the union id set;
  * replays are durable no-ops via the independent `last_delete_batch`
  * high-water mark; and the family-dispatched [[AnnIndex.delete]]
  * covers lsh/ivf/pq (immediate exclusion; physical fold at rebuild)
  * while refusing sq8 with the store-side instruction.
  */
class StreamTakedownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"stakedown_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def idFiles(landing: String, col0: String,
      batches: Seq[Seq[Long]]): Unit = {
    val spark0 = spark
    import spark0.implicits._
    batches.foreach(b =>
      b.toDF(col0).coalesce(1).write.mode("append").parquet(landing))
  }

  test("dedup: streamed takedown == batch delete of the union; replay no-op") {
    val docs = Tables.documents(spark, sf)
    val dir = tmp("dedup")
    DedupIndex.build(docs, dir, -1L)
    val ctl = tmp("dedup_ctl")
    DedupIndex.build(docs, ctl, -1L)

    val landing = tmp("landing")
    idFiles(landing, "doc_id", Seq(Seq(0L, 2L), Seq(4L, 999999999L)))
    val q = StreamTakedown.dedupTakedownSink(
      spark.readStream
        .schema("doc_id LONG").option("maxFilesPerTrigger", 1)
        .parquet(landing),
      dir, tmp("ckpt"))
    try q.processAllAvailable() finally q.stop()

    val spark0 = spark
    import spark0.implicits._
    DedupIndex.delete(Seq(0L, 2L, 4L).toDF("doc_id"), ctl)
    val a = DedupIndex.load(spark, dir)
    val b = DedupIndex.load(spark, ctl)
    assert(a.manifest.n == b.manifest.n)
    assert(rows(a.signatures.select(col("doc_id"))) ==
      rows(b.signatures.select(col("doc_id"))))
    assert(rows(a.pairs) == rows(b.pairs))
    assert(rows(a.components) == rows(b.components))
    // the replay guard is durable: re-applying the last batch is a no-op
    val mfA = ArtifactIO.readManifest(spark, dir)
    assert(mfA.params("last_delete_batch") == 1L)
    assert(DedupIndex.delete(Seq(4L).toDF("doc_id"), dir, batchId = 1L) == 0L)
    assert(ArtifactIO.readManifest(spark, dir) == mfA)
    spark.catalog.clearCache()
  }

  test("dedup: a takedown batch racing an append fails the stream; restart converges") {
    val docs = Tables.documents(spark, sf)
    val dir = tmp("dedup_race")
    DedupIndex.build(docs, dir, -1L)
    val landing = tmp("landing_race")
    idFiles(landing, "doc_id", Seq(Seq(0L, 2L)))
    val ckpt = tmp("ckpt_race")
    def sink() = StreamTakedown.dedupTakedownSink(
      spark.readStream
        .schema("doc_id LONG").option("maxFilesPerTrigger", 1)
        .parquet(landing),
      dir, ckpt)
    // an ingest append lands inside the takedown batch's commit window
    // — the enforced single-mutator CAS must fail the micro-batch
    // LOUDLY (the old rename-only commit silently lost one side)
    val inc = docs.filter(col("doc_id") < 3)
      .withColumn("doc_id", col("doc_id") + 7000000L)
    ArtifactIO.raceHookForTests = Some(() => {
      DedupIndex.append(inc, dir); ()
    })
    val q1 = sink()
    val failed =
      try intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.processAllAvailable()
        q1.awaitTermination(10000)
        ()
      } finally {
        ArtifactIO.raceHookForTests = None
        if (q1.isActive) q1.stop()
      }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(failed).exists(
        _.isInstanceOf[graft.operators.ConcurrentMutationException]),
      s"the lost race must surface as ConcurrentMutationException: $failed")
    // the append (the race's winner) committed in full; the takedown
    // batch did NOT land and nothing is half-visible
    val mid = DedupIndex.load(spark, dir)
    assert(mid.signatures.filter(col("doc_id") === 0L).count() == 1L,
      "the refused takedown must not be partially applied")
    assert(mid.signatures.filter(col("doc_id") >= 7000000L).count() == 3L,
      "the racing append's commit must stand")
    // restart on the SAME checkpoint: the batch replays its whole
    // read-modify-write against the fresh state and converges
    val q2 = sink()
    try q2.processAllAvailable() finally q2.stop()
    val after = DedupIndex.load(spark, dir)
    assert(after.signatures.filter(col("doc_id").isInCollection(
      Seq(0L, 2L))).isEmpty, "the replayed takedown must apply")
    assert(after.signatures.filter(col("doc_id") >= 7000000L).count() == 3L)
    assert(ArtifactIO.readManifest(spark, dir)
      .params("last_delete_batch") == 0L)
    spark.catalog.clearCache()
  }

  test("policy-triggered folds keep takedown streams from accreting tombstones") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Tables.documents(spark, sf)
    // dedup sink under maxDeltas=2 (build slab + 1 pending tombstone
    // delta trips it): every applied batch folds, so the stream ends
    // with an EMPTY window instead of one delta per batch
    val dxDir = tmp("dedup_policy")
    DedupIndex.build(docs, dxDir, -1L)
    val landing = tmp("landing_policy")
    idFiles(landing, "doc_id", Seq(Seq(0L, 2L), Seq(4L)))
    val q = StreamTakedown.dedupTakedownSink(
      spark.readStream
        .schema("doc_id LONG").option("maxFilesPerTrigger", 1)
        .parquet(landing),
      dxDir, tmp("ckpt_policy"),
      policy = graft.operators.CompactionPolicy(maxDeltas = 2))
    try q.processAllAvailable() finally q.stop()
    val mf = ArtifactIO.readManifest(spark, dxDir)
    assert(mf.params("tomb_deltas") == 0L,
      "the policy must fold pending tombstones in-stream")
    val ctl = tmp("dedup_policy_ctl")
    DedupIndex.build(docs.filter(!col("doc_id").isInCollection(
      Seq(0L, 2L, 4L))), ctl, -1L)
    assert(rows(DedupIndex.load(spark, dxDir).components) ==
      rows(DedupIndex.load(spark, ctl).components))

    // ann flat family (ivf) under maxDeltas=1: each batch's tombstone
    // folds physically through the frozen-quantizer version swap
    val emb = Tables.embeddings(spark, sf)
    val ivfDir = tmp("ivf_policy")
    AnnIndex.buildIvf(emb, ivfDir, Tables.EmbeddingDim,
      Tables.embeddingsRows(spark, sf))
    val preAssign = spark.read.parquet(s"$ivfDir/ivf_assign.parquet")
      .persist()
    preAssign.count()
    val landing2 = tmp("landing_policy2")
    idFiles(landing2, "vec_id", Seq(Seq(0L, 3L), Seq(5L)))
    val q2 = StreamTakedown.annTakedownSink(
      spark.readStream
        .schema("vec_id LONG").option("maxFilesPerTrigger", 1)
        .parquet(landing2),
      ivfDir, tmp("ckpt_policy2"),
      policy = graft.operators.CompactionPolicy(maxDeltas = 1))
    try q2.processAllAvailable() finally q2.stop()
    val mf2 = AnnIndex.readManifest(spark, ivfDir)
    assert(mf2.params("tomb_deltas") == 0L && mf2.params("version") == 2L,
      s"each batch must fold physically: ${mf2.params}")
    assert(rows(AnnIndex.loadIvf(spark, ivfDir).assign) ==
      rows(preAssign.filter(!col("vec_id").isInCollection(
        Seq(0L, 3L, 5L)))),
      "post-fold table must equal the filtered pre-delete table")
    preAssign.unpersist()
    spark.catalog.clearCache()
  }

  test("ann families: lsh/ivf/pq delete excludes immediately; sq8 refuses") {
    val emb = Tables.embeddings(spark, sf)
    val nEmb = Tables.embeddingsRows(spark, sf)
    val dim = Tables.EmbeddingDim
    val spark0 = spark
    import spark0.implicits._
    val victims = Seq(0L, 3L)
    val victimDf = (victims :+ 888888888L).toDF("vec_id")

    for (family <- Seq("lsh", "ivf", "pq")) {
      val dir = tmp(family)
      family match {
        case "lsh" => AnnIndex.buildLsh(emb, dir, dim, nEmb)
        case "ivf" => AnnIndex.buildIvf(emb, dir, dim, nEmb)
        case "pq" => AnnIndex.buildPq(emb, dir, dim, nHint = nEmb)
      }
      assert(AnnIndex.delete(victimDf, dir) == victims.size, family)
      val mf = AnnIndex.readManifest(spark, dir)
      assert(mf.n == nEmb - victims.size, family)
      // the family's stored per-vector view excludes the ids NOW
      val stored = family match {
        case "lsh" => AnnIndex.loadLsh(spark, dir).signatures
        case "ivf" => AnnIndex.loadIvf(spark, dir).assign
        case "pq" => AnnIndex.loadPq(spark, dir).codes
      }
      assert(stored.filter(col("vec_id").isInCollection(victims)).isEmpty,
        s"$family: a deleted vector survived in the stored view")
      // serving never returns them
      val queries = emb.filter(col("vec_id") < 2)
        .select((col("vec_id") + 7000000L).as("query_id"), col("embedding"))
      val served = AnnIndex.serveTopK(spark, dir, queries, emb, topK = 5)
      assert(served.filter(col("neighbor_id").isInCollection(victims)).isEmpty,
        s"$family: a deleted vector was served")
      // repeat delete: no-op, no commit
      assert(AnnIndex.delete(victimDf, dir) == 0L, family)
      assert(AnnIndex.readManifest(spark, dir) == mf, family)
      // rebuild from the (taken-down) store folds physically and
      // starts a clean window
      val mfR = AnnIndex.rebuild(
        emb.filter(!col("vec_id").isInCollection(victims)), dir,
        nHint = nEmb - victims.size)
      assert(mfR.params.getOrElse("tomb_deltas", 0L) == 0L, family)
      assert(mfR.n == nEmb - victims.size, family)
    }

    val sqDir = tmp("sq8")
    AnnIndex.buildSq(emb, sqDir, dim, nEmb)
    val err = intercept[IllegalArgumentException](
      AnnIndex.delete(victimDf, sqDir))
    assert(err.getMessage.contains("embedding store"),
      s"sq8 refusal must point at the store: ${err.getMessage}")
    spark.catalog.clearCache()
  }

  test("ann: streamed takedown == batch delete; replay guard independent of append's") {
    val emb = Tables.embeddings(spark, sf)
    val nEmb = Tables.embeddingsRows(spark, sf)
    val dim = Tables.EmbeddingDim
    val dir = tmp("ivfpq")
    AnnIndex.buildIvfPq(emb, dir, dim, m = 8, k = 64, nHint = nEmb)
    AnnIndex.appendIvfPq(
      emb.filter(col("vec_id") < 2)
        .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"),
          col("label")),
      dir, batchId = 5L)

    val landing = tmp("pq_landing")
    idFiles(landing, "vec_id", Seq(Seq(0L), Seq(10000001L)))
    val q = StreamTakedown.annTakedownSink(
      spark.readStream
        .schema("vec_id LONG").option("maxFilesPerTrigger", 1)
        .parquet(landing),
      dir, tmp("pq_ckpt"))
    try q.processAllAvailable() finally q.stop()

    val mf = AnnIndex.readManifest(spark, dir)
    assert(mf.params("last_delete_batch") == 1L)
    assert(mf.params("last_batch") == 5L,
      "the takedown guard must not disturb append's high-water mark")
    assert(mf.n == nEmb)
    val codes = AnnIndex.loadIvfPq(spark, dir).codes
    assert(codes.filter(
      col("vec_id").isInCollection(Seq(0L, 10000001L))).isEmpty)
    spark.catalog.clearCache()
  }
}
