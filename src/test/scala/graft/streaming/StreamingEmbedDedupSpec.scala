package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.queries.DedupQueries

/** Streaming embedding near-dup ≡ batch d5 (the StreamingNearDupSpec
  * pattern on the vector side): once every vector has flowed through,
  * the distinct (earlier, later, cosine) match set — cosines compared
  * as exact doubles, since the in-state verify runs the identical int64
  * dot + IEEE sqrt/divide as the batch column form — must equal the
  * batch banded pipeline's verified pairs at the same threshold,
  * regardless of micro-batch splits. Planted clones (ids above the
  * corpus, cosine 1.0) guarantee the gate tests a non-empty set even
  * where the raw corpus has no threshold-grade pairs.
  */
class StreamingEmbedDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val (bands, rowBits, threshold) = (32, 4, 0.45)

  test("streaming match set equals batch d5 pairs across micro-batches") {
    val dir = Files.createTempDirectory("graft_embdedup_stream").toString
    val emb = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label")
    val n = Tables.embeddingsRows(spark, sf)
    // clones of the first 5 vectors under ids above the corpus — the
    // re-crawled-image shape; ids stay nondecreasing across the three
    // files so streaming orientation dup_of < vec_id matches the batch
    // vec_a < vec_b
    val clones = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"),
        col("label"))
    emb.filter(col("vec_id") < n / 2).coalesce(1)
      .write.mode("append").parquet(dir)
    emb.filter(col("vec_id") >= n / 2).coalesce(1)
      .write.mode("append").parquet(dir)
    clones.coalesce(1).write.mode("append").parquet(dir)

    val q = StreamEmbedDedup.nearDupMatches(
        StreamEmbedDedup.readEmbeddings(spark, dir),
        bands, rowBits, threshold, dim = Tables.EmbeddingDim)
      .writeStream.outputMode("append").format("memory")
      .queryName("embdedup_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ckpt_embdedup").toString)
      .start()
    val batches = try {
      q.processAllAvailable()
      q.recentProgress.count(_.numInputRows > 0)
    } finally q.stop()
    assert(batches >= 3, s"expected >= 3 micro-batches, got $batches")

    val streamed = spark.table("embdedup_stream")
      .select("dup_of", "vec_id", "cosine").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val all = emb.unionAll(clones)
    val batch = DedupQueries.embNearDupBanded(all, bands, rowBits,
        threshold, dim = Tables.EmbeddingDim, nHint = n + 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    spark.catalog.clearCache()
    assert(batch.size >= 5, s"planted clones missing from batch: ${batch.size}")
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(5)}; " +
        s"batch-only: ${(batch -- streamed).take(5)}")
  }

  test("lean (ids-only state) mode emits the identical match set via the store join") {
    val dir = Files.createTempDirectory("graft_embdedup_lean").toString
    val emb = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label")
    val n = Tables.embeddingsRows(spark, sf)
    val clones = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"),
        col("label"))
    emb.filter(col("vec_id") < n / 2).coalesce(1)
      .write.mode("append").parquet(dir)
    emb.filter(col("vec_id") >= n / 2).coalesce(1)
      .write.mode("append").parquet(dir)
    clones.coalesce(1).write.mode("append").parquet(dir)
    // the store covers every filed vector (the deployment contract:
    // the store is the corpus table this very ingest maintains)
    val store = emb.unionAll(clones)

    def run(name: String, df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] = {
      val q = df.writeStream.outputMode("append").format("memory")
        .queryName(name)
        .option("checkpointLocation",
          Files.createTempDirectory(s"graft_ckpt_$name").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
      spark.table(name).select("dup_of", "vec_id", "cosine")
        .distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    val lean = run("embdedup_lean", StreamEmbedDedup.nearDupMatchesLean(
      StreamEmbedDedup.readEmbeddings(spark, dir), store,
      bands, rowBits, threshold, dim = Tables.EmbeddingDim))
    // full store coverage: every emitted row is a verified match
    assert(spark.table("embdedup_lean").filter(!col("verified")).isEmpty,
      "a fully-covering store must leave nothing unverified")
    val full = run("embdedup_full", StreamEmbedDedup.nearDupMatches(
      StreamEmbedDedup.readEmbeddings(spark, dir),
      bands, rowBits, threshold, dim = Tables.EmbeddingDim))
    assert(full.size >= 5, s"planted clones missing: ${full.size}")
    assert(lean == full,
      s"lean-only: ${(lean -- full).take(5)}; full-only: ${(full -- lean).take(5)}")
  }

  test("lean mode store lag: candidates against not-yet-visible vectors defer, not drop") {
    val dir = Files.createTempDirectory("graft_embdedup_lag").toString
    val emb = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label")
    val clones = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"),
        col("label"))
    emb.coalesce(1).write.mode("append").parquet(dir)
    clones.coalesce(1).write.mode("append").parquet(dir)
    // the LAGGING store: originals 0 and 1 not yet visible — their
    // clone candidates cannot verify this pass
    val store = emb.filter(col("vec_id") >= 2).unionAll(clones)
    val q = StreamEmbedDedup.nearDupMatchesLean(
        StreamEmbedDedup.readEmbeddings(spark, dir), store,
        bands, rowBits, threshold, dim = Tables.EmbeddingDim)
      .writeStream.outputMode("append").format("memory")
      .queryName("embdedup_lag")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ckpt_embdedup_lag").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("embdedup_lag")
    val deferred = out.filter(!col("verified"))
      .select("vec_id", "dup_of").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the clone pairs whose earlier side is store-invisible surface as
    // unverified rows (cosine null) instead of silently vanishing
    assert(Set((1000000L, 0L), (1000001L, 1L)).subsetOf(deferred),
      s"missing deferred candidates: $deferred")
    assert(out.filter(!col("verified")).filter(col("cosine").isNotNull).isEmpty,
      "unverified rows must carry no cosine")
    // covered clones still verify normally in the same pass
    val verified = out.filter(col("verified"))
      .select("vec_id", "dup_of").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((2L until 5L).forall(i => verified.contains((1000000L + i, i))),
      s"covered clones must verify: $verified")
    spark.catalog.clearCache()
  }

  test("streamed serving equals one batch serve (micro-batch splits invisible)") {
    import graft.operators.AnnIndex
    val emb = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label")
    val n = Tables.embeddingsRows(spark, sf)
    val ixDir = Files.createTempDirectory("graft_ix_serve_stream").toString
    AnnIndex.buildIvfPq(emb, ixDir, Tables.EmbeddingDim, m = 8, k = 64,
      nHint = n)
    // 8 out-of-corpus queries land as two files -> two micro-batches
    val queries = emb.filter(col("vec_id") < 8)
      .select((col("vec_id") + 3000000L).as("query_id"), col("embedding"))
    val landing = Files.createTempDirectory("graft_serve_landing").toString
    queries.filter(col("query_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(landing)
    queries.filter(col("query_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(landing)
    val outDir = Files.createTempDirectory("graft_serve_out").toString
    val q = StreamEmbedDedup.serveSink(
      StreamEmbedDedup.readQueries(spark, landing), ixDir, emb, outDir,
      Files.createTempDirectory("graft_ckpt_serve").toString)
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.read.parquet(s"$outDir/batch-*")
      .collect().map(_.toString).sorted.toSeq
    val oneBatch = AnnIndex.ivfPqServe(AnnIndex.loadIvfPq(spark, ixDir),
        emb, queries)
      .collect().map(_.toString).sorted.toSeq
    spark.catalog.clearCache()
    assert(streamed.nonEmpty && streamed == oneBatch,
      "per-query top-k must be independent of micro-batch splits")
  }

  test("index-append sink with in-stream compaction: codes identical, one slab") {
    import graft.operators.AnnIndex
    val emb = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label")
    val n = Tables.embeddingsRows(spark, sf)
    val inc = emb.filter(col("vec_id") < 6)
      .select((col("vec_id") + 4000000L).as("vec_id"), col("embedding"),
        col("label"))
    val landing = Files.createTempDirectory("graft_ixac_landing").toString
    inc.filter(col("vec_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(landing)
    inc.filter(col("vec_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(landing)
    val streamedIx = Files.createTempDirectory("graft_ixac_streamed").toString
    AnnIndex.buildIvfPq(emb, streamedIx, Tables.EmbeddingDim,
      m = 8, k = 64, nHint = n)
    val q = StreamEmbedDedup.indexAppendSink(
      StreamEmbedDedup.readEmbeddings(spark, landing), streamedIx,
      Files.createTempDirectory("graft_ckpt_ixac").toString,
      compactEvery = 1)
    try q.processAllAvailable() finally q.stop()
    val ctl = Files.createTempDirectory("graft_ixac_ctl").toString
    AnnIndex.buildIvfPq(emb, ctl, Tables.EmbeddingDim, m = 8, k = 64,
      nHint = n)
    AnnIndex.appendIvfPq(inc, ctl)
    def codes(dir: String) = AnnIndex.loadIvfPq(spark, dir).codes
      .collect().map(_.toString).sorted.toSeq
    assert(codes(streamedIx) == codes(ctl),
      "in-stream compaction must not change the codes bag")
    assert(AnnIndex.readManifest(spark, streamedIx).params("deltas") == 1L,
      "the last in-stream compaction must leave one slab")
    spark.catalog.clearCache()
  }

  test("streamed index appends equal a one-shot append (live index stays queryable)") {
    import graft.operators.AnnIndex
    val emb = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label")
    val n = Tables.embeddingsRows(spark, sf)
    val inc = emb.filter(col("vec_id") < 6)
      .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"),
        col("label"))
    // two landing files -> two micro-batches, each appended by the sink
    val landing = Files.createTempDirectory("graft_ixappend_landing").toString
    inc.filter(col("vec_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(landing)
    inc.filter(col("vec_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(landing)

    val streamedIx = Files.createTempDirectory("graft_ix_streamed").toString
    AnnIndex.buildIvfPq(emb, streamedIx, Tables.EmbeddingDim,
      m = 8, k = 64, nHint = n)
    val q = StreamEmbedDedup.indexAppendSink(
      StreamEmbedDedup.readEmbeddings(spark, landing), streamedIx,
      Files.createTempDirectory("graft_ckpt_ixappend").toString)
    try q.processAllAvailable() finally q.stop()

    val oneShotIx = Files.createTempDirectory("graft_ix_oneshot").toString
    AnnIndex.buildIvfPq(emb, oneShotIx, Tables.EmbeddingDim,
      m = 8, k = 64, nHint = n)
    AnnIndex.appendIvfPq(inc, oneShotIx)

    def codes(dir: String) = AnnIndex.loadIvfPq(spark, dir).codes
      .collect().map(_.toString).sorted.toSeq
    assert(codes(streamedIx) == codes(oneShotIx),
      "streamed appends diverged from the one-shot append")
    assert(AnnIndex.readManifest(spark, streamedIx).n == n + 6)
    // the live index serves queries that find the streamed-in clones
    val top = AnnIndex.ivfPqTopK(AnnIndex.loadIvfPq(spark, streamedIx),
        emb.unionAll(inc), nQueries = 6)
      .filter(col("rk") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0L until 6L).foreach(qid =>
      assert(top(qid) == qid + 2000000L, s"query $qid: ${top(qid)}"))
    spark.catalog.clearCache()
  }

  test("poison-pill unblock: re-ingest of a taken-down vec folds and retries") {
    // the ivfpq twin of StreamDedupIngestSpec's poison-pill case (r13
    // ADVICE): a fresh batch carrying a taken-down id must fold the
    // tombstone window and retry instead of wedging the stream
    import graft.operators.AnnIndex
    val emb = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label")
    val n = Tables.embeddingsRows(spark, sf)
    val ixDir = Files.createTempDirectory("graft_pp_ivfpq").toString
    AnnIndex.buildIvfPq(emb, ixDir, Tables.EmbeddingDim, m = 8, k = 64,
      nHint = n)
    val spark0 = spark
    import spark0.implicits._
    assert(AnnIndex.delete(Seq(5L).toDF("vec_id"), ixDir) == 1L)
    val landing = Files.createTempDirectory("graft_pp_landing2").toString
    emb.filter(col("vec_id") === 5L)
      .unionByName(emb.filter(col("vec_id") === 2L)
        .select((col("vec_id") + 4000000L).as("vec_id"), col("embedding"),
          col("label")))
      .coalesce(1).write.mode("append").parquet(landing)
    val q = StreamEmbedDedup.indexAppendSink(
      StreamEmbedDedup.readEmbeddings(spark, landing), ixDir,
      Files.createTempDirectory("graft_pp_ckpt2").toString)
    try q.processAllAvailable() finally q.stop()
    val mf = AnnIndex.readManifest(spark, ixDir)
    assert(mf.params("tomb_deltas") == 0L,
      "the unblock must have folded the tombstone window")
    val ids = AnnIndex.loadIvfPq(spark, ixDir).codes
      .select("vec_id").distinct()
    assert(ids.filter(col("vec_id") === 5L).count() == 1L,
      "the re-ingested vector must be live again")
    assert(mf.n == n + 1L) // n - 1 deleted + 2 ingested
    spark.catalog.clearCache()
  }
}
