package graft.bench

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.operators.{AnnIndex, DedupIndex}

/** Quantify the poison-pill cliff (r15 verdict #6): a crawl batch
  * re-ingesting a taken-down id is refused while the artifact's
  * tombstone window is live; the ingest sink's documented unblock
  * folds the window (a FULL delta compaction — the tables the
  * tombstoned rows live in are rewritten) and retries once, stalling
  * that micro-batch for the fold's wall. This bench puts numbers on
  * the cliff at a given corpus scale:
  *
  *   - `ingest8_floor_sec`: a clean 8-doc orchestrated ingest (the
  *     commit-machinery floor every batch pays);
  *   - `stalled_batch_sec`: the same batch when one id re-enters a
  *     live tombstone window — floor + both artifact folds;
  *   - `fold_dedup_sec` / `fold_ivfpq_sec`: the folds alone, measured
  *     directly on a fresh window (what the stall is made of);
  *   - `stalled_batch_bigwindow_sec`: the stall with a 1000-id window
  *     instead of 8 — pins that the cliff is TABLE-SIZE-bound, not
  *     window-size-bound (the fold rewrites slabs either way).
  *
  * Policy sizing rule the numbers feed: the stall ≈ the artifact's
  * full fold wall at its current size, so schedule compaction such
  * that takedown windows fold BEFORE a re-crawl of those ids can
  * arrive; the window's id COUNT does not buy anything.
  *
  *   runMain graft.bench.PoisonPillBench [fixtureDir]
  */
object PoisonPillBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
      .createTempDirectory("pp_dedup").toString
    val (_, buildSec) = timed(DedupIndex.build(docs, dedupDir, nDocs))
    spark.catalog.clearCache()
    parts += s""""dedup_build_sec":${f(buildSec)}"""
    val annDir = java.nio.file.Files
      .createTempDirectory("pp_ivfpq").toString
    AnnIndex.buildIvfPq(emb, annDir, graft.Tables.EmbeddingDim,
      m = 8, k = 64, nHint = nEmb)
    spark.catalog.clearCache()
    val corpusDir = java.nio.file.Files
      .createTempDirectory("pp_corpus").toString
    docs.select(col("doc_id"), col("text")).write.mode("overwrite")
      .parquet(s"$corpusDir/batch-seed")

    def ids(lo: Long, n: Long, c: String) =
      spark.range(lo, lo + n).select(col("id").as(c))
    // an ingest batch in the sink's crawl shape (doc_id, text,
    // embedding) carrying exactly the requested doc ids
    def mkBatch(docIds: Seq[Long]): org.apache.spark.sql.DataFrame = {
      val base = docs.select(col("doc_id"), col("text"))
        .join(emb.select(col("vec_id").as("doc_id"), col("embedding")),
          Seq("doc_id"))
        .limit(docIds.size)
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))))
      base.withColumn("doc_id",
          element_at(lit(docIds.toArray), col("rn").cast("int")))
        .drop("rn")
    }

    // clean floor: 8 fresh docs, min-of-2 on disjoint ids
    var batchId = 5000L
    val floor = (0 until 2).map { r =>
      batchId += 1
      val (_, s) = timed(graft.Graft.ingestAll(spark,
        mkBatch((0L until 8L).map(_ + 3000000000L + 100L * r)),
        batchId, Seq(dedupDir), Seq(annDir), Seq(corpusDir)))
      spark.catalog.clearCache(); s
    }.min
    parts += s""""ingest8_floor_sec":${f(floor)}"""

    // poison pill: take down 8 ingested ids, re-ingest one of them
    graft.Graft.takedownAll(spark, ids(3000000000L, 8L, "id"),
      Seq(dedupDir), Seq(annDir), Seq(corpusDir))
    batchId += 1
    val (_, stalled) = timed(graft.Graft.ingestAll(spark,
      mkBatch(Seq(3000000000L) ++
        (1L until 8L).map(_ + 3100000000L)),
      batchId, Seq(dedupDir), Seq(annDir), Seq(corpusDir)))
    spark.catalog.clearCache()
    parts += s""""stalled_batch_sec":${f(stalled)}"""

    // the folds alone on a fresh window (what the stall is made of)
    graft.Graft.takedownAll(spark, ids(3100000001L, 7L, "id"),
      Seq(dedupDir), Seq(annDir), Seq(corpusDir))
    val (_, foldDedup) = timed(DedupIndex.compactDeltas(spark, dedupDir))
    spark.catalog.clearCache()
    parts += s""""fold_dedup_sec":${f(foldDedup)}"""
    val (_, foldAnn) = timed(AnnIndex.compactIvfPqDeltas(spark, annDir))
    spark.catalog.clearCache()
    parts += s""""fold_ivfpq_sec":${f(foldAnn)}"""

    // big window: 1000 tombstoned ids - the stall must not scale with
    // the window's id count (the fold rewrites slabs either way)
    batchId += 1
    graft.Graft.ingestAll(spark,
      mkBatch((0L until 8L).map(_ + 3200000000L)), batchId,
      Seq(dedupDir), Seq(annDir), Seq(corpusDir))
    val big = docs.limit(1000).select(col("doc_id"))
      .withColumnRenamed("doc_id", "id")
    graft.Graft.takedownAll(spark, big, Seq(dedupDir), Seq(annDir),
      Seq(corpusDir))
    batchId += 1
    val bigFirst = docs.limit(1).select(col("doc_id")).head().getLong(0)
    val (_, stalledBig) = timed(graft.Graft.ingestAll(spark,
      mkBatch(Seq(bigFirst) ++ (1L until 8L).map(_ + 3300000000L)),
      batchId, Seq(dedupDir), Seq(annDir), Seq(corpusDir)))
    spark.catalog.clearCache()
    parts += s""""stalled_batch_bigwindow_sec":${f(stalledBig)}"""

    spark.stop()
    println(s"""{"dir":"$dir",${parts.mkString(",")}}""")
  }
}
