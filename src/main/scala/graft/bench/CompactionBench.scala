package graft.bench

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.operators.{AnnIndex, DedupIndex}

/** Evidence row for artifact delta compaction (r10 verdict #2): a
  * long-running ingest leaves one delta dir per micro-batch; this
  * measures what that actually costs a reader and an appender — load +
  * probe wall and append wall against a 30-delta artifact, then the
  * same calls after `compactDeltas` folded the windows to one slab per
  * table. Dedup artifact and the ivfpq code deltas.
  *   runMain graft.bench.CompactionBench [sfDir] [nAppends]
  */
object CompactionBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nAppends = args.lift(1).map(_.toInt).getOrElse(30)
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

    // ---- dedup artifact -------------------------------------------------
    val docs = graft.Tables.documents(spark, dir)
    val ixDir = java.nio.file.Files
      .createTempDirectory("compact_bench_dedup").toString
    DedupIndex.build(docs, ixDir, -1L)
    spark.catalog.clearCache()
    // nAppends micro-batches of 8 docs each (fresh id space per batch)
    (0 until nAppends).foreach { b =>
      val inc = docs.filter(col("doc_id") < 8)
        .withColumn("doc_id", col("doc_id") + lit(1000000000L + b * 1000L))
      DedupIndex.append(inc, ixDir)
      spark.catalog.clearCache()
    }
    val probe = docs.filter(col("doc_id") < 8)
      .withColumn("doc_id", col("doc_id") + 900000000L)
    def serveWall(): Double = {
      val (_, s) = timed {
        DedupIndex.serveNearDups(probe, DedupIndex.load(spark, ixDir), 8L)
          .count()
      }
      spark.catalog.clearCache(); s
    }
    def appendWall(tag: Long): Double = {
      val inc = docs.filter(col("doc_id") < 8)
        .withColumn("doc_id", col("doc_id") + lit(tag))
      val (_, s) = timed(DedupIndex.append(inc, ixDir))
      spark.catalog.clearCache(); s
    }
    parts += s""""dedup_deltas":${nAppends + 1}"""
    parts += s""""dedup_serve_pre_sec":${f(serveWall())}"""
    parts += s""""dedup_append_pre_sec":${f(appendWall(800000000L))}"""
    val (_, compactSec) = timed(DedupIndex.compactDeltas(spark, ixDir))
    parts += s""""dedup_compact_sec":${f(compactSec)}"""
    parts += s""""dedup_serve_post_sec":${f(serveWall())}"""
    parts += s""""dedup_append_post_sec":${f(appendWall(700000000L))}"""

    // ---- takedown (r11 verdict #1): delete O(touched), never a rebuild
    val victims = spark.range(8).select((col("id") + 16L).as("doc_id"))
    val (_, delSec) = timed(DedupIndex.delete(victims, ixDir))
    spark.catalog.clearCache()
    parts += s""""dedup_delete8_sec":${f(delSec)}"""
    // the tombstone-forced fold that makes the takedown physical
    val (_, delCompactSec) = timed(DedupIndex.compactDeltas(spark, ixDir))
    spark.catalog.clearCache()
    parts += s""""dedup_delete_compact_sec":${f(delCompactSec)}"""
    // contrast: what the only pre-takedown route (rebuild without the
    // docs) costs on the same corpus
    val rbDir = java.nio.file.Files
      .createTempDirectory("compact_bench_rebuild").toString
    val (_, rebuildSec) = timed(DedupIndex.build(
      docs.filter(col("doc_id") >= 24 || col("doc_id") < 16), rbDir, -1L))
    spark.catalog.clearCache()
    parts += s""""dedup_rebuild_without_sec":${f(rebuildSec)}"""
    // BULK takedown (r13 "what's wrong" #1): a removal batch of 4M ids
    // (a domain/license-class sweep — mostly misses, 10% of the corpus
    // hits) must ride the sizedHint ladder, never a driver broadcast
    val bulkVictims = docs.select(col("doc_id")).filter(col("doc_id") % 10 === 1)
      .unionByName(spark.range(2000000000L, 2004000000L)
        .select(col("id").as("doc_id")))
    val (nBulk, bulkDelSec) = timed(DedupIndex.delete(bulkVictims, ixDir))
    spark.catalog.clearCache()
    parts += s""""dedup_bulk_delete_ids":${nBulk}"""
    parts += s""""dedup_bulk_delete_sec":${f(bulkDelSec)}"""
    val (_, bulkFoldSec) = timed(DedupIndex.compactDeltas(spark, ixDir))
    spark.catalog.clearCache()
    parts += s""""dedup_bulk_delete_compact_sec":${f(bulkFoldSec)}"""

    // ---- ivfpq code deltas ----------------------------------------------
    val emb = graft.Tables.embeddings(spark, dir)
    val nEmb = graft.Tables.embeddingsRows(spark, dir)
    val dim = graft.Tables.EmbeddingDim
    val pqDir = java.nio.file.Files
      .createTempDirectory("compact_bench_ivfpq").toString
    AnnIndex.buildIvfPq(emb, pqDir, dim, m = 8, k = 64, nHint = nEmb)
    spark.catalog.clearCache()
    (0 until nAppends).foreach { b =>
      val inc = emb.filter(col("vec_id") < 8)
        .select((col("vec_id") + lit(1000000000L + b * 1000L)).as("vec_id"),
          col("embedding"), col("label"))
      AnnIndex.appendIvfPq(inc, pqDir)
      spark.catalog.clearCache()
    }
    def pqWall(): Double = {
      val (_, s) = timed {
        AnnIndex.ivfPqTopK(AnnIndex.loadIvfPq(spark, pqDir), emb,
          nQueries = 8).count()
      }
      spark.catalog.clearCache(); s
    }
    parts += s""""ivfpq_deltas":${nAppends + 1}"""
    parts += s""""ivfpq_query_pre_sec":${f(pqWall())}"""
    val (_, pqCompactSec) = timed(AnnIndex.compactIvfPqDeltas(spark, pqDir))
    parts += s""""ivfpq_compact_sec":${f(pqCompactSec)}"""
    parts += s""""ivfpq_query_post_sec":${f(pqWall())}"""
    val pqVictims = spark.range(8).select((col("id") + 16L).as("vec_id"))
    val (_, pqDelSec) = timed(AnnIndex.deleteIvfPq(pqVictims, pqDir))
    spark.catalog.clearCache()
    parts += s""""ivfpq_delete8_sec":${f(pqDelSec)}"""
    parts += s""""ivfpq_query_post_delete_sec":${f(pqWall())}"""
    // bulk takedown on the ann artifact — the dedup bulk row's twin
    val pqBulk = emb.select(col("vec_id")).filter(col("vec_id") % 10 === 1)
      .unionByName(spark.range(2000000000L, 2004000000L)
        .select(col("id").as("vec_id")))
    val (nPqBulk, pqBulkSec) = timed(AnnIndex.delete(pqBulk, pqDir))
    spark.catalog.clearCache()
    parts += s""""ivfpq_bulk_delete_ids":${nPqBulk}"""
    parts += s""""ivfpq_bulk_delete_sec":${f(pqBulkSec)}"""

    // ---- cross-artifact takedown (r13 verdict #1): one 8-id batch
    // applied to dedup + ivfpq + the published corpus in one call, plus
    // the convergence report — the deployed GDPR/DMCA request shape
    val corpusDir = java.nio.file.Files
      .createTempDirectory("compact_bench_corpus").toString
    docs.write.mode("overwrite").parquet(s"$corpusDir/batch-seed")
    val queue = spark.range(8).select((col("id") + 48L).as("id"))
    val (_, allSec) = timed(graft.Graft.takedownAll(spark, queue,
      Seq(ixDir), Seq(pqDir), Seq(corpusDir)))
    spark.catalog.clearCache()
    parts += s""""takedown_all_8_sec":${f(allSec)}"""
    val (status, statusSec) = timed(graft.Graft.takedownStatus(spark,
      queue, Seq(ixDir), Seq(pqDir), Seq(corpusDir))
      .agg(sum(col("n_visible"))).head().getLong(0))
    parts += s""""takedown_status_sec":${f(statusSec)}"""
    parts += s""""takedown_status_visible":$status"""
    spark.stop()
    println(s"""{"dir":"$dir",${parts.mkString(",")}}""")
  }
}
