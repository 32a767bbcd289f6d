package graft.bench

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.operators.{AnnIndex, DedupIndex}
import graft.streaming.StreamDedupIngest

/** Octave evidence for the ORCHESTRATED cross-artifact paths (r14
  * verdict #6): takedownAll / takedownStatus / ingestAll / ingestStatus
  * measured against a full artifact surface (dedup + ivfpq + published
  * corpus) at a given fixture scale, next to the per-artifact walls
  * they compose — the claim under test is that orchestration stays
  * bookkeeping-cost (the orchestrated wall ≈ the sum of the
  * per-artifact walls; no new cost class appears at 100×).
  *
  *   runMain graft.bench.OrchestratedOctave [fixtureDir]
  *
  * fixtureDir: sf0.1 for the 1× row; a ScaleFixture output
  * (SPARK_GRAFT_FIXTURE_TABLES=documents,embeddings, factor 100) for
  * the 100× row. All walls min-of-3 on fresh id batches (mutations are
  * not idempotent, so repetitions use disjoint ids instead of replays).
  */
object OrchestratedOctave {
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
    val nDocs = docs.count()
    val nEmb = emb.count()
    parts += s""""documents":$nDocs,"embeddings":$nEmb"""

    val dedupDir = java.nio.file.Files
      .createTempDirectory("oo_dedup").toString
    val (_, dedupBuildSec) = timed(DedupIndex.build(docs, dedupDir, nDocs))
    spark.catalog.clearCache()
    parts += s""""dedup_build_sec":${f(dedupBuildSec)}"""
    val annDir = java.nio.file.Files
      .createTempDirectory("oo_ivfpq").toString
    val dim = graft.Tables.EmbeddingDim
    val (_, annBuildSec) = timed(
      AnnIndex.buildIvfPq(emb, annDir, dim, m = 8, k = 64, nHint = nEmb))
    spark.catalog.clearCache()
    parts += s""""ivfpq_build_sec":${f(annBuildSec)}"""
    val corpusDir = java.nio.file.Files
      .createTempDirectory("oo_corpus").toString
    docs.select(col("doc_id"), col("text")).write.mode("overwrite")
      .parquet(s"$corpusDir/batch-seed")

    def ids(lo: Long, n: Long, c: String) =
      spark.range(lo, lo + n).select(col("id").as(c))

    // per-artifact baselines: three disjoint 8-id deletes each
    def minOf3(tag: String)(run: Int => Double): Unit =
      parts += s""""$tag":${f((0 until 3).map(run).min)}"""
    minOf3("dedup_delete8_sec") { r =>
      val (_, s) = timed(DedupIndex.delete(
        ids(100L + 8L * r, 8L, "doc_id"), dedupDir))
      spark.catalog.clearCache(); s
    }
    minOf3("ivfpq_delete8_sec") { r =>
      val (_, s) = timed(AnnIndex.delete(
        ids(200L + 8L * r, 8L, "vec_id"), annDir))
      spark.catalog.clearCache(); s
    }
    minOf3("corpus_delete8_sec") { r =>
      val (_, s) = timed(StreamDedupIngest.corpusDelete(
        ids(300L + 8L * r, 8L, "doc_id"), corpusDir))
      spark.catalog.clearCache(); s
    }

    // the orchestrated calls: same 8-id request shape, all artifacts
    minOf3("takedown_all_8_sec") { r =>
      val (_, s) = timed(graft.Graft.takedownAll(spark,
        ids(400L + 8L * r, 8L, "id"), Seq(dedupDir), Seq(annDir),
        Seq(corpusDir)))
      spark.catalog.clearCache(); s
    }
    val queue = ids(400L, 24L, "id")
    minOf3("takedown_status_sec") { _ =>
      val (vis, s) = timed(graft.Graft.takedownStatus(spark, queue,
        Seq(dedupDir), Seq(annDir), Seq(corpusDir))
        .agg(sum(col("n_visible"))).head().getLong(0))
      require(vis == 0L, s"takedown must have converged, saw $vis visible")
      spark.catalog.clearCache(); s
    }

    // ingest side: one 8-doc crawl batch (docs ⋈ embeddings on the
    // shared id space, salted out of corpus), fresh ids + batch per rep
    val crawlBase = docs.filter(col("doc_id") < 8)
      .select(col("doc_id"), col("text"))
      .join(emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("doc_id"), col("embedding")),
        Seq("doc_id"))
    minOf3("ingest_all_8_sec") { r =>
      val crawl = crawlBase
        .withColumn("doc_id", col("doc_id") + lit(1500000000L + 1000L * r))
      val (_, s) = timed(graft.Graft.ingestAll(spark, crawl,
        batchId = 1000L + r, Seq(dedupDir), Seq(annDir), Seq(corpusDir)))
      spark.catalog.clearCache(); s
    }
    val ingested = (0 until 3).map(r =>
        spark.range(1500000000L + 1000L * r, 1500000008L + 1000L * r))
      .reduce(_ unionAll _).select(col("id"))
    minOf3("ingest_status_sec") { _ =>
      val (live, s) = timed(graft.Graft.ingestStatus(spark, ingested,
        Seq(dedupDir), Seq(annDir), Seq(corpusDir))
        .agg(min(col("n_live"))).head().getLong(0))
      require(live == 24L, s"ingest must have converged, min live $live")
      spark.catalog.clearCache(); s
    }
    spark.stop()
    println(s"""{"dir":"$dir",${parts.mkString(",")}}""")
  }
}
