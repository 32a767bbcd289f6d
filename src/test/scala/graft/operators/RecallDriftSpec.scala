package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.{Tables, TestSpark}
import graft.queries.SimilarityQueries

/** Recall drift detection (r13 verdict #6): [[AnnIndex.recallCheck]]
  * re-measures the serving path's recall@k at the TUNED operating
  * point. Pinned: the measurement right after tuning reproduces the
  * recorded number (zero drift); a benign append (vectors that enter
  * no neighborhood) does not trip the bound; a planted distribution
  * shift (the tuned neighborhood taken down, truth re-scattering
  * across cells the probe budget was never measured against) DOES trip
  * it — the trigger for [[AnnIndex.rebuildAndTune]]; and a re-measure
  * on a different query sample is flagged as such. */
class RecallDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val NQ = 8
  private lazy val corpus =
    Tables.embeddings(spark, sf).filter(col("vec_id") >= NQ)
  private lazy val nCorpus = Tables.embeddingsRows(spark, sf) - NQ
  private lazy val queries = Tables.embeddings(spark, sf)
    .filter(col("vec_id") < NQ)
    .select((col("vec_id") + 1000000L).as("query_id"), col("embedding"))
  private val dim = Tables.EmbeddingDim

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"drift_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("planted shift trips the check; a benign append does not") {
    val dir = tmp("ivfpq")
    AnnIndex.buildIvfPq(corpus, dir, dim, m = 8, k = 64, nHint = nCorpus)
    val tuned = AnnIndex.tuneIndex(spark, dir, corpus, queries,
      targetRecall = 0.85)
    assert(tuned.targetMet)
    // right after tuning: the same measurement reproduces the recorded
    // recall — zero drift, recorded sample recognized
    val base = AnnIndex.recallCheck(spark, dir, corpus, queries)
    assert(base.driftM == 0L && !base.drifted && base.sampleMatches,
      s"the post-tune re-measure must reproduce the record: $base")

    // benign append: anti-aligned vectors (negated queries) enter no
    // neighborhood — truth and served top-k are unchanged
    val anti = queries.select(
      (col("query_id") + 4000000L).as("vec_id"),
      transform(col("embedding"),
        x => -x).as("embedding"),
      lit("planted").as("label"))
    AnnIndex.appendIvfPq(anti, dir)
    val emb1 = corpus.unionByName(anti.drop("label")
      .withColumnRenamed("vec_id", "vec_id")
      .select(col("vec_id"), col("embedding"),
        lit("planted").as("label")))
    val benign = AnnIndex.recallCheck(spark, dir, emb1, queries)
    assert(!benign.drifted,
      s"a no-op append must not trip the drift bound: $benign")

    // planted shift: take down every query's true neighborhood (its
    // exact top-10). The remaining truth is scattered across cells the
    // tuned nProbe was never measured against — recall at the tuned
    // operating point collapses, which is exactly what the check is for
    val victims = SimilarityQueries.cosineTopKServe(emb1, queries, 10)
      .select(col("neighbor_id").as("vec_id")).distinct()
      .localCheckpoint(true)
    assert(AnnIndex.delete(victims, dir) > 0L)
    val embLive = emb1.join(victims, Seq("vec_id"), "left_anti")
    val shifted = AnnIndex.recallCheck(spark, dir, embLive, queries)
    assert(shifted.drifted && shifted.sampleMatches,
      s"the planted shift must trip the bound (tuned ${shifted.tunedRecallM}" +
        s" -> ${shifted.recallM}): $shifted")

    // a different sample is flagged: drift on it may be sample shift
    val otherSample = Tables.embeddings(spark, sf)
      .filter(col("vec_id") >= NQ && col("vec_id") < 2L * NQ)
      .select((col("vec_id") + 2000000L).as("query_id"), col("embedding"))
    val other = AnnIndex.recallCheck(spark, dir, embLive, otherSample)
    assert(!other.sampleMatches,
      "a re-measure on a different sample must be flagged")
    spark.catalog.clearCache()
  }

  test("recallCheck refuses an untuned index") {
    val dir = tmp("untuned")
    AnnIndex.buildIvf(corpus, dir, dim, nCorpus)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.recallCheck(spark, dir, corpus, queries)
    }
    assert(e.getMessage.contains("tuneIndex"))
  }
}
