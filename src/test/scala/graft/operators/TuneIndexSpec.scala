package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.{Tables, TestSpark}

/** Recall-targeted auto-tuning (r12 verdict #3): [[AnnIndex.tuneIndex]]
  * walks the family's knob ladder against the measured SERVING-path
  * recall, records the chosen operating point in the manifest, and the
  * serve paths default to it. Pinned: target met within the bounded
  * ladder on the gate corpus (unfiltered AND filtered), knobs recorded,
  * serving defaults re-pointed, and the explicit-knob override intact.
  */
class TuneIndexSpec extends AnyFunSuite {
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
    val d = Files.createTempDirectory(s"tune_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("ivf: tune meets the target, records knobs, serve defaults to them") {
    val dir = tmp("ivf")
    AnnIndex.buildIvf(corpus, dir, dim, nCorpus)
    val res = AnnIndex.tuneIndex(spark, dir, corpus, queries,
      targetRecall = 0.9)
    assert(res.targetMet, s"ladder must reach 0.9 on the gate corpus: $res")
    assert(res.recall >= 0.9 && res.nProbe > 0)
    val cells = AnnIndex.readManifest(spark, dir).params("cells")
    assert(res.nProbe <= cells, "probe budget must stay bounded")
    val mf = AnnIndex.readManifest(spark, dir)
    assert(mf.params("tuned_n_probe") == res.nProbe.toLong)
    assert(mf.params("tuned_target_recall_m") == 900L)
    assert(mf.params("tuned_recall_m") == math.round(res.recall * 1000))
    // serving now DEFAULTS to the tuned knob: the dispatch equals the
    // family serve called with the tuned value explicitly
    assert(rows(AnnIndex.serveTopK(spark, dir, queries, corpus)) ==
      rows(AnnIndex.ivfServe(AnnIndex.loadIvf(spark, dir), queries,
        topK = 3, nProbe = res.nProbe)))
    // an explicit caller knob still wins over the tuned one
    assert(rows(AnnIndex.serveTopK(spark, dir, queries, corpus, nProbe = 1))
      == rows(AnnIndex.ivfServe(AnnIndex.loadIvf(spark, dir), queries,
        topK = 3, nProbe = 1)))
    // the measurement at the recorded knobs reproduces ≥ target
    assert(AnnIndex.recallVsExactOn(spark, dir, corpus, queries)
      .select("recall").head().getDouble(0) >= 0.9)
    spark.catalog.clearCache()
  }

  test("ivfpq: filtered-path tuning measures through the keep-set") {
    val dir = tmp("ivfpq")
    AnnIndex.buildIvfPq(corpus, dir, dim, nHint = nCorpus)
    // a predicate-poor slice: every other vector survives
    val keep = corpus.filter(col("vec_id") % 2 === 0).select("vec_id")
    val res = AnnIndex.tuneIndex(spark, dir, corpus, queries,
      targetRecall = 0.9, keepIds = Some(keep))
    assert(res.targetMet && res.nProbe > 0 && res.r > 0, s"$res")
    val mf = AnnIndex.readManifest(spark, dir)
    assert(mf.params("tuned_n_probe") == res.nProbe.toLong &&
      mf.params("tuned_r") == res.r.toLong)
    // the filtered serve path reproduces the tuned recall from the
    // recorded defaults alone
    assert(AnnIndex.recallVsExactOnWhere(spark, dir, corpus, queries, keep)
      .select("recall").head().getDouble(0) >= 0.9)
    spark.catalog.clearCache()
  }

  test("pq and sq8: the rerank-budget ladder meets the target") {
    for ((family, build) <- Seq[(String, String => Unit)](
      "pq" -> (d => { AnnIndex.buildPq(corpus, d, dim, nHint = nCorpus); () }),
      "sq8" -> (d => { AnnIndex.buildSq(corpus, d, dim, nCorpus); () }))) {
      val dir = tmp(family)
      build(dir)
      val res = AnnIndex.tuneIndex(spark, dir, corpus, queries,
        targetRecall = 0.9)
      assert(res.targetMet && res.r > 0 && res.nProbe == -1,
        s"$family: $res")
      assert(res.r <= math.min(nCorpus, 4096L),
        s"$family: rerank budget must stay corpus-bounded")
      val mf = AnnIndex.readManifest(spark, dir)
      assert(mf.params("tuned_r") == res.r.toLong &&
        !mf.params.contains("tuned_n_probe"), s"$family: ${mf.params}")
      // serving reproduces >= target from the recorded default alone
      assert(AnnIndex.recallVsExactOn(spark, dir, corpus, queries)
        .select("recall").head().getDouble(0) >= 0.9, family)
    }
    spark.catalog.clearCache()
  }

  test("lsh: bounded ladder records its best rung even when capped") {
    val dir = tmp("lsh")
    AnnIndex.buildLsh(corpus, dir, dim, nCorpus)
    // an impossible target can't be met inside lsh's 4-probe mask
    // bound — the BEST rung must still be recorded, loudly not-met
    val res = AnnIndex.tuneIndex(spark, dir, corpus, queries,
      targetRecall = 1.01)
    assert(!res.targetMet && res.nProbe >= 1 && res.nProbe <= 4)
    val mf = AnnIndex.readManifest(spark, dir)
    assert(mf.params("tuned_n_probe") == res.nProbe.toLong)
    assert(mf.params("tuned_recall_m") == math.round(res.recall * 1000))
    // a capacity miss carries a concrete way forward (r13 verdict #8):
    // the mask bound is named, with the rebuild / family escape hatches
    assert(res.recommendation.contains("4 probes") &&
      res.recommendation.contains("rebuild") &&
      res.recommendation.contains("ivf"),
      s"the lsh capacity signal must recommend a path: ${res.recommendation}")
    // a met target carries no recommendation
    val dir2 = tmp("lsh_met")
    AnnIndex.buildLsh(corpus, dir2, dim, nCorpus)
    val met = AnnIndex.tuneIndex(spark, dir2, corpus, queries,
      targetRecall = 0.1)
    assert(met.targetMet && met.recommendation.isEmpty)
    spark.catalog.clearCache()
  }

  test("rebuildAndTune: knobs re-recorded against the NEW geometry (r13 #5)") {
    val dir = tmp("ivfpq_rt")
    AnnIndex.buildIvfPq(corpus, dir, dim, m = 8, k = 64, nHint = nCorpus)
    val first = AnnIndex.tuneIndex(spark, dir, corpus, queries,
      targetRecall = 0.9)
    assert(first.targetMet)
    // a bare rebuild drops the tuned knobs (measured against the OLD
    // geometry — the documented revert this composition exists to fix)
    AnnIndex.rebuild(corpus, dir, nCorpus)
    val afterRebuild = AnnIndex.readManifest(spark, dir)
    assert(!afterRebuild.params.contains("tuned_n_probe") &&
      !afterRebuild.params.contains("tuned_r"),
      "rebuild alone must drop stale knobs (the hazard)")
    // the composition re-fits, swaps AND re-tunes: knobs recorded
    // against the new version, serving defaults to them
    val res = AnnIndex.rebuildAndTune(spark, dir, corpus, queries,
      targetRecall = 0.9, nHint = nCorpus)
    assert(res.targetMet)
    val mf = AnnIndex.readManifest(spark, dir)
    assert(mf.params("version") == 2L,
      s"the re-fit must have swapped a new version in: ${mf.params}")
    assert(mf.params("tuned_n_probe") == res.nProbe.toLong &&
      mf.params("tuned_r") == res.r.toLong,
      s"knobs must be recorded against the new geometry: ${mf.params}")
    assert(rows(AnnIndex.serveTopK(spark, dir, queries, corpus)) ==
      rows(AnnIndex.ivfPqServe(AnnIndex.loadIvfPq(spark, dir), corpus,
        queries, r = res.r, topK = 3, nProbe = res.nProbe)))
    spark.catalog.clearCache()
  }
}
