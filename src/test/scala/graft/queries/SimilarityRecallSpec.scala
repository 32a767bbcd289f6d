package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Recall GATES for the approximate similarity operators against the
  * exact s1 baseline (r4 verdict gap #4: "ANN recall is reported, not
  * gated") — a future bucket/cell tuning change that silently trades
  * recall for speed fails this suite instead of shipping.
  *
  * Definitions (what a user of the shipped output experiences):
  *  - s2 (LSH buckets): a true (query, neighbor) pair counts as found if
  *    it appears in the ranked output in either orientation (s2 pairs
  *    are emitted once with vec_a < vec_b).
  *  - s3 (IVF): found iff (query, neighbor) is in the query's ranked
  *    top-k (s3 ranks per query, both orientations present).
  * Measured values at sf0.01 are recorded in BENCH_NOTES; floors sit
  * under them with margin for fixture drift, not for regressions.
  *
  * Why the absolute numbers are under 0.9: this corpus's true top-3
  * neighbors are WEAK (near-random 64-dim vectors, best cosines ~0.4),
  * and single-probe schemes — one bucket per vector (s2), one cell per
  * query — collide with a weak neighbor rarely (sign-LSH: p^bits with
  * p = 1−acos(0.4)/π ≈ 0.63, so ~0.1 at 5 masked bits; chance hits
  * raise it to the measured ~0.2). Multi-probe is the standard
  * recall/cost dial at scale: s3's FAISS-style nprobe=4 (round 5)
  * lifts IVF recall to the measured 0.44, and s2's Hamming-adjacent
  * bucket probing (round 6, nProbe=4 single-bit flips) lifts LSH
  * recall to the measured 0.75 — each at a bounded ×4 candidate cost.
  * The regime the engine actually uses ANN for — high-cosine
  * near-duplicates — is recalled at ~100% by the same machinery
  * (DedupScaleSpec's planted-pair suites, GraftFacadeSpec
  * auto-banding): recall is a function of the pair's cosine, and these
  * gates pin the low end of that curve, where regressions would
  * otherwise hide.
  */
class SimilarityRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("s2 and s3 top-k recall vs exact s1 stays above the gate floor") {
    val emb = Tables.embeddings(spark, sf)
    val truth = SimilarityQueries.cosineTopK(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size == 96, s"baseline should be 32 queries x top-3: ${truth.size}")

    val s2 = SimilarityQueries.annLsh(emb, dim0 = Tables.EmbeddingDim)
      .collect().flatMap(r =>
        Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0)))).toSet
    val s2recall = truth.count(s2.contains).toDouble / truth.size

    val s3 = SimilarityQueries.ivfTopKDf(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    val s3recall = truth.count(s3.contains).toDouble / truth.size

    info(f"s2_recall=$s2recall%.4f s3_recall=$s3recall%.4f (n=${truth.size})")
    // measured 2026-08 (this fixture, these parameters): s2 0.75 at
    // nProbe=4 Hamming-adjacent probing (0.1979 single-probe);
    // s3 0.4375 at nprobe=4 (0.1979 single-probe)
    assert(s2recall >= 0.55, f"s2 recall regressed: $s2recall%.3f (measured 0.75 @ nProbe=4)")
    assert(s3recall >= 0.35, f"s3 recall regressed: $s3recall%.3f (measured 0.438 @ nprobe=4)")
  }

  test("s5 PQ+rerank top-k recall vs exact stays above the gate floor") {
    // s5's query set is vec_id < 8 (vs s1's 32), so the baseline here is
    // the s1 ranking restricted to those queries
    val emb = Tables.embeddings(spark, sf)
    val truth = SimilarityQueries.cosineTopK(emb, nQueries = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size == 24, s"baseline should be 8 queries x top-3: ${truth.size}")
    val s5 = SimilarityQueries.pqAdc(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val s5recall = truth.count(s5.contains).toDouble / truth.size
    info(f"s5_recall=$s5recall%.4f (n=${truth.size})")
    // measured 2026-08 (m=8, k=64, R=20 rerank): 0.75 — same
    // weak-neighbor caveat as s2/s3 above; m is the resolution dial
    // (0.083 at m=4 without rerank)
    assert(s5recall >= 0.55, f"s5 recall regressed: $s5recall%.3f (measured 0.75)")
  }

  test("s10 IVF-PQ+rerank top-k recall vs exact stays above the gate floor") {
    // same query set as s5 (vec_id < 8); the rerank is exact, so recall
    // = P(true neighbor's home cell probed AND it survives the ADC
    // top-R) — nProbe is the dial (16 of the 64 sf0.01 cells here)
    val emb = Tables.embeddings(spark, sf)
    val truth = SimilarityQueries.cosineTopK(emb, nQueries = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size == 24, s"baseline should be 8 queries x top-3: ${truth.size}")
    val s10 = SimilarityQueries.ivfPq(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    spark.catalog.clearCache()
    val s10recall = truth.count(s10.contains).toDouble / truth.size
    info(f"s10_recall=$s10recall%.4f (n=${truth.size})")
    // the verdict's gate: IVF-PQ must not be WORSE than flat PQ (s5's
    // measured 0.75) — residuals buy resolution, probing costs coverage
    assert(s10recall >= 0.55, f"s10 recall regressed: $s10recall%.3f")
  }
}
