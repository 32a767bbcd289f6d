package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.{Graft, Tables, TestSpark}
import graft.operators.AnnIndex

/** Retrieval-quality evaluation (s17, r15 verdict #5): nDCG@k / MRR of
  * a ranked run against a relevance set — integer-scaled so both
  * engines hash-match. Pinned here: the metric arithmetic on a
  * hand-computed fixture, the perfect-run and empty-relevance edges,
  * the s17 corpus query's shape/invariants, and the artifact variant
  * ([[Graft.retrievalEvalFromIndex]]) scoring a LOADED index's serving
  * path with exhaustive knobs ≡ scoring the exact run. */
class RetrievalEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"receval_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def df(rows: Seq[(Long, Long, Long)], c: Seq[String]): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF(c: _*)
  }

  test("hand-computed fixture: DCG weights, ideal truncation, integer " +
    "division — every column exact") {
    // run for query 1: ranks 1..3 = docs 10 (rel), 11 (not), 12 (rel);
    // relevance {10, 12, 13, 14} → n_rel = 4, truncated ideal = C(3)
    val run = df(Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L)),
      Seq("query_id", "neighbor_id", "rk"))
    val rel = df(Seq((1L, 10L, 0L), (1L, 12L, 0L), (1L, 13L, 0L),
      (1L, 14L, 0L)), Seq("query_id", "neighbor_id", "ignored"))
      .select("query_id", "neighbor_id")
    val r = Graft.retrievalEval(run, rel, k = 3).collect()
    assert(r.length == 1)
    val row = r.head
    // W = [1000000, 630930, 500000]; dcg = W1 + W3 = 1500000;
    // idcg = C3 = 2130930; ndcg_e6 = 1500000 * 1e6 div 2130930 =
    // 703918; first relevant at rank 1 → rr_e6 = 1000000
    assert(row.getAs[Long]("n_rel") == 4L)
    assert(row.getAs[Long]("dcg_e6") == 1500000L)
    assert(row.getAs[Long]("idcg_e6") == 2130930L)
    assert(row.getAs[Long]("ndcg_e6") == 703918L)
    assert(row.getAs[Long]("rr_e6") == 1000000L)
  }

  test("edges: a perfect run scores ndcg 1e6; no relevant anywhere " +
    "scores all-zero; fewer relevant than k truncates the ideal") {
    // perfect: all 2 relevant docs at the top, n_rel = 2 < k = 3 →
    // idcg = C2, dcg = C2, ndcg = exactly 1e6; rr = 1e6
    val run = df(Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 10L, 1L), (2L, 11L, 2L), (2L, 12L, 3L)),
      Seq("query_id", "neighbor_id", "rk"))
    val rel = df(Seq((1L, 10L, 0L), (1L, 11L, 0L)),
      Seq("query_id", "neighbor_id", "ignored"))
      .select("query_id", "neighbor_id")
    val byQ = Graft.retrievalEval(run, rel, k = 3).collect()
      .map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(byQ(1L).getAs[Long]("dcg_e6") == 1630930L)
    assert(byQ(1L).getAs[Long]("idcg_e6") == 1630930L,
      "ideal must truncate at n_rel when n_rel < k")
    assert(byQ(1L).getAs[Long]("ndcg_e6") == 1000000L)
    assert(byQ(1L).getAs[Long]("rr_e6") == 1000000L)
    // query 2 has no relevant docs at all: everything zero, no NULLs
    assert(byQ(2L).getAs[Long]("n_rel") == 0L)
    assert(byQ(2L).getAs[Long]("dcg_e6") == 0L)
    assert(byQ(2L).getAs[Long]("idcg_e6") == 0L)
    assert(byQ(2L).getAs[Long]("ndcg_e6") == 0L)
    assert(byQ(2L).getAs[Long]("rr_e6") == 0L)
  }

  test("s17 corpus query: one row per eval query, metrics bounded, " +
    "MRR consistent with first-hit rank") {
    val emb = Tables.embeddings(spark, sf)
    val out = SimilarityQueries.retrievalEval(emb).collect()
    assert(out.length == 32, "one row per eval query")
    out.foreach { r =>
      val (ndcg, rr) = (r.getAs[Long]("ndcg_e6"), r.getAs[Long]("rr_e6"))
      assert(ndcg >= 0L && ndcg <= 1000000L, s"ndcg in [0, 1e6]: $r")
      assert(rr == 0L || rr == 1000000L / math.max(1L, 1000000L / rr),
        s"rr must be 1e6 div an integer rank: $r")
      assert(r.getAs[Long]("dcg_e6") <= r.getAs[Long]("idcg_e6"),
        s"dcg cannot exceed ideal: $r")
    }
    // labels cover ~10% of the corpus each, so SOME query must land a
    // relevant hit in its top-10 (all-zero output would mean a broken
    // join, not an unlucky corpus)
    assert(out.exists(_.getAs[Long]("rr_e6") > 0L))
  }

  test("artifact variant: a loaded IVF index served with exhaustive " +
    "probes evals IDENTICALLY to the exact bipartite run; the facade " +
    "scores the tuned serving path") {
    val emb = Tables.embeddings(spark, sf)
    val nq = 8
    val corpus = emb.filter(col("vec_id") >= nq)
    val queries = emb.filter(col("vec_id") < nq)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val rel = SimilarityQueries
      .labelRelevance(emb, nQueries = nq)
      .filter(col("neighbor_id") >= nq)
    val dir = tmp("ivf")
    AnnIndex.buildIvf(corpus, dir, Tables.EmbeddingDim,
      Tables.embeddingsRows(spark, sf) - nq)
    // exhaustive identity: probing ALL cells makes the served ranking
    // the exact bipartite ranking, so the evals must match row for row
    val servedEval = Graft.retrievalEval(
      AnnIndex.serveTopK(spark, dir, queries, corpus, topK = 10,
        nProbe = 100000), rel, k = 10)
      .collect().map(_.toString).sorted.toSeq
    val exactEval = Graft.retrievalEval(
      SimilarityQueries.cosineTopKServe(corpus, queries, 10), rel, k = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(servedEval.nonEmpty && servedEval == exactEval)
    // the deployment facade (tuned/default knobs): one scored row per
    // query, metrics in range
    val deployed = Graft.retrievalEvalFromIndex(spark, dir, queries,
      corpus, rel, k = 10).collect()
    assert(deployed.length == nq)
    deployed.foreach { r =>
      assert(r.getAs[Long]("ndcg_e6") >= 0L &&
        r.getAs[Long]("ndcg_e6") <= 1000000L)
    }
    spark.catalog.clearCache()
  }
}
