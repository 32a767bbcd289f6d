package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** s13 fusion semantics on planted corpora: RRF must (a) prefer a
  * candidate present in BOTH legs over a candidate that tops a single
  * leg (the whole point of rank fusion — agreement beats any one
  * signal), (b) degrade to pure vector ranking when the lexical leg is
  * empty, with the absent rank surfaced as −1, and (c) break exact
  * lexical ties deterministically by doc_id.
  */
class HybridRrfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val qText = "alpha beta gamma delta epsilon zeta"
  private val farText = "omicron pi rho sigma tau upsilon"

  private def docsOf(rows: (Long, String)*) = rows.toDF("doc_id", "text")
  private def embOf(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("a both-legs candidate outranks each single-leg winner; ties break by id") {
    // query 0; A(1) matches text AND vector, B(2) text only, C(3) vector only
    val docs = docsOf(0L -> qText, 1L -> qText, 2L -> qText, 3L -> farText)
    val emb = embOf(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0.9f, 0.1f, 0f, 0f), // cosine ~0.994 (vec rank 2)
      2L -> Seq(0f, 1f, 0f, 0f),     // cosine 0      (vec rank 3)
      3L -> Seq(1f, 0f, 0f, 0f))     // cosine 1      (vec rank 1)
    val out = SimilarityQueries.hybridRrf(docs, emb, nQueries = 1, topK = 3)
      .orderBy(col("rk")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // A: lex 1 + vec 2 = 1/61+1/62; B: lex 2 + vec 3 = 1/62+1/63 (the
    // lexical tie A-vs-B broke by doc_id); C: vec 1 only = 1/61 — the
    // both-legs candidates beat the best single-leg candidate
    assert(out == Seq((1L, 1L, 2L), (2L, 2L, 3L), (3L, -1L, 1L)),
      s"fused order/legs: $out")
  }

  test("empty lexical leg degrades to pure vector ranking with lex_rank = -1") {
    val docs = docsOf(0L -> qText, 1L -> farText, 2L -> farText)
    val emb = embOf(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0f, 1f, 0f, 0f),
      2L -> Seq(0.5f, 0.5f, 0f, 0f))
    val out = SimilarityQueries.hybridRrf(docs, emb, nQueries = 1, topK = 2)
      .orderBy(col("rk")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((2L, -1L, 1L), (1L, -1L, 2L)), s"got $out")
  }
}
