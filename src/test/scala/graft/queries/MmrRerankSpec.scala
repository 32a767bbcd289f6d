package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** s14 MMR semantics on a planted pool: where plain top-k returns a
  * near-duplicate at rank 2, MMR must demote it behind an
  * equally-relevant but DIVERSE candidate — the whole point of the
  * diversity pass — and the greedy chain must stay deterministic under
  * exact sim ties (doc_id order).
  */
class MmrRerankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("MMR demotes the redundant near-clone behind the diverse candidate") {
    // query 0 = [1,0,0,0]; docs 1 and 2 are CLONES of each other
    // (redundancy 1.0), doc 3 equally relevant but diverse — all three
    // share the exact same relevance sim, so plain ranking returns
    // (1, 2, 3) by id while MMR must return (1, 3, 2)
    val emb = Seq(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0.9f, 0.3f, 0f, 0f),
      2L -> Seq(0.9f, 0.3f, 0f, 0f),
      3L -> Seq(0.9f, -0.3f, 0f, 0f)).toDF("vec_id", "embedding")
    val mmr = SimilarityQueries.mmrRerank(emb, nQueries = 1, poolR = 3)
      .orderBy(col("rk")).collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    assert(mmr == Seq((1L, 1L), (3L, 2L), (2L, 3L)),
      s"expected the diverse doc 3 at rank 2, the clone demoted: $mmr")
    // cross-check the plain ranking really would have interleaved them
    val plain = SimilarityQueries.cosineTopK(emb, nQueries = 1, topK = 3)
      .orderBy(col("rk")).collect().map(_.getLong(1)).toSeq
    assert(plain == Seq(1L, 2L, 3L), s"plain top-k baseline changed: $plain")
  }
}
