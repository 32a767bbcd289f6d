package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{Graft, TestSpark}

/** t18: CCNet-style perplexity routing. The bits-per-bigram arithmetic
  * is hand-replayable (exact ceil(-log2 P) via 2^20 fixed point +
  * binary-string length), so the first test pins exact scores on a
  * 2-doc corpus; the second pins the routing property the operator
  * exists for — predictable boilerplate lands in 'head', mid-entropy
  * text in 'middle', high-entropy text in 'tail' — with bucket
  * membership forced by construction (successor fan-out per prefix
  * word decides P(w2|w1)).
  */
class LmPerplexitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("exact hand-computed bits on a 2-doc corpus") {
    import spark.implicits._
    // corpus bigrams: "a b"x2, "b a"x1, "a c"x1; u(a)=3, u(b)=1
    // p20("a b") = 2*2^20 div 3 = 699050 -> floor_log2 19 -> 1 bit
    //   (= ceil(-log2(2/3)) = ceil(0.585))
    // p20("b a") = 2^20 div 1 = 2^20     -> floor_log2 20 -> 0 bits
    //   (P = 1 costs exactly zero bits — the old 10^6 scale said 1)
    // p20("a c") = 2^20 div 3 = 349525   -> floor_log2 18 -> 2 bits
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = Graft.lmPerplexityBuckets(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got == Set(
      (1L, 3L, 666L, "head"),    // (1+0+1)*1000 div 3
      (2L, 1L, 2000L, "head")))  // 2*1000 div 1
  }

  test("routing: boilerplate -> head, mid-entropy -> middle, high-entropy -> tail") {
    import spark.implicits._
    // head: deterministic bigrams (P = 1 -> 0 bits/bigram)
    val head = Seq((0L, "a b a b a b"))
    // middle: 1000 distinct successors of 'm' -> ceil(log2 1000) = 10 bits
    val mid = (1L to 1000L).map(i => (1000L + i, s"m v$i"))
    // tail: 5000 distinct successors of 'z' -> ceil(log2 5000) = 13 bits
    val tail = (1L to 5000L).map(i => (10000L + i, s"z u$i"))
    val docs = (head ++ mid ++ tail).toDF("doc_id", "text")
    val buckets = Graft.lmPerplexityBuckets(docs)
      .groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(buckets == Map("head" -> 1L, "middle" -> 1000L, "tail" -> 5000L),
      s"got $buckets")
  }
}
