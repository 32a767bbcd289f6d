package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** PageRank: the distributed integer power iteration must equal a
  * straightforward single-threaded replay of the same recurrence, and
  * basic centrality structure must come out (hubs above leaves). */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference replay of the exact recurrence (r0 = Scale;
    * r' = Jump + (85 · Σ r/deg) div 100, truncating int division). */
  private def replay(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var r = deg.keys.map(_ -> PageRank.Scale).toMap
    (1 to iters).foreach { _ =>
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      r = in.map { case (v, s) => v -> (PageRank.Jump + (85L * s) / 100L) }
    }
    r
  }

  private def run(pairs: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] = {
    val df = PageRank.pageRank(pairs.toDF("a", "b"), iters)
    val out = df.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    df.unpersist()
    out
  }

  test("matches the single-threaded replay on an irregular graph") {
    // two components: a 4-star (hub 1) plus a triangle with a tail
    val pairs = Seq[(Long, Long)](
      (1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L), (12L, 13L))
    val expect = replay(pairs, 5)
    val got = run(pairs, 5)
    assert(got.keySet == expect.keySet)
    expect.foreach { case (id, rank) =>
      assert(got(id)._1 == rank, s"node $id: got ${got(id)._1}, want $rank")
    }
    // structure: the star hub outranks its leaves; the tail node is lowest
    // in its component
    assert(got(1L)._1 > got(2L)._1)
    assert(got(13L)._1 < got(12L)._1)
    // degrees carried through
    assert(got(1L)._2 == 4L && got(13L)._2 == 1L)
  }

  test("iteration count changes the result until the fixpoint regime") {
    val pairs = Seq[(Long, Long)]((1L, 2L), (2L, 3L))
    assert(run(pairs, 1) != run(pairs, 3), "1 vs 3 rounds should differ")
    assert(run(pairs, 2) == replay(pairs, 2).map { case (k, v) =>
      k -> (v, if (k == 2L) 2L else 1L) })
  }

  test("rejects out-of-range iteration counts") {
    intercept[IllegalArgumentException](run(Seq((1L, 2L)), 0))
    intercept[IllegalArgumentException](run(Seq((1L, 2L)), 21))
  }

  test("exact fixed point exits early with output identical to the full unroll") {
    // a 6-cycle: every node has degree 2, each receives 2·(Scale div 2)
    // = Scale, so r1 = Jump + (85·Scale) div 100 = Scale — the integer
    // fixed point is hit after ONE round; rounds 2..5 are provably
    // identical, so the early exit must stop at 1 and still equal the
    // 5-round replay bit-for-bit
    val cycle = Seq[(Long, Long)](
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 1L))
    val (df, rounds) = PageRank.pageRankRuns(cycle.toDF("a", "b"), 5)
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    df.unpersist()
    assert(rounds == 1, s"cycle should converge after round 1, ran $rounds")
    val expect = replay(cycle, 5)
    assert(got == expect, "early-exited output diverged from the full unroll")
    assert(got.values.forall(_ == PageRank.Scale))
  }

  test("non-converged graphs run the full iteration budget") {
    val pairs = Seq[(Long, Long)](
      (1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L), (12L, 13L))
    // the replay confirms every round up to 5 still moves some rank —
    // so the early exit must NOT fire
    (1 to 5).foreach(t => assert(replay(pairs, t) != replay(pairs, t - 1)))
    val (df, rounds) = PageRank.pageRankRuns(pairs.toDF("a", "b"), 5)
    df.unpersist()
    assert(rounds == 5, s"no fixed point before round 5, but ran $rounds")
  }
}
