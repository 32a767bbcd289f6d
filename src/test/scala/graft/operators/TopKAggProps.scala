package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ScoredRow, TopKAgg, TopKRows}

/** Aggregator-contract properties for TopKAgg. Spark merges partial
  * buffers in ARBITRARY order across partitions, so the result must be
  * invariant to how the input is partitioned and to merge order — these
  * seeded generative trials pin exactly that, beyond the single oracle
  * example.
  */
class TopKAggProps extends AnyFunSuite {

  private val k = 3
  private val agg = new TopKAgg(k)
  private val Trials = 200

  private def genRows(rnd: scala.util.Random): Seq[ScoredRow] = {
    val n = rnd.nextInt(40)
    // duplicate scores are common on purpose (tie-break coverage); ids
    // made unique per the aggregator's contract
    Seq.fill(n)(ScoredRow((rnd.nextInt(10) - 5).toDouble, rnd.nextInt(1000).toLong))
      .groupBy(_.id).map(_._2.head).toSeq
  }

  /** Reference semantics: global sort, take k. */
  private def expected(rows: Seq[ScoredRow]): Seq[ScoredRow] =
    rows.sortBy(r => (-r.score, r.id)).take(k)

  private def reduceAll(rows: Seq[ScoredRow]): TopKRows =
    rows.foldLeft(agg.zero)(agg.reduce)

  test("any partitioning + any merge order equals global sort-take-k") {
    val rnd = new scala.util.Random(42)
    (1 to Trials).foreach { _ =>
      val rows = genRows(rnd)
      val nParts = 1 + rnd.nextInt(5)
      val partitions = rnd.shuffle(rows)
        .grouped(math.max(1, (rows.length + nParts - 1) / nParts)).toList
      val buffers = rnd.shuffle(partitions.map(reduceAll))
      val merged = buffers.foldLeft(agg.zero)((a, b) => agg.merge(a, b))
      assert(agg.finish(merged).rows == expected(rows),
        s"rows=$rows parts=$nParts")
    }
  }

  test("merge is commutative") {
    val rnd = new scala.util.Random(7)
    (1 to Trials).foreach { _ =>
      val a = reduceAll(genRows(rnd))
      val b = reduceAll(genRows(rnd))
      assert(agg.finish(agg.merge(a, b)).rows ==
        agg.finish(agg.merge(b, a)).rows)
    }
  }

  test("buffer never exceeds k rows (bounded state)") {
    val rnd = new scala.util.Random(13)
    (1 to Trials).foreach { _ =>
      assert(reduceAll(genRows(rnd)).rows.length <= k)
    }
  }
}
