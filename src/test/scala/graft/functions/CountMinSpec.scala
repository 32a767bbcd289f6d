package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** CountMinAgg: the linear-sketch algebra that makes q51 fully
  * hash-gated — the matrix is an order-independent sum, estimates never
  * undercount, and merge over ANY partitioning equals the single-stream
  * sketch (the map-side-combine property the 100 TB shape relies on).
  */
class CountMinSpec extends AnyFunSuite {

  private val d = 4
  private val w = 32

  private def bucketsOf(item: String): CmBuckets =
    CmBuckets((0 until d).map(r => (XHash.hash60Local(s"$item:$r") % w).toInt))

  private def sketch(items: Seq[String]): CmSketch = {
    val agg = new CountMinAgg(d, w)
    items.foldLeft(agg.zero)((b, it) => agg.reduce(b, bucketsOf(it)))
  }

  private def est(s: CmSketch, item: String): Long = {
    val b = bucketsOf(item)
    (0 until d).map(r => s.cells(r * w + b.b(r))).min
  }

  private def corpus(n: Int, vocab: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(s"tok${rnd.nextInt(vocab)}")
  }

  test("estimates never undercount; exact when no row collides") {
    val items = corpus(5000, 200, seed = 1)
    val s = sketch(items)
    val truth = items.groupBy(identity).view.mapValues(_.length.toLong).toMap
    var collided = 0
    truth.foreach { case (tok, cnt) =>
      val e = est(s, tok)
      assert(e >= cnt, s"$tok undercounted: $e < $cnt")
      if (e > cnt) collided += 1
    }
    // vocab 200 >> w 32: collisions MUST occur or the gate tests nothing
    assert(collided > 0, "no collisions — widen vocab or shrink w")
  }

  test("merge over any partitioning equals the single-stream sketch") {
    val agg = new CountMinAgg(d, w)
    val items = corpus(3000, 150, seed = 2)
    val whole = sketch(items)
    Seq(2, 7, 64).foreach { parts =>
      val merged = items.grouped(math.max(1, items.length / parts))
        .map(chunk => sketch(chunk.toSeq))
        .foldLeft(agg.zero)(agg.merge)
      assert(merged.cells.toSeq == whole.cells.toSeq,
        s"merge at $parts partitions diverged from the single stream")
    }
  }

  test("total mass per row equals the item count (linear-sketch invariant)") {
    val items = corpus(1234, 50, seed = 3)
    val s = sketch(items)
    (0 until d).foreach { r =>
      val mass = (0 until w).map(b => s.cells(r * w + b)).sum
      assert(mass == items.length.toLong, s"row $r mass $mass != ${items.length}")
    }
  }

  test("weighted increments from exact counts equal unit increments " +
      "(the r16 q51 rewire's linearity claim)") {
    val items = corpus(4000, 180, seed = 4)
    val whole = sketch(items)
    val wAgg = new CountMinWeightedAgg(d, w)
    val weighted = items.groupBy(identity).view
      .mapValues(_.length.toLong).toSeq
      .foldLeft(wAgg.zero) { case (b, (tok, n)) =>
        wAgg.reduce(b, CmWeighted(bucketsOf(tok).b, n))
      }
    assert(weighted.cells.toSeq == whole.cells.toSeq,
      "weighted sketch diverged from the unit-increment sketch")
  }
}
