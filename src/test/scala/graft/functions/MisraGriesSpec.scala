package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** MisraGriesAgg: the two order-independent guarantees (under-count
  * bounded by n/(k+1), presence of every true heavy hitter) must hold
  * for adversarial arrival AND merge orders — that is exactly what the
  * q50 gate booleans assert in-plan, so they are pinned here directly
  * against the raw summary on skewed streams.
  */
class MisraGriesSpec extends AnyFunSuite {

  private def runStream(agg: MisraGriesAgg, items: Seq[String]): MgSummary =
    items.foldLeft(agg.zero)(agg.reduce)

  private def check(k: Int, items: Seq[String], summary: MgSummary): Unit = {
    val n = items.length.toLong
    val truth = items.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(summary.counters.size <= k, "summary exceeds k counters")
    truth.foreach { case (tok, cnt) =>
      val est = summary.counters.getOrElse(tok, 0L)
      assert(est <= cnt, s"$tok over-counted: $est > $cnt")
      assert((cnt - est) * (k + 1) <= n,
        s"$tok under-counted beyond n/(k+1): est $est, true $cnt, n $n")
    }
    summary.counters.keys.foreach(tok =>
      assert(truth.contains(tok), s"phantom token $tok"))
  }

  private def zipf(n: Int, vocab: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n) {
      // skewed: token i with weight ~ 1/(i+1)
      val u = rnd.nextDouble()
      val i = ((math.exp(u * math.log(vocab + 1.0)) - 1).toInt).min(vocab - 1)
      s"tok$i"
    }
  }

  test("stream guarantees hold with heavy eviction (k far below vocab)") {
    for (seed <- 1 to 5; k <- Seq(4, 16)) {
      val items = zipf(5000, 200, seed)
      check(k, items, runStream(new MisraGriesAgg(k), items))
    }
  }

  test("merge rule preserves the guarantees across arbitrary partitionings") {
    val k = 8
    val agg = new MisraGriesAgg(k)
    for (seed <- 1 to 5) {
      val items = zipf(4000, 100, seed)
      // split into uneven partitions, summarize each, merge in order
      val parts = items.grouped(items.length / 7 + 1).toSeq
      val merged = parts.map(p => runStream(agg, p)).reduce(agg.merge)
      check(k, items, merged)
      // and merge in reverse order — result may differ, guarantees may not
      val mergedRev = parts.reverse.map(p => runStream(agg, p)).reduce(agg.merge)
      check(k, items, mergedRev)
    }
  }

  test("no-eviction regime is exact") {
    val agg = new MisraGriesAgg(64)
    val items = Seq.fill(100)("a") ++ Seq.fill(30)("b") ++ Seq.fill(7)("c")
    val got = runStream(agg, items).counters
    assert(got == Map("a" -> 100L, "b" -> 30L, "c" -> 7L))
  }
}
