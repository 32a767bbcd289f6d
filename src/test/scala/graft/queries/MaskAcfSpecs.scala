package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.XHash

/** q54 span corruption: the bounded-lookback mask must equal a
  * single-threaded greedy replay of "5% of positions start a 2–4 token
  * span, overlaps merge", and the masked fraction must sit near its
  * closed-form expectation. */
class SpanCorruptionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** greedy reference: walk positions, start a span where the hash says
    * so, extend cover; a position is masked iff covered by any span. */
  private def replay(docId: Long, nTokens: Int): Seq[Int] = {
    val masked = Array.fill(nTokens + 1)(false)
    for (p <- 1 to nTokens) {
      val h = XHash.hash60Local(s"$docId:$p")
      if (h % 20 == 0) {
        val len = 2 + ((h % 60) / 20).toInt // h%20==0 => h%60 in {0,20,40}
        for (q <- p until math.min(p + len, nTokens + 1)) masked(q) = true
      }
    }
    (1 to nTokens).filter(masked)
  }

  test("distributed mask equals the greedy replay on synthetic docs") {
    val docs = Seq(
      (7L, ("w " * 200).trim),
      (8L, "single"),
      (9L, ""),
      (10L, ("tok " * 55).trim))
      .toDF("doc_id", "text")
    val got = PipelineQueries.spanCorruptionOn(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    docs.collect().foreach { row =>
      val id = row.getLong(0)
      val n = if (row.getString(1).isEmpty) 1 // split("") = [""] = 1 token
        else row.getString(1).split(" ", -1).length
      val expect = replay(id, n)
      val (gotN, gotMasked, gotFp) = got(id)
      assert(gotN == n, s"doc $id n_tokens")
      assert(gotMasked == expect.length, s"doc $id n_masked")
      assert(gotFp == XHash.hash60Local(expect.mkString(",")),
        s"doc $id mask fingerprint")
    }
  }

  test("masked fraction tracks the closed form on the corpus") {
    // P(masked) = 1 - (19/20)^3 * (no len-3+ span at d=2) * ... ;
    // exact form: miss(d=0,1) = 19/20; d=2: 1 - 1/20*(2/3); d=3: 1 - 1/20*(1/3)
    val pMask = 1.0 -
      math.pow(19.0 / 20, 2) * (1 - (2.0 / 3) / 20) * (1 - (1.0 / 3) / 20)
    val row = PipelineQueries.spanCorruptionOn(
      graft.Tables.documents(spark, "/root/testdata/sf0.01"))
      .agg(sum("n_tokens").cast("double").as("t"),
        sum("n_masked").cast("double").as("m")).head()
    val frac = row.getDouble(1) / row.getDouble(0)
    assert(math.abs(frac - pMask) < 0.02,
      s"masked fraction $frac vs expected $pMask")
  }
}

/** ts11 autocorrelation: the scaled-residual estimator must equal a
  * double-precision single-threaded ACF computed the textbook way, and
  * structured series must show their signature (trend: acf1 near 1;
  * alternating: acf1 near −1). */
class AutocorrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def acf(xs: Seq[Long], k: Int): Double = {
    val n = xs.length
    val mean = xs.sum.toDouble / n
    val den = xs.map(x => (x - mean) * (x - mean)).sum
    if (den == 0) 0.0
    else (k until n).map(i => (xs(i) - mean) * (xs(i - k) - mean)).sum / den
  }

  test("estimator equals the textbook ACF on the corpus (spot keys)") {
    val out = graft.SparkEntry.queries("ts11_autocorr")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    // recompute two keys the long way from the raw events
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"),
        expr("ts_ns div 1000").as("ts_us"),
        round(col("value") * 100).cast("bigint").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    ev.groupBy(_._1).take(3).foreach { case (key, rows) =>
      val xs = rows.sortBy(r => (r._3, r._2)).map(_._4).toSeq
      val (a1, a2) = out(key)
      assert(math.abs(a1 - acf(xs, 1)) < 1e-9, s"key $key acf1")
      assert(math.abs(a2 - acf(xs, 2)) < 1e-9, s"key $key acf2")
    }
  }

  test("signatures: monotone trend -> acf1 ~ 1; alternating -> acf1 ~ -1") {
    assert(acf((1L to 100L).map(_ * 10), 1) > 0.9)
    assert(acf((1L to 100L).map(i => if (i % 2 == 0) 100L else -100L), 1) < -0.9)
    // and the DISTRIBUTED estimator shows the same signatures
    val rows =
      (1L to 100L).map(i => (1L, i, i * 100L, i * 10L)) ++          // trend
      (1L to 100L).map(i => (2L, 200 + i, i * 100L,                  // alt
        if (i % 2 == 0) 100L else -100L))
    val got = TimeSeriesQueries.autocorrOn(
      rows.toDF("k", "id", "ts", "c"), "k", "id", "ts", "c")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) > 0.9, s"trend key acf1 ${got(1L)}")
    assert(got(2L) < -0.9, s"alternating key acf1 ${got(2L)}")
    // exact agreement with the textbook double computation
    assert(math.abs(got(1L) - acf((1L to 100L).map(_ * 10), 1)) < 1e-9)
  }
}
