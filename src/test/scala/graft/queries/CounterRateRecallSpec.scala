package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.functions.XHash

/** ts14 planted-reset semantics, s9 recall bounds, q55 HT estimate —
  * the properties the DuckDB hash-compare can't express (it only proves
  * both engines agree, not that the semantics are the intended ones). */
class CounterRateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("planted resets: increase, reset count, and rate are exact") {
    // one series, one hour: 10 → 25 (+15), 25 → 5 (reset: +5),
    // 5 → 7 (+2), 7 → −3 (reset floored at 0); second key single-row
    val rows = Seq[(Long, Long, Long, Long)](
      (1L, 1L, 0L, 10L), (1L, 2L, 10000000L, 25L),
      (1L, 3L, 20000000L, 5L), (1L, 4L, 30000000L, 7L),
      (1L, 5L, 40000000L, -3L),
      (2L, 6L, 0L, 99L))
    val got = TimeSeriesQueries.counterRateOn(
      rows.toDF("k", "id", "ts", "c"), "k", "id", "ts", "c").collect()
    assert(got.length == 1, "single-reading keys produce no deltas")
    val r = got.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 0L)
    assert(r.getLong(2) == 22L, s"increase: ${r.getLong(2)}") // 15+5+2+0
    assert(r.getLong(3) == 2L, "two resets")
    assert(r.getLong(4) == 4L, "four deltas")
    // span = 40e6 − 10e6 µs (first reading has no delta row); 22 cents
    // over 30 s
    assert(r.getDouble(5) == 22.0 * 1000000.0 / 30000000.0)
  }

  test("deltas land in the hour of their CURRENT reading") {
    val h = 3600L * 1000000L
    val rows = Seq[(Long, Long, Long, Long)](
      (1L, 1L, h - 1000000L, 100L), // hour 0
      (1L, 2L, h + 1000000L, 130L), // hour 1: +30 attributed here
      (1L, 3L, h + 2000000L, 140L)) // hour 1: +10
    val got = TimeSeriesQueries.counterRateOn(
      rows.toDF("k", "id", "ts", "c"), "k", "id", "ts", "c")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 40L), s"got $got")
    // a single-delta bucket with positive span still gets a rate; a
    // zero-span bucket would be NULL (both readings at one instant)
  }

  test("zero-span bucket yields NULL rate, not a division blow-up") {
    val rows = Seq[(Long, Long, Long, Long)](
      (1L, 1L, 5000L, 10L), (1L, 2L, 5000L, 30L))
    val got = TimeSeriesQueries.counterRateOn(
      rows.toDF("k", "id", "ts", "c"), "k", "id", "ts", "c").collect()
    assert(got.length == 1 && got.head.getLong(2) == 20L
      && got.head.isNullAt(5))
  }
}

class HistogramQuantileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("planted 1..100: interpolated quantiles match the hand replay") {
    val rows = (1L to 100L).map(c => (1L, c))
    val got = TimeSeriesQueries.histogramQuantileOn(
      rows.toDF("k", "c"), Seq("k"), "c").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(1) == 100L)
    // log2 buckets cum: 1,2,4,8,16,32,64,100. rank50 falls in (32,64]:
    // 32 + 32·(50−32)/32 = 50 exactly; rank90/99 in (64,128], cnt 36
    assert(r.getDouble(2) == 50.0, s"p50=${r.getDouble(2)}")
    assert(r.getDouble(3) == 64.0 + 64.0 * 26.0 / 36.0, s"p90=${r.getDouble(3)}")
    assert(r.getDouble(4) == 64.0 + 64.0 * 35.0 / 36.0, s"p99=${r.getDouble(4)}")
  }

  test("quantiles are monotone and bracket the data on real events") {
    val rows = graft.SparkEntry.queries("ts15_histogram_quantile")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(p50 <= p90 && p90 <= p99, s"monotone: $p50 $p90 $p99")
      assert(p50 >= 0.0)
    }
  }
}

class RecallEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("one recall row per query, recall = n_hits/k in [0,1], LSH useful") {
    val rows = SimilarityQueries.recallEval(Tables.embeddings(spark, sf),
      dim0 = Tables.EmbeddingDim, nHint = Tables.embeddingsRows(spark, sf))
      .collect()
    assert(rows.length == 32, s"32 query rows, got ${rows.length}")
    rows.foreach { r =>
      val (hits, rec) = (r.getLong(1), r.getDouble(2))
      assert(hits >= 0 && hits <= 3, s"n_hits: $hits")
      assert(rec == hits.toDouble / 3.0, "recall is the exact ratio")
    }
    val mean = rows.map(_.getDouble(2)).sum / rows.length
    assert(mean >= 0.5,
      s"4-probe LSH should recover most exact neighbors: mean=$mean")
  }
}

class WeightedSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("HT estimate tracks the true population; decisions match the hash") {
    val rows = graft.SparkEntry.queries("q55_weighted_sample")(spark, sf)
      .collect()
    val total = rows.map(_.getLong(2)).sum
    val est = rows.map(_.getDouble(4)).sum
    rows.foreach(r => assert(r.getLong(3) <= r.getLong(2),
      "sampled ≤ total per stratum"))
    assert(math.abs(est - total) / total < 0.4,
      s"Horvitz–Thompson estimate off: est=$est actual=$total")
    // spot-check the per-row acceptance rule against the driver-side
    // twin of the engines' shared hash
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), least(greatest(col("n_chars"), lit(1L)),
        lit(800L)).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expectSampled = docs.count { case (id, w) =>
      XHash.hash60Local(id.toString) % 1000000L < w * 500L }
    assert(rows.map(_.getLong(3)).sum == expectSampled,
      "accepted count must equal the hash-rule replay")
  }
}
