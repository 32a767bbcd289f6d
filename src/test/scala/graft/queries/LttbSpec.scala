package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** ts17 LTTB semantics on a planted series: the selected points are
  * REAL points (never synthetic averages), the interior pick is the
  * one subtending the largest triangle with the neighbor-bucket
  * centroids (a spike survives downsampling where ts1's per-bucket
  * average would flatten it to noise), and the endpoint buckets keep
  * their first/last point — the LTTB anchor convention.
  */
class LttbSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val H = TimeSeriesQueries.HourUs

  test("interior bucket keeps the spike; endpoints keep first/last points") {
    // three hour-buckets; flat value 100 everywhere except one 10000
    // spike mid-bucket-1
    val rows =
      (0 until 4).map(i => (1L, 100L + i, i * (H / 4), 100L)) ++
      Seq((1L, 200L, H + 0 * (H / 4), 100L),
        (1L, 201L, H + 1 * (H / 4), 100L),
        (1L, 202L, H + 2 * (H / 4), 10000L), // the spike
        (1L, 203L, H + 3 * (H / 4), 100L)) ++
      (0 until 4).map(i => (1L, 300L + i, 2 * H + i * (H / 4), 100L))
    val df = rows.toDF("user_id", "event_id", "ts_us", "c")
    val got = TimeSeriesQueries.lttbOn(df, "user_id", "event_id")
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap

    assert(got.size == 3, s"one representative per bucket: $got")
    assert(got(1L) == ((H + 2 * (H / 4), 10000L)),
      s"interior bucket must keep the spike, got ${got(1L)} " +
        "(a per-bucket average would report ~2575)")
    assert(got(0L) == ((0L, 100L)), s"first bucket keeps its first point: ${got(0L)}")
    assert(got(2L) == ((2 * H + 3 * (H / 4), 100L)),
      s"last bucket keeps its last point: ${got(2L)}")
  }

  test("a flat interior bucket tie-breaks to the earliest point") {
    val rows =
      Seq((1L, 1L, 0L, 100L)) ++
      (0 until 3).map(i => (1L, 10L + i, H + i * (H / 4), 100L)) ++
      Seq((1L, 20L, 2 * H, 100L))
    val df = rows.toDF("user_id", "event_id", "ts_us", "c")
    val got = TimeSeriesQueries.lttbOn(df, "user_id", "event_id")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // all areas equal (collinear) -> (area desc, ts asc, id asc) picks
    // the earliest point of bucket 1
    assert(got(1L) == H, s"flat bucket should keep its earliest point: $got")
  }
}
