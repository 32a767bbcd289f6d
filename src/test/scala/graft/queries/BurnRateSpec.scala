package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** ts16 multi-window burn-rate semantics on planted series: the short
  * window catches a real burn, the long window suppresses a brief
  * spike — the two cases that justify the SRE workbook's pairing.
  */
class BurnRateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ids(n: Int, errors: Int): Seq[Long] = {
    // `errors` ids divisible by 20 + (n - errors) ids that are not
    val errIds = (1 to errors).map(_ * 20L)
    val okIds = Iterator.from(1).map(_.toLong).filter(_ % 20 != 0)
      .take(n - errors).toSeq
    errIds ++ okIds
  }

  test("sustained burn alerts; brief spike is suppressed by the long window") {
    val rows =
      // user 1: 200 events in hour 0, 40 errors — burn 20× in BOTH
      // windows (hour 0 is alone in its 6-hour bucket) → alert
      ids(200, 40).map(id => (1L, id, 0L)) ++
      // user 2: same volume, 2 errors — burn 1× → no alert
      ids(200, 2).map(id => (2L, id, 0L)) ++
      // user 3: hour 0 spikes at burn 50× (10/20), but hours 1-5 are
      // clean (580 events, 0 errors) → long burn 10·100/600 ≈ 1.7× —
      // the long window suppresses the flap
      ids(20, 10).map(id => (3L, id, 0L)) ++
      (1L to 5L).flatMap(h => ids(116, 0).map(id => (3L, id, h)))
    val df = rows.toDF("user_id", "event_id", "hour")
    val out = TimeSeriesQueries.burnRateOn(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(6), r.getDouble(7), r.getBoolean(8))).toMap

    assert(out((1L, 0L)) == ((20.0, 20.0, true)))
    assert(out((2L, 0L)) == ((1.0, 1.0, false)))
    val (spikeShort, spikeLong, spikeAlert) = out((3L, 0L))
    assert(spikeShort == 50.0 && !spikeAlert,
      s"spike must burn short (got $spikeShort) yet stay suppressed")
    assert(spikeLong < 14.4, s"long burn should be ~1.7, got $spikeLong")
  }
}
