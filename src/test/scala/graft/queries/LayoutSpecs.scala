package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q52 z-order layout: the rank-equalized Morton interleave must equal a
  * bit-level reference implementation, shards must be balanced, and —
  * the point of the layout — every shard must have a TIGHT span on BOTH
  * axes (a time-sorted layout is tight on time and spans the full hash
  * range on series; the z-layout is 1/8-range on each). */
class ZorderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def spread(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    (x | (x << 1)) & 0x55555555L
  }
  private def morton(xb: Long, yb: Long): Long = (spread(xb) << 1) | spread(yb)
  /** inverse: odd bits -> xb, even bits -> yb */
  private def unmorton(z: Long): (Long, Long) = {
    var xb = 0L; var yb = 0L
    var i = 0
    while (i < 16) {
      xb |= ((z >> (2 * i + 1)) & 1L) << i
      yb |= ((z >> (2 * i)) & 1L) << i
      i += 1
    }
    (xb, yb)
  }
  private def bitrev12(v: Long): Long =
    (0 until 12).foldLeft(0L)((acc, i) => acc | (((v >> i) & 1L) << (11 - i)))

  test("rank-equalized interleave equals the reference Morton on a permutation grid") {
    // x = id, y = bit-reversed id: both are permutations of 0..4095, so
    // ranks are the values themselves and every (x-octile, y-octile)
    // grid cell holds exactly 64 rows
    val n = 4096L
    val df = (0L until n).map(id => (id, id, bitrev12(id))).toDF("id", "x", "y")
    val got = PipelineQueries.zorderOn(df, "id", "x", "y", rowBound = n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == n)
    got.foreach { case (id, zkey, zshard) =>
      val expect = morton(id * 16L, bitrev12(id) * 16L)
      assert(zkey == expect, s"id=$id zkey=$zkey want $expect")
      assert(zshard == (zkey >> 26), s"id=$id shard")
    }
    val byShard = got.groupBy(_._3).view.mapValues(_.length)
    assert(byShard.size == 64 && byShard.values.forall(_ == 64),
      "perfectly uniform grid must land 4096/64 rows in every shard")
  }

  test("rank equalization is skew-proof on the MARGINALS: 90%-hot axes still split exactly") {
    // 90% of rows share ONE x value (a hot hour) and a hot y value —
    // raw-value interleave would collapse those axes' top bits to a
    // constant (every hot row in one octile); rank equalization
    // tie-breaks by id, so each axis still splits into EXACTLY n/8 per
    // octile. (Joint balance additionally needs the axes decorrelated:
    // here both hot blocks take their ranks from the SAME id order, so
    // rows concentrate on the grid diagonal — real time×series axes
    // don't share a tie-break; the corpus test below covers the joint
    // claim.)
    val n = 4096
    val rows = (0 until n).map { i =>
      val x = if (i % 10 != 0) 777L else i.toLong // 90% hot x
      val y = if (i % 10 != 5) 999L else i * 31L  // 90% hot y
      (i.toLong, x, y)
    }
    val zkeys = PipelineQueries.zorderOn(
      rows.toDF("id", "x", "y"), "id", "x", "y", rowBound = n)
      .collect().map(r => r.getLong(1))
    def octiles(sel: Long => Long): Map[Long, Int] =
      zkeys.map(z => sel(z) >> 13).groupBy(identity).view.mapValues(_.length).toMap
    val xOct = octiles(z => unmorton(z)._1)
    val yOct = octiles(z => unmorton(z)._2)
    Seq(xOct, yOct).foreach { m =>
      assert(m.size == 8 && m.values.forall(_ == n / 8),
        s"rank-equalized marginals must split exactly: $m")
    }
  }

  test("q52 on the corpus: every shard spans <= 1/8 of BOTH axes") {
    val out = graft.SparkEntry.queries("q52_zorder_layout")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.length > 0)
    val byShard = out.groupBy(_._2)
    assert(byShard.size >= 56, s"64-cell grid mostly populated, got ${byShard.size}")
    byShard.foreach { case (shard, rows) =>
      val xs = rows.map(t => unmorton(t._1)._1)
      val ys = rows.map(t => unmorton(t._1)._2)
      assert(xs.max - xs.min <= 8191L,
        s"shard $shard time-axis span ${xs.max - xs.min}")
      assert(ys.max - ys.min <= 8191L,
        s"shard $shard series-axis span ${ys.max - ys.min}")
    }
  }
}

/** ts10 rolling median: the distributed bounded-frame median must equal
  * a single-threaded replay (lower middle element), including even
  * frames, ties, and short histories. */
class RollingMedianSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def replay(rows: Seq[(Long, Long, Long, Long)],
      window: Int): Map[(Long, Long), Long] =
    rows.groupBy(_._1).flatMap { case (k, rs) =>
      val ordered = rs.sortBy(r => (r._3, r._2))
      ordered.zipWithIndex.map { case ((_, id, _, _), i) =>
        val frame = ordered.slice(math.max(0, i - window + 1), i + 1)
          .map(_._4).sorted
        (k, id) -> frame((frame.length + 1) / 2 - 1)
      }
    }

  test("matches the replay with ties, even frames, and short keys") {
    val rows = Seq[(Long, Long, Long, Long)](
      // key 1: mixed, with duplicate values and a spike
      (1L, 1L, 100L, 10L), (1L, 2L, 200L, 40L), (1L, 3L, 300L, 20L),
      (1L, 4L, 400L, 20L), (1L, 5L, 500L, 900L), (1L, 6L, 600L, 30L),
      (1L, 7L, 700L, 10L), (1L, 8L, 800L, 50L), (1L, 9L, 900L, 20L),
      // key 2: single row; key 3: two rows (even frame)
      (2L, 10L, 100L, 7L),
      (3L, 11L, 100L, 5L), (3L, 12L, 200L, 9L))
    Seq(4, 7).foreach { w =>
      val got = TimeSeriesQueries.rollingMedianOn(
        rows.toDF("k", "id", "ts", "c"), "k", "id", "ts", "c", w)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
      assert(got == replay(rows, w), s"window=$w")
    }
  }

  test("median shrugs off the spike a mean would absorb") {
    val rows = (1L to 9L).map(i =>
      (1L, i, i * 100L, if (i == 5L) 1000000L else 10L))
    val got = TimeSeriesQueries.rollingMedianOn(
      rows.toDF("k", "id", "ts", "c"), "k", "id", "ts", "c", 7)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // every frame median stays 10 despite the embedded 1e6 outlier
    assert(got.values.toSet == Set(10L))
  }
}
