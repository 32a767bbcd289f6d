package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property test: on random event sets — including timestamp ties,
  * users with no build rows, and build rows after every probe — the
  * broadcast-probe and union+window as-of strategies agree with each
  * other AND with a brute-force reference computed per row.
  */
class AsOfProps extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("probe == window == brute force on 30 random as-of instances") {
    val rnd = new scala.util.Random(20260812)
    (1 to 30).foreach { trial =>
      val nUsers = 1 + rnd.nextInt(5)
      // small ts domain forces ties and equal-timestamp probe/build rows
      val probe = Seq.fill(1 + rnd.nextInt(40))(
        (rnd.nextInt(nUsers).toLong, rnd.nextInt(20).toLong))
        .zipWithIndex.map { case ((u, t), i) => (u, t, 1000L + i) }
      val build = Seq.fill(rnd.nextInt(25))(
        (rnd.nextInt(nUsers).toLong, rnd.nextInt(20).toLong))
        .distinct // unique per (key, ts) — the operator's contract
        .zipWithIndex.map { case ((u, t), i) => (u, t, 2000L + i) }

      val probeDf = probe.toDF("user_id", "ts_us", "event_id")
      val buildDf = build.toDF("user_id", "ts_us", "err_id")

      def asMap(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap

      val viaProbe = asMap(AsOf.broadcastProbe(spark, probeDf, buildDf,
        "user_id", "ts_us", "event_id", "err_id").collect())
      val viaWindow = asMap(AsOf.unionWindow(probeDf, buildDf,
        "user_id", "ts_us", "event_id", "err_id").collect())
      // bucket width 7 on a ts domain of 20: matches routinely cross
      // bucket boundaries, exercising the carry-in path
      val viaBuckets = asMap(AsOf.rangeBucketed(probeDf, buildDf,
        "user_id", "ts_us", "event_id", "err_id", bucketWidth = 7L).collect())

      // brute force: most recent STRICTLY-earlier build value per key
      val expected = probe.map { case (u, t, id) =>
        val earlier = build.filter(b => b._1 == u && b._2 < t)
        id -> (if (earlier.isEmpty) None
               else Some(earlier.maxBy(_._2)._3))
      }.toMap

      assert(viaProbe == expected, s"trial $trial: probe != brute force")
      assert(viaWindow == expected, s"trial $trial: window != brute force")
      assert(viaBuckets == expected, s"trial $trial: rangeBucketed != brute force")
    }
  }

  test("rangeBucketed plan is shuffle-bounded: no unpartitioned window") {
    val probe = (1 to 200).map(i => (i % 3L, i.toLong * 5, 1000L + i))
      .toDF("user_id", "ts_us", "event_id")
    val build = (1 to 60).map(i => (i % 3L, i.toLong * 17, 2000L + i))
      .toDF("user_id", "ts_us", "err_id")
    val df = AsOf.rangeBucketed(probe, build,
      "user_id", "ts_us", "event_id", "err_id", bucketWidth = 100L)
    df.write.format("noop").mode("overwrite").save()
    val physical = df.queryExecution.executedPlan.toString
    // every window partitions on something (a global window would move
    // all data to ONE task — the unionWindow hot-key failure mode)
    assert(!physical.contains("Window [") ||
      !physical.matches("(?s).*Window \\[[^\\]]*\\], \\[\\].*"),
      s"unpartitioned window in plan:\n$physical")
    // the big raw-row window runs per (key, bucket), not per key alone
    assert(physical.contains("__bucket"),
      s"expected (key, __bucket) partitioning in plan:\n$physical")
    // the ns-scale bucket arithmetic stays in long math end-to-end: a
    // double floor would corrupt 2^60-scale timestamps
    val negProbe = Seq((-1L, -10L, 1L), (-1L, 3L, 2L)).toDF("user_id", "ts_us", "event_id")
    val negBuild = Seq((-1L, -12L, 7L), (-1L, 2L, 8L)).toDF("user_id", "ts_us", "err_id")
    val neg = AsOf.rangeBucketed(negProbe, negBuild,
      "user_id", "ts_us", "event_id", "err_id", bucketWidth = 7L)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(neg == Map(1L -> Some(7L), 2L -> Some(8L)))
  }
}
