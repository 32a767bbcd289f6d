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

      // brute force: most recent STRICTLY-earlier build value per key
      val expected = probe.map { case (u, t, id) =>
        val earlier = build.filter(b => b._1 == u && b._2 < t)
        id -> (if (earlier.isEmpty) None
               else Some(earlier.maxBy(_._2)._3))
      }.toMap

      assert(viaProbe == expected, s"trial $trial: probe != brute force")
      assert(viaWindow == expected, s"trial $trial: window != brute force")
    }
  }
}
