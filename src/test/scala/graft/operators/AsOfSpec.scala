package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** operators.AsOf: the broadcast-probe strategy must be GUARDED — when
  * the build side overflows maxBuildRows, the call returns the
  * union+window plan (same rows, shuffle strategy) instead of collecting
  * an unbounded build side onto the driver.
  */
class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def sides() = {
    val e = Tables.events(spark, sf).withColumn("ts_us", expr("ts_ns div 1000"))
    val clicks = e.filter(col("event_type") === "click")
      .select("user_id", "ts_us", "event_id")
    val errors = e.filter(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max(col("event_id")).as("err_id"))
    (clicks, errors)
  }

  test("broadcast probe and union+window agree row-for-row") {
    val (clicks, errors) = sides()
    val probe = AsOf.broadcastProbe(spark, clicks, errors,
      "user_id", "ts_us", "event_id", "err_id").collect().toSet
    val window = AsOf.unionWindow(clicks, errors,
      "user_id", "ts_us", "event_id", "err_id").collect().toSet
    assert(probe.nonEmpty && probe == window)
  }

  test("overflowing the build-side guard falls back to the window plan") {
    val (clicks, errors) = sides()
    val fallback = AsOf.broadcastProbe(spark, clicks, errors,
      "user_id", "ts_us", "event_id", "err_id", maxBuildRows = 1)
    // the fallback is the union+window plan: a Window node appears and no
    // typed mapPartitions (the probe path's signature operator)
    val plan = fallback.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(400))
    assert(!plan.contains("MapPartitions"), plan.take(400))
    // and the rows are still correct
    val expected = AsOf.unionWindow(clicks, errors,
      "user_id", "ts_us", "event_id", "err_id").collect().toSet
    assert(fallback.collect().toSet == expected)

    // the in-bounds path really is the probe plan (no Window anywhere)
    val probe = AsOf.broadcastProbe(spark, clicks, errors,
      "user_id", "ts_us", "event_id", "err_id")
    val probePlan = probe.queryExecution.executedPlan.toString
    assert(!probePlan.contains("Window"), probePlan.take(400))
  }
}
