package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** transformWithState running totals: state carries across micro-batches
  * and equals the batch cumulative sum. */
class RunningTotalsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = 1737928800L * 1000000000L

  test("per-user running totals accumulate across micro-batches") {
    val dir = Files.createTempDirectory("graft_tws_in").toString
    def write(rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
    write(Seq(
      (1L, base, 7L, "click", 1.5, "{}"),
      (2L, base + 1000000000L, 7L, "click", 2.5, "{}"),
      (3L, base, 8L, "view", 10.0, "{}")))
    write(Seq(
      (4L, base + 2000000000L, 7L, "click", 6.0, "{}")))

    // one file per trigger => accumulation must survive the batch boundary
    val events = spark.readStream
      .schema(EventStreams.eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withColumnRenamed("ts", "ts_ns")
    val got = EventStreams.runToMemory(spark,
      RunningTotals.totals(events).toDF(), "tws_totals")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(
      (7L, 1L, 1.5), (7L, 2L, 4.0), (7L, 4L, 10.0),
      (8L, 3L, 10.0)))
  }
}
