package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** flatMapGroupsWithState sessionizer must produce the same sessions as
  * the native session_window operator (StreamingSpec's expectation set) —
  * sessions close via event-time timeout once the watermark passes.
  */
class StatefulSessionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val hourNs = 3600L * 1000000000L
  private val base = 1737928800L * 1000000000L // > 2^53

  test("stateful sessionizer equals gaps-and-islands sessions") {
    val dir = Files.createTempDirectory("graft_fmgws_in").toString
    // user 0: two sessions (gap > 30 min); user 1: one session
    val rows = Seq(
      (1L, base, 0L, "click", 1.0, "{}"),
      (2L, base + 10L * 60 * 1000000000L, 0L, "click", 2.0, "{}"),
      (3L, base + 2L * hourNs, 0L, "click", 3.0, "{}"),
      (4L, base + 5L * 60 * 1000000000L, 1L, "view", 4.0, "{}"))
    // sentinel pushes the watermark past every real session's timeout
    val sentinel = (9999L, base + 100L * hourNs, 99L, "sentinel", 0.0, "{}")
    (rows :+ sentinel)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2).write.mode("append").parquet(dir)

    val sessions = StatefulSessions.sessionize(
      EventStreams.readEvents(spark, dir))
    val got = EventStreams.runToMemory(spark, sessions.toDF(), "fmgws")
      .filter(col("user_id") =!= 99L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val expected = Set(
      (0L, base / 1000L, 2L, 3.0), //                 session 1: events 1+2
      (0L, (base + 2L * hourNs) / 1000L, 1L, 3.0), // session 2: event 3
      (1L, (base + 5L * 60 * 1000000000L) / 1000L, 1L, 4.0))
    assert(got == expected)
  }

  test("session state carries across micro-batches, late events widen it") {
    val dir = Files.createTempDirectory("graft_fmgws3_in").toString
    val minNs = 60L * 1000000000L
    def write(rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
    // file 1: session open at [t0, t0+10m]
    write(Seq(
      (1L, base, 5L, "click", 1.0, "{}"),
      (2L, base + 10L * minNs, 5L, "click", 2.0, "{}")))
    // file 2: a LATE event inside the open session (t0+5m) plus the
    // sentinel that expires it — arrives in a later micro-batch
    write(Seq(
      (3L, base + 5L * minNs, 5L, "click", 4.0, "{}"),
      (9999L, base + 100L * hourNs, 99L, "sentinel", 0.0, "{}")))

    // one file per trigger => file 1 and file 2 land in separate batches
    val events = spark.readStream
      .schema(EventStreams.eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withColumnRenamed("ts", "ts_ns")
    val got = EventStreams.runToMemory(spark,
      StatefulSessions.sessionize(events).toDF(), "fmgws3")
      .filter(col("user_id") === 5L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // one session, all three events, bounds from the earliest event
    assert(got == Set((base / 1000L, 3L, 7.0)))
  }

  test("mid-batch session close emits inline (no timeout needed)") {
    val dir = Files.createTempDirectory("graft_fmgws2_in").toString
    // one user, two sessions arriving in ONE batch: the first session must
    // be emitted inline when the second one opens
    val rows = Seq(
      (1L, base, 7L, "click", 1.0, "{}"),
      (2L, base + 3L * hourNs, 7L, "click", 2.0, "{}"),
      (9999L, base + 100L * hourNs, 99L, "sentinel", 0.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)

    val got = EventStreams.runToMemory(spark,
      StatefulSessions.sessionize(EventStreams.readEvents(spark, dir)).toDF(),
      "fmgws2")
      .filter(col("user_id") === 7L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((base / 1000L, 1L), ((base + 3L * hourNs) / 1000L, 1L)))
  }
}
