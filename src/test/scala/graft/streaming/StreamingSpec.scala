package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streaming semantics checked against their batch twins: a streaming
  * windowed agg over a finite file stream must equal the same aggregation
  * run in batch (modulo the sentinel event used to push the watermark so
  * append mode closes all real windows).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val hourNs = 3600L * 1000000000L
  private val base = 1737928800L * 1000000000L // > 2^53

  /** (event_id, ts_ns, user_id, event_type, value, props) rows spanning
    * ~3 hours, two users, deterministic. */
  private def mkEvents(n: Int): Seq[(Long, Long, Long, String, Double, String)] =
    (0 until n).map { i =>
      (i.toLong, base + i.toLong * 97L * 1000000000L, (i % 2).toLong,
        if (i % 3 == 0) "click" else "view", i * 1.5, s"""{"k": $i}""")
    }

  private def writeEventFiles(dir: String, rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2).write.mode("append").parquet(dir)

  test("streaming tumbling agg equals batch aggregation") {
    val dir = Files.createTempDirectory("graft_stream_in").toString
    val rows = mkEvents(120)
    // sentinel far in the future closes every real window in append mode
    val sentinel = (9999L, base + 100L * hourNs, 99L, "sentinel", 0.0, "{}")
    writeEventFiles(dir, rows :+ sentinel)

    val streamed = EventStreams.runToMemory(spark,
      EventStreams.tumblingAgg(EventStreams.readEvents(spark, dir)), "tumbling")
      .filter(col("event_type") =!= "sentinel")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getDouble(4)))
      .toSet

    val winUs = 5L * 60 * 1000000
    val batch = rows.toDF("event_id", "ts_ns", "user_id", "event_type", "value", "props")
      .withColumn("win_start_us", expr(s"(ts_ns div 1000) div $winUs * $winUs"))
      .groupBy("win_start_us", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(25,2)")).cast("double").as("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch)
  }

  test("streaming sliding windows equal the batch two-window expansion") {
    val dir = Files.createTempDirectory("graft_slide_in").toString
    val rows = mkEvents(80)
    val sentinel = (9999L, base + 100L * hourNs, 99L, "sentinel", 0.0, "{}")
    writeEventFiles(dir, rows :+ sentinel)

    val streamed = EventStreams.runToMemory(spark,
      EventStreams.slidingAgg(EventStreams.readEvents(spark, dir)), "sliding")
      .filter(col("event_type") =!= "sentinel")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    // batch twin: a 10m/5m sliding window means each event lands in the
    // two windows starting at floor(ts/5m)*5m and that minus 5m
    val slideUs = 5L * 60 * 1000000
    val batch = rows.toDF("event_id", "ts_ns", "user_id", "event_type", "value", "props")
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("win_start_us", explode(array(
        expr(s"ts_us div $slideUs * $slideUs"),
        expr(s"ts_us div $slideUs * $slideUs - $slideUs"))))
      .groupBy("win_start_us", "event_type")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("streaming session windows equal batch gaps-and-islands") {
    val dir = Files.createTempDirectory("graft_sess_in").toString
    // user 0: two sessions (gap > 30 min); user 1: one session
    val rows = Seq(
      (1L, base, 0L, "click", 1.0, "{}"),
      (2L, base + 10L * 60 * 1000000000L, 0L, "click", 2.0, "{}"),
      (3L, base + 2L * hourNs, 0L, "click", 3.0, "{}"),
      (4L, base + 5L * 60 * 1000000000L, 1L, "view", 4.0, "{}"))
    val sentinel = (9999L, base + 100L * hourNs, 99L, "sentinel", 0.0, "{}")
    writeEventFiles(dir, rows :+ sentinel)

    val got = EventStreams.runToMemory(spark,
      EventStreams.sessionAgg(EventStreams.readEvents(spark, dir)), "sessions")
      .filter(col("user_id") =!= 99L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val expected = Set(
      (0L, base / 1000L, 2L, 3.0), //                 session 1: events 1+2
      (0L, (base + 2L * hourNs) / 1000L, 1L, 3.0), // session 2: event 3
      (1L, (base + 5L * 60 * 1000000000L) / 1000L, 1L, 4.0))
    assert(got == expected)
  }

  test("streaming dedup drops duplicates within the watermark") {
    val dir = Files.createTempDirectory("graft_dedup_in").toString
    val rows = mkEvents(40)
    val dups = rows.take(10) // same event_ids re-delivered
    writeEventFiles(dir, rows ++ dups)
    val got = EventStreams.runToMemory(spark,
      EventStreams.dedupStream(EventStreams.readEvents(spark, dir)), "dedup")
    assert(got.count() == 40)
    assert(got.select("event_id").distinct().count() == 40)
  }

  test("stream-stream interval join equals the batch join") {
    val dir = Files.createTempDirectory("graft_ssj_in").toString
    val minNs = 60L * 1000000000L
    // user 0: clicks at t0,t0+4m; views at t0+5m (joins both), t0+30m (none)
    // user 1: click t0+2m, view t0+3m (joins one)
    val rows = Seq(
      (1L, base, 0L, "click", 1.0, "{}"),
      (2L, base + 4L * minNs, 0L, "click", 1.0, "{}"),
      (3L, base + 5L * minNs, 0L, "view", 1.0, "{}"),
      (4L, base + 30L * minNs, 0L, "view", 1.0, "{}"),
      (5L, base + 2L * minNs, 1L, "click", 1.0, "{}"),
      (6L, base + 3L * minNs, 1L, "view", 1.0, "{}"))
    val sentinel = (9999L, base + 100L * hourNs, 99L, "click", 0.0, "{}")
    writeEventFiles(dir, rows :+ sentinel)

    val got = EventStreams.runToMemory(spark,
      EventStreams.clickViewJoin(EventStreams.readEvents(spark, dir)), "ssj")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet // (view_id, click_id)
    assert(got == Set((3L, 1L), (3L, 2L), (6L, 5L)))
  }

  test("incremental compaction: AvailableNow picks up only new files") {
    val in = Files.createTempDirectory("graft_ic_in").toString
    val out = Files.createTempDirectory("graft_ic_out").toString + "/data"
    val ckpt = Files.createTempDirectory("graft_ic_ckpt").toString

    val batch1 = (0 until 50).map(i =>
      (base + (49 - i).toLong * 60L * 1000000000L, s"s$i", i * 1.0))
    batch1.toDF("time", "sensor", "value").write.mode("append").parquet(in)
    StreamingCompactor.runOnce(spark, in, out, ckpt)
    assert(StreamingCompactor.readCompacted(spark, out).count() == 50)

    val batch2 = (0 until 30).map(i =>
      (base + 2 * hourNs + i.toLong * 60L * 1000000000L, s"t$i", i * 2.0))
    batch2.toDF("time", "sensor", "value").write.mode("append").parquet(in)
    StreamingCompactor.runOnce(spark, in, out, ckpt)

    val compacted = StreamingCompactor.readCompacted(spark, out)
    assert(compacted.count() == 80) // no reprocessing of batch1
    // hour partitioning exists and rows are time-sorted within each file
    assert(StreamingCompactor.listPartitions(spark, out).nonEmpty)
    val perFileSorted = compacted
      .select(input_file_name().as("f"), col("time"))
      .groupBy("f")
      .agg(collect_list("time").as("ts"))
      .collect()
      .forall(r => { val l = r.getSeq[Long](1); l == l.sorted })
    assert(perFileSorted)
  }
}
