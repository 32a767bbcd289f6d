package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` shape (ns-precision
  * int64 `ts` kept as LongType at rest; converted to µs TimestampType only
  * at the watermark/window boundary, where Spark's event-time machinery
  * requires TimestampType).
  *
  * The reference is a batch-only CLI — streaming is part of this engine's
  * extension surface (SURVEY.md §2 D): the same aggregations the batch
  * queries declare (tumbling/sliding windows, sessionization) run
  * incrementally with watermark-bounded state, which is what makes them
  * viable on an unbounded 100 TB/day event feed.
  */
object EventStreams {

  /** events parquet schema with ns-as-long timestamps (read-side schema
    * must be explicit for readStream). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // ns since epoch
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of event parquet files. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", "8")
      .parquet(dir)
      .withColumnRenamed("ts", "ts_ns")

  private def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time", timestamp_micros(expr("ts_ns div 1000")))

  /** Tumbling-window counts/sums per event type with a bounded-state
    * watermark. Output: window start/end (µs epoch), type, aggregates. */
  def tumblingAgg(
      events: DataFrame,
      window: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("event_time"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(25,2)")).cast("double").as("sum_value"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        unix_micros(col("window.end")).as("win_end_us"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window variant (overlapping windows). */
  def slidingAgg(
      events: DataFrame,
      window: String = "10 minutes",
      slide: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("event_time"), window, slide),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"))

  /** Session windows per user (gap-based), the streaming twin of batch
    * query q16_sessionize. */
  def sessionAgg(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(25,2)")).cast("double").as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("sess_start_us"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup with bounded state: duplicates of (event_id)
    * arriving within the watermark horizon are dropped; state for older
    * keys is reclaimed — the streaming twin of d1_exact_dedup, viable on
    * an unbounded feed because state is watermark-bounded. */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("event_id")
      .drop("event_time")

  /** Stream-stream interval join: each "view" joined to the same user's
    * "click"s from the preceding `lookback`. Both sides carry watermarks
    * and the join condition bounds click_time relative to view_time, so
    * Spark can expire join state on BOTH sides — state stays
    * O(users × lookback window), not O(stream length). This is the
    * streaming enrichment twin of the batch range join (q22). */
  def clickViewJoin(
      events: DataFrame,
      lookback: String = "10 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val clicks = withEventTime(events.filter(col("event_type") === "click"))
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("event_time").as("click_time"))
      .withWatermark("click_time", watermark)
    val views = withEventTime(events.filter(col("event_type") === "view"))
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("event_time").as("view_time"))
      .withWatermark("view_time", watermark)
    views.join(clicks,
      col("v_user") === col("c_user") &&
        col("click_time") >= col("view_time") - expr(s"INTERVAL $lookback") &&
        col("click_time") <= col("view_time"))
      .select(col("v_user").as("user_id"), col("view_id"), col("click_id"),
        unix_micros(col("view_time")).as("view_us"),
        unix_micros(col("click_time")).as("click_us"))
  }

  /** Run a streaming DataFrame to completion against currently-available
    * input (Trigger.AvailableNow semantics via processAllAvailable on a
    * memory sink) and return the collected result — test/dev harness. */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"graft_ckpt_$name").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
