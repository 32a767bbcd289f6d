package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
import graft.queries.TimeSeriesQueries

final case class HistIn(event_type: String, hour: Long, c: Long)
final case class HistBucket(event_type: String, hour: Long, b: Int, cnt: Long)

/** Streaming twin of ts15's counting half
  * ([[TimeSeriesQueries.histogramBucketsOn]]): per-(series, hour)
  * `MapState` holds the log₂-bucket counts — ≤ ~40 entries per key, the
  * mergeable-state property that makes bucketed histograms THE streaming
  * percentile shape (exact percentiles would need every reading in
  * state; bucket counts are O(log range) and additive across batches).
  * Each micro-batch folds its readings into the state and emits the
  * UPDATED (key, bucket, cumulative cnt) rows for the buckets it
  * touched; counts are monotone, so the latest emission per (key, b) —
  * `max(cnt)` — IS the final bucket table, and feeding it through the
  * SAME [[TimeSeriesQueries.quantilesFromBuckets]] reproduces batch
  * ts15 exactly (StreamingHistogramSpec pins this).
  *
  * Bucket rule is byte-identical to the batch half: readings floored at
  * 0; c ≤ 1 → bucket 0, else ceil-log₂ via 64 − nlz(c − 1) — the Scala
  * form of `length(bin(c - 1))`.
  */
class HistogramProcessor extends StatefulProcessor[(String, Long), HistIn, HistBucket] {
  @transient private var counts: MapState[Int, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[Int, Long](
      "counts", Encoders.scalaInt, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: (String, Long), rows: Iterator[HistIn],
      timerValues: TimerValues): Iterator[HistBucket] = {
    val touched = scala.collection.mutable.Map.empty[Int, Long]
    rows.foreach { r =>
      val c = math.max(r.c, 0L)
      val b = if (c <= 1L) 0
        else 64 - java.lang.Long.numberOfLeadingZeros(c - 1L)
      val cur = touched.getOrElse(b,
        if (counts.containsKey(b)) counts.getValue(b) else 0L)
      touched.update(b, cur + 1L)
    }
    touched.foreach { case (b, cnt) => counts.updateValue(b, cnt) }
    touched.iterator.map { case (b, cnt) =>
      HistBucket(key._1, key._2, b, cnt)
    }
  }
}

object StreamHistogram {
  /** events (with ts_ns) → updated (event_type, hour, b, cnt) bucket
    * rows per micro-batch, maintaining exactly
    * [[TimeSeriesQueries.histogramBucketsOn]]'s counts as state. Sets
    * the RocksDB provider (required by transformWithState) on the
    * session. */
  def buckets(events: DataFrame): Dataset[HistBucket] = {
    val spark = events.sparkSession
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    events
      .select(col("event_type"),
        expr(s"(ts_ns div 1000) div ${TimeSeriesQueries.HourUs}").as("hour"),
        round(col("value") * 100).cast("bigint").as("c"))
      .as[HistIn]
      .groupByKey(r => (r.event_type, r.hour))
      .transformWithState(
        new HistogramProcessor, TimeMode.None(), OutputMode.Append())
  }
}
