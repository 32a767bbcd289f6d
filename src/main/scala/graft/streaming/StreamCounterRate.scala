package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.queries.TimeSeriesQueries

final case class CtrIn(user_id: Long, ts_us: Long, event_id: Long, c: Long)
final case class CtrLast(ts_us: Long, event_id: Long, c: Long)
final case class CtrDelta(user_id: Long, ts_us: Long, hour: Long, inc: Long,
    reset: Long)

/** Streaming twin of ts14's delta half
  * ([[TimeSeriesQueries.counterDeltasOn]]): per-series `ValueState`
  * holds the LAST reading (ts, id, value) — constant state per series —
  * and each arriving reading emits one delta row with the identical
  * reset rule (counter moved forward → `cur − prev`; restarted →
  * `max(cur, 0)`). Readings inside a micro-batch are sorted by
  * (ts, id) like the batch window; across batches the carried state
  * continues the series, so feeding the emitted deltas through the
  * SAME [[TimeSeriesQueries.counterRollup]] reproduces the batch
  * ts14 output exactly (StreamingCounterRateSpec pins this).
  *
  * Ordering contract: per-series readings must arrive in time order
  * across micro-batches (the scrape pattern — counters are sampled in
  * order per target). A reading older than the carried state would be
  * treated as a restart; that is the same answer Prometheus gives.
  */
class CounterRateProcessor extends StatefulProcessor[Long, CtrIn, CtrDelta] {
  @transient private var last: ValueState[CtrLast] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    last = getHandle.getValueState[CtrLast](
      "last", Encoders.product[CtrLast], TTLConfig.NONE)

  override def handleInputRows(
      key: Long, rows: Iterator[CtrIn],
      timerValues: TimerValues): Iterator[CtrDelta] = {
    var prev = if (last.exists()) Option(last.get()) else None
    val out = Vector.newBuilder[CtrDelta]
    rows.toVector.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      prev.foreach { p =>
        val inc = if (e.c >= p.c) e.c - p.c else math.max(e.c, 0L)
        out += CtrDelta(key, e.ts_us, e.ts_us / TimeSeriesQueries.HourUs,
          inc, if (e.c < p.c) 1L else 0L)
      }
      prev = Some(CtrLast(e.ts_us, e.event_id, e.c))
    }
    prev.foreach(last.update)
    out.result().iterator
  }
}

object StreamCounterRate {
  /** events (with ts_ns) → one delta row per adjacent reading pair,
    * exactly [[TimeSeriesQueries.counterDeltasOn]]'s rows, emitted
    * incrementally. Sets the RocksDB provider (required by
    * transformWithState) on the session. */
  def deltas(events: DataFrame): Dataset[CtrDelta] = {
    val spark = events.sparkSession
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    events
      .select(col("user_id"), expr("ts_ns div 1000").as("ts_us"),
        col("event_id"), round(col("value") * 100).cast("bigint").as("c"))
      .as[CtrIn]
      .groupByKey(_.user_id)
      .transformWithState(
        new CounterRateProcessor, TimeMode.None(), OutputMode.Append())
  }
}
