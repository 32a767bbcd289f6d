package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

final case class TotalIn(user_id: Long, ts_us: Long, event_id: Long, value: Double)
final case class TotalOut(user_id: Long, event_id: Long, running_total: Double)

/** Per-user running total via `transformWithState` (Spark 4's arbitrary-
  * state API, successor to flatMapGroupsWithState): typed `ValueState`
  * per key in the RocksDB state store, optional TTL, timers available.
  * Complements [[StatefulSessions]] — that operator shows the classic
  * API, this one the state-v2 surface (named state variables, per-state
  * TTL, multiple column families).
  *
  * State is one double per user; TTL (here: none) would bound it for
  * abandoned keys. Requires the RocksDB state store provider — see
  * [[RunningTotals.totals]] which sets it on the session.
  */
class RunningTotalProcessor extends StatefulProcessor[Long, TotalIn, TotalOut] {
  @transient private var total: ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    total = getHandle.getValueState[Double](
      "total", Encoders.scalaDouble, TTLConfig.NONE)

  override def handleInputRows(
      key: Long, rows: Iterator[TotalIn],
      timerValues: TimerValues): Iterator[TotalOut] = {
    var t = if (total.exists()) total.get() else 0.0
    val out = rows.toVector.sortBy(e => (e.ts_us, e.event_id)).map { e =>
      t += e.value
      TotalOut(key, e.event_id, t)
    }
    total.update(t)
    out.iterator
  }
}

object RunningTotals {
  /** events (with ts_ns) → one row per event carrying the per-user
    * cumulative value. Sets the RocksDB provider (required by
    * transformWithState) on the session. */
  def totals(events: DataFrame): Dataset[TotalOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    events
      .select(col("user_id"), expr("ts_ns div 1000").as("ts_us"),
        col("event_id"), col("value"))
      .as[TotalIn]
      .groupByKey(_.user_id)
      .transformWithState(
        new RunningTotalProcessor, TimeMode.None(), OutputMode.Append())
  }
}
