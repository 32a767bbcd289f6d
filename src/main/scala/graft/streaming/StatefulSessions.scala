package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-event input to the sessionizer (event_time carries the watermark). */
final case class SessEvent(
    user_id: Long, ts_us: Long, value: Double, event_time: Timestamp)

/** Per-user open-session state kept by Spark's state store. */
final case class SessState(
    startUs: Long, lastUs: Long, n: Long, sum: Double)

/** One closed session — the output row. */
final case class SessionOut(
    user_id: Long, sess_start_us: Long, n_events: Long, sum_value: Double)

/** Custom-state sessionization via `flatMapGroupsWithState` (SURVEY.md §2D
  * streaming row). `session_window` (EventStreams.sessionAgg) covers the
  * gap-merge aggregate; this operator exists for session logic the native
  * operator cannot express — arbitrary per-session state transitions,
  * emit-on-close with derived fields, custom close conditions.
  *
  * Scale shape: state is one `SessState` per ACTIVE user (not per event);
  * event-time timeout + watermark bound state lifetime, so state-store
  * size is O(active users) regardless of stream length. Sessions close
  * either inline (a later event arrives past the gap) or via timeout when
  * the watermark passes `last_event + gap`.
  */
object StatefulSessions {

  def sessionize(
      events: DataFrame,
      gapMinutes: Int = 30,
      watermark: String = "1 hour"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    val typed = events
      .withColumn("event_time", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("event_time", watermark)
      .select(col("user_id"), unix_micros(col("event_time")).as("ts_us"),
        col("value"), col("event_time"))
      .as[SessEvent]

    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[SessEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // watermark passed last_event + gap: close and clear
            val closed = state.get
            state.remove()
            Iterator.single(
              SessionOut(user, closed.startUs, closed.n, closed.sum))
          } else {
            // within one micro-batch the group's rows are not ordered —
            // re-segment locally via gaps-and-islands over the batch's
            // events plus the open session (an atomic segment: it is
            // gap-contiguous by construction). This matches the batch
            // twin's semantics for late events anywhere inside the
            // watermark: an event within `gap` of the open session widens
            // it, while one more than `gap` BEFORE its start becomes its
            // own earlier island instead of being absorbed (the old
            // `e.ts - last < gap` test was trivially true for any earlier
            // event). Only the latest island stays open in state.
            val segs = (state.getOption.toVector ++
              rows.map(e => SessState(e.ts_us, e.ts_us, 1L, e.value)))
              .sortBy(s => (s.startUs, s.lastUs, s.sum))
            var open: Option[SessState] = None
            val out = Vector.newBuilder[SessionOut]
            segs.foreach { seg =>
              open match {
                case Some(c) if seg.startUs - c.lastUs < gapUs =>
                  open = Some(SessState(c.startUs,
                    math.max(c.lastUs, seg.lastUs), c.n + seg.n, c.sum + seg.sum))
                case Some(c) =>
                  out += SessionOut(user, c.startUs, c.n, c.sum)
                  open = Some(seg)
                case None =>
                  open = Some(seg)
              }
            }
            open.foreach { s =>
              state.update(s)
              // fire once the watermark passes session close time
              state.setTimeoutTimestamp(s.lastUs / 1000L + gapMinutes * 60000L)
            }
            out.result().iterator
          }
      }
  }
}
