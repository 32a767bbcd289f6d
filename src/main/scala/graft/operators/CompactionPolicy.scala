package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.Path

/** When a streaming sink folds its artifact's deltas (r11 verdict #4).
  *
  * The legacy cadence (`every`: fold on every N-th micro-batch) is kept,
  * but a bursty stream blows straight past a count-of-batches schedule —
  * the thing that actually degrades readers is the LIVE WINDOW, so the
  * policy can trigger on it directly:
  *   - `maxDeltas`: fold when the manifest's live delta count (the
  *     authoritative number, no filesystem access) reaches the bound —
  *     pending takedown tombstones count toward it (they are window
  *     dirs readers must anti-join until folded)
  *   - `maxBytes`: fold when the delta dirs ABOVE the base slab hold at
  *     least this many bytes (one filesystem content summary per
  *     micro-batch, computed only when this knob is set) — the
  *     reference compactor's own size-target idea applied to artifact
  *     maintenance
  * Any satisfied condition triggers; all three default to off.
  * CompactionPolicySpec pins the bound under a long synthetic stream.
  */
final case class CompactionPolicy(every: Int = 0, maxDeltas: Int = 0,
    maxBytes: Long = 0L) {

  def enabled: Boolean = every > 0 || maxDeltas > 0 || maxBytes > 0

  /** `windowBytes` is by-name: only evaluated when `maxBytes` is set
    * and the cheaper conditions did not already trigger. */
  def triggers(batchId: Long, liveDeltas: => Long,
      windowBytes: => Long): Boolean =
    (every > 0 && batchId > 0 && batchId % every == 0) ||
      (maxDeltas > 0 && liveDeltas >= maxDeltas) ||
      (maxBytes > 0 && windowBytes >= maxBytes)
}

object CompactionPolicy {

  /** Total bytes under the given dirs (missing dirs count 0). */
  private[operators] def bytesUnder(spark: SparkSession,
      dirs: Seq[String]): Long =
    dirs.map { d =>
      val p = new Path(d)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    }.sum
}
