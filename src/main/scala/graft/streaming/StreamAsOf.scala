package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.AsOf

/** Streaming point-in-time enrichment: attach to every event of an
  * unbounded probe stream the most recent strictly-earlier row of a
  * STATIC build table (feature tables, dimension snapshots, quote
  * books). This is the streaming face of [[graft.operators.AsOf]]:
  * the broadcast-probe strategy is stateless on the probe side (plan-time
  * build collect + per-partition binary search), so the SAME operator
  * body runs under Structured Streaming unchanged — no state store, no
  * watermark, per-batch cost O(batch × log build).
  *
  * The batch operator's silent fallback for an oversized build is
  * [[AsOf.unionWindow]], which is NOT streamable (a non-time-ordered
  * window over an unbounded stream); here that would surface as an
  * opaque AnalysisException at stream start. So the streaming entry
  * pre-flights the build size and throws a loud, actionable error
  * instead. A genuinely big build needs the stream-stream interval-join
  * path (EventStreams) or a periodic re-broadcast job — both different
  * contracts, chosen deliberately, not fallen into.
  */
object StreamAsOf {
  /** @param probe streaming DataFrame with long columns (key, ts, id)
    * @param build STATIC DataFrame with long columns (key, ts, value),
    *              unique per (key, ts)
    * @return streaming DataFrame (id, key, ts, value) — value null when
    *         no strictly-earlier build row exists */
  def enrich(spark: SparkSession, probe: DataFrame, build: DataFrame,
      key: String, ts: String, id: String, value: String,
      maxBuildRows: Int = AsOf.DefaultMaxBuildRows): DataFrame = {
    require(probe.isStreaming, "probe must be a streaming DataFrame")
    require(!build.isStreaming,
      "build must be static — for stream×stream use EventStreams' interval join")
    val n = build.limit(maxBuildRows + 1).count()
    if (n > maxBuildRows)
      throw new IllegalArgumentException(
        s"build side exceeds $maxBuildRows rows: the broadcast-probe plan " +
          "would fall back to a shuffle window, which cannot run on an " +
          "unbounded stream. Raise maxBuildRows (driver memory permitting) " +
          "or use a stream-stream interval join.")
    AsOf.broadcastProbe(spark, probe, build, key, ts, id, value, maxBuildRows)
  }
}
