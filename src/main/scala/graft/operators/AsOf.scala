package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (time-series enrichment): for each probe row, the value of
  * the most recent strictly-earlier build row with the same key. Spark
  * has no native as-of join; this operator offers the two physical
  * strategies a 100 TB deployment needs, with an explicit, guarded
  * choice between them:
  *
  *  - [[unionWindow]] — union both sides, one IGNORE-NULLS `last` window
  *    pass. ONE shuffle of probe+build by key; no driver-side data. The
  *    always-safe plan, any build size.
  *  - [[broadcastProbe]] — collect the (small) build side, sort per key,
  *    broadcast, binary-search per probe row in `mapPartitions`. The
  *    probe side is never shuffled or sorted. Same contract as
  *    `broadcast()`: the build side must be small — so the collect is
  *    GUARDED by `maxBuildRows` and falls back to [[unionWindow]] when
  *    the build side is too big (an unguarded collect would OOM the
  *    driver silently at 100× data). The guard costs nothing extra: the
  *    bounded collect IS the broadcast build when it fits.
  *  - [[rangeBucketed]] — the big-probe × big-build regime. unionWindow
  *    sorts each key's ENTIRE history in one task (a hot key = a
  *    straggler; its window partition is unbounded); rangeBucketed
  *    shuffles both sides by (key, time-bucket) so every task holds one
  *    bounded time slice, and threads the inter-bucket state (the latest
  *    build row of all earlier buckets) through a window over the
  *    per-(key,bucket) AGGREGATE — O(keys × buckets) rows, not raw rows.
  *
  * Both sides are long-typed `(key, ts)`; the build side must be unique
  * per (key, ts) — pre-aggregate it (e.g. `max(id)` per key+ts).
  */
object AsOf {
  /** Default driver-collect bound for the broadcast build side: 2M rows.
    * Raw data is three longs (~48 MB), but the collected tuples are
    * BOXED on the driver until regrouped into primitive arrays — budget
    * ~10× raw, which keeps the peak well under a default driver heap.
    * Same order as Spark's own autoBroadcastJoinThreshold-sized builds. */
  val DefaultMaxBuildRows: Int = 2000000

  /** Shuffle-by-key as-of: probe ∪ build, then `last(value) IGNORE NULLS`
    * over (ts, kind) per key — `kind` orders a build row AFTER a probe
    * row at equal ts, making the match strictly earlier.
    *
    * @param probe  columns (key, ts, id)
    * @param build  columns (key, ts, value), unique per (key, ts)
    * @return columns (id, key, ts, value) — value null when no match
    */
  def unionWindow(probe: DataFrame, build: DataFrame,
      key: String, ts: String, id: String, value: String): DataFrame = {
    val p = probe.select(col(key), col(ts), col(id), lit(0).as("kind"),
      lit(null).cast("long").as(value))
    val b = build.select(col(key), col(ts), col(value).as(id),
      lit(1).as("kind"), col(value))
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("kind"))
      .rowsBetween(Window.unboundedPreceding, -1)
    p.unionAll(b)
      .withColumn("__asof", last(col(value), ignoreNulls = true).over(w))
      .filter(col("kind") === 0)
      .select(col(id), col(key), col(ts), col("__asof").as(value))
  }

  /** Broadcast-build as-of: the probe side stays put (no shuffle, no
    * sort); each partition binary-searches the broadcast build arrays.
    *
    * The build side is collected through `limit(maxBuildRows + 1)`, so
    * driver memory is bounded by the guard no matter how large the build
    * side really is; if it overflows the bound, the call transparently
    * returns the [[unionWindow]] plan instead (same result, shuffle
    * strategy). No Catalyst expression covers ordered-probe semantics,
    * so the probe itself is a typed `mapPartitions` — the one place
    * imperative per-partition code is the right tool.
    */
  /** Range-bucketed as-of: both sides bucketed on `floor(ts /
    * bucketWidth)` and windowed within (key, bucket) — the per-key
    * unbounded sort of [[unionWindow]] becomes per-(key, time-slice)
    * bounded tasks. Matches that cross a bucket boundary are carried in
    * by a synthetic build row per (key, bucket): the latest build row of
    * all earlier buckets, computed with one window over the
    * per-(key,bucket) aggregate (its real, earlier ts makes it sort
    * before every row of the bucket). Exact same result as
    * [[unionWindow]] (property-tested); pick `bucketWidth` so a bucket
    * of one key fits a task (e.g. one hour of ns).
    *
    * @param probe  columns (key, ts, id)
    * @param build  columns (key, ts, value), unique per (key, ts)
    * @return columns (id, key, ts, value) — value null when no match
    */
  def rangeBucketed(probe: DataFrame, build: DataFrame,
      key: String, ts: String, id: String, value: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    // floor division in pure long arithmetic: (ts - pmod) is an exact
    // multiple of the width, so the integral divide is exact — a double
    // round-trip (floor(ts / w)) would corrupt ns-scale timestamps
    // (2^60 > the 53-bit mantissa)
    def withBucket(df: DataFrame): DataFrame =
      df.withColumn("__floor", col(ts) - pmod(col(ts), lit(bucketWidth)))
        .withColumn("__bucket", expr(s"__floor div ${bucketWidth}L"))
        .drop("__floor")
    val p = withBucket(probe.select(col(key), col(ts), col(id)))
    val b = withBucket(build.select(col(key), col(ts), col(value)))

    // latest build row per (key, bucket): lexicographic max over the
    // (ts, value) struct — build is unique per (key, ts)
    val bAgg = b.groupBy(col(key), col("__bucket"))
      .agg(max(struct(col(ts), col(value))).as("__last"))
    // the bucket universe per key: buckets EITHER side touches (a probe
    // bucket with no build rows still needs its carry-in)
    val universe = p.select(col(key), col("__bucket"))
      .unionAll(b.select(col(key), col("__bucket"))).distinct()
    val wCarry = Window.partitionBy(col(key)).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = universe.join(bAgg, Seq(key, "__bucket"), "left")
      .withColumn("__carry", last(col("__last"), ignoreNulls = true).over(wCarry))
      .filter(col("__carry").isNotNull)
      .select(col(key), col("__bucket"),
        col(s"__carry.$ts").as(ts), col(s"__carry.$value").as(value))

    val pu = p.select(col(key), col("__bucket"), col(ts), col(id),
      lit(0).as("kind"), lit(null).cast("long").as(value))
    val bu = b.select(col(key), col("__bucket"), col(ts), col(value).as(id),
      lit(1).as("kind"), col(value))
    val cu = carry.select(col(key), col("__bucket"), col(ts),
      col(value).as(id), lit(1).as("kind"), col(value))
    val w = Window.partitionBy(col(key), col("__bucket"))
      .orderBy(col(ts), col("kind"))
      .rowsBetween(Window.unboundedPreceding, -1)
    pu.unionAll(bu).unionAll(cu)
      .withColumn("__asof", last(col(value), ignoreNulls = true).over(w))
      .filter(col("kind") === 0)
      .select(col(id), col(key), col(ts), col("__asof").as(value))
  }

  def broadcastProbe(spark: SparkSession, probe: DataFrame, build: DataFrame,
      key: String, ts: String, id: String, value: String,
      maxBuildRows: Int = DefaultMaxBuildRows): DataFrame = {
    import spark.implicits._
    // bounded collect: at most maxBuildRows+1 rows ever reach the driver
    val buildRows = build.select(col(key), col(ts), col(value))
      .as[(Long, Long, Long)].limit(maxBuildRows + 1).collect()
    if (buildRows.length > maxBuildRows)
      return unionWindow(probe, build, key, ts, id, value)
    val byKey: Map[Long, (Array[Long], Array[Long])] =
      buildRows.groupBy(_._1).map { case (k, rows) =>
        val sorted = rows.sortBy(_._2)
        k -> (sorted.map(_._2), sorted.map(_._3))
      }
    val bc = spark.sparkContext.broadcast(byKey)
    probe.select(col(id), col(key), col(ts))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (i, k, t) =>
          val matched = m.get(k).flatMap { case (tss, vals) =>
            // greatest idx with tss(idx) < t (strictly earlier)
            var lo = 0; var hi = tss.length - 1; var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (tss(mid) < t) { ans = mid; lo = mid + 1 } else hi = mid - 1
            }
            if (ans >= 0) Some(vals(ans)) else None
          }
          (i, k, t, matched)
        }
      }.toDF(id, key, ts, value)
  }
}
