package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed rank family over arbitrarily large ordered groups.
  *
  * Spark's window functions require every partition of the window to fit
  * one task: `Window.partitionBy(k).orderBy(o)` with a low-cardinality
  * `k` (or none) moves whole groups — at the limit the whole table —
  * through ONE sorter ("WindowExec: No Partition Defined ... single
  * partition"). On a 1000-executor cluster that single task is the job.
  * The reference's merge query has the same shape (global ORDER BY time,
  * kompactor.ts:107), solved inline for `a_scan_sort_merge` with
  * fixed one-hour time shards; this operator is the general form: the
  * shards come from quantiles of a caller-named numeric shard key, so
  * any orderable axis works and skewed axes still split evenly.
  *
  * Exact rank in one data shuffle, every stage parallel:
  *   1. one small job computes ~numShards quantile boundaries of
  *      `shardKey`; they are embedded as LITERALS, so the shard id is a
  *      pure function of row values — deterministic across jobs, stages,
  *      and retries (this is why it is not `spark_partition_id` after a
  *      range exchange: separate consumers of an exchange can resample
  *      different boundaries, and a partition index is not a value);
  *   2. per-(shard, group) row counts → prefix-sum offsets via a window
  *      over that TINY table (shards × groups rows, broadcastable);
  *   3. local row_number inside each (shard, group) — bounded by the
  *      shard size — plus the broadcast offset.
  *
  * Requirements, checked by the caller's choice of columns:
  *  - `shardKey` is numeric, non-null, and NON-DECREASING along
  *    `orderCols` within every group (ordering by `x.desc` → pass
  *    `negate(x)`); rows equal on `shardKey` always share a shard, so
  *    boundary placement cannot split an order tie;
  *  - `orderCols` is a total order within each group (append a unique
  *    tiebreaker) — the same requirement every oracle-gated query
  *    already imposes for cross-engine determinism.
  */
object DistributedRank {

  /** Exact `row_number() OVER (PARTITION BY groupCols ORDER BY
    * orderCols)` as `rnName`, with no single-partition stage. Output
    * carries the input columns plus `rnName`. */
  def withRowNumber(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[Column], shardKey: Column, rnName: String = "rn",
      numShards: Int = -1): DataFrame =
    rankParts(df, groupCols, orderCols, shardKey, rnName, numShards)._1

  /** [[withRowNumber]] plus the per-(shard, group) counts table it is
    * built from — `(__shard, groupCols…, __n, __offset)`, shards×groups
    * rows — so callers needing per-group totals can aggregate THAT
    * instead of re-scanning the data. */
  private def rankParts(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[Column], shardKey: Column, rnName: String,
      numShards: Int): (DataFrame, DataFrame) = {
    val shards =
      if (numShards > 0) numShards
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // quantile boundaries of the shard key — one narrow scan job; the
    // approximation only affects balance, never correctness
    val bounds =
      if (shards <= 1) Array.empty[Double]
      else df.select(shardKey.cast("double").as("__sk"))
        .stat.approxQuantile("__sk",
          (1 until shards).map(_.toDouble / shards).toArray, 0.001)
        .distinct.sorted
    // shard = #boundaries strictly below the key: monotone in the key,
    // and all rows with equal keys share a shard by construction
    val shardOf =
      if (bounds.isEmpty) lit(0L)
      else size(filter(array(bounds.map(lit(_)): _*),
        b => b < col("__sk"))).cast("bigint")
    val withShard = df
      .withColumn("__sk", shardKey.cast("double"))
      .withColumn("__shard", shardOf)
      .drop("__sk")
    val wLocal = Window.partitionBy(("__shard" +: groupCols).map(col): _*)
      .orderBy(orderCols: _*)
    val wOff = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__shard")).rowsBetween(Window.unboundedPreceding, -1)
    val counts = withShard
      .groupBy(("__shard" +: groupCols).map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__offset", coalesce(sum(col("__n")).over(wOff), lit(0L)))
    val ranked = withShard
      .withColumn("__lrn", row_number().over(wLocal).cast("bigint"))
      .join(broadcast(counts.drop("__n")), "__shard" +: groupCols)
      .withColumn(rnName, col("__lrn") + col("__offset"))
      .drop("__shard", "__lrn", "__offset")
    (ranked, counts)
  }

  /** The ranking-window family — row_number (= rank = dense_rank under a
    * total order), ntile(k), percent_rank, cume_dist, first value — in
    * closed form from `rn` and the per-group size, each group ranked in
    * parallel across shards. Column names follow the window functions;
    * `firstCol` (the `nth_value(…, 1)` analogue) is taken from the
    * group's rank-1 row.
    *
    * percent_rank = (rn−1)/(n−1) and cume_dist = rn/n are exact-integer
    * double divisions — bit-identical to any engine's window evaluation
    * of the same definition (both operands ≤ 2^53). */
  def withRankFamily(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[Column], shardKey: Column, tiles: Int,
      firstCol: String, numShards: Int = -1): DataFrame = {
    val (rn, counts) = rankParts(df, groupCols, orderCols, shardKey, "rn",
      numShards)
    // per-group sizes come from the TINY counts table, not a re-scan of
    // the data
    val totals = counts.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__n")).as("__gn"))
    val firsts = rn.filter(col("rn") === 1L)
      .select((groupCols.map(col) :+ col(firstCol).as("__first")): _*)
    // Spark/DuckDB ntile semantics: q = n div k, r = n mod k; the first
    // r tiles carry q+1 rows, the rest q
    val qi = expr(s"__gn div ${tiles.toLong}")
    val ri = col("__gn") % lit(tiles.toLong)
    val inBig = col("rn") <= ri * (qi + lit(1L))
    val tile = when(qi === 0L, col("rn"))
      .when(inBig, expr(s"(rn - 1) div ((__gn div $tiles) + 1) + 1"))
      .otherwise(ri +
        expr(s"(rn - (__gn % $tiles) * ((__gn div $tiles) + 1) - 1) " +
          s"div (__gn div $tiles) + 1"))
    rn.join(broadcast(totals), groupCols)
      .join(broadcast(firsts), groupCols)
      .withColumn("ntile", tile.cast("bigint"))
      .withColumn("percent_rank",
        when(col("__gn") === 1L, lit(0.0)).otherwise(
          (col("rn") - 1L).cast("double") /
            (col("__gn") - 1L).cast("double")))
      .withColumn("cume_dist",
        col("rn").cast("double") / col("__gn").cast("double"))
      .withColumnRenamed("__first", "first_value")
      .drop("__gn")
  }
}
