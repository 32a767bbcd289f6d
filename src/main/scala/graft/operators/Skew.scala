package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot-key aggregations and joins.
  *
  * At 100 TB a handful of keys (one pathological user_id, one empty-string
  * token) can hold a whole stage hostage. AQE's skew-join splitting covers
  * sort-merge joins at runtime (enabled in [[graft.Sessions]]); these
  * helpers cover the aggregation side, where Spark's partial aggregation
  * already absorbs most skew EXCEPT for high-cardinality-payload aggs
  * (collect_list/distinct counts), which genuinely need two phases.
  */
object Skew {

  /** Add a deterministic salt column 0..buckets-1 derived from stable row
    * content (no rand(): re-runs and retries stay deterministic). */
  def withSalt(df: DataFrame, from: Column, buckets: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(from), lit(buckets)))

  /** Two-phase skew-proof distinct count per key: phase 1 dedups
    * (key, value) within (key, salt) partitions, phase 2 merges exact
    * partial distincts. Equivalent to countDistinct but the heaviest key
    * fans out over `buckets` reducers in phase 1. */
  def skewedCountDistinct(
      df: DataFrame, key: Column, value: Column, buckets: Int = 16): DataFrame =
    withSalt(df, value, buckets)
      .groupBy(key.as("k"), col("__salt"))
      .agg(countDistinct(value).as("partial"))
      .groupBy(col("k"))
      .agg(sum(col("partial")).as("n_distinct"))
  // NOTE: exact because value-hash salting co-locates equal values: a
  // value lands in exactly one (key, salt) bucket, so partial distinct
  // counts are disjoint and sum exactly.

  /** Two-phase skew-proof sum: salted partial sums then final merge.
    * For long/decimal inputs this is exactly associative. */
  def skewedSum(
      df: DataFrame, key: Column, value: Column, buckets: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(key, value), lit(buckets)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(sum(value).as("partial"))
      .groupBy(col("k"))
      .agg(sum(col("partial")).as("total"))
}
