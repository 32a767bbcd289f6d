package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for shuffle-free (co-located) joins and
  * aggregations — SURVEY.md §2D "joins" scale path.
  *
  * At 100 TB the dominant cost of a fact-fact join is the shuffle of both
  * sides. Writing each side bucketed (`bucketBy(n, key)` + `sortBy(key)`)
  * moves that exchange to WRITE time, once; every later join or groupBy on
  * the bucket key then runs with zero exchange (and with `sortBy`, zero
  * sort) — Spark's bucketing-aware scan emits the `HashPartitioning`
  * that SortMergeJoin needs. The win compounds: one pre-bucketed layout
  * serves every downstream query keyed on it.
  *
  * Buckets must agree on count and key across the joined tables
  * (`spark.sql.sources.bucketing.enabled` is on by default).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table backed by `path`. */
  def writeBucketed(
      df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on the bucket key — plans with no
    * shuffle exchange on either side. */
  def colocatedJoin(
      spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** True if the executed plan contains a shuffle exchange (test probe). */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
