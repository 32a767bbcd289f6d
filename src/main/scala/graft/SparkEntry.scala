package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is declared here as a named
  * query; where the semantics are SQL-expressible the matching DuckDB oracle
  * statement is in [[oracleSql]] (same column names — the driver's compare
  * sorts columns by name before hashing).
  */
object SparkEntry {

  /** All registered query groups (grows per SURVEY §7 build order). */
  private def registry: Seq[Q] =
    CoreQueries.all ++ AdvancedQueries.all ++ TimeSeriesQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ TextQueries.all ++
      MultimodalQueries.all ++ PipelineQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.find(_.name == "q3_segment_revenue").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Queries included in the Bench headline timing. */
  def benchQueries: Seq[String] = registry.filter(_.bench).map(_.name)
}
