package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver test corpus (TESTDATA.md): one parquet per table
  * under an sf dir. Column pruning + predicate pushdown happen at the scan
  * because we return the raw DataFrame and let Catalyst prune.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** The driver corpus's fixed embedding width (every SF ships
    * 64-float vectors). Passed to the LSH builders so planning needs no
    * `head()` probe job; the parquet list type itself carries no length. */
  val EmbeddingDim = 64

  /** events with the ns timestamp surfaced as a LongType `ts_ns` column.
    * The parquet physical type is timestamp[ns]; with
    * spark.sql.legacy.parquet.nanosAsLong=true Spark reads it as LongType
    * directly (no precision loss — see SURVEY.md §1.1). */
  def events(s: SparkSession, d: String): DataFrame =
    apply(s, d, "events").withColumnRenamed("ts", "ts_ns")
}
