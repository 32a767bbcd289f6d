package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** events with the timestamp surfaced as a LongType `ts_ns` column
    * (int64 epoch-nanoseconds — the reference's data model,
    * kompactor.ts:107 / README.md:95-97 — kept as the internal contract
    * so every downstream query is encoding-agnostic).
    *
    * The loader adapts to whatever encoding the corpus actually carries:
    *  - parquet timestamp[ns]: read as LongType ns directly via
    *    spark.sql.legacy.parquet.nanosAsLong=true (no precision loss);
    *  - parquet timestamp[us] (TIMESTAMP / TIMESTAMP_NTZ): derive
    *    ts_ns = unix_micros(ts) * 1000. The NTZ naive value is
    *    interpreted under the UTC session TZ (Sessions.scala), which is
    *    exactly DuckDB's epoch_us semantics for the same column, so the
    *    oracle comparison stays byte-stable;
    *  - int64: pass through (already ns).
    * Column position is preserved so downstream selects-by-order and the
    * compactor's schema contract are unaffected. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    val tsNs = raw.schema("ts").dataType match {
      case LongType => col("ts")
      case TimestampNTZType | TimestampType =>
        unix_micros(col("ts").cast(TimestampType)) * lit(1000L)
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected int64 ns or timestamp")
    }
    raw.select(raw.schema.fieldNames.map {
      case "ts" => tsNs.as("ts_ns")
      case c    => col(c)
    }.toSeq: _*)
  }
}
