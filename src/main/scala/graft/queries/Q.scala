package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: the Spark implementation plus (where the
  * semantics are SQL-expressible) an equivalent DuckDB oracle statement the
  * driver replays over the same parquet tables.
  *
  * Determinism contract (how hash-equality with the oracle is achieved):
  *  - money/double aggregates are computed as
  *    `CAST(SUM(CAST(x AS DECIMAL)) AS DOUBLE)` in BOTH engines — decimal
  *    addition is exact and order-independent, and the final decimal→double
  *    conversion is correctly rounded IEEE in both, so results are
  *    bit-identical regardless of partition/summation order;
  *  - every ORDER-dependent output (top-k, row_number) carries a unique
  *    tie-break key;
  *  - ns timestamps stay int64 end-to-end (`epoch_ns` on the DuckDB side).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = true)

object Q {
  /** Exact-sum of a money-ish double column: decimal(25,scale) is wide
    * enough that 1e12 rows of 1e9-scale values cannot overflow. */
  def moneySum(sqlExpr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($sqlExpr AS DECIMAL(25,$scale))) AS DOUBLE)"
}
