package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.Encoders

/** Input row for [[TopKAgg]]: a sortable score plus a unique tie-break id. */
final case class ScoredRow(score: Double, id: Long)

/** Aggregation buffer / output — a Product wrapper so `Encoders.product`
  * yields a columnar (non-kryo) encoder for the Seq payload. */
final case class TopKRows(rows: Seq[ScoredRow])

/** Exact per-group top-k as a typed `Aggregator` (SURVEY.md §2D "UDF/UDAF"
  * row). The scale rationale vs the window-function formulation
  * (`row_number() OVER (...) <= k`, q6_window_topn):
  *
  *  - the window form shuffles EVERY row of the group to one partition and
  *    sorts it — per-group data volume on one task is unbounded;
  *  - this aggregator participates in partial aggregation (map-side
  *    combine): each input partition reduces to at most k rows per group
  *    before the exchange, so shuffle volume is `groups × k` regardless of
  *    input size, and per-task state is O(k).
  *
  * At 100 TB with heavy-hitter groups the window form stalls on the
  * biggest group's sort; this form cannot — the same reason `TopK` shows
  * up as a native partial aggregate in every serious OLAP engine.
  *
  * Determinism: ordering is (score DESC, id ASC); `id` must be unique
  * within the group for a well-defined result set.
  */
final class TopKAgg(k: Int)
    extends Aggregator[ScoredRow, TopKRows, TopKRows] {

  private def trim(rows: Seq[ScoredRow]): Seq[ScoredRow] =
    rows.sortBy(r => (-r.score, r.id)).take(k)

  override def zero: TopKRows = TopKRows(Vector.empty)

  override def reduce(b: TopKRows, a: ScoredRow): TopKRows =
    // cheap accept test avoids the sort for the common reject path
    if (b.rows.length < k || a.score > b.rows.last.score ||
      (a.score == b.rows.last.score && a.id < b.rows.last.id))
      TopKRows(trim(b.rows :+ a))
    else b

  override def merge(x: TopKRows, y: TopKRows): TopKRows =
    TopKRows(trim(x.rows ++ y.rows))

  override def finish(b: TopKRows): TopKRows = TopKRows(trim(b.rows))

  override def bufferEncoder = Encoders.product[TopKRows]
  override def outputEncoder = Encoders.product[TopKRows]
}

object TopKAgg {
  /** Column-callable form: `topK(3)(col("score"), col("id"))`. */
  def topK(k: Int): UserDefinedFunction =
    udaf(new TopKAgg(k), Encoders.product[ScoredRow])
}
