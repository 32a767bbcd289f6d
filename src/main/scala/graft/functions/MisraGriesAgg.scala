package graft.functions

import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.Encoders

/** Misra–Gries frequency summary: `counters` holds at most k tokens. */
final case class MgSummary(counters: Map[String, Long])

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` — the
  * frequency sibling of the cardinality (q19 HLL) and quantile (q34
  * t-digest) sketches: O(k) state per group, partial-aggregatable
  * (map-side combine reduces every input partition to ≤ k counters
  * before the exchange), so finding every token with frequency > n/(k+1)
  * over 100 TB costs one k-sized summary per partition instead of a
  * full token group-by.
  *
  * The MERGE rule is the Agarwal et al. ("Mergeable Summaries", PODS'12)
  * reduction: sum counters pairwise, then subtract the (k+1)-th largest
  * count from all and drop the non-positives — the result is again a
  * valid MG summary of the union stream.
  *
  * Guarantees (hold for ANY arrival and merge order, which is what the
  * q50 gate's booleans check): for every token,
  *   est ≤ true_count        and        true_count − est ≤ n / (k+1)
  * (est = 0 when absent), so every token with true_count > n/(k+1) is
  * guaranteed present. The counter CONTENT beyond that is order-
  * dependent — only the guaranteed properties are gate-able, never the
  * raw counter values.
  */
final class MisraGriesAgg(k: Int)
    extends Aggregator[String, MgSummary, MgSummary] {
  require(k >= 1, s"Misra-Gries needs k >= 1, got $k")

  override def zero: MgSummary = MgSummary(Map.empty)

  override def reduce(b: MgSummary, t: String): MgSummary = {
    val m = b.counters
    m.get(t) match {
      case Some(c) => MgSummary(m.updated(t, c + 1L))
      case None if m.size < k => MgSummary(m.updated(t, 1L))
      case None =>
        // decrement-all: the O(k) path runs at most once per k arrivals
        MgSummary(m.iterator.collect {
          case (tok, c) if c > 1L => tok -> (c - 1L)
        }.toMap)
    }
  }

  override def merge(x: MgSummary, y: MgSummary): MgSummary = {
    val combined = y.counters.foldLeft(x.counters) { case (m, (tok, c)) =>
      m.updated(tok, m.getOrElse(tok, 0L) + c)
    }
    if (combined.size <= k) MgSummary(combined)
    else {
      // subtract the (k+1)-th largest count, keep the strict positives
      val kth = combined.valuesIterator.toArray.sortBy(-_).apply(k)
      MgSummary(combined.iterator.collect {
        case (tok, c) if c > kth => tok -> (c - kth)
      }.toMap)
    }
  }

  override def finish(b: MgSummary): MgSummary = b

  override def bufferEncoder = Encoders.product[MgSummary]
  override def outputEncoder = Encoders.product[MgSummary]
}

object MisraGriesAgg {
  /** Column-callable form: `heavyHitters(64)(col("token"))`. */
  def heavyHitters(k: Int): UserDefinedFunction =
    udaf(new MisraGriesAgg(k), Encoders.STRING)
}
