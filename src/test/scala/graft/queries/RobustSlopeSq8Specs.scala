package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** ts13: the distributed rolling slope-median must equal a
  * single-threaded replay, and a glitch sample that wrecks the raw
  * derivative must leave the median slope untouched. */
class RobustSlopeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def replay(rows: Seq[(Long, Long, Long, Long)],
      window: Int): Map[(Long, Long), Option[Double]] =
    rows.groupBy(_._1).flatMap { case (k, rs) =>
      val o = rs.sortBy(r => (r._3, r._2))
      val slopes = o.indices.map { i =>
        if (i == 0 || o(i)._3 == o(i - 1)._3) None
        else Some((o(i)._4 - o(i - 1)._4).toDouble * 1000000.0 /
          (o(i)._3 - o(i - 1)._3).toDouble)
      }
      o.indices.map { i =>
        val frame = slopes.slice(math.max(0, i - window + 1), i + 1)
          .flatten.sorted
        (k, o(i)._2) ->
          (if (frame.isEmpty) None else Some(frame((frame.length + 1) / 2 - 1)))
      }
    }

  test("matches the replay; first-of-key rows are NULL") {
    val rows = Seq[(Long, Long, Long, Long)](
      (1L, 1L, 1000L, 100L), (1L, 2L, 2000L, 140L), (1L, 3L, 2500L, 130L),
      (1L, 4L, 4000L, 220L), (1L, 5L, 5000L, 200L), (1L, 6L, 7000L, 300L),
      (2L, 7L, 1000L, 50L))
    val got = TimeSeriesQueries.robustSlopeOn(
      rows.toDF("k", "id", "ts", "v"), "k", "id", "ts", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got == replay(rows, 7))
    assert(got((2L, 7L)).isEmpty, "single-row key has no slope yet")
  }

  test("a glitch sample corrupts two raw slopes but not the median") {
    // steady +10/step at 1000-unit spacing, one wild spike mid-series
    val rows = (1L to 12L).map(i =>
      (1L, i, i * 1000L, if (i == 6L) 100000L else i * 10L))
    val out = TimeSeriesQueries.robustSlopeOn(
      rows.toDF("k", "id", "ts", "v"), "k", "id", "ts", "v")
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val steady = 10.0 * 1000000.0 / 1000.0
    // from id 9 the 7-slope frame holds the two glitch slopes plus five
    // steady ones: the median stays exactly the steady rate
    (9L to 12L).foreach { id =>
      assert(out(id).contains(steady), s"id=$id got ${out(id)}")
    }
  }
}

/** s8: reconstruction error is bounded by one code step per dimension,
  * and the rerank recovers the exact top-1 on separated data. */
class Sq8Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact top-1 recovered on the corpus queries; ranks are 1..k") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val sq = SimilarityQueries.sqTopK(emb)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    // exact MIPS over the same 8 queries is the ground truth
    val exact = SimilarityQueries.mipsTopK(emb, nQueries = 8, topK = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (q, bestN) =>
      assert(sq((q, 1L)) == bestN,
        s"query $q: SQ8 rerank should recover exact top-1 $bestN")
    }
  }

  test("SQ8 reconstruction is within one code step per dimension") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val e = emb.select(col("vec_id"),
      graft.operators.TextOps.quantize(col("embedding")).as("q"))
    val st = e.select(posexplode(col("q")).as(Seq("i", "v")))
      .groupBy("i").agg(min(col("v")).as("mn"),
        greatest(max(col("v")) - min(col("v")), lit(1L)).as("sp"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val rows = e.select(posexplode(col("q")).as(Seq("i", "v")))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    rows.foreach { case (i, v) =>
      val (mn, sp) = st(i)
      val code = (v - mn) * 255L / sp
      val recon = mn + code * sp / 255L
      assert(code >= 0 && code <= 255, s"dim $i code $code")
      assert(math.abs(recon - v) <= sp / 255L + 1,
        s"dim $i: |$recon - $v| beyond one step of span $sp")
    }
  }
}
