package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

/** d14's bucketed query-set configuration (r14 verdict #8): SemDeDup
  * with only the qPerCell lowest-id members per cell as witnesses —
  * n·qPerCell candidate cosines instead of the exact config's
  * quadratic within-cell pairs. Pinned: with qPerCell covering the
  * largest cell the result EQUALS exact d14 (same rows, same
  * dup_of); with a small qPerCell it is a SUBSET whose witnesses all
  * come from the query set. */
class SemDeDupBucketedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("qPerCell covering the largest cell reproduces exact d14") {
    val emb = Tables.embeddings(spark, sf)
    val n = Tables.embeddingsRows(spark, sf)
    val exact = SimilarityQueries.semanticDedupOn(emb, 16, 0.45,
      nHint = n)
    val covered = SimilarityQueries.semanticDedupBucketedOn(emb, 16,
      qPerCell = n.toInt, threshold = 0.45, nHint = n)
    assert(rows(covered) == rows(exact),
      "full-coverage bucketing must equal the exact configuration")
    spark.catalog.clearCache()
  }

  test("small qPerCell yields a subset with query-set witnesses") {
    val emb = Tables.embeddings(spark, sf)
    val n = Tables.embeddingsRows(spark, sf)
    // threshold 0.3 so the gate corpus yields a dense dup set (161
    // exact rows) — small-Q subsets are then non-trivially populated
    val exact = SimilarityQueries.semanticDedupOn(emb, 16, 0.3,
      nHint = n).persist()
    val sampled = SimilarityQueries.semanticDedupBucketedOn(emb, 16,
      qPerCell = 8, threshold = 0.3, nHint = n).persist()
    try {
      assert(sampled.count() > 0, "the gate corpus has planted dups")
      // every flagged vector is flagged by the exact config too
      assert(sampled.join(exact, Seq("vec_id"), "left_anti").isEmpty,
        "bucketed dups must be a subset of the exact dup set")
      // the witness is never earlier than the exact config's (min over
      // a subset of the witness candidates)
      val joined = sampled.select(col("vec_id"), col("dup_of"))
        .join(exact.select(col("vec_id"),
          col("dup_of").as("exact_dup")), Seq("vec_id"))
      assert(joined.filter(col("dup_of") < col("exact_dup")).isEmpty,
        "a query-set witness cannot beat the exact minimum")
    } finally { exact.unpersist(); sampled.unpersist() }
    spark.catalog.clearCache()
  }
}
