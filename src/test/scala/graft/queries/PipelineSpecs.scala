package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, Tables, TestSpark}
import graft.operators.TextOps

/** Semantic invariants of the training-pipeline family that the value
  * hash-compare can't express, plus the plan shapes their scale story
  * depends on.
  */
class PipelineSpecs extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q45 packing: token-count preserved, bins contiguous, starts within budget") {
    val budget = 2048L
    val bins = SparkEntry.queries("q45_sequence_pack")(spark, sf).collect()
    val totalPacked = bins.map(_.getLong(3)).sum // bin_tokens
    val totalTokens = Tables.documents(spark, sf)
      .select(size(TextOps.tokens(col("text"))).cast("bigint").as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    assert(totalPacked == totalTokens, "packing must not drop or double tokens")
    // bins per language are 0..maxBin contiguous (next-fit never skips)
    bins.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.head == 0L && ids.last == ids.length - 1L,
        s"$lang bins not contiguous: ${ids.mkString(",")}")
    }
    // every bin's STARTING offset is inside its budget slot: all but the
    // last bin of a language span at least to the next boundary
    bins.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      val byBin = rows.sortBy(_.getLong(1))
      val cums = byBin.map(_.getLong(3)).scanLeft(0L)(_ + _)
      byBin.zip(cums).foreach { case (r, startOffset) =>
        assert(startOffset / budget == r.getLong(1),
          s"$lang bin ${r.getLong(1)} starts at offset $startOffset")
      }
    }
  }

  test("d8 contamination: hits are real shared shingles, holdout excluded") {
    val hits = SparkEntry.queries("d8_contamination")(spark, sf).collect()
    assert(hits.nonEmpty, "fixture should contain contaminated docs at n=3")
    assert(hits.forall(_.getLong(0) % 97 != 0), "holdout docs must not self-report")
    // spot-verify one hit by recomputing its shingle intersection exactly
    val docId = hits.head.getLong(0)
    val nShared = hits.head.getLong(1)
    val docs = Tables.documents(spark, sf)
    val evalGrams = docs.filter(col("doc_id") % 97 === 0)
      .select(explode(TextOps.shingles(col("text"))).as("g"))
      .distinct().collect().map(_.getString(0)).toSet
    val docGrams = docs.filter(col("doc_id") === docId)
      .select(explode(TextOps.shingles(col("text"))).as("g"))
      .collect().map(_.getString(0)).toSet
    assert((docGrams & evalGrams).size.toLong == nShared)
  }

  test("t6 repetition fractions are in [0,1] and consistent with counts") {
    val rows = SparkEntry.queries("t6_repetition")(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (nTok, topN) = (r.getLong(1), r.getLong(2))
      val (topFrac, dupFrac) = (r.getDouble(3), r.getDouble(4))
      assert(topN >= 1 && topN <= nTok)
      assert(topFrac == topN.toDouble / nTok.toDouble)
      assert(dupFrac >= 0.0 && dupFrac < 1.0)
    }
  }

  test("d8's eval side broadcasts; q44's sample filter reaches the scan stage") {
    val d8 = SparkEntry.queries("d8_contamination")(spark, sf)
    d8.collect()
    assert(d8.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "holdout side must broadcast, not shuffle the corpus")
    val q44 = SparkEntry.queries("q44_stratified_sample")(spark, sf)
    q44.collect()
    val p = q44.queryExecution.executedPlan.toString
    // the hash-split predicate is not parquet-pushable (md5), but it must
    // run pre-shuffle: a Filter inside the scan stage, no join, one agg
    assert(p.contains("Filter") && !p.contains("Join"), p.take(600))
  }
}
