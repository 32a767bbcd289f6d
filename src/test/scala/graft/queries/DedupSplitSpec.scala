package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** q56's whole reason to exist: NO near-dup cluster may straddle a
  * split — verified doc-by-doc on the gate corpus (not just by
  * construction), and contrasted with the per-doc hash rule q44-style
  * splits use, which DOES leak on this corpus's clusters.
  */
class DedupSplitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("no component straddles a split; per-doc hashing would leak") {
    val docs = Tables.documents(spark, sf)
    val comp = graft.operators.Components.connectedComponents(
      DedupQueries.jaccardPairs(docs, Tables.documentsRows(spark, sf))
        .select(col("doc_a"), col("doc_b")))
    val withComp = docs.select(col("doc_id"))
      .join(comp, docs("doc_id") === comp("id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
    def splitOf(c: org.apache.spark.sql.Column) = {
      val h = graft.functions.XHash.hash60(c.cast("string")) % 1000L
      when(h < 800L, "train").when(h < 900L, "val").otherwise("test")
    }
    val assigned = withComp
      .withColumn("split", splitOf(col("component")))
      .withColumn("leaky_split", splitOf(col("doc_id")))
      .cache()
    try {
      // q56's rule: every multi-doc component lives in exactly one split
      val straddlers = assigned.groupBy(col("component"))
        .agg(countDistinct(col("split")).as("ns"), count(lit(1)).as("n"))
        .filter(col("ns") > 1)
      assert(straddlers.isEmpty, "component-keyed split leaked a cluster")
      // the per-doc rule leaks on this very corpus: at least one
      // multi-doc cluster gets two different per-doc splits
      val leaky = assigned.groupBy(col("component"))
        .agg(countDistinct(col("leaky_split")).as("ns"), count(lit(1)).as("n"))
        .filter(col("n") > 1 && col("ns") > 1)
      assert(!leaky.isEmpty,
        "expected the per-doc hash rule to straddle at least one cluster " +
          "(otherwise this gate proves nothing on this corpus)")
    } finally { assigned.unpersist(); spark.catalog.clearCache() }
  }
}
