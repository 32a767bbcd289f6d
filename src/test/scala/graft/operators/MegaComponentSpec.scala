package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.{Tables, TestSpark}

/** Takedown against a MEGA-component (r12 verdict "what's wrong" #1):
  * C4-scale corpora produce boilerplate clusters holding large corpus
  * fractions, and [[DedupIndex.delete]]'s component re-solve pulls the
  * WHOLE touched component's membership into its joins. Those joins
  * now ride the sizedHint ladder on exact counts (broadcast only when
  * genuinely small — never a bare `broadcast()` of an unbounded
  * membership that OOMs the driver at 100× scale). This spec plants a
  * component holding >half the corpus and pins the takedown lifecycle
  * on that shape: delete commits, every consumer excludes instantly,
  * and delete-then-compact ≡ rebuild-without stays a state identity.
  */
class MegaComponentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"mega_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def ids(xs: Seq[Long], c: String): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    xs.toDF(c)
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("takedown inside a component holding >half the corpus") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 100)
    // 150 planted members sharing doc 0's text (tail-salted so texts
    // differ but J stays ≳0.9): ONE near-dup component of 151 docs in
    // a 250-doc corpus — the membership the re-solve must not assume
    // broadcast-small
    val t0 = docs.filter(col("doc_id") === 0L).drop("doc_id")
    val planted = t0.crossJoin(ids((0 until 150)
        .map(i => 5000000L + i), "doc_id"))
      .withColumn("text", concat(col("text"), lit(" mega"),
        (col("doc_id") % 3).cast("string")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select(docs.columns.map(col).toIndexedSeq: _*)
    val all = docs.unionByName(planted).persist()
    val n = all.count()
    val dir = tmp("ix")
    DedupIndex.build(all, dir, n)
    // sanity: the planted cluster really is one mega-component
    val comp0 = DedupIndex.load(spark, dir).components
    val biggest = comp0.groupBy(col("component")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(biggest > n / 2,
      s"planted component must span >half the corpus (got $biggest of $n)")
    // remove one mid-cluster member + the cluster's min-id doc (forces
    // a relabel of the entire mega-membership through the re-solve)
    val removeSeq = Seq(0L, 5000077L)
    assert(DedupIndex.delete(ids(removeSeq, "doc_id"), dir)
      == removeSeq.size)
    val ctlDir = tmp("ctl")
    val kept = all.filter(!col("doc_id").isInCollection(removeSeq))
    DedupIndex.build(kept, ctlDir, n - removeSeq.size)
    val (ixDel, ixCtl) = (DedupIndex.load(spark, dir),
      DedupIndex.load(spark, ctlDir))
    assert(rows(ixDel.components) == rows(ixCtl.components),
      "post-delete components must equal rebuild-without, mega-shape included")
    assert(rows(ixDel.pairs) == rows(ixCtl.pairs))
    // physical fold keeps the identity
    DedupIndex.compactDeltas(spark, dir)
    val ixPost = DedupIndex.load(spark, dir)
    assert(rows(ixPost.components) == rows(ixCtl.components))
    assert(rows(ixPost.signatures.select(col("doc_id"))) ==
      rows(ixCtl.signatures.select(col("doc_id"))))
    all.unpersist()
    spark.catalog.clearCache()
  }
}
