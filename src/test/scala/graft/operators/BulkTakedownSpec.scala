package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.{Tables, TestSpark}
import graft.queries.DedupQueries

/** Bulk takedown (r13 verdict "what's wrong" #1): `delete`'s removal
  * batch is caller-supplied and NOT queue-sized — "remove every doc
  * from this domain / license class" arrives as millions of ids at
  * C4 scale. Round 14 ladders the batch side on one exact count at
  * entry ([[DedupIndex.delete]] / [[AnnIndex.delete]]) and the live
  * tombstone side on the manifest's `tomb_rows` accounting, so neither
  * join is ever a bare driver broadcast. This spec pins:
  *  - the ladder picks a non-broadcast strategy above the 32 MB bound
  *    (the plan, directly via sizedHint — the exact seam delete uses)
  *  - a bulk-shaped delete (30 % of the corpus inside a removal batch
  *    of MILLIONS of ids, mostly misses) stays correct on both
  *    artifact kinds: state ≡ rebuild-without after the fold
  *  - `tomb_rows` accounting: accumulates across deletes, resets at
  *    the fold
  */
class BulkTakedownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"bulk_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("sizedHint refuses to broadcast a bulk id batch") {
    // the exact seam both deletes ride: rows x 16 B beyond 32 MB must
    // leave the broadcast tier (2^21 rows = 32 MB at 16 B/row)
    val big = spark.range(3L << 20).select(col("id").as("doc_id"))
    val bulk = DedupQueries.sizedHint(big, 3L << 20, 16L)
    val probe = spark.range(10).select(col("id").as("doc_id"))
    val plan = probe.join(bulk, Seq("doc_id"), "left_semi")
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      s"bulk id side must not broadcast:\n$plan")
    // and the queue-sized case still broadcasts
    val small = DedupQueries.sizedHint(
      spark.range(8).select(col("id").as("doc_id")), 8L, 16L)
    val planSmall = probe.join(small, Seq("doc_id"), "left_semi")
      .queryExecution.sparkPlan.toString
    assert(planSmall.contains("BroadcastHashJoin"),
      s"queue-sized id side must broadcast:\n$planSmall")
  }

  test("dedup artifact: bulk delete (30% corpus, millions-of-ids batch)") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 200)
      .persist()
    val n = docs.count()
    val dir = tmp("dedup")
    DedupIndex.build(docs, dir, n)
    // a domain-shaped bulk batch: every third doc, wrapped in a
    // removal set of 2.5M ids (mostly misses — the realistic shape:
    // the takedown list is derived from an attribute, not membership)
    val victims = docs.select(col("doc_id")).filter(col("doc_id") % 3 === 0)
    val nVictims = victims.count()
    val bulk = victims.unionByName(
      spark.range(10000000L, 12500000L).select(col("id").as("doc_id")))
    assert(DedupIndex.delete(bulk, dir) == nVictims)
    val mf = ArtifactIO.readManifest(spark, dir)
    assert(mf.params("tomb_rows") == nVictims, "exact accounting")
    // a second delete accumulates
    val extra = docs.select(col("doc_id"))
      .filter(col("doc_id") % 3 === 1 && col("doc_id") % 5 === 0)
    val nExtra = extra.count()
    assert(DedupIndex.delete(extra, dir) == nExtra)
    assert(ArtifactIO.readManifest(spark, dir).params("tomb_rows")
      == nVictims + nExtra)
    // readers exclude instantly; fold makes it physical and resets
    DedupIndex.compactDeltas(spark, dir)
    assert(ArtifactIO.readManifest(spark, dir).params("tomb_rows") == 0L)
    val ctlDir = tmp("dedup_ctl")
    val kept = docs.filter(!(col("doc_id") % 3 === 0) &&
      !(col("doc_id") % 3 === 1 && col("doc_id") % 5 === 0))
    DedupIndex.build(kept, ctlDir, n - nVictims - nExtra)
    val (ixDel, ixCtl) =
      (DedupIndex.load(spark, dir), DedupIndex.load(spark, ctlDir))
    assert(rows(ixDel.signatures.select(col("doc_id"))) ==
      rows(ixCtl.signatures.select(col("doc_id"))))
    assert(rows(ixDel.components) == rows(ixCtl.components))
    docs.unpersist()
    spark.catalog.clearCache()
  }

  test("pre-accounting artifact: a delete counts the legacy window once " +
    "instead of leaving tomb_rows unknown (r14 advisor #2)") {
    // an upgraded-in-place artifact has a live tombstone window but NO
    // tomb_rows param; leaving it unknown after a new bulk delete keeps
    // the legacy broadcast for a now millions-of-rows window on every
    // reader. The delete must count the existing window once and commit
    // the exact total. Both artifact kinds.
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 100)
      .persist()
    val n = docs.count()
    val dir = tmp("dedup_legacy")
    DedupIndex.build(docs, dir, n)
    assert(DedupIndex.delete(
      docs.select(col("doc_id")).filter(col("doc_id") % 7 === 0), dir) > 0L)
    val mf = ArtifactIO.readManifest(spark, dir)
    val firstWindow = mf.params("tomb_rows")
    assert(firstWindow > 0L)
    // simulate the pre-accounting manifest: strip tomb_rows, keep the
    // live window
    ArtifactIO.writeManifest(spark, dir,
      mf.copy(params = mf.params - "tomb_rows"))
    val extra = docs.select(col("doc_id")).filter(col("doc_id") % 7 === 1)
    val nExtra = extra.count()
    assert(DedupIndex.delete(extra, dir) == nExtra)
    assert(ArtifactIO.readManifest(spark, dir).params("tomb_rows")
      == firstWindow + nExtra,
      "the legacy window must be counted once, not left unknown")

    val emb = Tables.embeddings(spark, sf).filter(col("vec_id") < 200)
      .persist()
    val nv = emb.count()
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val adir = tmp("ivfpq_legacy")
    AnnIndex.buildIvfPq(emb, adir, dim, nHint = nv)
    assert(AnnIndex.delete(
      emb.select(col("vec_id")).filter(col("vec_id") % 7 === 0), adir) > 0L)
    val amf = AnnIndex.readManifest(spark, adir)
    val aFirst = amf.params("tomb_rows")
    assert(aFirst > 0L)
    ArtifactIO.writeManifest(spark, adir,
      amf.copy(params = amf.params - "tomb_rows"))
    val aExtra = emb.select(col("vec_id")).filter(col("vec_id") % 7 === 1)
    val nAExtra = aExtra.count()
    assert(AnnIndex.delete(aExtra, adir) == nAExtra)
    assert(AnnIndex.readManifest(spark, adir).params("tomb_rows")
      == aFirst + nAExtra)
    docs.unpersist(); emb.unpersist()
    spark.catalog.clearCache()
  }

  test("ann artifact: bulk delete on ivfpq, fold = pre-delete filtered") {
    val emb = Tables.embeddings(spark, sf).filter(col("vec_id") < 300)
      .persist()
    val n = emb.count()
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val dir = tmp("ivfpq")
    AnnIndex.buildIvfPq(emb, dir, dim, nHint = n)
    val preCodes = rows(AnnIndex.loadIvfPq(spark, dir).codes)
    val victims = emb.select(col("vec_id")).filter(col("vec_id") % 3 === 0)
    val nVictims = victims.count()
    val bulk = victims.unionByName(
      spark.range(10000000L, 12500000L).select(col("id").as("vec_id")))
    assert(AnnIndex.delete(bulk, dir) == nVictims)
    assert(AnnIndex.readManifest(spark, dir).params("tomb_rows") == nVictims)
    // fold resets the accounting and drops the rows physically; the
    // frozen-quantizer identity: folded codes = pre-delete codes with
    // the victims' rows filtered out (the FlatTombstoneFoldSpec
    // contract at bulk shape)
    AnnIndex.compactIvfPqDeltas(spark, dir)
    assert(AnnIndex.readManifest(spark, dir).params("tomb_rows") == 0L)
    val victimSet = victims.collect().map(_.getLong(0)).toSet
    val expect = preCodes.filterNot { r =>
      victimSet.exists(v => r.startsWith(s"[$v,"))
    }
    assert(rows(AnnIndex.loadIvfPq(spark, dir).codes) == expect)
    emb.unpersist()
    spark.catalog.clearCache()
  }
}
