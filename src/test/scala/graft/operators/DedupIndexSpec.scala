package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import graft.{SparkEntry, Tables, TestSpark}
import graft.queries.DedupQueries

/** Dedup-pipeline artifact contract (r9 verdict #3, the AnnIndexSpec
  * pattern): every consumer of the LOADED artifact returns byte-identical
  * rows to the inline gate query that rebuilds the pipeline per call —
  * build once, consume many, lose nothing. Incremental append (d16's
  * bipartite shape) must equal the one-shot build on the union corpus —
  * signatures, pairs AND merged components — and the mutation protocol
  * inherits the AnnIndex crash-safety (reader isolation + convergent
  * retry + durable replay guard).
  */
class DedupIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sf)
  private lazy val n = Tables.documentsRows(spark, sf)

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"dedupix_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def gate(name: String): Seq[String] = {
    val out = rows(SparkEntry.queries(name)(spark, sf))
    spark.catalog.clearCache()
    out
  }

  test("loaded tables == the inline pipeline (signatures, pairs, components)") {
    val dir = tmp("build")
    val mf = DedupIndex.build(docs, dir, n)
    assert(mf.n == n && mf.params("comp_versions") == 1L)
    val ix = DedupIndex.load(spark, dir)
    assert(ix.manifest == mf)
    val inlineSigs = rows(DedupQueries.minhashSigArr(docs)
      .select(col("doc_id"), concat_ws(",", col("sig")).as("s")))
    assert(rows(ix.signatures
      .select(col("doc_id"), concat_ws(",", col("sig")).as("s"))) == inlineSigs)
    // stored band rows == the band derivation the probe joins would
    // otherwise recompute per call
    assert(rows(ix.bands) == rows(DedupQueries
      .sigBandRows(DedupQueries.minhashSigArr(docs)).drop("sig")
      .select(col("doc_id"), col("band_idx"), col("band_val"))))
    // stored shingle sets == the d11 hashed verify-set representation
    assert(rows(ix.shingleSets
        .select(col("doc_id"), concat_ws(",", col("hs")).as("h")))
      == rows(DedupQueries.hashedShingleSets(docs)
        .select(col("doc_id"), concat_ws(",", col("hs")).as("h"))))
    // stored postings == the shingle sets exploded (the inverted form)
    assert(rows(ix.postings) == rows(DedupQueries.hashedShingleSets(docs)
      .select(explode(col("hs")).as("h"), col("doc_id"))))
    val inlinePairs = rows(DedupQueries.jaccardPairs(docs, n))
    spark.catalog.clearCache()
    assert(rows(ix.pairs).nonEmpty && rows(ix.pairs) == inlinePairs)
    assert(rows(ix.components) == gate("d7_components"))
  }

  test("consumers from the loaded artifact == the inline gate queries (q56/d10/p1/p3)") {
    val dir = tmp("consume")
    DedupIndex.build(docs, dir, n)
    val ix = DedupIndex.load(spark, dir)
    assert(rows(DedupIndex.splitFrom(docs, ix)) == gate("q56_dedup_split"))
    assert(rows(DedupIndex.keepBestFrom(docs, ix, n)) == gate("d10_keep_best"))
    val pr = DedupIndex.pageRankFrom(ix)
    val prRows = rows(pr)
    pr.unpersist()
    assert(prRows == gate("p1_pagerank"))
    val lp = DedupIndex.labelPropFrom(ix)
    val lpRows = rows(lp)
    lp.unpersist()
    assert(lpRows == gate("p3_label_prop"))
    spark.catalog.clearCache()
  }

  test("incremental append == one-shot build: signatures, pairs, merged components") {
    // the d16 split: increment = every 10th doc, corpus = the rest —
    // cross-cluster duplicates exist on both sides of the cut
    val inc = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val dirInc = tmp("inc")
    DedupIndex.build(corpus, dirInc, -1L)
    val nNew = DedupIndex.append(inc, dirInc)
    assert(nNew > 0, "the fixture has cross-cut near-dups")
    val a = DedupIndex.load(spark, dirInc)
    val dirOne = tmp("oneshot")
    DedupIndex.build(docs, dirOne, n)
    val b = DedupIndex.load(spark, dirOne)
    assert(a.manifest.n == n)
    assert(rows(a.signatures.select(col("doc_id"),
        concat_ws(",", col("sig")).as("s")))
      == rows(b.signatures.select(col("doc_id"),
        concat_ws(",", col("sig")).as("s"))))
    assert(rows(a.bands) == rows(b.bands),
      "incremental band table must equal the one-shot build")
    assert(rows(a.shingleSets.select(col("doc_id"),
        concat_ws(",", col("hs")).as("h")))
      == rows(b.shingleSets.select(col("doc_id"),
        concat_ws(",", col("hs")).as("h"))),
      "incremental shingle-set table must equal the one-shot build")
    assert(rows(a.postings) == rows(b.postings),
      "incremental posting table must equal the one-shot build")
    assert(rows(a.pairs) == rows(b.pairs),
      "incremental pair set must equal the one-shot build")
    assert(rows(a.components) == rows(b.components),
      "merged components must equal the one-shot solve")
    spark.catalog.clearCache()
  }

  test("read-only serve == the d16 cross-dedup operator; artifact untouched") {
    val inc = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val dir = tmp("serve")
    DedupIndex.build(corpus, dir, -1L)
    val before = Files.readAllBytes(Paths.get(dir, "manifest.json")).toSeq
    val ix = DedupIndex.load(spark, dir)
    val served = rows(DedupIndex.serveNearDups(inc, ix))
    val d16 = rows(DedupQueries.crossNearDups(inc, corpus))
    assert(served.nonEmpty && served == d16,
      "serve must equal the oracle-gated d16 operator on the same inputs")
    assert(Files.readAllBytes(Paths.get(dir, "manifest.json")).toSeq == before,
      "read-only serve must not mutate the artifact")
    spark.catalog.clearCache()
  }

  test("crash between staged writes and manifest commit: invisible, retry converges") {
    val inc = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val dir = tmp("crash")
    DedupIndex.build(corpus, dir, -1L)
    val preAppend = Files.readAllBytes(Paths.get(dir, "manifest.json"))
    val basePairs = rows(DedupIndex.load(spark, dir).pairs)
    // full append, then revert the manifest — the on-disk state of a
    // crash after every staged write and before the commit
    DedupIndex.append(inc, dir)
    Files.write(Paths.get(dir, "manifest.json"), preAppend)
    Files.deleteIfExists(Paths.get(dir, ".manifest.json.crc"))
    val crashed = DedupIndex.load(spark, dir)
    assert(rows(crashed.pairs) == basePairs,
      "a reader must never see uncommitted deltas")
    assert(crashed.manifest.params("comp_versions") == 1L)
    // retry converges to the exact no-crash state
    DedupIndex.append(inc, dir)
    val healed = DedupIndex.load(spark, dir)
    val dirOne = tmp("crash_ctl")
    DedupIndex.build(docs, dirOne, n)
    assert(rows(healed.pairs) == rows(DedupIndex.load(spark, dirOne).pairs))
    assert(rows(healed.components)
      == rows(DedupIndex.load(spark, dirOne).components))
    spark.catalog.clearCache()
  }

  test("streaming replay guard: an applied batchId is a durable no-op") {
    val inc = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val dir = tmp("replay")
    DedupIndex.build(corpus, dir, -1L)
    assert(DedupIndex.append(inc, dir, batchId = 0L) > 0)
    val once = rows(DedupIndex.load(spark, dir).pairs)
    val nOnce = DedupIndex.load(spark, dir).manifest.n
    assert(DedupIndex.append(inc, dir, batchId = 0L) == 0L)
    val after = DedupIndex.load(spark, dir)
    assert(rows(after.pairs) == once && after.manifest.n == nOnce,
      "replayed batch must not duplicate pairs or over-count n")
    spark.catalog.clearCache()
  }
}
