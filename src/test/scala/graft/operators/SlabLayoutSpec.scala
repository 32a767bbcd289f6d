package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}
import graft.queries.DedupQueries

/** Posting/band slab layout (r11 verdict #3): compaction writes the two
  * probe-joined slabs Hive-partitioned on pmod(key, LayoutBuckets), so
  * a probe reads ONLY its keys' bucket directories — genuine Catalyst
  * partition pruning (footer min/max cannot prune uniformly distributed
  * hashes). Pinned here: (a) contents identical through the bucketed
  * round-trip for every reader, (b) the pruned probe scan reads
  * strictly fewer files than the slab holds for a small probe, (c)
  * serve results identical pre/post layout.
  */
class SlabLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sf)

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"slab_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  /** Sum of files actually read by the parquet scans under `df`'s
    * executed plan (after an action). The caller must pass a FRESH
    * DataFrame: FileSourceScanExec fires its numFiles metric only on
    * the first evaluation of its lazy partition listing, so a
    * previously-collected frame reports 0. */
  private def filesRead(df: DataFrame): Long = {
    df.collect()
    val executed = df.queryExecution.executedPlan
    val plans = executed.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    } match {
      case Seq() => Seq(executed)
      case xs => xs
    }
    plans.flatMap(_.collect {
      case s: FileSourceScanExec => s.metrics.get("numFiles").map(_.value)
    }.flatten).sum
  }

  test("bucketed slab: contents identical, probes prune to their buckets") {
    val dir = tmp("dedup")
    // build + append so compaction has something to fold
    DedupIndex.build(docs.filter(col("doc_id") % 2 === 0), dir, -1L)
    DedupIndex.append(docs.filter(col("doc_id") % 2 === 1), dir)
    val pre = DedupIndex.load(spark, dir)
    val prePost = rows(pre.postings)
    val preBands = rows(pre.bands)
    // a one-doc probe before compaction (unbucketed fallback)
    val probe = docs.filter(col("doc_id") === 3L)
      .select((col("doc_id") + 9000000L).as("doc_id"), col("text"))
    val preServe = rows(DedupIndex.serveNearDups(probe, pre, 1L))

    DedupIndex.compactDeltas(spark, dir, DedupIndex.LayoutBuckets)
    val ix = DedupIndex.load(spark, dir)
    assert(ix.manifest.params("layout_buckets") == DedupIndex.LayoutBuckets)
    // (a) canonical views unchanged through the bucketed round-trip
    assert(rows(ix.postings) == prePost, "postings changed through layout")
    assert(rows(ix.bands) == preBands, "bands changed through layout")
    assert(ix.postings.columns.toSeq == Seq("h", "doc_id"),
      "the bucket column must not leak into the canonical view")
    assert(ix.bands.columns.toSeq == Seq("doc_id", "band_idx", "band_val"))

    // (b) the pruned probe reads fewer files than the slab holds: a
    // SHORT one-doc posting probe (few shingles — the keysHint gate
    // only engages pruning when the probe can skip >= half the
    // buckets) touches <= its distinct-hash bucket count
    val spark0 = spark
    import spark0.implicits._
    val shortProbe = Seq((9500000L,
      "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val qPost = DedupQueries.hashedShingleSets(shortProbe)
      .select(col("doc_id").as("query_id"), explode(col("hs")).as("h"))
      .persist()
    val nKeys = qPost.select("h").distinct().count()
    assert(nKeys * 2 <= DedupIndex.LayoutBuckets,
      s"test probe must be small enough to engage pruning: $nKeys keys")
    val nBucketsProbed = qPost
      .select(DedupIndex.slabBucket("h", DedupIndex.LayoutBuckets.toLong))
      .distinct().count()
    val slabFiles = filesRead(DedupIndex.load(spark, dir).postings)
    val prunedFiles = filesRead(DedupIndex.probePostings(ix, qPost, nKeys))
    assert(prunedFiles <= nBucketsProbed,
      s"pruned probe read $prunedFiles files for $nBucketsProbed buckets")
    assert(prunedFiles < slabFiles,
      s"pruning must skip files: $prunedFiles read vs $slabFiles in the slab")
    // pruned == full view restricted to the probe's hashes
    assert(rows(DedupIndex.probePostings(ix, qPost, nKeys)
        .join(qPost.select("h"), "h")) ==
      rows(ix.postings.join(qPost.select("h"), "h")),
      "pruning must not lose any matching posting row")
    // an unknown-size probe (keysHint < 0) falls back to the full view
    // with NO bucket collect — identical rows by construction
    assert(rows(DedupIndex.probePostings(ix, qPost)) == rows(ix.postings))
    qPost.unpersist()

    // (c) serving from the bucketed slab returns identical results
    assert(rows(DedupIndex.serveNearDups(probe, ix, 1L)) == preServe)
    spark.catalog.clearCache()
  }

  test("band probe prunes; append after layout converges with control") {
    val dir = tmp("dedup2")
    DedupIndex.build(docs.filter(col("doc_id") % 2 === 0), dir, -1L)
    DedupIndex.append(docs.filter(col("doc_id") % 2 === 1), dir)
    DedupIndex.compactDeltas(spark, dir, DedupIndex.LayoutBuckets)
    val ix = DedupIndex.load(spark, dir)
    assert(ix.manifest.params("layout_band_major") == 1L,
      "a bucketed fold must lay the band slab band-major")
    // one probe doc → Bands band rows; a band-major probe mounts the
    // probed band_idx DIRS (≤ Bands for ANY batch size — the r13 #4
    // bound; the hash-dir layout mounted one dir per distinct key,
    // batch × Bands for a serve probe)
    val probe = docs.filter(col("doc_id") === 5L)
      .select((col("doc_id") + 9100000L).as("doc_id"), col("text"))
    val qBands = DedupQueries.sigBandRows(DedupQueries.minhashSigArrFromHashes(
      DedupQueries.hashedShingleSets(probe))).drop("sig").persist()
    // a SINGLE-BAND probe reads only that band's files — the dir-level
    // prune the band_idx partitioning buys
    val oneBand = qBands.filter(col("band_idx") === 0)
    val slabFiles = filesRead(DedupIndex.load(spark, dir).bands)
    val oneBandFiles = filesRead(
      DedupIndex.probeBands(ix, oneBand, 1L))
    assert(oneBandFiles < slabFiles,
      s"a one-band probe must skip other bands' files: " +
        s"$oneBandFiles vs slab $slabFiles")
    // probe ≡ full view restricted to the probe's keys (the bvh
    // IN-list is a superset pre-filter; the exact join stays lossless)
    val full = ix.bands
    assert(rows(DedupIndex.probeBands(ix, qBands, DedupQueries.Bands.toLong)
        .join(qBands.select("band_idx", "band_val"),
          Seq("band_idx", "band_val"))) ==
      rows(full.join(qBands.select("band_idx", "band_val"),
        Seq("band_idx", "band_val"))),
      "band-major pruning must not lose any matching band row")
    qBands.unpersist()
    // a MULTI-doc serve-shaped probe (keysHint ≫ the hash-dir gate's
    // bound) still engages band-major — its gate is the IN-list cap,
    // not keysHint·2 ≤ buckets (r14 review #3); identity re-pinned
    val probe8 = docs.filter(col("doc_id") < 16)
      .select((col("doc_id") + 9200000L).as("doc_id"), col("text"))
    val qBands8 = DedupQueries.sigBandRows(
        DedupQueries.minhashSigArrFromHashes(
          DedupQueries.hashedShingleSets(probe8))).drop("sig").persist()
    val keys8 = 16L * DedupQueries.Bands
    assert(keys8 * 2 > DedupIndex.LayoutBuckets &&
      keys8 <= DedupIndex.BandMajorMaxKeys,
      "the 16-doc probe must sit past the hash-dir gate but inside the cap")
    val pruned8 = DedupIndex.probeBands(ix, qBands8, keys8)
    // NON-VACUOUS engagement check (r14 review pass 2: the first
    // version of this test fell back to the full view and compared it
    // to itself): the band-major path pushes the probe's bvh IN-list
    // into the parquet scan — the fallback never mentions bvh
    assert(pruned8.queryExecution.executedPlan.toString.contains("bvh"),
      "the multi-doc probe must take the band-major IN-list path")
    assert(rows(pruned8
        .join(qBands8.select("band_idx", "band_val"),
          Seq("band_idx", "band_val"))) ==
      rows(full.join(qBands8.select("band_idx", "band_val"),
        Seq("band_idx", "band_val"))),
      "the multi-doc band-major probe must be lossless")
    qBands8.unpersist()

    // appends on a bucketed artifact keep converging to the one-shot
    // build (mixed bucketed-slab + flat-delta window reads)
    val inc = docs.filter(col("doc_id") < 8)
      .withColumn("doc_id", col("doc_id") + 1000000000L)
    DedupIndex.append(inc, dir)
    val ctl = tmp("dedup2_ctl")
    DedupIndex.build(docs.unionByName(inc), ctl, -1L)
    val a = DedupIndex.load(spark, dir)
    val b = DedupIndex.load(spark, ctl)
    assert(rows(a.pairs) == rows(b.pairs))
    assert(rows(a.components) == rows(b.components))
    assert(rows(a.postings) == rows(b.postings))
    // a default (-1) compaction PRESERVES the committed layout — the
    // maintenance semantics an in-stream policy fold relies on: a
    // bucketed artifact must never be silently re-laid flat
    val mfKeep = DedupIndex.compactDeltas(spark, dir)
    assert(mfKeep.params("layout_buckets") == DedupIndex.LayoutBuckets,
      "a default fold must keep the owner's opted-in layout")
    // an EXPLICIT 0 re-folds flat and resets the layout param — the
    // opt-out path
    val mfFlat = DedupIndex.compactDeltas(spark, dir, 0)
    assert(mfFlat.params("layout_buckets") == 0L)
    assert(rows(DedupIndex.load(spark, dir).postings) == rows(b.postings))
    spark.catalog.clearCache()
  }
}
