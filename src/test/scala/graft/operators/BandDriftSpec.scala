package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.{Tables, TestSpark}

/** Band-layout drift detection + retune (r14 verdict #3) — the dedup
  * twin of recallCheck/rebuildAndTune: the artifact's slab layout
  * (`layout_buckets`, the per-probe candidate-load knob) is sized at
  * fold time and silently goes stale as appends grow the corpus. The
  * check is manifest-only (exact n delta accounting, no scan); a 10×
  * append trips it, a small one does not; the retune re-folds at the
  * now-right bucket count and the per-bucket candidate load returns to
  * the design point. */
class BandDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"drift_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def docs(lo: Long, hi: Long) =
    Tables.documents(spark, sf)
      .filter(col("doc_id") >= lo && col("doc_id") < hi)

  test("auto layout: flat below the crossover, pow2 ladder above, capped") {
    assert(DedupIndex.autoLayoutBuckets(1000L) == 0, "tiny corpus: flat")
    assert(DedupIndex.autoLayoutBuckets(32768L) == 0)
    assert(DedupIndex.autoLayoutBuckets(500000L) == 64,
      "the measured 500k-doc config")
    assert(DedupIndex.autoLayoutBuckets(5000000L) == 1024)
    assert(DedupIndex.autoLayoutBuckets(Long.MaxValue / 2) == 4096,
      "capped at the probe IN-list bound")
  }

  test("10x growth trips the check; a small append does not; retune " +
    "restores the per-bucket load") {
    val perBucket = 8L // test-scale design point
    val dir = tmp("grow")
    DedupIndex.build(docs(0, 50), dir, 50L)
    assert(ArtifactIO.readManifest(spark, dir).params("geom_n") == 50L)
    // size the layout for the corpus at hand: 50 docs / 8 → 8 buckets
    val sized = DedupIndex.autoLayoutBuckets(50L, perBucket)
    assert(sized == 8)
    DedupIndex.compactDeltas(spark, dir, layoutBuckets = sized)
    val d0 = DedupIndex.bandDriftCheck(spark, dir, perBucket)
    assert(!d0.drifted && d0.recordedBuckets == 8L &&
      d0.geomN == 50L && d0.liveN == 50L, s"fresh layout must be clean: $d0")

    // small append (1.2×): same pow2 pick — no drift
    DedupIndex.append(docs(50, 60), dir)
    val d1 = DedupIndex.bandDriftCheck(spark, dir, perBucket)
    assert(!d1.drifted && d1.liveN == 60L,
      s"a small append must not trip the check: $d1")

    // grow to 10× the sized-for corpus
    DedupIndex.append(docs(60, 250), dir)
    DedupIndex.append(docs(250, 500), dir)
    val d2 = DedupIndex.bandDriftCheck(spark, dir, perBucket)
    assert(d2.drifted && d2.liveN == 500L && d2.recommendedBuckets == 64L,
      s"a 10x-appended corpus must trip the check: $d2")
    assert(d2.recommendation.contains("retuneBandLayout"),
      "the way out must be named")

    // stale per-bucket candidate load: fold at the stale count first so
    // the postings slab is comparable (all rows in pb dirs)
    DedupIndex.compactDeltas(spark, dir) // preserving fold: stays at 8
    val mfStale = ArtifactIO.readManifest(spark, dir)
    assert(mfStale.params("layout_buckets") == 8L)
    assert(mfStale.params("geom_n") == 50L,
      "a preserving fold must carry the recorded design point")
    def postingsPerBucket(): Double = {
      val mf = ArtifactIO.readManifest(spark, dir)
      val base = mf.params.getOrElse("sig_base", 0L)
      val p = spark.read.parquet(
        s"$dir/postings.parquet/delta-" + f"$base%05d")
      p.count().toDouble / p.select(col("pb")).distinct().count()
    }
    val stale = postingsPerBucket()

    // retune: re-fold at the auto count; the check goes clean and the
    // per-bucket load returns to the design point (~8× smaller)
    val mf2 = DedupIndex.retuneBandLayout(spark, dir, perBucket)
    assert(mf2.params("layout_buckets") == 64L &&
      mf2.params("geom_n") == 500L)
    val d3 = DedupIndex.bandDriftCheck(spark, dir, perBucket)
    assert(!d3.drifted, s"retune must clear the drift: $d3")
    val tuned = postingsPerBucket()
    assert(tuned <= stale / 4.0,
      f"per-bucket candidate load must return toward the design point " +
        f"(stale $stale%.0f rows/bucket, tuned $tuned%.0f)")
    // and the serve content is unchanged by the re-layout
    assert(DedupIndex.load(spark, dir).signatures.count() == 500L)
    spark.catalog.clearCache()
  }

  test("flat slab past the crossover drifts toward bucketed; legacy " +
    "manifests report an unrecorded design point") {
    val dir = tmp("flat")
    DedupIndex.build(docs(0, 200), dir, 200L)
    // flat layout, corpus big enough that the auto-sizer wants buckets
    val d = DedupIndex.bandDriftCheck(spark, dir, docsPerBucket = 8L)
    assert(d.drifted && d.recordedBuckets == 0L && d.recommendedBuckets >= 16L,
      s"flat past the crossover must drift: $d")
    // legacy manifest (no geom_n): check still works, reports -1
    val mf = ArtifactIO.readManifest(spark, dir)
    ArtifactIO.writeManifest(spark, dir,
      mf.copy(params = mf.params - "geom_n"))
    val dl = DedupIndex.bandDriftCheck(spark, dir, docsPerBucket = 8L)
    assert(dl.geomN == -1L && dl.drifted)
    spark.catalog.clearCache()
  }
}
