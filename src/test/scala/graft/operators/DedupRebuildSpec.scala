package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import graft.{Tables, TestSpark}

/** Dedup-artifact rebuild contract (the AnnRebuildSpec pattern): a
  * rebuild from the current corpus is byte-identical to a fresh build,
  * the version swap is atomic with one superseded-version grace cycle,
  * both streaming replay guards carry over, and every mutation/read
  * keeps working unchanged on the version-pointer layout.
  */
class DedupRebuildSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sf)

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"dedupreb_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def state(ix: DedupIndex.LoadedDedup) = Seq(
    rows(ix.signatures.select(col("doc_id"), concat_ws(",", col("sig")))),
    rows(ix.bands),
    rows(ix.shingleSets.select(col("doc_id"), concat_ws(",", col("hs")))),
    rows(ix.postings), rows(ix.pairs), rows(ix.components))

  test("rebuild == fresh build; guards carried; mutations keep working") {
    val dir = tmp("main")
    val half = docs.filter(col("doc_id") % 2 === 0)
    DedupIndex.build(half, dir, -1L)
    // history: a replay-guarded append, a takedown, a compaction
    DedupIndex.append(docs.filter(col("doc_id") % 2 === 1), dir,
      batchId = 3L)
    val spark0 = spark
    import spark0.implicits._
    DedupIndex.delete(Seq(0L, 2L).toDF("doc_id"), dir, batchId = 7L)
    DedupIndex.compactDeltas(spark, dir)
    val kept = docs.filter(!col("doc_id").isInCollection(Seq(0L, 2L)))

    // rebuild from the current corpus; control = fresh build
    val mf2 = DedupIndex.rebuild(kept, dir)
    assert(mf2.params("version") == 1L)
    assert(mf2.params("last_batch") == 3L &&
      mf2.params("last_delete_batch") == 7L,
      "both replay guards must survive the swap")
    assert(mf2.params.getOrElse("tomb_deltas", 0L) == 0L,
      "the rebuilt version starts with a clean tombstone window")
    val ctl = tmp("ctl")
    DedupIndex.build(kept, ctl, -1L)
    assert(state(DedupIndex.load(spark, dir)) ==
      state(DedupIndex.load(spark, ctl)),
      "rebuild must equal a fresh build on the same corpus")
    // superseded flat layout keeps one grace cycle
    assert(Files.exists(Paths.get(dir, "signatures.parquet")),
      "the superseded flat tables survive until the next rebuild")

    // every mutation works unchanged on the version-pointer layout
    val inc = docs.filter(col("doc_id") < 6)
      .withColumn("doc_id", col("doc_id") + 1000000000L)
    DedupIndex.append(inc, dir, batchId = 4L)
    DedupIndex.append(inc, ctl, batchId = 4L)
    assert(DedupIndex.append(inc, dir, batchId = 4L) == 0L,
      "append replay guard works across the swap")
    DedupIndex.delete(Seq(1000000001L).toDF("doc_id"), dir)
    DedupIndex.delete(Seq(1000000001L).toDF("doc_id"), ctl)
    DedupIndex.compactDeltas(spark, dir)
    DedupIndex.compactDeltas(spark, ctl)
    assert(state(DedupIndex.load(spark, dir)) ==
      state(DedupIndex.load(spark, ctl)),
      "append/delete/compact on the rebuilt artifact == on a fresh one")
    // serve works against the rebuilt artifact
    val probe = docs.filter(col("doc_id") === 4L)
      .select((col("doc_id") + 9000000L).as("doc_id"), col("text"))
    assert(rows(DedupIndex.serveNearDups(probe,
        DedupIndex.load(spark, dir), 1L)) ==
      rows(DedupIndex.serveNearDups(probe,
        DedupIndex.load(spark, ctl), 1L)))

    // a second rebuild sweeps the superseded flat layout; v-1 (current
    // at its sweep time) gets the one-cycle grace and the THIRD
    // rebuild's sweep ends it — storage stays bounded at <= 2 versions
    val corpus2 = kept.unionByName(inc)
      .filter(col("doc_id") =!= 1000000001L)
    DedupIndex.rebuild(corpus2, dir)
    assert(!Files.exists(Paths.get(dir, "signatures.parquet")),
      "the next rebuild's sweep ends the flat layout's grace cycle")
    assert(Files.exists(Paths.get(dir, "v-00001")) &&
      Files.exists(Paths.get(dir, "v-00002")),
      "the superseded version keeps one grace cycle for in-flight readers")
    DedupIndex.rebuild(corpus2, dir)
    assert(!Files.exists(Paths.get(dir, "v-00001")) &&
      Files.exists(Paths.get(dir, "v-00002")) &&
      Files.exists(Paths.get(dir, "v-00003")),
      "storage stays bounded at <= 2 versions")
    spark.catalog.clearCache()
  }

  test("crashed rebuild is invisible; retry converges") {
    val dir = tmp("crash")
    DedupIndex.build(docs, dir, -1L)
    val pre = state(DedupIndex.load(spark, dir))
    val mfPre = ArtifactIO.readManifest(spark, dir)
    // crash state: a rebuild staged a partial version dir but never
    // committed the root manifest
    val staged = Paths.get(dir, "v-00001", "signatures.parquet")
    Files.createDirectories(staged)
    Files.write(staged.resolve("garbage.parquet"), Array[Byte](1, 2))
    assert(state(DedupIndex.load(spark, dir)) == pre,
      "a staged-but-uncommitted version must be invisible")
    assert(ArtifactIO.readManifest(spark, dir) == mfPre)
    // the retry sweeps the orphan and converges
    DedupIndex.rebuild(docs, dir)
    val ctl = tmp("crash_ctl")
    DedupIndex.build(docs, ctl, -1L)
    assert(state(DedupIndex.load(spark, dir)) ==
      state(DedupIndex.load(spark, ctl)))
    spark.catalog.clearCache()
  }
}
