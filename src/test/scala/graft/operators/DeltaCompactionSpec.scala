package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import graft.{Tables, TestSpark}
import graft.streaming.StreamDedupIngest

/** Artifact delta compaction (r10 verdict #2): a long-running ingest
  * stream leaves one delta dir per micro-batch; compaction folds them
  * into one slab per table with CONTENTS IDENTICAL (hash-pinned here),
  * bounded dir counts, and the same crash-safety as every other
  * mutation (staged slab at an uncommitted slot → atomic manifest
  * commit; orphans healed, folded dirs ignored by readers the moment
  * the commit lands). Folded dirs are NOT deleted at the commit — a
  * reader that loaded just before it may still be scanning them, so
  * they keep ONE GRACE CYCLE and the next mutation's heal sweeps them
  * (storage bounded at ≤ 2 windows — the r11 ADVICE in-flight-reader
  * contract). Covers the dedup artifact, the ivfpq code deltas, and
  * the ingest corpus's per-batch publish dirs.
  */
class DeltaCompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sf)
  private lazy val n = Tables.documentsRows(spark, sf)

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"compact_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  import scala.jdk.CollectionConverters._

  private def subdirs(dir: String, table: String): Seq[String] = {
    val p = Paths.get(dir, table)
    if (!Files.exists(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(x => !x.startsWith(".") && !x.startsWith("_")).toSeq.sorted
      finally s.close()
    }
  }

  private def dedupState(ix: DedupIndex.LoadedDedup) = Seq(
    rows(ix.signatures.select(col("doc_id"), concat_ws(",", col("sig")))),
    rows(ix.bands),
    rows(ix.shingleSets.select(col("doc_id"), concat_ws(",", col("hs")))),
    rows(ix.postings), rows(ix.pairs), rows(ix.components))

  test("dedup artifact: compaction folds deltas to one slab each, contents identical") {
    val dir = tmp("dedup")
    // 1 build + 3 appends -> 4 sig/band/shingle deltas, 4 pair deltas
    DedupIndex.build(docs.filter(col("doc_id") % 4 === 0), dir, -1L)
    (1 to 3).foreach(r =>
      DedupIndex.append(docs.filter(col("doc_id") % 4 === r), dir))
    assert(subdirs(dir, "signatures.parquet").size == 4)
    val pre = dedupState(DedupIndex.load(spark, dir))
    val mfPre = ArtifactIO.readManifest(spark, dir)

    DedupIndex.compactDeltas(spark, dir)
    val allFive = (0 to 4).map(i => f"delta-$i%05d")
    // folded dirs keep one grace cycle for in-flight readers
    assert(subdirs(dir, "signatures.parquet") == allFive)
    assert(subdirs(dir, "bands.parquet") == allFive)
    assert(subdirs(dir, "shingles.parquet") == allFive)
    assert(subdirs(dir, "postings.parquet") == allFive)
    assert(subdirs(dir, "pairs.parquet") == allFive)
    assert(subdirs(dir, "components.parquet").size == 1,
      "component versions outside the grace window must be swept")
    val ixPost = DedupIndex.load(spark, dir)
    assert(dedupState(ixPost) == pre,
      "compaction must not change any table's contents")
    assert(ixPost.manifest.n == mfPre.n)
    assert(ixPost.manifest.params("sig_base") == 4L &&
      ixPost.manifest.params("sig_deltas") == 1L,
      "readers mount only the committed slab")

    // append AFTER compaction still converges to the one-shot build,
    // and its heal ends the folded window's grace cycle
    val inc = docs.filter(col("doc_id") < 8)
      .withColumn("doc_id", col("doc_id") + 1000000000L)
    DedupIndex.append(inc, dir)
    assert(subdirs(dir, "signatures.parquet") ==
      Seq("delta-00004", "delta-00005"),
      "the next mutation's heal must sweep the folded grace window")
    val dirOne = tmp("dedup_ctl")
    DedupIndex.build(docs.unionByName(inc), dirOne, -1L)
    val a = DedupIndex.load(spark, dir)
    val b = DedupIndex.load(spark, dirOne)
    assert(rows(a.pairs) == rows(b.pairs))
    assert(rows(a.components) == rows(b.components))
    spark.catalog.clearCache()
  }

  test("dedup artifact: orphan slabs healed; recreated folded dirs ignored and swept") {
    val dir = tmp("dedup_crash")
    DedupIndex.build(docs.filter(col("doc_id") % 2 === 0), dir, -1L)
    DedupIndex.append(docs.filter(col("doc_id") % 2 === 1), dir)
    val pre = dedupState(DedupIndex.load(spark, dir))
    // crash state A: a prior compaction staged its slab (slot 2 = the
    // next uncommitted slot) but never committed — garbage there must
    // be invisible and overwritten by the retry
    val orphan = Paths.get(dir, "signatures.parquet", "delta-00002")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("garbage.parquet"), Array[Byte](1, 2, 3))
    assert(dedupState(DedupIndex.load(spark, dir)) == pre,
      "a staged-but-uncommitted slab must be invisible to readers")
    DedupIndex.compactDeltas(spark, dir) // retry overwrites the orphan
    val post = dedupState(DedupIndex.load(spark, dir))
    assert(post == pre)
    // crash state B: GC interrupted after the commit — a folded dir
    // lingers below the base (same bytes a replayed micro-batch would
    // recreate). Readers ignore it; the next mutation sweeps it.
    val stale = Paths.get(dir, "signatures.parquet", "delta-00000")
    Files.createDirectories(stale)
    Files.write(stale.resolve("garbage.parquet"), Array[Byte](9, 9))
    assert(dedupState(DedupIndex.load(spark, dir)) == post,
      "dirs below the committed base must be ignored")
    val inc = docs.filter(col("doc_id") < 4)
      .withColumn("doc_id", col("doc_id") + 2000000000L)
    DedupIndex.append(inc, dir)
    assert(!Files.exists(stale), "the next mutation's heal must sweep " +
      "dirs outside the live window")
    spark.catalog.clearCache()
  }

  test("ivfpq codes: compaction folds deltas, queries and replay guard unchanged") {
    val emb = Tables.embeddings(spark, sf)
    val nEmb = Tables.embeddingsRows(spark, sf)
    val dim = Tables.EmbeddingDim
    val dir = tmp("ivfpq")
    AnnIndex.buildIvfPq(emb, dir, dim, m = 8, k = 64, nHint = nEmb)
    (0 to 2).foreach { r =>
      val inc = emb.filter(col("vec_id") >= r * 4 && col("vec_id") < (r + 1) * 4)
        .select((col("vec_id") + 10000000L * (r + 1)).as("vec_id"),
          col("embedding"), col("label"))
      AnnIndex.appendIvfPq(inc, dir, batchId = r.toLong)
    }
    assert(subdirs(dir, "ivfpq_codes.parquet").size == 4)
    val preCodes = rows(AnnIndex.loadIvfPq(spark, dir).codes)
    val preTopK = rows(AnnIndex.ivfPqTopK(AnnIndex.loadIvfPq(spark, dir),
      emb, nQueries = 4))
    AnnIndex.compactIvfPqDeltas(spark, dir)
    // folded dirs keep one grace cycle; readers mount only the slab
    assert(subdirs(dir, "ivfpq_codes.parquet") ==
      (0 to 4).map(i => f"delta-$i%05d"))
    val post = AnnIndex.loadIvfPq(spark, dir)
    assert(rows(post.codes) == preCodes,
      "compaction must not change the codes bag")
    assert(rows(AnnIndex.ivfPqTopK(post, emb, nQueries = 4)) == preTopK,
      "query results must be unchanged")
    // the streaming replay guard survives compaction
    assert(post.manifest.params("last_batch") == 2L)
    val inc = emb.filter(col("vec_id") < 2)
      .select((col("vec_id") + 90000000L).as("vec_id"), col("embedding"),
        col("label"))
    assert(AnnIndex.appendIvfPq(inc, dir, batchId = 2L) == 0L,
      "an applied batchId must stay a no-op after compaction")
    assert(subdirs(dir, "ivfpq_codes.parquet") ==
      (0 to 4).map(i => f"delta-$i%05d"),
      "a replay no-op returns before the heal — grace window intact")
    assert(AnnIndex.appendIvfPq(inc, dir, batchId = 3L) == 2L * 8)
    assert(subdirs(dir, "ivfpq_codes.parquet") ==
      Seq("delta-00004", "delta-00005"),
      "the next real mutation's heal sweeps the folded grace window")
    spark.catalog.clearCache()
  }

  test("ingest corpus: merged slab + live batches; replayed folded dirs ignored") {
    val spark0 = spark
    import spark0.implicits._
    val corpusDir = tmp("corpus")
    def publish(id: String, lo: Long, hi: Long): Unit =
      (lo until hi).map(i => (i, s"doc $i text")).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$corpusDir/batch-$id")
    publish("seed", 0L, 10L)
    publish("0", 10L, 14L)
    publish("1", 14L, 18L)
    publish("2", 18L, 20L)
    val pre = rows(StreamDedupIngest.readCorpus(spark, corpusDir))
    assert(pre.size == 20)

    StreamDedupIngest.compactCorpus(spark, corpusDir, upTo = 1L)
    assert(rows(StreamDedupIngest.readCorpus(spark, corpusDir)) == pre,
      "compaction must not change the corpus contents")
    assert(Files.exists(Paths.get(corpusDir, "batch-seed")) &&
      Files.exists(Paths.get(corpusDir, "batch-0")) &&
      Files.exists(Paths.get(corpusDir, "batch-2")),
      "folded dirs keep one grace cycle; post-slab batches kept")

    // a streaming replay re-creates a folded batch dir: readers must
    // ignore it (no duplicates) and the next compaction sweeps it
    publish("1", 14L, 18L)
    assert(rows(StreamDedupIngest.readCorpus(spark, corpusDir)) == pre,
      "a replayed folded batch must not duplicate rows")
    StreamDedupIngest.compactCorpus(spark, corpusDir, upTo = 2L)
    assert(rows(StreamDedupIngest.readCorpus(spark, corpusDir)) == pre)
    assert(!Files.exists(Paths.get(corpusDir, "batch-seed")) &&
      !Files.exists(Paths.get(corpusDir, "batch-0")) &&
      !Files.exists(Paths.get(corpusDir, "batch-1")),
      "the next compaction's sweep ends the previous grace window " +
        "(including the replayed folded dir)")
    assert(Files.exists(Paths.get(corpusDir, "batch-2")),
      "dirs folded by THIS pass keep their grace cycle")
    def merged: Seq[String] = {
      val s = Files.list(Paths.get(corpusDir))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("merged-")).toSeq.sorted
      finally s.close()
    }
    // this pass's fold source slab stays for its grace cycle too:
    // storage is bounded at ≤ 2 windows, never growing
    assert(merged == Seq("merged-0000000001", "merged-0000000002"))
    StreamDedupIngest.compactCorpus(spark, corpusDir, upTo = 3L)
    assert(rows(StreamDedupIngest.readCorpus(spark, corpusDir)) == pre)
    assert(!Files.exists(Paths.get(corpusDir, "batch-2")) &&
      merged == Seq("merged-0000000002", "merged-0000000003"),
      "each pass sweeps exactly the previous grace window")
    spark.catalog.clearCache()
  }
}
