package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.{Graft, Tables, TestSpark}

/** Reader pins across grace cycles (r14 verdict #4): folds/rebuilds
  * keep a superseded window/version exactly ONE grace cycle, so a
  * reader holding table views across TWO mutations could have files
  * GC'd under it mid-scan. A pin snapshots the manifest into
  * `.pins/`; every sweep honors live pins' windows; abandoned pins
  * expire by TTL and are swept opportunistically. */
class ReaderPinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"pin_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def docs(lo: Long, hi: Long) =
    Tables.documents(spark, sf)
      .filter(col("doc_id") >= lo && col("doc_id") < hi)

  private def exists(path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  test("dedup: a pinned view held across two mutations still reads; " +
    "an unpinned one loses its files (the hazard)") {
    // the hazard first: no pin, view held across fold + append
    val bare = tmp("bare")
    DedupIndex.build(docs(0, 60), bare, 60L)
    val held0 = DedupIndex.load(spark, bare).signatures
    DedupIndex.append(docs(60, 70), bare)
    DedupIndex.compactDeltas(spark, bare) // grace cycle 1
    DedupIndex.append(docs(70, 80), bare) // heal sweeps the old window
    assert(!exists(s"$bare/signatures.parquet/delta-00000"),
      "without a pin the second mutation sweeps the held window")
    intercept[Exception] { held0.count() }

    // pinned: same sequence, the held view survives both mutations
    val dir = tmp("pinned")
    DedupIndex.build(docs(0, 60), dir, 60L)
    val pin = Graft.pinArtifactReader(spark, dir)
    val held = DedupIndex.load(spark, dir).signatures
    val heldPairs = DedupIndex.load(spark, dir).pairs
    DedupIndex.append(docs(60, 70), dir)
    DedupIndex.compactDeltas(spark, dir)
    DedupIndex.append(docs(70, 80), dir)
    assert(exists(s"$dir/signatures.parquet/delta-00000"),
      "the pinned window must survive every sweep")
    assert(held.count() == 60L,
      "the pinned reader sees its snapshot, bit-for-bit")
    heldPairs.count() // the pair window survives too
    // current readers are unaffected: they see the live state
    assert(DedupIndex.load(spark, dir).signatures.count() == 80L)
    // release: the NEXT mutation's sweep ends the extended grace
    pin.release(spark)
    DedupIndex.append(docs(80, 90), dir)
    assert(!exists(s"$dir/signatures.parquet/delta-00000"),
      "a released pin stops protecting")
    spark.catalog.clearCache()
  }

  test("ivfpq: pinned code window survives fold+append; pinned flat " +
    "layout survives two rebuilds") {
    val emb = Tables.embeddings(spark, sf).filter(col("vec_id") < 80)
    val dir = tmp("ivfpq")
    AnnIndex.buildIvfPq(emb.filter(col("vec_id") < 60), dir,
      Tables.EmbeddingDim, m = 8, k = 64, nHint = 60L)
    val pin = Graft.pinArtifactReader(spark, dir)
    val held = AnnIndex.loadIvfPq(spark, dir).codes
    def inc(lo: Long, hi: Long) = emb
      .filter(col("vec_id") >= lo && col("vec_id") < hi)
    AnnIndex.appendIvfPq(inc(60, 70), dir)
    AnnIndex.compactIvfPqDeltas(spark, dir)
    AnnIndex.appendIvfPq(inc(70, 80), dir) // heal would sweep unpinned
    assert(exists(s"$dir/ivfpq_codes.parquet/delta-00000"),
      "the pinned code window must survive")
    assert(held.select(col("vec_id")).distinct().count() == 60L)
    pin.release(spark)

    // version pins: the flat layout survives rebuild sweeps while pinned
    val vd = tmp("vpin")
    AnnIndex.buildIvfPq(emb.filter(col("vec_id") < 60), vd,
      Tables.EmbeddingDim, m = 8, k = 64, nHint = 60L)
    val vpin = Graft.pinArtifactReader(spark, vd)
    val heldFlat = AnnIndex.loadIvfPq(spark, vd).codes
    AnnIndex.rebuild(emb.filter(col("vec_id") < 60), vd, 60L) // v-1
    AnnIndex.rebuild(emb.filter(col("vec_id") < 60), vd, 60L) // v-2 sweep
    assert(exists(s"$vd/ivfpq_codes.parquet"),
      "a pinned flat layout must survive two rebuild sweeps")
    assert(heldFlat.select(col("vec_id")).distinct().count() == 60L)
    vpin.release(spark)
    AnnIndex.rebuild(emb.filter(col("vec_id") < 60), vd, 60L)
    assert(!exists(s"$vd/ivfpq_codes.parquet"),
      "a released version pin stops protecting the flat layout")
    spark.catalog.clearCache()
  }

  test("corpus: a pinned published-view survives two compactions; " +
    "release ends the extended grace") {
    import graft.streaming.StreamDedupIngest
    val corpusDir = tmp("corpus")
    def publish(lo: Long, hi: Long, batch: Long): Unit =
      docs(lo, hi).select(col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(s"$corpusDir/batch-$batch")
    publish(0, 20, 0); publish(20, 40, 1)
    StreamDedupIngest.compactCorpus(spark, corpusDir, upTo = 0L)
    // pin the view at merged_upto = 0 (slab merged-0 + batch-1)
    val pin = Graft.pinArtifactReader(spark, corpusDir)
    assert(pin.manifest.params("merged_upto") == 0L)
    val held = StreamDedupIngest.readCorpus(spark, corpusDir)
    // two further compactions: without the pin, merged-0 dies at the
    // second sweep and batch-1 at the first
    publish(40, 50, 2)
    StreamDedupIngest.compactCorpus(spark, corpusDir, upTo = 1L)
    publish(50, 60, 3)
    StreamDedupIngest.compactCorpus(spark, corpusDir, upTo = 2L)
    assert(exists(s"$corpusDir/merged-0000000000") &&
      exists(s"$corpusDir/batch-1"),
      "the pinned slab and its uncovered batch dirs must survive")
    assert(held.count() == 40L,
      "the pinned reader still sees its snapshot")
    // current readers see the live state
    assert(StreamDedupIngest.readCorpus(spark, corpusDir).count() == 60L)
    pin.release(spark)
    publish(60, 70, 4)
    StreamDedupIngest.compactCorpus(spark, corpusDir, upTo = 3L)
    assert(!exists(s"$corpusDir/merged-0000000000"),
      "a released corpus pin stops protecting")
    spark.catalog.clearCache()
  }

  test("corpus: a never-compacted (plain batch-dir) corpus can be " +
    "pinned; the pre-compaction pin protects every batch dir (r15 " +
    "advisor #4)") {
    import graft.streaming.StreamDedupIngest
    val corpusDir = tmp("precompact")
    def publish(lo: Long, hi: Long, batch: Long): Unit =
      docs(lo, hi).select(col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(s"$corpusDir/batch-$batch")
    publish(0, 20, 0); publish(20, 40, 1)
    // no manifest.json exists yet - pinArtifactReader advertises ANY
    // persisted artifact, so this must synthesize a pre-compaction pin
    val pin = Graft.pinArtifactReader(spark, corpusDir)
    assert(pin.manifest.family == "unmanaged" &&
      !pin.manifest.params.contains("merged_upto"),
      "a pre-compaction pin carries no merged_upto - the sweep's " +
        "protect-every-batch-dir branch")
    val held = StreamDedupIngest.readCorpus(spark, corpusDir)
    // two compactions: unpinned, batch-0 would be folded at the first
    // and swept at the second
    publish(40, 50, 2)
    StreamDedupIngest.compactCorpus(spark, corpusDir, upTo = 0L)
    StreamDedupIngest.compactCorpus(spark, corpusDir, upTo = 1L)
    assert(exists(s"$corpusDir/batch-0"),
      "the pre-compaction pin must keep every batch dir alive")
    assert(held.count() == 40L,
      "the pinned pre-compaction reader still sees its snapshot")
    assert(StreamDedupIngest.readCorpus(spark, corpusDir).count() == 50L)
    pin.release(spark)
    StreamDedupIngest.compactCorpus(spark, corpusDir, upTo = 2L)
    assert(!exists(s"$corpusDir/batch-0"),
      "a released pre-compaction pin stops protecting")
    spark.catalog.clearCache()
  }

  test("abandoned pin expires by TTL and is swept; renew extends it") {
    val dir = tmp("ttl")
    DedupIndex.build(docs(0, 60), dir, 60L)
    val saved = ArtifactIO.pinTtlMs
    ArtifactIO.pinTtlMs = 400L
    try {
      val pin = Graft.pinArtifactReader(spark, dir)
      val pinFile = s"$dir/.pins/pin-${pin.id}.json"
      assert(exists(pinFile))
      // renewal keeps a live long reader protected past the raw TTL
      Thread.sleep(300L)
      pin.renew(spark)
      Thread.sleep(300L)
      assert(ArtifactIO.pinnedManifests(spark, dir).nonEmpty,
        "a renewed pin must still be live past the original TTL")
      // abandon it: past the TTL the next sweep consult drops the file
      Thread.sleep(500L)
      assert(ArtifactIO.pinnedManifests(spark, dir).isEmpty,
        "an expired pin must stop protecting")
      assert(!exists(pinFile), "the expired pin file must be swept")
      // and mutations GC normally again
      DedupIndex.append(docs(60, 70), dir)
      DedupIndex.compactDeltas(spark, dir)
      DedupIndex.append(docs(70, 80), dir)
      assert(!exists(s"$dir/signatures.parquet/delta-00000"))
    } finally ArtifactIO.pinTtlMs = saved
    spark.catalog.clearCache()
  }
}
