package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.{Tables, TestSpark}

/** Crash-safety of the index mutation protocol (r9 verdict #2): the
  * CrashMatrixSpec discipline applied to the ANN artifact. Invariant
  * under a crash at ANY filesystem mutation point: a reader never sees
  * codes the manifest doesn't describe (or vice versa), and the next
  * run converges to the exact no-crash state.
  *
  * Mutation points and the injected faults:
  *   - append stage (delta dir written, manifest commit never ran) —
  *     injected by reverting the manifest to its pre-append bytes
  *   - manifest tmp write torn mid-stream — garbage `.manifest.json.tmp`
  *   - the (tmp only) delete→rename window — manifest.json removed, the
  *     complete new content sits in the tmp
  *   - corrupt target next to a complete tmp (non-atomic-rename store)
  *   - both target and tmp unparseable — must refuse, not guess
  * Plus the streaming replay guard: an already-applied batchId is a
  * durable no-op across "restarts" (fresh readManifest each call).
  */
class AnnIndexCommitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val n = Tables.embeddingsRows(spark, sf)
  private val dim = Tables.EmbeddingDim

  private lazy val inc = emb.filter(col("vec_id") < 8)
    .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"),
      col("label"))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"annixc_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def manifestPath(dir: String) = Paths.get(dir, "manifest.json")
  private def tmpPath(dir: String) = Paths.get(dir, ".manifest.json.tmp")

  test("crash between delta write and manifest commit: orphan invisible, retry converges") {
    val dir = tmp("orphan")
    AnnIndex.buildIvfPq(emb, dir, dim, m = 8, k = 64, nHint = n)
    val preAppend = Files.readAllBytes(manifestPath(dir))
    val baseline = rows(AnnIndex.loadIvfPq(spark, dir).codes)
    // control: the same append with no fault, in a separate dir
    val ctl = tmp("orphan_ctl")
    AnnIndex.buildIvfPq(emb, ctl, dim, m = 8, k = 64, nHint = n)
    AnnIndex.appendIvfPq(inc, ctl)
    val want = rows(AnnIndex.loadIvfPq(spark, ctl).codes)

    // fault: run the append fully, then revert the manifest — exactly
    // the on-disk state a crash AFTER the delta write and BEFORE the
    // manifest commit leaves behind (delta-00001 present, uncommitted)
    AnnIndex.appendIvfPq(inc, dir)
    Files.write(manifestPath(dir), preAppend)
    // the revert bypasses Hadoop's LocalFileSystem, whose .crc sidecar
    // would otherwise flag the (valid) old bytes as corrupt
    Files.deleteIfExists(Paths.get(dir, ".manifest.json.crc"))
    assert(Files.exists(Paths.get(dir, "ivfpq_codes.parquet", "delta-00001")))
    val crashed = AnnIndex.loadIvfPq(spark, dir)
    assert(crashed.manifest.n == n, "uncommitted append must not change n")
    assert(rows(crashed.codes) == baseline,
      "a reader must never see codes the manifest doesn't describe")

    // second run converges: the retry overwrites the orphan and commits
    assert(AnnIndex.appendIvfPq(inc, dir) == 8L * 8)
    val healed = AnnIndex.loadIvfPq(spark, dir)
    assert(healed.manifest.n == n + 8)
    assert(rows(healed.codes) == want, "retry must converge to the no-crash state")
  }

  test("stale orphan deltas from abandoned appends are healed before staging") {
    val dir = tmp("stale")
    AnnIndex.buildIvfPq(emb, dir, dim, m = 8, k = 64, nHint = n)
    // a long-abandoned orphan two slots ahead (e.g. two crashed ingests)
    val orphan = Paths.get(dir, "ivfpq_codes.parquet", "delta-00002")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("garbage.parquet"), Array[Byte](1, 2, 3))
    assert(AnnIndex.appendIvfPq(inc, dir) == 8L * 8)
    assert(!Files.exists(orphan), "heal must delete orphans >= committed")
    assert(AnnIndex.loadIvfPq(spark, dir).manifest.params("deltas") == 2L)
  }

  test("torn manifest tmp: committed manifest wins, stale tmp dropped") {
    val dir = tmp("torn")
    AnnIndex.buildSq(emb, dir, dim, n)
    Files.write(tmpPath(dir), "{\"fam".getBytes) // crash mid-tmp-write
    val m = AnnIndex.readManifest(spark, dir)
    assert(m.family == "sq8" && m.n == n)
    assert(!Files.exists(tmpPath(dir)), "stale tmp must be dropped")
  }

  test("(tmp only) window: a complete tmp is promoted to the manifest") {
    val dir = tmp("promote")
    AnnIndex.buildSq(emb, dir, dim, n)
    // crash between delete and rename: target gone, complete tmp present
    Files.move(manifestPath(dir), tmpPath(dir),
      StandardCopyOption.REPLACE_EXISTING)
    val m = AnnIndex.readManifest(spark, dir)
    assert(m.family == "sq8" && m.n == n)
    assert(Files.exists(manifestPath(dir)) && !Files.exists(tmpPath(dir)))
    // and the artifact serves normally afterwards
    assert(AnnIndex.sqTopK(AnnIndex.loadSq(spark, dir), emb).count() > 0)
  }

  test("corrupt target next to a complete tmp: commit completed from the tmp") {
    val dir = tmp("complete")
    AnnIndex.buildSq(emb, dir, dim, n)
    Files.copy(manifestPath(dir), tmpPath(dir),
      StandardCopyOption.REPLACE_EXISTING)
    Files.write(manifestPath(dir), "partial co".getBytes) // torn rename copy
    val m = AnnIndex.readManifest(spark, dir)
    assert(m.family == "sq8" && m.n == n)
    assert(!Files.exists(tmpPath(dir)))
  }

  test("torn tmp with NO committed manifest: never promoted into a corrupt manifest") {
    // a crash mid-tmp-write on a first-ever build: partial tmp, no target
    val dir = tmp("torn_first")
    Files.write(tmpPath(dir), "{\"fam".getBytes)
    intercept[java.io.IOException](AnnIndex.readManifest(spark, dir))
    assert(!Files.exists(manifestPath(dir)),
      "a partial tmp must not be installed as manifest.json")
    assert(!Files.exists(tmpPath(dir)), "the torn tmp must be dropped")
    // and a subsequent build succeeds cleanly in the same dir
    AnnIndex.buildSq(emb, dir, dim, n)
    assert(AnnIndex.readManifest(spark, dir).family == "sq8")
  }

  test("both target and tmp unparseable: refuse loudly, never guess") {
    val dir = tmp("refuse")
    AnnIndex.buildSq(emb, dir, dim, n)
    Files.write(manifestPath(dir), "xx".getBytes)
    Files.write(tmpPath(dir), "yy".getBytes)
    val e = intercept[java.io.IOException](AnnIndex.readManifest(spark, dir))
    assert(e.getMessage.contains("refusing"))
  }

  test("streaming replay guard: an applied batchId is a durable no-op") {
    val dir = tmp("replay")
    AnnIndex.buildIvfPq(emb, dir, dim, m = 8, k = 64, nHint = n)
    assert(AnnIndex.appendIvfPq(inc, dir, batchId = 0L) == 8L * 8)
    val once = rows(AnnIndex.loadIvfPq(spark, dir).codes)
    // the post-restart replay of the SAME micro-batch (fresh process:
    // every call re-reads the manifest — nothing held in memory)
    assert(AnnIndex.appendIvfPq(inc, dir, batchId = 0L) == 0L)
    val after = AnnIndex.loadIvfPq(spark, dir)
    assert(rows(after.codes) == once && after.manifest.n == n + 8,
      "replayed batch must not duplicate codes or over-count n")
    // the NEXT batch still applies
    val inc2 = emb.filter(col("vec_id") >= 8 && col("vec_id") < 12)
      .select((col("vec_id") + 20000000L).as("vec_id"), col("embedding"),
        col("label"))
    assert(AnnIndex.appendIvfPq(inc2, dir, batchId = 1L) == 4L * 8)
    assert(AnnIndex.loadIvfPq(spark, dir).manifest.n == n + 12)
  }
}
