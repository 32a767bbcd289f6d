package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import graft.{Tables, TestSpark}

/** Quantizer refresh with atomic version swap (r10 verdict #5): append
  * correctly refuses the stats-derived families (lsh mask width, ivf
  * cells, sq8 stats drift under append), so a growing corpus needs an
  * explicit re-fit that readers see atomically. Contract pinned here:
  * rebuilt-on-corpus-X ≡ fresh-build-on-corpus-X (tables AND recall),
  * readers are isolated from a staged-but-uncommitted rebuild, the
  * crash state (staged version, manifest never committed) converges on
  * retry, the superseded version survives one refresh cycle (in-flight
  * reader grace) and is swept by the next, and the ivfpq replay
  * high-water mark survives the swap.
  */
class AnnRebuildSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val n = Tables.embeddingsRows(spark, sf)
  private val dim = Tables.EmbeddingDim
  private lazy val half = emb.filter(col("vec_id") % 2 === 0)
  private lazy val nHalf = half.count()

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"annrebuild_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("lsh: rebuild on the grown corpus == a fresh build; recall re-gated") {
    val dir = tmp("lsh")
    AnnIndex.buildLsh(half, dir, dim, nHalf) // the stale index
    val staleBits = AnnIndex.readManifest(spark, dir).params("bucket_bits")
    AnnIndex.rebuild(emb, dir, n)
    val m = AnnIndex.readManifest(spark, dir)
    assert(m.params("version") == 1L && m.n == n)
    assert(m.params("bucket_bits") ==
      graft.queries.SimilarityQueries.annBucketBits(n).toLong,
      s"mask width must be re-fit to the grown corpus (stale: $staleBits)")
    val ctl = tmp("lsh_ctl")
    AnnIndex.buildLsh(emb, ctl, dim, n)
    assert(rows(AnnIndex.loadLsh(spark, dir).signatures
        .select(col("vec_id"), concat_ws(",", col("sig"))))
      == rows(AnnIndex.loadLsh(spark, ctl).signatures
        .select(col("vec_id"), concat_ws(",", col("sig")))),
      "rebuilt signature table must equal a fresh build")
    // recall re-gate: the refreshed index measures exactly as a fresh one
    assert(rows(AnnIndex.recallVsExact(spark, dir, emb))
      == rows(AnnIndex.recallVsExact(spark, ctl, emb)))
    spark.catalog.clearCache()
  }

  test("reader isolation: staged-but-uncommitted version invisible; retry converges") {
    val dir = tmp("sq")
    AnnIndex.buildSq(half, dir, dim, nHalf)
    val pre = rows(AnnIndex.loadSq(spark, dir).stats)
    val preManifest = Files.readAllBytes(Paths.get(dir, "manifest.json"))
    // crash state: a full rebuild ran but its root-manifest commit never
    // landed (revert the manifest) — the staged v-00001 must be
    // invisible and the OLD tables still intact (rebuild defers GC)
    AnnIndex.rebuild(emb, dir, n)
    Files.write(Paths.get(dir, "manifest.json"), preManifest)
    Files.deleteIfExists(Paths.get(dir, ".manifest.json.crc"))
    assert(Files.exists(Paths.get(dir, "v-00001")))
    val crashed = AnnIndex.loadSq(spark, dir)
    assert(crashed.manifest.n == nHalf && rows(crashed.stats) == pre,
      "a reader must never see a version the manifest doesn't commit")
    // retry converges: the orphan version dir is swept and re-staged
    AnnIndex.rebuild(emb, dir, n)
    val healed = AnnIndex.loadSq(spark, dir)
    assert(healed.manifest.n == n &&
      healed.manifest.params("version") == 1L)
    val ctl = tmp("sq_ctl")
    AnnIndex.buildSq(emb, ctl, dim, n)
    assert(rows(healed.stats) == rows(AnnIndex.loadSq(spark, ctl).stats))
    spark.catalog.clearCache()
  }

  test("superseded version survives one cycle (reader grace), swept by the next") {
    val dir = tmp("ivf")
    AnnIndex.buildIvf(half, dir, dim, nHalf)
    AnnIndex.rebuild(emb, dir, n)
    // the flat build-layout tables are the superseded version: intact
    assert(Files.exists(Paths.get(dir, "ivf_assign.parquet")),
      "the superseded version must survive until the next rebuild")
    AnnIndex.rebuild(half, dir, nHalf)
    assert(!Files.exists(Paths.get(dir, "ivf_assign.parquet")),
      "the next rebuild must sweep the flat layout")
    assert(Files.exists(Paths.get(dir, "v-00001")),
      "the version superseded by THIS rebuild keeps its grace cycle")
    assert(Files.exists(Paths.get(dir, "v-00002")))
    AnnIndex.rebuild(half, dir, nHalf)
    assert(!Files.exists(Paths.get(dir, "v-00001")) &&
      Files.exists(Paths.get(dir, "v-00002")) &&
      Files.exists(Paths.get(dir, "v-00003")),
      "each rebuild sweeps everything but the version it supersedes")
    val ctl = tmp("ivf_ctl")
    AnnIndex.buildIvf(half, ctl, dim, nHalf)
    assert(rows(AnnIndex.ivfTopK(AnnIndex.loadIvf(spark, dir)))
      == rows(AnnIndex.ivfTopK(AnnIndex.loadIvf(spark, ctl))))
    spark.catalog.clearCache()
  }

  test("ivfpq: rebuild resets the delta layout; append + replay guard continue") {
    val dir = tmp("ivfpq")
    AnnIndex.buildIvfPq(half, dir, dim, m = 8, k = 64, nHint = nHalf)
    val inc = emb.filter(col("vec_id") % 2 === 1)
      .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"),
        col("label"))
    AnnIndex.appendIvfPq(inc, dir, batchId = 7L)
    AnnIndex.rebuild(emb, dir, n)
    val m = AnnIndex.readManifest(spark, dir)
    assert(m.params("version") == 1L && m.params("deltas") == 1L &&
      !m.params.contains("deltas_base"))
    assert(m.params("last_batch") == 7L,
      "the streaming replay high-water mark must survive the swap")
    val ctl = tmp("ivfpq_ctl")
    AnnIndex.buildIvfPq(emb, ctl, dim, m = 8, k = 64, nHint = n)
    assert(rows(AnnIndex.loadIvfPq(spark, dir).codes)
      == rows(AnnIndex.loadIvfPq(spark, ctl).codes),
      "rebuilt codes must equal a fresh build on the same corpus")
    // appends keep working against the versioned layout
    assert(AnnIndex.appendIvfPq(inc.limit(0).unionByName(
      emb.filter(col("vec_id") < 4)
        .select((col("vec_id") + 20000000L).as("vec_id"), col("embedding"),
          col("label"))), dir, batchId = 8L) == 4L * 8)
    assert(AnnIndex.loadIvfPq(spark, dir).manifest.n == n + 4)
    spark.catalog.clearCache()
  }
}
