package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.{Tables, TestSpark}
import graft.queries.SimilarityQueries

/** Index-as-artifact contract (r8 verdict top item): for every ANN
  * family, querying the LOADED parquet artifact returns byte-identical
  * rows to querying the inline-built index — build once, serve many,
  * lose nothing. Also pins the manifest round-trip and the
  * foreign-family guard (loading half an index must fail loudly).
  */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val n = Tables.embeddingsRows(spark, sf)
  private val dim = Tables.EmbeddingDim

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"annix_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("lsh: query-from-loaded == query-from-built, manifest intact") {
    val dir = tmp("lsh")
    val m = AnnIndex.buildLsh(emb, dir, dim, n)
    assert(m.params("bucket_bits") == SimilarityQueries.annBucketBits(n).toLong)
    val loaded = AnnIndex.loadLsh(spark, dir)
    assert(loaded.manifest == AnnIndex.readManifest(spark, dir))
    val fromIndex = rows(AnnIndex.lshTopK(loaded))
    val inline = rows(SimilarityQueries.annLsh(emb, dim0 = dim, nHint = n))
    spark.catalog.clearCache()
    assert(fromIndex.nonEmpty && fromIndex == inline)
  }

  test("ivf: query-from-loaded == query-from-built; centroids match the stride sample") {
    val dir = tmp("ivf")
    AnnIndex.buildIvf(emb, dir, dim, n)
    val loaded = AnnIndex.loadIvf(spark, dir)
    val fromIndex = rows(AnnIndex.ivfTopK(loaded))
    val inline = rows(SimilarityQueries.ivfTopKDf(emb, nHint = n))
    spark.catalog.clearCache()
    assert(fromIndex.nonEmpty && fromIndex == inline)
    // the centroid table is the deterministic hash-stride sample, and a
    // centroid's home cell is itself — cross-check the two artifacts
    val cents = loaded.centroids.collect().map(_.getLong(0)).sorted
    val selfHomes = loaded.assign
      .filter("arn = 1 AND vec_id = cell").collect().map(_.getLong(0)).sorted
    assert(cents.nonEmpty && cents.sameElements(selfHomes))
  }

  test("pq: query-from-loaded == query-from-built") {
    val dir = tmp("pq")
    AnnIndex.buildPq(emb, dir, dim, m = 8, k = 64, nHint = n)
    val loaded = AnnIndex.loadPq(spark, dir)
    assert(loaded.manifest.params == Map("m" -> 8L, "k" -> 64L))
    val fromIndex = rows(AnnIndex.pqTopK(loaded, emb))
    val inline = rows(SimilarityQueries.pqTopKOn(
      emb, dim, m = 8, k = 64, r = 20, topK = 3, nQueries = 8, nHint = n))
    assert(fromIndex.nonEmpty && fromIndex == inline)
  }

  test("ivfpq: query-from-loaded == query-from-built") {
    val dir = tmp("ivfpq")
    val mf = AnnIndex.buildIvfPq(emb, dir, dim, m = 8, k = 64, nHint = n)
    assert(mf.params("cells") == SimilarityQueries.ivfCells(n).toLong)
    val loaded = AnnIndex.loadIvfPq(spark, dir)
    val fromIndex = rows(AnnIndex.ivfPqTopK(loaded, emb))
    val inline = rows(SimilarityQueries.ivfPqTopKOn(
      emb, dim, m = 8, k = 64, r = 40, topK = 3, nQueries = 8,
      nProbe = 32, nHint = n))
    spark.catalog.clearCache()
    assert(fromIndex.nonEmpty && fromIndex == inline)
  }

  test("ivfpq append: frozen-quantizer ingest — chunked == one-shot, clones found") {
    import org.apache.spark.sql.functions._
    // base index on the corpus; the increment is 8 exact clones of the
    // query vectors under fresh ids (the re-crawled-image shape)
    val inc = emb.filter(col("vec_id") < 8)
      .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"),
        col("label"))
    val dirA = tmp("ipq_app_a")
    AnnIndex.buildIvfPq(emb, dirA, dim, m = 8, k = 64, nHint = n)
    val before = AnnIndex.loadIvfPq(spark, dirA).codes.count()
    assert(AnnIndex.appendIvfPq(inc, dirA) == 8L * 8)
    val after = AnnIndex.loadIvfPq(spark, dirA)
    assert(after.codes.count() == before + 8 * 8)
    assert(after.manifest.n == n + 8)
    // encoding is a pure per-row function of the frozen quantizers, so
    // appending in two chunks must yield the identical codes table
    val dirB = tmp("ipq_app_b")
    AnnIndex.buildIvfPq(emb, dirB, dim, m = 8, k = 64, nHint = n)
    AnnIndex.appendIvfPq(inc.filter(col("vec_id") % 2 === 0), dirB)
    AnnIndex.appendIvfPq(inc.filter(col("vec_id") % 2 === 1), dirB)
    assert(rows(AnnIndex.loadIvfPq(spark, dirB).codes)
      == rows(after.codes))
    // a clone shares its original's home cell and codes exactly, so the
    // query finds it at rank 1 with exact rerank distance 0
    val top = AnnIndex.ivfPqTopK(after, emb.unionAll(inc))
      .filter(col("rk") === 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    (0L until 8L).foreach { q =>
      assert(top(q) == (q + 10000000L, 0L),
        s"query $q should find its appended clone at rank 1: ${top(q)}")
    }
    spark.catalog.clearCache()
  }

  test("sq8: query-from-loaded == query-from-built") {
    val dir = tmp("sq")
    AnnIndex.buildSq(emb, dir, dim)
    val loaded = AnnIndex.loadSq(spark, dir)
    val fromIndex = rows(AnnIndex.sqTopK(loaded, emb))
    val inline = rows(SimilarityQueries.sqTopK(emb))
    assert(fromIndex.nonEmpty && fromIndex == inline)
  }

  test("recall@k runs against the loaded artifact and matches the inline number") {
    import org.apache.spark.sql.functions._
    // the s9 tuning loop against a persisted index: same params as the
    // gated inline s10 query, so the recall must equal the inline
    // measurement exactly (identical candidate sets + tie-breaks)
    val dir = tmp("ipq_recall")
    AnnIndex.buildIvfPq(emb, dir, dim, m = 8, k = 64, nHint = n)
    val row = graft.Graft.annIndexRecall(spark, dir, emb).head()
    assert(row.getString(0) == "ivfpq" && row.getLong(3) == 24L)
    val truth = SimilarityQueries.cosineTopK(emb, nQueries = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inline = SimilarityQueries.ivfPqTopKOn(emb, dim, m = 8, k = 64,
        r = 40, topK = 3, nQueries = 8, nProbe = 32, nHint = n)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    spark.catalog.clearCache()
    val inlineRecall = truth.count(inline.contains).toDouble / truth.size
    assert(row.getDouble(5) == inlineRecall,
      s"loaded-index recall ${row.getDouble(5)} != inline $inlineRecall")
  }

  test("loading a directory of the wrong family fails loudly") {
    val dir = tmp("guard")
    AnnIndex.buildSq(emb, dir, dim)
    val e = intercept[IllegalArgumentException](AnnIndex.loadIvf(spark, dir))
    assert(e.getMessage.contains("sq8") && e.getMessage.contains("ivf"))
  }
}
