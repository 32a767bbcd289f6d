package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

/** Artifact-backed RAG retrieval contract (r10 verdict #3, the
  * AnnServeSpec pattern): the hybrid-RRF and MMR compositions served
  * from persisted indexes must, at EXHAUSTIVE index parameters (probe
  * all cells, candidate budget ≥ corpus), return byte-identically what
  * their exact twins return over the same out-of-corpus query batch —
  * the approximation is exactly (and only) the candidate truncation.
  * Plus: the default-parameter paths fill k per query, and the greedy
  * MMR rounds from an index pool run the IDENTICAL factored selection
  * as the s14 gate (shared half).
  */
class RagServeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val NQ = 4

  // hold the first NQ ids OUT of the corpus on both modalities; serve
  // them back as queries under a disjoint id namespace
  private lazy val corpusDocs =
    Tables.documents(spark, sf).filter(col("doc_id") >= NQ)
  private lazy val corpusEmb =
    Tables.embeddings(spark, sf).filter(col("vec_id") >= NQ)
  private lazy val nEmb = Tables.embeddingsRows(spark, sf) - NQ
  private lazy val queries = Tables.documents(spark, sf)
    .filter(col("doc_id") < NQ).select(col("doc_id"), col("text"))
    .join(Tables.embeddings(spark, sf).filter(col("vec_id") < NQ)
      .select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
    .select((col("doc_id") + 5000000L).as("query_id"), col("text"),
      col("embedding"))
  private val dim = Tables.EmbeddingDim

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"ragserve_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private lazy val annDir = {
    val d = tmp("ivf")
    AnnIndex.buildIvf(corpusEmb, d, dim, nEmb)
    d
  }
  private lazy val dedupIx = {
    val d = tmp("dedup")
    DedupIndex.build(corpusDocs, d, -1L)
    DedupIndex.load(spark, d)
  }

  test("hybrid: exhaustive index parameters == the exact twin") {
    val exact = rows(RagServe.hybridExact(corpusDocs, corpusEmb, queries))
    spark.catalog.clearCache()
    val fromIx = rows(RagServe.hybridFromIndexes(spark, annDir, dedupIx,
      corpusEmb, queries, r = 100, nProbe = 100000))
    spark.catalog.clearCache()
    assert(exact.nonEmpty && fromIx == exact,
      s"ix-only: ${(fromIx.toSet -- exact.toSet).take(3)}; " +
        s"exact-only: ${(exact.toSet -- fromIx.toSet).take(3)}")
  }

  test("hybrid: default parameters fill k per query; ranks are sane") {
    val got = RagServe.hybridFromIndexes(spark, annDir, dedupIx,
      corpusEmb, queries).collect()
    spark.catalog.clearCache()
    assert(got.length == NQ * 3, s"expected ${NQ * 3} rows, got ${got.length}")
    assert(got.forall(r => r.getLong(4) >= 1 && r.getLong(4) <= 3))
    // every query's rk sequence is exactly 1..3
    got.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(4)).sorted.toSeq == Seq(1L, 2L, 3L))
    }
  }

  test("mmr: exhaustive index pool == the exact twin (scores bit-equal)") {
    val (exactDf, exactPins) = RagServe.mmrExactPinned(corpusEmb, queries)
    val exact = rows(exactDf)
    exactPins.foreach(_.unpersist())
    spark.catalog.clearCache()
    val (ixDf, ixPins) = RagServe.mmrFromIndexPinned(spark, annDir,
      corpusEmb, queries, r = nEmb.toInt + 1, nProbe = 100000)
    val fromIx = rows(ixDf)
    ixPins.foreach(_.unpersist())
    spark.catalog.clearCache()
    assert(exact.size == NQ * 3 && fromIx == exact,
      s"ix-only: ${(fromIx.toSet -- exact.toSet).take(3)}; " +
        s"exact-only: ${(exact.toSet -- fromIx.toSet).take(3)}")
  }

  // the s15 metadata predicate's keep-set: even labels only
  private lazy val keepIds =
    corpusEmb.filter(col("label") % 2 === 0).select(col("vec_id"))

  test("filtered hybrid: exhaustive index parameters == the exact filtered twin") {
    val exact = rows(RagServe.hybridExactWhere(corpusDocs, corpusEmb,
      queries, keepIds))
    spark.catalog.clearCache()
    val fromIx = rows(RagServe.hybridFromIndexesWhere(spark, annDir,
      dedupIx, keepIds, corpusEmb, queries, r = 100, nProbe = 100000))
    spark.catalog.clearCache()
    assert(exact.nonEmpty && fromIx == exact,
      s"ix-only: ${(fromIx.toSet -- exact.toSet).take(3)}; " +
        s"exact-only: ${(exact.toSet -- fromIx.toSet).take(3)}")
    // pre-filter semantics: no returned doc violates the predicate
    val got = RagServe.hybridFromIndexesWhere(spark, annDir, dedupIx,
      keepIds, corpusEmb, queries, r = 100, nProbe = 100000)
      .join(keepIds.select(col("vec_id").as("doc_id")),
        Seq("doc_id"), "left_anti")
    assert(got.isEmpty, "a filtered hybrid result leaked a filtered doc")
    spark.catalog.clearCache()
  }

  test("filtered mmr: exhaustive index pool == the exact filtered twin") {
    val (exactDf, exactPins) = RagServe.mmrExactWherePinned(corpusEmb,
      queries, keepIds)
    val exact = rows(exactDf)
    exactPins.foreach(_.unpersist())
    spark.catalog.clearCache()
    val (ixDf, ixPins) = RagServe.mmrFromIndexWherePinned(spark, annDir,
      keepIds, corpusEmb, queries, r = nEmb.toInt + 1, nProbe = 100000)
    val fromIx = rows(ixDf)
    ixPins.foreach(_.unpersist())
    spark.catalog.clearCache()
    assert(exact.size == NQ * 3 && fromIx == exact,
      s"ix-only: ${(fromIx.toSet -- exact.toSet).take(3)}; " +
        s"exact-only: ${(exact.toSet -- fromIx.toSet).take(3)}")
  }

  test("facade: served variants materialize and release every pin") {
    val dedupDir = tmp("dedup_facade")
    DedupIndex.build(corpusDocs, dedupDir, -1L)
    spark.catalog.clearCache()
    graft.Graft.hybridSearchFrom(spark, annDir, dedupDir, corpusEmb,
      queries).count()
    graft.Graft.mmrRerankFrom(spark, annDir, corpusEmb, queries).count()
    graft.Graft.hybridSearchFromWhere(spark, annDir, dedupDir, keepIds,
      corpusEmb, queries).count()
    graft.Graft.mmrRerankFromWhere(spark, annDir, keepIds, corpusEmb,
      queries).count()
    graft.Graft.mmrRerankServe(corpusEmb, queries).count()
    graft.Graft.hybridSearchServe(corpusDocs, corpusEmb, queries).count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "a served RAG facade call left entries pinned in the session cache")
  }
}
