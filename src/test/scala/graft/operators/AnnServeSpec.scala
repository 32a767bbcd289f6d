package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}
import graft.queries.SimilarityQueries

/** Out-of-corpus serving contract (r9 verdict top item): every loaded
  * index family answers a query batch of NEW vectors — ids in their own
  * namespace, never sliced from the indexed corpus — by assigning the
  * batch against the STORED quantizers and probing the stored artifact.
  *
  * The load-bearing checks are the EXHAUSTIVE-PARAMETER identities:
  * probe everything (nProbe ≥ cells, R ≥ corpus) and the approximate
  * serving path must return byte-identically what the exact bipartite
  * scan returns — proving the serve plumbing loses nothing and the
  * approximation is exactly (and only) the probe/candidate truncation.
  * Plus: the id-namespace contract (a query id colliding with a corpus
  * id is NOT self-excluded), serving-path recall pins at the gate
  * parameters, and the plan gates (query batch broadcasts; the stored
  * artifact streams through one broadcast hash join, never shuffles).
  */
class AnnServeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val NQ = 8
  // hold the first NQ vectors OUT of the corpus; serve them as new
  // queries under ids disjoint from every corpus vec_id
  private lazy val corpus =
    Tables.embeddings(spark, sf).filter(col("vec_id") >= NQ)
  private lazy val nCorpus = Tables.embeddingsRows(spark, sf) - NQ
  private lazy val queries = Tables.embeddings(spark, sf)
    .filter(col("vec_id") < NQ)
    .select((col("vec_id") + 1000000L).as("query_id"), col("embedding"))
  private val dim = Tables.EmbeddingDim

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"annserve_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  /** Exact bipartite L2 top-k (the rerank metric): every (query, corpus)
    * pair reranked — the truth leg for the L2-ranked families. */
  private def exactL2(topK: Int = 3): Seq[String] = {
    val vecs = corpus.select(col("vec_id"),
      TextOps.quantize(col("embedding")).as("q"))
    val qfull = queries.select(col("query_id"),
      TextOps.quantize(col("embedding")).as("qq"))
    val cand = queries.select(col("query_id"))
      .crossJoin(corpus.select(col("vec_id").as("neighbor_id")))
    rows(ProductQuantizer.rerank(cand, vecs, qfull, topK))
  }

  test("ivf serve: probe ALL cells == exact bipartite cosine top-k") {
    val dir = tmp("ivf")
    AnnIndex.buildIvf(corpus, dir, dim, nCorpus)
    val ix = AnnIndex.loadIvf(spark, dir)
    val served = rows(AnnIndex.ivfServe(ix, queries, topK = 3, nProbe = 100000)
      .select(col("query_id"), col("neighbor_id"), col("rk"), col("cosine_r")))
    val exact = rows(SimilarityQueries.cosineTopKServe(corpus, queries, 3))
    assert(served.nonEmpty && served == exact)
  }

  test("pq serve: R >= corpus == exact bipartite L2 top-k; default-R recall pinned") {
    val dir = tmp("pq")
    AnnIndex.buildPq(corpus, dir, dim, m = 8, k = 64, nHint = nCorpus)
    val ix = AnnIndex.loadPq(spark, dir)
    val served = rows(AnnIndex.pqServe(ix, corpus, queries,
      r = nCorpus.toInt + 1, topK = 3))
    assert(served.nonEmpty && served == exactL2())
  }

  test("ivfpq serve: probe ALL cells at R >= corpus == exact bipartite L2 top-k") {
    val dir = tmp("ivfpq")
    AnnIndex.buildIvfPq(corpus, dir, dim, m = 8, k = 64, nHint = nCorpus)
    val ix = AnnIndex.loadIvfPq(spark, dir)
    val served = rows(AnnIndex.ivfPqServe(ix, corpus, queries,
      r = nCorpus.toInt + 1, topK = 3, nProbe = 100000))
    spark.catalog.clearCache()
    assert(served.nonEmpty && served == exactL2())
  }

  test("sq8 serve: rerank R >= corpus == exact bipartite dot top-k") {
    val dir = tmp("sq")
    AnnIndex.buildSq(corpus, dir, dim, nCorpus)
    assert(AnnIndex.readManifest(spark, dir).n == nCorpus) // r9 nit #2
    val ix = AnnIndex.loadSq(spark, dir)
    val served = rows(AnnIndex.sqServe(ix, corpus, queries,
      topK = 3, rerankR = nCorpus.toInt + 1))
    val vecs = corpus.select(col("vec_id"),
      TextOps.quantize(col("embedding")).as("q"))
    val qfull = queries.select(col("query_id"),
      TextOps.quantize(col("embedding")).as("qq"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id"))
    val exact = rows(vecs.join(broadcast(qfull))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        TextOps.qdot(col("qq"), col("q")).as("dot"))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("rk"), col("dot")))
    assert(served.nonEmpty && served == exact)
  }

  test("id namespaces are independent: a colliding query id is NOT self-excluded") {
    // a query whose numeric id ALSO names a corpus vector, carrying that
    // very vector's embedding — the serving path must return the corpus
    // twin at rank 1 with exact distance 0 (the in-corpus gate paths
    // exclude self-matches; serving must not)
    val cloneOf = NQ + 34L
    val q1 = Tables.embeddings(spark, sf).filter(col("vec_id") === cloneOf)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val dir = tmp("collide")
    AnnIndex.buildPq(corpus, dir, dim, m = 8, k = 64, nHint = nCorpus)
    val top1 = AnnIndex.pqServe(AnnIndex.loadPq(spark, dir), corpus, q1,
        r = 20, topK = 1).head()
    assert(top1.getLong(0) == cloneOf && top1.getLong(2) == cloneOf
      && top1.getLong(3) == 0L,
      s"expected the corpus twin at rank 1 with dist 0: $top1")
  }

  test("lsh serve: stored mask width honored; recall vs exact pinned; deterministic") {
    val dir = tmp("lsh")
    AnnIndex.buildLsh(corpus, dir, dim, nCorpus)
    val ix = AnnIndex.loadLsh(spark, dir)
    val a = rows(AnnIndex.lshServe(ix, queries))
    assert(a.nonEmpty && a == rows(AnnIndex.lshServe(ix, queries)))
    val row = AnnIndex.recallVsExactOn(spark, dir, corpus, queries).head()
    assert(row.getString(0) == "lsh" && row.getLong(1) == NQ.toLong
      && row.getLong(3) == 3L * NQ)
    val recall = row.getDouble(5)
    assert(recall > 0.0 && recall <= 1.0, s"lsh serve recall $recall")
  }

  test("serving-path recall: exhaustive parameters reach 1.0; gate parameters measured") {
    val dir = tmp("recall_ivf")
    AnnIndex.buildIvf(corpus, dir, dim, nCorpus)
    // recallVsExactOn uses the family defaults (the gate shape)
    val gate = AnnIndex.recallVsExactOn(spark, dir, corpus, queries).head()
    assert(gate.getString(0) == "ivf" && gate.getLong(3) == 3L * NQ)
    assert(gate.getDouble(5) > 0.0 && gate.getDouble(5) <= 1.0)
    // exhaustive probing must reach exactly 1.0 — the serve plumbing
    // loses nothing beyond the probe truncation
    val ix = AnnIndex.loadIvf(spark, dir)
    val served = AnnIndex.ivfServe(ix, queries, topK = 3, nProbe = 100000)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = SimilarityQueries.cosineTopKServe(corpus, queries, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty && truth.forall(served.contains))
  }

  test("filtered serve (pre-filter): probe ALL cells == exact over the FILTERED corpus") {
    // the metadata predicate is one semi join against the stored
    // inverted file; with every cell probed the result must be
    // byte-equal to the exact bipartite scan over the filtered corpus —
    // and stricter than post-filtering, which would under-fill k
    val pred = col("label") % 2 === 0
    val keep = corpus.filter(pred).select(col("vec_id"))
    val dir = tmp("ivf_where")
    AnnIndex.buildIvf(corpus, dir, dim, nCorpus)
    val ix = AnnIndex.loadIvf(spark, dir)
    val served = rows(SimilarityQueries.ivfServeFromAssign(
        ix.assign.join(keep, Seq("vec_id"), "left_semi"), ix.centroids,
        queries, topK = 3, nProbe = 100000)
      .select(col("query_id"), col("neighbor_id"), col("rk"), col("cosine_r")))
    val exact = rows(SimilarityQueries.cosineTopKServe(
      corpus.filter(pred), queries, 3))
    assert(served.nonEmpty && served == exact)
    // the default-parameter facade returns only predicate-passing rows
    val got = AnnIndex.serveTopKWhere(spark, dir, queries, keep, corpus)
      .select(col("neighbor_id")).collect().map(_.getLong(0)).toSet
    val allowed = keep.collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty && got.forall(allowed.contains))
  }

  test("filtered serving-path recall: exhaustive params reach 1.0 on the keep slice") {
    val pred = col("label") % 2 === 0
    val keep = corpus.filter(pred).select(col("vec_id"))
    val dir = tmp("recall_where")
    AnnIndex.buildIvf(corpus, dir, dim, nCorpus)
    // the tuning row at the family defaults (the deployed shape)
    val gate = AnnIndex.recallVsExactOnWhere(spark, dir, corpus, queries,
      keep).head()
    assert(gate.getString(0) == "ivf" && gate.getLong(3) == 3L * NQ)
    assert(gate.getDouble(5) > 0.0 && gate.getDouble(5) <= 1.0)
    // exhaustive probes: the filtered serve loses nothing beyond the
    // probe truncation — recall exactly 1.0 against the filtered truth
    val served = AnnIndex.serveTopKWhere(spark, dir, queries, keep, corpus,
        topK = 3, nProbe = 100000)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = SimilarityQueries.cosineTopKServe(corpus.filter(pred),
        queries, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty && truth.forall(served.contains))
  }

  test("filtered serve on the compressed family: exhaustive R == exact filtered L2") {
    val pred = col("label") % 2 === 0
    val keep = corpus.filter(pred).select(col("vec_id"))
    val dir = tmp("ipq_where")
    AnnIndex.buildIvfPq(corpus, dir, dim, m = 8, k = 64, nHint = nCorpus)
    val ix = AnnIndex.loadIvfPq(spark, dir)
    val filtered = corpus.filter(pred)
    val served = rows(SimilarityQueries.ivfPqServeOn(
      ix.codes.join(keep, Seq("vec_id"), "left_semi"), ix.codebook,
      ix.centroids, filtered, queries, dim, 8,
      r = nCorpus.toInt + 1, topK = 3, nProbe = 100000))
    val vecs = filtered.select(col("vec_id"),
      TextOps.quantize(col("embedding")).as("q"))
    val qfull = queries.select(col("query_id"),
      TextOps.quantize(col("embedding")).as("qq"))
    val cand = queries.select(col("query_id"))
      .crossJoin(filtered.select(col("vec_id").as("neighbor_id")))
    val exact = rows(ProductQuantizer.rerank(cand, vecs, qfull, 3))
    spark.catalog.clearCache()
    assert(served.nonEmpty && served == exact)
  }

  test("serving sees appended vectors: a post-append clone query returns it at rank 1") {
    // the ingest→serve loop: append new vectors with frozen quantizers,
    // then serve a query carrying one appended vector's embedding — the
    // loaded index must retrieve the appended twin at rank 1, distance 0
    val dir = tmp("append_serve")
    AnnIndex.buildIvfPq(corpus, dir, dim, m = 8, k = 64, nHint = nCorpus)
    val inc = Tables.embeddings(spark, sf).filter(col("vec_id") < NQ)
      .select((col("vec_id") + 5000000L).as("vec_id"), col("embedding"),
        col("label"))
    AnnIndex.appendIvfPq(inc, dir)
    val fullEmb = corpus.unionByName(inc)
    val q1 = inc.filter(col("vec_id") === 5000003L)
      .select((col("vec_id") + 1000L).as("query_id"), col("embedding"))
    val top1 = AnnIndex.ivfPqServe(AnnIndex.loadIvfPq(spark, dir), fullEmb,
      q1, topK = 1).head()
    spark.catalog.clearCache()
    assert(top1.getLong(2) == 5000003L && top1.getLong(3) == 0L,
      s"appended twin must serve at rank 1 with dist 0: $top1")
  }

  test("plan gates: the query batch broadcasts; the stored artifact never shuffles") {
    val dirL = tmp("plan_lsh")
    AnnIndex.buildLsh(corpus, dirL, dim, nCorpus)
    val lsh = AnnIndex.lshServe(AnnIndex.loadLsh(spark, dirL), queries)
    // inspect BEFORE execution: the post-collect AQE string appends an
    // "Initial Plan" copy that double-counts every exchange line
    val pl = lsh.queryExecution.executedPlan.toString
    assert(pl.contains("BroadcastHashJoin"),
      s"probe join must broadcast the query batch:\n$pl")
    assert(!pl.contains("CartesianProduct"), pl)
    // ONE exchange: the rank-by-query window; the signature table itself
    // is never re-partitioned
    val exchanges = pl.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"only the rank exchange expected:\n$pl")

    val dirI = tmp("plan_ipq")
    AnnIndex.buildIvfPq(corpus, dirI, dim, m = 8, k = 64, nHint = nCorpus)
    val ipq = AnnIndex.ivfPqServe(AnnIndex.loadIvfPq(spark, dirI), corpus,
      queries)
    ipq.collect()
    val pi = ipq.queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    assert(!pi.contains("CartesianProduct"), pi)
    // the one legitimate nested-loop shape is the batch×centroids
    // scoring join — it must build on the broadcast side
    val bnlj = pi.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnlj.forall(_.contains("BuildRight")),
      s"centroid scoring must build on the broadcast side:\n${bnlj.mkString("\n")}")
    assert(pi.contains("BroadcastHashJoin"),
      "LUT/candidate joins must broadcast the small side")
  }
}
