package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.queries.{DedupQueries, SimilarityQueries}

/** Artifact-backed RAG retrieval (r10 verdict #3): the s13 hybrid-RRF
  * and s14 MMR compositions re-pointed at PERSISTED indexes for an
  * OUT-OF-CORPUS query batch — the shape a deployment actually runs.
  * The inline gate queries rescan raw embeddings and re-shingle the
  * corpus text per call; here the vector leg draws CANDIDATES from a
  * loaded [[AnnIndex]] (any family) and exact-reranks only those, and
  * the lexical leg scores shingle overlap against the [[DedupIndex]]
  * artifact's stored hashed shingle sets — corpus text and the full
  * embedding table never stream through a call (only candidate
  * vectors are joined from the store).
  *
  * Every composition has an EXACT twin (`hybridExact` / `mmrExact*`)
  * over the same out-of-corpus query batch — the truth leg: with
  * exhaustive index parameters (probe all cells, R ≥ corpus) the
  * artifact-backed result is byte-identical to it (RagServeSpec, the
  * AnnServeSpec pattern), proving the plumbing loses nothing and the
  * approximation is exactly the candidate truncation.
  *
  * Queries carry their own id namespace, disjoint from the corpus
  * (the serving contract shared with [[AnnIndex]] `*Serve`).
  */
object RagServe {

  /** Uniform (query_id, doc_id) candidates from a persisted ANN index,
    * family-dispatched with EXPLICIT probe parameters (r = per-query
    * candidate budget; nProbe where the family probes buckets/cells) —
    * [[AnnIndex.serveTopK]]'s dispatch with the knobs the exhaustive
    * identities need exposed. `emb` is consulted by the compressed
    * families only (their serve paths exact-rerank internally). */
  def annCandidates(spark: SparkSession, dir: String, queries: DataFrame,
      emb: DataFrame, r: Int, nProbe: Int): DataFrame =
    // one dispatch, owned by AnnIndex.serveTopK (topK = r: the pool IS
    // the candidate budget; explicit knobs win over manifest-tuned ones
    // there, so exhaustive-identity callers are unchanged)
    AnnIndex.serveTopK(spark, dir, queries, emb, topK = r, r = r,
        nProbe = nProbe)
      .select(col("query_id"), col("neighbor_id").as("doc_id")).distinct()

  /** [[annCandidates]] under a PRE-FILTER keep-set: the family dispatch
    * of [[AnnIndex.serveTopKWhere]] with the explicit (r, nProbe) knobs
    * the exhaustive identities need — the stored scan-side table is
    * semi-joined against `keepIds` BEFORE scoring, so the r-budget
    * fills with docs the predicate admits (post-filtering an
    * unfiltered candidate set under-fills whenever the neighborhood is
    * predicate-poor). */
  def annCandidatesWhere(spark: SparkSession, dir: String,
      queries: DataFrame, keepIds: DataFrame, emb: DataFrame, r: Int,
      nProbe: Int): DataFrame =
    AnnIndex.serveTopKWhere(spark, dir, queries, keepIds, emb,
        topK = r, r = r, nProbe = nProbe)
      .select(col("query_id"), col("neighbor_id").as("doc_id")).distinct()

  /** The query batch's (query_id, h) posting probe rows. On a BUCKETED
    * artifact the frame is consumed three times per call (the keysHint
    * count, probeWindow's bucket collect, the broadcast join), so the
    * lineage is cut once with an eager localCheckpoint — the shingle
    * hashing + explode run once; the blocks are GC-managed and tiny
    * (queries × shingles). Flat artifacts keep the lazy frame (one
    * consumer). */
  private def queryPostings(dedup: DedupIndex.LoadedDedup,
      queries: DataFrame): DataFrame = {
    val qPost = DedupQueries.hashedShingleSets(
        queries.select(col("query_id").as("doc_id"), col("text")))
      .select(col("doc_id").as("query_id"), explode(col("hs")).as("h"))
    if (dedup.manifest.params.getOrElse("layout_buckets", 0L) > 0)
      qPost.localCheckpoint(true)
    else qPost
  }

  /** The distinct-shingle-hash count of a query batch — the `keysHint`
    * [[DedupIndex.probePostings]]'s bucket-pruning gate needs. Paid
    * (one bounded count job over the broadcast-sized query batch) ONLY
    * when the artifact's posting slab is actually bucket-partitioned;
    * −1 (gate stays closed, full-slab fallback) otherwise. */
  private def postingKeysHint(dedup: DedupIndex.LoadedDedup,
      qPost: DataFrame): Long =
    if (dedup.manifest.params.getOrElse("layout_buckets", 0L) > 0)
      qPost.select(col("h")).distinct().count()
    else -1L

  // ---- hybrid RRF ------------------------------------------------------

  /** The exact serve twin: lexical leg = exact shared-shingle rank over
    * the corpus TEXT, vector leg = exact cosine rank over the full
    * embedding store, fused by RRF — s13's semantics for an
    * out-of-corpus (query_id, text, embedding) batch. The truth leg
    * RagServeSpec pins [[hybridFromIndexes]] against. */
  def hybridExact(docs: DataFrame, emb: DataFrame, queries: DataFrame,
      topK: Int = 3, kRrf: Int = 60, r: Int = 100): DataFrame = {
    val sh = docs.select(col("doc_id"), TextOps.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val qsh = queries
      .select(col("query_id"), TextOps.shingles(col("text")).as("qsh"))
      .filter(size(col("qsh")) > 0)
    val lexRank = SimilarityQueries.lexRankOn(
      sh.join(broadcast(qsh))
        .select(col("query_id"), col("doc_id"),
          size(array_intersect(col("qsh"), col("sh"))).cast("bigint")
            .as("inter")), r)
    val vecRank = SimilarityQueries
      .cosineRankServe(emb, queries.select("query_id", "embedding"), r)
      .select(col("query_id"), col("doc_id"), col("vec_rank"))
    SimilarityQueries.rrfFuse(lexRank, vecRank, kRrf, topK)
  }

  /** Hybrid RRF from the artifacts: vector candidates from the loaded
    * ANN index (exact-cosine reranked), lexical overlap from the dedup
    * artifact's stored POSTING LIST — the query batch's shingle hashes
    * explode to (query_id, h) rows (a bounded broadcast side: queries ×
    * shingles-per-doc), equi-join the stored (h, doc_id) postings, and
    * the per-(query, doc) match count IS |qhs ∩ hs| because both sides
    * are distinct-hash sets. Only docs sharing ≥ 1 query shingle ever
    * leave the join — no per-doc array intersect across the corpus, no
    * corpus text, no full-embedding rescan, nothing re-fit. Same output
    * schema as s13: (query_id, doc_id, lex_rank, vec_rank, rk, rrf_r). */
  def hybridFromIndexes(spark: SparkSession, annDir: String,
      dedup: DedupIndex.LoadedDedup, emb: DataFrame, queries: DataFrame,
      topK: Int = 3, kRrf: Int = 60, r: Int = 100,
      nProbe: Int = 32): DataFrame = {
    val qPost = queryPostings(dedup, queries)
    // on a bucket-partitioned slab, one bounded count of the query
    // batch's distinct shingle hashes arms probePostings' pruning gate
    // (keysHint ≥ 0 — without it the gate never engages, r12 ADVICE);
    // identical rows either way, only non-matching bucket dirs skipped
    val keysHint = postingKeysHint(dedup, qPost)
    val lexRank = SimilarityQueries.lexRankOn(
      DedupIndex.probePostings(dedup, qPost, keysHint)
        .join(broadcast(qPost), "h")
        .groupBy(col("query_id"), col("doc_id"))
        .agg(count(lit(1)).as("inter")), r)
    val cand = annCandidates(spark, annDir,
      queries.select("query_id", "embedding"), emb, r, nProbe)
    val vecRank = SimilarityQueries.cosineRankOnPairs(cand, emb,
        queries.select("query_id", "embedding"), r)
      .select(col("query_id"), col("doc_id"), col("vec_rank"))
    SimilarityQueries.rrfFuse(lexRank, vecRank, kRrf, topK)
  }

  /** The exact FILTERED serve twin: s15's pre-filter semantics for an
    * out-of-corpus query batch — one keep-set (`vec_id` column, the
    * metadata predicate's surviving ids) restricts BOTH legs via a semi
    * join BEFORE any ranking, so ranks are positions within the
    * filtered corpus. The truth leg [[hybridFromIndexesWhere]] is
    * pinned against. */
  def hybridExactWhere(docs: DataFrame, emb: DataFrame, queries: DataFrame,
      keepIds: DataFrame, topK: Int = 3, kRrf: Int = 60,
      r: Int = 100): DataFrame = {
    val keepDoc = keepIds.select(col("vec_id").as("doc_id"))
    val sh = docs.select(col("doc_id"), TextOps.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .join(keepDoc, Seq("doc_id"), "left_semi")
    val qsh = queries
      .select(col("query_id"), TextOps.shingles(col("text")).as("qsh"))
      .filter(size(col("qsh")) > 0)
    val lexRank = SimilarityQueries.lexRankOn(
      sh.join(broadcast(qsh))
        .select(col("query_id"), col("doc_id"),
          size(array_intersect(col("qsh"), col("sh"))).cast("bigint")
            .as("inter")), r)
    val vecRank = SimilarityQueries.cosineRankServe(
        emb.join(keepIds.select(col("vec_id")), Seq("vec_id"), "left_semi"),
        queries.select("query_id", "embedding"), r)
      .select(col("query_id"), col("doc_id"), col("vec_rank"))
    SimilarityQueries.rrfFuse(lexRank, vecRank, kRrf, topK)
  }

  /** FILTERED hybrid RRF from the artifacts (r11 verdict #2): the
    * deployed RAG query — "hybrid top-k among the docs this user may
    * see" — served from the persisted indexes. The keep-set composes
    * into both legs with PRE-FILTER semantics:
    *   - vector leg: [[annCandidatesWhere]] semi-joins the STORED
    *     scan-side table before scoring, so the candidate budget fills
    *     with admitted docs only
    *   - lexical leg: the posting-list probe runs first (the broadcast
    *     h-join bounds rows to docs sharing a query shingle — the slab
    *     itself is never shuffled), then the bounded (query, doc)
    *     matches semi-join the keep-set BEFORE ranking, so lex ranks
    *     are positions within the filtered corpus
    * With exhaustive parameters the result is byte-identical to
    * [[hybridExactWhere]] (RagServeSpec pins it). */
  def hybridFromIndexesWhere(spark: SparkSession, annDir: String,
      dedup: DedupIndex.LoadedDedup, keepIds: DataFrame, emb: DataFrame,
      queries: DataFrame, topK: Int = 3, kRrf: Int = 60, r: Int = 100,
      nProbe: Int = 32): DataFrame = {
    val keepDoc = keepIds.select(col("vec_id").as("doc_id"))
    val qPost = queryPostings(dedup, queries)
    val keysHint = postingKeysHint(dedup, qPost)
    val lexRank = SimilarityQueries.lexRankOn(
      DedupIndex.probePostings(dedup, qPost, keysHint)
        .join(broadcast(qPost), "h")
        .groupBy(col("query_id"), col("doc_id"))
        .agg(count(lit(1)).as("inter"))
        .join(keepDoc, Seq("doc_id"), "left_semi"), r)
    val cand = annCandidatesWhere(spark, annDir,
      queries.select("query_id", "embedding"), keepIds, emb, r, nProbe)
    val vecRank = SimilarityQueries.cosineRankOnPairs(cand, emb,
        queries.select("query_id", "embedding"), r)
      .select(col("query_id"), col("doc_id"), col("vec_rank"))
    SimilarityQueries.rrfFuse(lexRank, vecRank, kRrf, topK)
  }

  // ---- MMR -------------------------------------------------------------

  /** The exact serve twin of the MMR composition: relevance pool = the
    * exhaustive cosine rank over the store, then the IDENTICAL greedy
    * selection rounds as s14 (shared factored half). Returns the pins
    * the caller releases after materializing (the mmrRerankPinned
    * contract). */
  def mmrExactPinned(emb: DataFrame, queries: DataFrame, poolR: Int = 10,
      topK: Int = 3): (DataFrame, Seq[DataFrame]) =
    mmrFromRankedPool(SimilarityQueries.cosineRankServe(emb,
      queries.select("query_id", "embedding"), poolR), emb, topK)

  /** MMR re-ranking whose relevance pool comes from the loaded ANN
    * index's candidates (exact-cosine reranked to pool order) — with
    * exhaustive parameters the pool, and therefore every selection
    * round and score, is byte-identical to [[mmrExactPinned]]. */
  def mmrFromIndexPinned(spark: SparkSession, annDir: String,
      emb: DataFrame, queries: DataFrame, poolR: Int = 10, topK: Int = 3,
      r: Int = 100, nProbe: Int = 32): (DataFrame, Seq[DataFrame]) = {
    val cand = annCandidates(spark, annDir,
      queries.select("query_id", "embedding"), emb, r, nProbe)
    mmrFromRankedPool(SimilarityQueries.cosineRankOnPairs(cand, emb,
      queries.select("query_id", "embedding"), poolR), emb, topK)
  }

  /** The exact FILTERED MMR twin: relevance pool = exhaustive cosine
    * rank over the keep-set's slice of the store; selection rounds
    * identical (the diversity leg touches only pool members, which are
    * keep-admitted by construction). */
  def mmrExactWherePinned(emb: DataFrame, queries: DataFrame,
      keepIds: DataFrame, poolR: Int = 10,
      topK: Int = 3): (DataFrame, Seq[DataFrame]) =
    mmrFromRankedPool(SimilarityQueries.cosineRankServe(
      emb.join(keepIds.select(col("vec_id")), Seq("vec_id"), "left_semi"),
      queries.select("query_id", "embedding"), poolR), emb, topK)

  /** FILTERED MMR from the loaded ANN index (r11 verdict #2): the pool
    * comes from [[annCandidatesWhere]] (pre-filter semantics), so every
    * selection round works within the admitted corpus — with exhaustive
    * parameters byte-identical to [[mmrExactWherePinned]]. */
  def mmrFromIndexWherePinned(spark: SparkSession, annDir: String,
      keepIds: DataFrame, emb: DataFrame, queries: DataFrame,
      poolR: Int = 10, topK: Int = 3, r: Int = 100,
      nProbe: Int = 32): (DataFrame, Seq[DataFrame]) = {
    val cand = annCandidatesWhere(spark, annDir,
      queries.select("query_id", "embedding"), keepIds, emb, r, nProbe)
    mmrFromRankedPool(SimilarityQueries.cosineRankOnPairs(cand, emb,
      queries.select("query_id", "embedding"), poolR), emb, topK)
  }

  private def mmrFromRankedPool(ranked: DataFrame, emb: DataFrame,
      topK: Int): (DataFrame, Seq[DataFrame]) = {
    val pool = ranked.select(col("query_id"), col("doc_id"), col("sim"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    pool.count() // referenced by every selection round (house discipline)
    val eVec = emb.select(col("vec_id").as("doc_id"),
        TextOps.quantize(col("embedding")).as("dq"))
      .withColumn("dnn", TextOps.qdot(col("dq"), col("dq")))
    val (out, dsPins) = SimilarityQueries.mmrSelectFromPool(pool, eVec, topK)
    (out, pool +: dsPins)
  }
}
