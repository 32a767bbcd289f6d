package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.XHash
import graft.operators.TextOps

/** Similarity search over the `embeddings` table (BASELINE.json north
  * star): brute-force cosine top-k as the exact baseline, and a
  * sign-random-projection LSH bucketed variant as the scale path.
  *
  * Determinism: embeddings are quantized to int64 (1e-6) so dot products
  * and norms are exact integers in both engines; cosine is then a fixed
  * IEEE expression — the oracle matches bit-for-bit, including for the
  * "approximate" LSH operator (its hyperplanes are hash-derived, not
  * random). See TextOps.quantize / XHash.
  */
object SimilarityQueries {
  private val TopK = 3
  private val NQueries = 32 // query subset for the brute-force baseline
  // s2's signature is computed at a FIXED width (so the oracle's
  // hyperplane SQL stays a static string) and then MASKED to a
  // size-derived bucket width at query time — the dynamic half of the
  // knob lives in a closed form both engines evaluate identically
  private val SigBits = 24 // static hyperplane count (mask never exceeds)
  // s3 probes each query vector's NProbe nearest cells (FAISS nprobe):
  // single-probe recall is bounded by how often the true neighbor shares
  // the ONE nearest centroid (~0.2 measured on this corpus); probing the
  // 4 nearest cells recovers most of it for a ×4 bounded candidate cost
  private val NProbe = 4
  // s2's multi-probe analogue (round-5 verdict top item): probe the
  // query's masked signature plus its AnnProbes−1 single-bit-flip
  // neighbors — the Hamming-adjacent buckets where a near-neighbor whose
  // signature disagrees in exactly one probed bit lands. Flip bits
  // 0..AnnProbes−2, all inside the minimum 3-bit mask, so every probe
  // targets a real bucket at any corpus size. Single-probe sign-LSH
  // recall is p^bits (p = 1−θ/π); each probed bit adds p^(bits−1)(1−p) —
  // measured on sf0.01: 0.198 single-probe → 0.75 at 4 probes (past
  // s3's nprobe=4 0.4375), at the same bounded ×4 candidate cost.
  private val AnnProbes = 4

  /** Bucket width for s2: ceil(log2(n / 64)) bits, clamped [3, SigBits] —
    * ~64 vectors per bucket at any corpus size, so candidate pairs stay
    * ~64·n (linear) instead of n²/2^bits with fixed bits. The round-4
    * 100× octave measured the fixed-8-bit version growing toward its
    * n²/256 asymptote — same class of latent quadratic as s3's fixed-C
    * IVF, fixed the same way.
    *
    * PURE INTEGER arithmetic (r4 ADVICE): ceil(log2 n) = 64 − nlz(n−1),
    * so raw = that − 6 — the float log-ratio form can flip by one ulp at
    * exact power-of-two boundaries and diverge from the oracle, whose
    * twin is a closed integer form too (smallest r with 2^(r+6) ≥ n,
    * found by comparing EXACT doubles — powers of two and counts are both
    * exactly representable). */
  private[graft] def annBucketBits(n: Long): Int = {
    val raw = 58 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n - 1L))
    math.min(SigBits, math.max(3, raw))
  }

  /** Brute-force exact top-k: queries × all candidates, ranked by
    * (cosine desc, vec_id). At scale: broadcast the query set, one pass
    * over candidates, TakeOrdered per query — no shuffle of the big side.
    */
  private[graft] def cosineTopK(emb: DataFrame, nQueries: Int = NQueries,
      topK: Int = TopK): DataFrame = {
    val e = emb
      .select(col("vec_id"), TextOps.quantize(col("embedding")).as("q"))
      .withColumn("nn", TextOps.qdot(col("q"), col("q")))
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("nn").as("qnn"))
    val scored = e.join(broadcast(queries), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (TextOps.qdot(col("qq"), col("q")).cast("double") /
          (sqrt(col("qnn").cast("double")) * sqrt(col("nn").cast("double"))))
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("rk"),
        round(col("cosine"), 6).as("cosine_r"))
  }
  private val cosineTopKSql =
    s"""WITH q AS (SELECT vec_id, ${TextOps.quantizeSql("embedding")} AS q FROM embeddings),
       |e AS (SELECT vec_id, unnest(q) AS v, generate_subscripts(q, 1) AS i FROM q),
       |norms AS (SELECT vec_id, SUM(v * v) AS nn FROM e GROUP BY 1),
       |dot AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.v * b.v) AS dot
       |  FROM e a JOIN e b ON a.i = b.i AND a.vec_id < $NQueries
       |   AND b.vec_id <> a.vec_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS cosine
       |  FROM dot JOIN norms na ON na.vec_id = query_id
       |  JOIN norms nb ON nb.vec_id = neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS rk, cosine
       |  FROM scored)
       |SELECT query_id, neighbor_id, rk, round(cosine, 6) AS cosine_r
       |FROM ranked WHERE rk <= $TopK""".stripMargin

  /** Sign-random-projection signature: bit j = sign(Σ_i w_ij · q_i) with
    * ±1 weights derived from the cross-engine hash of (j, i) — a
    * deterministic, oracle-checkable LSH.
    *
    * The weights depend only on (j, i), so they are folded at PLAN time
    * into `SigBits` literal arrays (hash60Local == the engines' hash60);
    * each projection is then one codegen'd `LongArrayDot` against a
    * constant — the whole signature is a narrow projection: no explode
    * (the previous form shuffled dim×SigBits rows per vector through two
    * hash-aggregates — measured 2.2 s vs 0.6 s at sf0.1), no shuffle, no
    * join, and it scales per-row at 100 TB. */
  private def sigCol(dim: Int): Column = {
    val weights = Array.tabulate(SigBits, dim)((j, i) =>
      if (XHash.hash60Local(s"${j}_$i") % 2 == 0) 1L else -1L)
    (0 until SigBits).map { j =>
      when(graft.functions.LongArrayDot(col("q"), lit(weights(j))) > 0,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  private val lshSignatureSql =
    s"""SELECT vec_id,
       |  CAST(SUM(CASE WHEN proj > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS sig
       |FROM (
       |  SELECT vec_id, r.range AS j,
       |    SUM(CASE WHEN ${XHash.hash60Sql("concat(r.range, '_', e.i)")} % 2 = 0
       |      THEN e.v ELSE -e.v END) AS proj
       |  FROM (SELECT vec_id, unnest(q) AS v, generate_subscripts(q, 1) - 1 AS i
       |        FROM (SELECT vec_id, ${TextOps.quantizeSql("embedding")} AS q
       |              FROM embeddings)) e
       |  CROSS JOIN range($SigBits) r
       |  GROUP BY 1, 2)
       |GROUP BY vec_id""".stripMargin

  /** ANN via LSH buckets: candidates share the low `annBucketBits(n)`
    * bits of the signature; exact cosine rank within the bucket. The
    * equi-join on the masked signature is the scale path — shuffle by
    * bucket, never all-pairs, ~64 vectors per bucket at any n.
    *
    * Multi-probe: the QUERY side explodes to `nProbe` signatures (the
    * masked signature plus nProbe−1 single-bit flips); the INDEX side
    * stays one row per vector. Probe signatures are pairwise distinct,
    * so each (a, b) pair still meets at most once, and flipping is
    * symmetric (if a's flip reaches b's bucket, b's flip reaches a's),
    * so the `vec_a < vec_b` orientation loses nothing. Candidate volume
    * stays linear: ×nProbe buckets of the same ~64-vector size. */
  private[graft] def annLsh(emb: DataFrame, topK: Int = TopK,
      dim0: Int = -1, nHint: Long = -1L, nProbe: Int = AnnProbes): DataFrame = {
    // dim < 0 = probe with one tiny head() job (convenience); callers on a
    // hot path pass the known dimension so the query trace has no extra job
    val dim = if (dim0 >= 0) dim0
      else emb.select(size(col("embedding"))).head().getInt(0)
    val withSig = lshSignatures(emb, dim, nHint)
      // pinned + materialized: the probe explosion and the index side are
      // both full-corpus references to this signature table — uncached
      // they recompute the quantize+24-projection scan twice and race
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    withSig.count()
    annLshFromSigs(withSig, topK, nHint, nProbe)
  }

  /** The s2 signature table (vec_id, q, nn, sig) — the write-once LSH
    * index artifact ([[graft.operators.AnnIndex]] persists it as
    * parquet). NOT persisted here: the inline query path pins it, the
    * artifact path writes it. */
  private[graft] def lshSignatures(emb: DataFrame, dim: Int,
      nHint: Long = -1L): DataFrame = {
    val base = emb
      .select(col("vec_id"), TextOps.quantize(col("embedding")).as("q"))
      .withColumn("nn", TextOps.qdot(col("q"), col("q")))
      .withColumn("sig_full", sigCol(dim))
    (if (nHint > 0)
        // known corpus size: static mask, plan identical to the classic one
        base.withColumn("sig",
          col("sig_full").bitwiseAND(lit((1L << annBucketBits(nHint)) - 1L)))
      else {
        // mask width from a 1-row count aggregate folded INTO the plan
        // (broadcast bounds frame): no separate count job per invocation —
        // the lazy `<prefix>_emb_ann` view used to re-count the corpus on
        // every query it served (r4 ADVICE). Integer end to end:
        // length(bin(n−1)) = ceil(log2 n), mirroring annBucketBits.
        val nRow = emb.agg(count(lit(1)).as("n_rows"))
        base.crossJoin(broadcast(nRow))
          .withColumn("bits", least(lit(SigBits),
            greatest(lit(3), length(bin(col("n_rows") - lit(1L))) - lit(6))))
          .withColumn("sig", col("sig_full").bitwiseAND(
            expr("shiftleft(CAST(1 AS BIGINT), bits) - 1")))
          .drop("n_rows", "bits")
      }).drop("sig_full")
  }

  /** The s2 query half over an existing signature table (pinned by the
    * inline path, or loaded from the parquet artifact): multi-probe
    * bucket join + exact cosine rank. */
  private[graft] def annLshFromSigs(withSig: DataFrame, topK: Int = TopK,
      nHint: Long = -1L, nProbe: Int = AnnProbes): DataFrame = {
    require(nProbe >= 1 && nProbe <= 4,
      s"nProbe must be in [1, 4] (flip bits live inside the 3-bit minimum mask): $nProbe")
    // query-side probe explosion: sig, sig^1, sig^2, ... (bits 0..nProbe−2)
    val flips = (0L +: (0 until nProbe - 1).map(b => 1L << b)).toArray
    val probes = withSig.withColumn("psig",
      explode(array(flips.map(f => col("sig").bitwiseXOR(lit(f))): _*)))
    // candidate-side strategy follows the sizedHint ladder when the
    // caller supplies the corpus size (exact count, pessimistic ~640 B/row
    // incl. the 64-long quantized vector); unknown size keeps the
    // shuffle_hash pin (never a stats-estimated broadcast)
    val bSide = if (nHint > 0)
      graft.queries.DedupQueries.sizedHint(withSig, nHint, 640L)
    else withSig.hint("shuffle_hash")
    val cand = probes.as("a").join(bSide.as("b"),
        col("a.psig") === col("b.sig") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (TextOps.qdot(col("a.q"), col("b.q")).cast("double") /
          (sqrt(col("a.nn").cast("double")) * sqrt(col("b.nn").cast("double"))))
          .as("cosine"))
    val w = Window.partitionBy(col("vec_a"))
      .orderBy(col("cosine").desc, col("vec_b"))
    cand.withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= topK)
      .select(col("vec_a"), col("vec_b"), col("rk"),
        round(col("cosine"), 6).as("cosine_r"))
  }
  private val annLshSql =
    s"""WITH q AS (SELECT vec_id, ${TextOps.quantizeSql("embedding")} AS q FROM embeddings),
       |nrows AS (SELECT COUNT(*) AS n FROM q),
       |mask AS (
       |  SELECT CAST(POWER(2, LEAST($SigBits, GREATEST(3, COALESCE(
       |      MIN(CASE WHEN POWER(2, r.range + 6) >= n THEN r.range END),
       |      $SigBits)))) AS BIGINT) - 1 AS m
       |  FROM range(0, ${SigBits + 1}) r, nrows GROUP BY n),
       |sig AS ($lshSignatureSql),
       |e AS (SELECT vec_id, unnest(q) AS v, generate_subscripts(q, 1) AS i FROM q),
       |norms AS (SELECT vec_id, SUM(v * v) AS nn FROM e GROUP BY 1),
       |flips AS (SELECT unnest([${(0L +: (0 until AnnProbes - 1).map(b => 1L << b)).mkString(", ")}]) AS f),
       |cand AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM sig a CROSS JOIN flips JOIN sig b
       |    ON xor(a.sig & (SELECT m FROM mask), f) = (b.sig & (SELECT m FROM mask))
       |   AND a.vec_id < b.vec_id),
       |dot AS (
       |  SELECT c.vec_a, c.vec_b, SUM(ea.v * eb.v) AS dot
       |  FROM cand c JOIN e ea ON ea.vec_id = c.vec_a
       |  JOIN e eb ON eb.vec_id = c.vec_b AND ea.i = eb.i
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT vec_a, vec_b,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS cosine
       |  FROM dot JOIN norms na ON na.vec_id = vec_a
       |  JOIN norms nb ON nb.vec_id = vec_b),
       |ranked AS (
       |  SELECT vec_a, vec_b,
       |    row_number() OVER (PARTITION BY vec_a ORDER BY cosine DESC, vec_b) AS rk,
       |    cosine
       |  FROM scored)
       |SELECT vec_a, vec_b, rk, round(cosine, 6) AS cosine_r
       |FROM ranked WHERE rk <= $TopK""".stripMargin

  /** IVF cell count from corpus size — the classic `nlist ≈ √n` rule
    * (per-cell population √n, total probe pairs n^1.5 instead of n²/C).
    * The round-4 100× octave measured the fixed-C=8 version at 1251 s for
    * 200k vectors (25k per cell, ~5e9 probe pairs) — quadratic by
    * construction; cells must grow with the corpus. Rounded to a power of
    * two far from float edges so the SQL twin (POWER/CEIL/LOG2/SQRT in
    * DuckDB) lands on the identical integer. */
  private[graft] def ivfCells(n: Long): Int = {
    // smallest power of two 2^b with 4^b ≥ n (⟺ b = ⌈ceil(log2 n)/2⌉,
    // since ⌈⌈x⌉/2⌉ = ⌈x/2⌉), in pure integer arithmetic — same 1-ulp
    // rationale as annBucketBits; the oracle finds the same b by
    // comparing exact doubles (POWER(4, r) ≥ n)
    val clog2 = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n - 1L))
    math.min(65536L, math.max(8L, 1L << ((clog2 + 1) / 2))).toInt
  }

  /** The IVF assignment table (vec_id, q, nn, cell), persisted — the
    * materialized inverted file. Centroids are a deterministic HASH
    * sample: vec_id is a centroid iff hash60(vec_id) % stride == 0 with
    * stride = n / ivfCells(n), giving ~ivfCells(n) centroids spread
    * uniformly over the id space regardless of id ordering. (The previous
    * "lowest-id" training sample skewed cell populations on id-correlated
    * corpora — time-ordered embeddings put all early centroids in one
    * region; r4 nit #2.) The hash is the cross-engine md5-60, so the
    * oracle reproduces the exact centroid set in SQL.
    *
    * With `nHint < 0` the stride comes from a 1-row count aggregate
    * folded into the plan (broadcast bounds frame) — no separate count
    * job (r4 nit #1); pass the known corpus size to get a static plan.
    *
    * Returns one row per (vector, probe): `arn` ranks the vector's
    * centroids by cosine, rows with `arn <= nProbe` are kept. `arn = 1`
    * is the vector's HOME cell (where it lives in the inverted file);
    * the rest are the cells it PROBES as a query. */
  private[graft] def ivfAssign(emb: DataFrame, nHint: Long = -1L,
      nProbe: Int = 1): DataFrame =
    ivfAssignRaw(emb, nHint, nProbe)
      // referenced twice (both sides of the per-cell self-join): pin the
      // assignment table — the materialized inverted file of IVF
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** The s3 centroid table (cent_id, cq, cnn) — the other half of the
    * write-once IVF artifact: new query batches (vectors NOT in the
    * corpus) assign against it without touching the inverted file.
    * Requires a known corpus size (the artifact build path counts). */
  private[graft] def ivfCentroids(emb: DataFrame, nHint: Long): DataFrame = {
    require(nHint > 0, s"ivfCentroids needs the corpus size, got $nHint")
    val stride = math.max(1L, nHint / ivfCells(nHint))
    emb.select(col("vec_id"), TextOps.quantize(col("embedding")).as("q"))
      .withColumn("nn", TextOps.qdot(col("q"), col("q")))
      .filter(XHash.hash60(col("vec_id").cast("string")) % stride === 0)
      .select(col("vec_id").as("cent_id"), col("q").as("cq"),
        col("nn").as("cnn"))
  }

  /** [[ivfAssign]] without the cache pin — the artifact build path
    * writes this frame as parquet instead of pinning it. Assignment
    * runs as [[graft.operators.ProductQuantizer.cosineAssignTop]]'s
    * broadcast-variable + per-partition loop (one map over n rows)
    * instead of the old n×cells row_number window, whose per-vector
    * sort of wide rows was the [[graft.operators.KMeans.assign]]
    * cliff paid on every IVF / IVF-PQ build (r15 verdict #3
    * follow-up); surviving rows and their (ccos desc, cent_id) order
    * are identical. With `nHint < 0` the corpus is counted up front —
    * the old plan folded the count into the join, but the centroid
    * collect needs the stride before the map starts. */
  private[graft] def ivfAssignRaw(emb: DataFrame, nHint: Long = -1L,
      nProbe: Int = 1): DataFrame = {
    val n = if (nHint > 0) nHint else emb.count()
    val base = emb
      .select(col("vec_id"), TextOps.quantize(col("embedding")).as("q"))
      .withColumn("nn", TextOps.qdot(col("q"), col("q")))
    val stride = math.max(1L, n / ivfCells(n))
    val centroids = base
      .filter(XHash.hash60(col("vec_id").cast("string")) % stride === 0)
      .select(col("vec_id").as("cent_id"), col("q").as("cq"),
        col("nn").as("cnn"))
    graft.operators.ProductQuantizer.cosineAssignTop(base, centroids, nProbe)
  }

  /** IVF-style ANN: deterministic hash-sampled coarse quantizer
    * ([[ivfAssign]]), every vector stored in its nearest centroid's cell,
    * each query probing its `nProbe` nearest cells (FAISS-style nprobe —
    * single-probe recall is capped by P(true neighbor shares the ONE
    * nearest centroid), measured ~0.2 on this corpus; multi-probe buys
    * recall back at a bounded ×nProbe candidate cost). At scale this is
    * the inverted-file layout: one broadcast of the centroid table, one
    * shuffle by cell id; the quadratic part is per-cell and bounded by
    * the √n cell rule. Exact top-k within the probed cells by quantized
    * cosine; each (query, neighbor) pair meets at most once because a
    * neighbor is STORED in exactly one cell. */
  private[graft] def ivfTopKDf(emb: DataFrame, topK: Int = TopK,
      nHint: Long = -1L, nProbe: Int = NProbe): DataFrame =
    ivfTopKPinned(emb, topK, nHint, nProbe)._1

  /** [[ivfTopKDf]] plus the pinned frames it holds in the session cache
    * (the persisted IVF assignment table) — the facade wraps this in
    * `materialized(...)` so no hidden cache entry outlives the call. */
  private[graft] def ivfTopKPinned(emb: DataFrame, topK: Int = TopK,
      nHint: Long = -1L, nProbe: Int = NProbe): (DataFrame, Seq[DataFrame]) = {
    val assigned = ivfAssign(emb, nHint, nProbe)
    // materialize the pinned inverted file BEFORE the self-join: the two
    // join legs otherwise race to fill the same cache blocks, each
    // recomputing the full assignment pipeline (r7 verdict #2 — the
    // `Block rdd_N already exists` warnings and the [4.3, 9.4] s spread;
    // PageRank.scala count-then-consume pattern, CacheDisciplineSpec)
    assigned.count()
    (ivfTopKFromAssign(assigned, topK), Seq(assigned))
  }

  /** The s3 query half over an existing assignment table (pinned by the
    * inline path, or loaded from the parquet inverted-file artifact):
    * per-cell self-join + exact cosine rank within probed cells. */
  private[graft] def ivfTopKFromAssign(assigned: DataFrame,
      topK: Int = TopK): DataFrame = {
    val index = assigned.filter(col("arn") === 1) // home cells only
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    assigned.as("a").join(index.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"),
        col("b.cell").as("cell"),
        (TextOps.qdot(col("a.q"), col("b.q")).cast("double") /
          (sqrt(col("a.nn").cast("double")) * sqrt(col("b.nn").cast("double"))))
          .as("cosine"))
      .withColumn("rk", row_number().over(wRank).cast("bigint"))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("cell"), col("rk"),
        round(col("cosine"), 6).as("cosine_r"))
  }
  private def ivfTopK(s: SparkSession, d: String): DataFrame =
    ivfTopKDf(Tables.embeddings(s, d), nHint = Tables.embeddingsRows(s, d))
  private val ivfTopKSql =
    s"""WITH q AS (SELECT vec_id, ${TextOps.quantizeSql("embedding")} AS q FROM embeddings),
       |nrows AS (SELECT COUNT(*) AS n FROM q),
       |strid AS (
       |  SELECT GREATEST(1, n // LEAST(65536, GREATEST(8,
       |    CAST(POWER(2, COALESCE(
       |      MIN(CASE WHEN POWER(4, r.range) >= n THEN r.range END),
       |      16)) AS BIGINT)))) AS st
       |  FROM range(0, 17) r, nrows GROUP BY n),
       |e AS (SELECT vec_id, unnest(q) AS v, generate_subscripts(q, 1) AS i FROM q),
       |norms AS (SELECT vec_id, SUM(v * v) AS nn FROM e GROUP BY 1),
       |cdot AS (
       |  SELECT e.vec_id, c.vec_id AS cent_id, SUM(e.v * c.v) AS dot
       |  FROM e JOIN e c ON e.i = c.i
       |   AND ${XHash.hash60Sql("CAST(c.vec_id AS VARCHAR)")} % (SELECT st FROM strid) = 0
       |  GROUP BY 1, 2),
       |assigned AS (
       |  SELECT vec_id, cent_id AS cell, arn FROM (
       |    SELECT cdot.vec_id, cent_id,
       |      row_number() OVER (PARTITION BY cdot.vec_id ORDER BY
       |        CAST(dot AS DOUBLE) / (sqrt(CAST(n1.nn AS DOUBLE)) * sqrt(CAST(n2.nn AS DOUBLE))) DESC,
       |        cent_id) AS arn
       |    FROM cdot JOIN norms n1 ON n1.vec_id = cdot.vec_id
       |    JOIN norms n2 ON n2.vec_id = cent_id)
       |  WHERE arn <= $NProbe),
       |cand AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, b.cell
       |  FROM assigned a JOIN assigned b
       |    ON a.cell = b.cell AND b.arn = 1 AND a.vec_id <> b.vec_id),
       |pdot AS (
       |  SELECT c.query_id, c.neighbor_id, c.cell, SUM(ea.v * eb.v) AS dot
       |  FROM cand c JOIN e ea ON ea.vec_id = c.query_id
       |  JOIN e eb ON eb.vec_id = c.neighbor_id AND ea.i = eb.i
       |  GROUP BY 1, 2, 3),
       |scored AS (
       |  SELECT query_id, neighbor_id, cell,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS cosine
       |  FROM pdot JOIN norms na ON na.vec_id = query_id
       |  JOIN norms nb ON nb.vec_id = neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cell,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS rk, cosine
       |  FROM scored)
       |SELECT query_id, neighbor_id, cell, rk, round(cosine, 6) AS cosine_r
       |FROM ranked WHERE rk <= $TopK""".stripMargin

  // ---- s4/d14: deterministic k-means + SemDeDup-style semantic dedup.
  // KMeans (operators.KMeans) runs Lloyd's in exact integer arithmetic;
  // the oracle replays the identical rounds in SQL. The shared CTE chain
  // below is the oracle twin of KMeans.fit(prepared, K, updates = 1):
  // hash-stride seeds → assign (argmin exact dist², ties on cid) →
  // floor-mean update → final assign.
  private val KmK = 16 // gate-query cluster count (operator takes any k)
  private def kmeansCtes: String =
    s"""q AS (SELECT vec_id, ${TextOps.quantizeSql("embedding")} AS q FROM embeddings),
       |nrows AS (SELECT COUNT(*) AS n FROM q),
       |e AS (SELECT vec_id, unnest(q) AS v, generate_subscripts(q, 1) AS i FROM q),
       |norms AS (SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS nn FROM e GROUP BY 1),
       |c0 AS (SELECT vec_id AS cid, q AS c FROM q
       |  WHERE ${XHash.hash60Sql("CAST(vec_id AS VARCHAR)")}
       |    % (SELECT GREATEST(1, n // $KmK) FROM nrows) = 0),
       |ce0 AS (SELECT cid, unnest(c) AS w, generate_subscripts(c, 1) AS i FROM c0),
       |d0 AS (SELECT e.vec_id, c.cid,
       |    CAST(SUM((e.v - c.w) * (e.v - c.w)) AS BIGINT) AS dist
       |  FROM e JOIN ce0 c ON c.i = e.i GROUP BY 1, 2),
       |a1 AS (SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM d0) WHERE rn = 1),
       |s1 AS (SELECT a1.cell, e.i, CAST(SUM(e.v) AS BIGINT) AS s, COUNT(1) AS m
       |  FROM a1 JOIN e ON e.vec_id = a1.vec_id GROUP BY 1, 2),
       |c1 AS (SELECT cell AS cid,
       |    list((s - ((s % m) + m) % m) // m ORDER BY i) AS c
       |  FROM s1 GROUP BY 1),
       |ce1 AS (SELECT cid, unnest(c) AS w, generate_subscripts(c, 1) AS i FROM c1),
       |d1 AS (SELECT e.vec_id, c.cid,
       |    CAST(SUM((e.v - c.w) * (e.v - c.w)) AS BIGINT) AS dist
       |  FROM e JOIN ce1 c ON c.i = e.i GROUP BY 1, 2),
       |a2 AS (SELECT vec_id, cid AS cell, dist FROM (
       |    SELECT vec_id, cid, dist,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM d1) WHERE rn = 1)""".stripMargin

  /** s4: per-cluster summary after one Lloyd round — size, inertia
    * (Σ dist², decimal-exact), and the centroid's L1 mass (pins the
    * centroid VECTOR content, not just the partition).
    *
    * GATE-ONLY pin discipline (r16 ADVICE): fitPinned's pins are
    * deliberately discarded here because the only caller is the query
    * gate, whose per-query clearCache releases them; any reuse outside
    * the gate path must go through a facade that threads the pins. */
  private def kmeansSummary(s: SparkSession, d: String): DataFrame = {
    // fitPinned (r16): the l1 leg rejoins the returned centroids —
    // unpinned, it replayed the whole Lloyd-update aggregate that the
    // assign collect had already evaluated. Gate path: clearCache.
    val ((asg, cent), _) = graft.operators.KMeans.fitPinned(
      graft.operators.KMeans.prepare(Tables.embeddings(s, d)), KmK, updates = 1)
    val l1 = cent.select(col("cid"),
      aggregate(transform(col("c"), x => abs(x)), lit(0L), (a, x) => a + x)
        .as("cent_l1"))
    asg.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("dist").cast("decimal(38,0)")).cast("double").as("inertia"))
      .join(broadcast(l1), col("cell") === col("cid"))
      .select(col("cell"), col("n_members"), col("inertia"), col("cent_l1"))
  }
  private val kmeansSummarySql =
    s"""WITH $kmeansCtes,
       |l1 AS (SELECT cid,
       |    CAST(list_sum(list_transform(c, x -> abs(x))) AS BIGINT) AS cent_l1
       |  FROM c1)
       |SELECT a2.cell, COUNT(1) AS n_members,
       |  CAST(SUM(CAST(dist AS DECIMAL(38,0))) AS DOUBLE) AS inertia,
       |  l1.cent_l1 AS cent_l1
       |FROM a2 JOIN l1 ON l1.cid = a2.cell
       |GROUP BY a2.cell, l1.cent_l1""".stripMargin

  /** d14: SemDeDup (Abbas et al. 2023) with the keep-first policy — a
    * vector is dropped iff a LOWER-id member of its own k-means cluster
    * sits above the cosine threshold; `dup_of` is the smallest such
    * witness. Per-cluster pairs only (that is SemDeDup's point: the
    * all-pairs search collapses to within-cluster searches, m²·k pairs
    * with m ≈ n/k — k ~ √n keeps it n^1.5-class like s3). The demo
    * threshold matches d5's 0.45 (the corpus's planted near-dup level);
    * production thresholds are higher, which only shrinks the pair set. */
  private def semanticDedup(s: SparkSession, d: String): DataFrame =
    semanticDedupOn(Tables.embeddings(s, d), KmK, threshold = 0.45,
      nHint = Tables.embeddingsRows(s, d))
  private[graft] def semanticDedupOn(emb: DataFrame, k: Int,
      threshold: Double, updates: Int = 1, nHint: Long = -1L): DataFrame =
    semanticDedupOnPinned(emb, k, threshold, updates, nHint)._1
  private[graft] def semanticDedupOnPinned(emb: DataFrame, k: Int,
      threshold: Double, updates: Int = 1,
      nHint: Long = -1L): (DataFrame, Seq[DataFrame]) = {
    val (asg0, _) = graft.operators.KMeans.fit(
      graft.operators.KMeans.prepare(emb), k, updates, nHint)
    // the within-cell pair search SELF-JOINS the assignment — pinned +
    // materialized so the two legs read one argmin pass instead of each
    // re-running scan + quantize + assign (r16; CacheDisciplineSpec's
    // no-race contract requires the count before the two-leg consumer).
    // Gate path: per-query clearCache releases it.
    val asg = asg0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    asg.count()
    val a = asg.select(col("cell"), col("vec_id").as("va"),
      col("q").as("qa"), col("nn").as("na"))
    val b = asg.select(col("cell"), col("vec_id").as("vb"),
      col("q").as("qb"), col("nn").as("nb"))
    val out = a.join(b, Seq("cell"))
      .filter(col("va") < col("vb"))
      .filter(TextOps.qdot(col("qa"), col("qb")).cast("double") /
        (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))
        >= threshold)
      .groupBy(col("vb"), col("cell"))
      .agg(min(col("va")).as("dup_of"))
      .select(col("vb").as("vec_id"), col("cell"), col("dup_of"))
    (out, Seq(asg))
  }
  /** Auto-sized SemDeDup cell count: ceil(√n), floored at 4 so tiny
    * corpora still partition. */
  private[graft] def autoSemK(n: Long): Int =
    math.max(4, math.ceil(math.sqrt(math.max(1L, n).toDouble)).toInt)

  /** d14's SCALE configuration (r14 verdict #8): SemDeDup with a
    * BUCKETED QUERY SET — the s6 bipartite shape applied per cluster.
    * The exact d14 compares every within-cluster pair (m²·k pairs,
    * quadratic once k is a constant — arithmetic-bound by ~200k
    * vectors at the gate's k=16), and growing k to hold m² down makes
    * the ASSIGN pass n·k — quadratic again at k ∼ n. This
    * configuration bounds BOTH: per cell the `qPerCell` LOWEST-id
    * members form the witness (query) set, and every member is
    * compared against those alone — n·qPerCell candidate cosines and
    * n·k assign work, both linear in n at fixed knobs, which is the
    * 100-TB regime. Semantics: a vector is dropped iff a lower-id
    * witness in its cluster's query set clears the threshold, so the
    * result is a SUBSET of exact d14 (witnesses outside the query set
    * are not consulted) and EQUALS it whenever qPerCell covers the
    * largest cluster (SemDeDupBucketedSpec pins both). `dup_of` is
    * the smallest clearing witness in the query set.
    *
    * AUTO-K (r15 verdict #4): `k <= 0` sizes the cell count to
    * ceil(√n) — the s3/IVF precedent. A FIXED k drifts as the corpus
    * grows: cells fill as n/k, witness coverage qPerCell/|cell| decays
    * as 1/n, and dedup recall silently collapses — the same drift
    * class bandDriftCheck instruments on the MinHash artifact. At
    * k = √n the cell size is √n, so coverage decays only as n^-1/2
    * (and the assign pass stays n·k = n^1.5, s3's class, instead of
    * going quadratic the way holding coverage constant with a flat
    * k-means would); SemDeDupAutoKSpec measures planted-dup recall
    * holding up at 1×/10× under auto-k while fixed-k falls off. */
  private[graft] def semanticDedupBucketedOn(emb: DataFrame, k: Int,
      qPerCell: Int, threshold: Double, updates: Int = 1,
      nHint: Long = -1L): DataFrame =
    semanticDedupBucketedOnPinned(emb, k, qPerCell, threshold, updates,
      nHint)._1
  private[graft] def semanticDedupBucketedOnPinned(emb: DataFrame, k: Int,
      qPerCell: Int, threshold: Double, updates: Int = 1,
      nHint: Long = -1L): (DataFrame, Seq[DataFrame]) = {
    val n0 = if (nHint > 0) nHint else emb.count()
    val k0 = if (k > 0) k else autoSemK(n0)
    val (asg0, _) = graft.operators.KMeans.fit(
      graft.operators.KMeans.prepare(emb), k0, updates, n0)
    // query-set window + members leg both read the assignment — pinned
    // + materialized, one argmin pass (the d14 r16 rewire)
    val asg = asg0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    asg.count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell")).orderBy(col("vec_id"))
    val queries = asg
      .select(col("cell"), col("vec_id"), col("q"), col("nn"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= qPerCell)
      .select(col("cell"), col("vec_id").as("va"), col("q").as("qa"),
        col("nn").as("na"))
    val members = asg.select(col("cell"), col("vec_id").as("vb"),
      col("q").as("qb"), col("nn").as("nb"))
    val out = members.join(queries, Seq("cell"))
      .filter(col("va") < col("vb"))
      .filter(TextOps.qdot(col("qa"), col("qb")).cast("double") /
        (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))
        >= threshold)
      .groupBy(col("vb"), col("cell"))
      .agg(min(col("va")).as("dup_of"))
      .select(col("vb").as("vec_id"), col("cell"), col("dup_of"))
    (out, Seq(asg))
  }

  private val semanticDedupSql =
    s"""WITH $kmeansCtes,
       |pairs AS (
       |  SELECT a.vec_id AS va, b.vec_id AS vb, a.cell
       |  FROM a2 a JOIN a2 b ON a.cell = b.cell AND a.vec_id < b.vec_id),
       |pdot AS (
       |  SELECT p.va, p.vb, p.cell, CAST(SUM(ea.v * eb.v) AS BIGINT) AS dot
       |  FROM pairs p JOIN e ea ON ea.vec_id = p.va
       |  JOIN e eb ON eb.vec_id = p.vb AND eb.i = ea.i
       |  GROUP BY 1, 2, 3)
       |SELECT p.vb AS vec_id, p.cell AS cell, MIN(p.va) AS dup_of
       |FROM pdot p JOIN norms na ON na.vec_id = p.va
       |JOIN norms nb ON nb.vec_id = p.vb
       |WHERE CAST(dot AS DOUBLE)
       |    / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) >= 0.45
       |GROUP BY 1, 2""".stripMargin

  // ---- s5: product quantization + ADC + exact rerank (Jégou et al.
  // 2011) — the compressed-domain ANN path: vectors become m
  // nearest-centroid codes from per-subspace k-means; queries scan
  // CODES via a broadcast lookup table of exact query↔centroid
  // subdistances, and only the R winning candidates per query are
  // reranked against full vectors. See operators.ProductQuantizer for
  // the full scale rationale (the scan side reads codes, ~1/100 the
  // float footprint; the rerank touches queries × R vectors, not n).
  // m=8 × k=64, R=20: measured rerank recall-of-exact-top3 0.75 at
  // sf0.01 (weak-neighbor regime, same caveat as s2/s3 — see
  // SimilarityRecallSpec scaladoc; 0.083 without rerank at m=4, 0.333
  // at m=8: finer subspaces are THE resolution dial). The oracle
  // replays fit/encode/LUT/scan/rerank in exact int64.
  private val PqM = 8
  private val PqK = 64
  private val PqR = 20 // ADC candidates per query fed to the rerank
  private val PqNQ = 8 // query subset (vec_id < PqNQ, s1's convention)
  private[graft] def pqAdc(s: SparkSession, d: String): DataFrame =
    pqTopKOn(Tables.embeddings(s, d), Tables.EmbeddingDim,
      m = PqM, k = PqK, r = PqR, topK = TopK, nQueries = PqNQ,
      nHint = Tables.embeddingsRows(s, d))
  private[graft] def pqTopKOn(emb: DataFrame, dim: Int, m: Int, k: Int,
      r: Int, topK: Int, nQueries: Int, nHint: Long = -1L): DataFrame =
    pqTopKOnPinned(emb, dim, m, k, r, topK, nQueries, nHint)._1

  /** [[pqTopKOn]] plus its pinned intermediates — the house Pinned
    * contract (r16 ADVICE): the gate path releases them via per-query
    * clearCache, the [[graft.Graft.pqTopK]] facade via materialized().
    * Without this variant every facade call stranded two MEMORY_AND_DISK
    * caches for the session lifetime. */
  private[graft] def pqTopKOnPinned(emb: DataFrame, dim: Int, m: Int, k: Int,
      r: Int, topK: Int, nQueries: Int,
      nHint: Long = -1L): (DataFrame, Seq[DataFrame]) = {
    import graft.operators.ProductQuantizer
    val n = if (nHint > 0) nHint else emb.count()
    // prepared pinned (the s10 pattern, r16): fit references it once
    // per assign round and the codes leg once more — unpinned, each
    // replayed the scan + quantize + subvector split. The cache fills
    // as a side effect of fit's first codebook collect (one driver
    // action, no leg race); fitPinned additionally pins the final
    // codebook the ADC LUT rejoins.
    val prepared = ProductQuantizer.prepare(emb, dim, m)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ((codes, cb), cbPins) =
      ProductQuantizer.fitPinned(prepared, k, updates = 1, n)
    (pqQueryFromIndex(codes, cb, emb, dim, m, r, topK, nQueries),
      prepared +: cbPins)
  }

  /** The s5 query half over an existing codes + codebook pair (fit
    * inline, or loaded from the parquet artifact): ADC scan over the
    * codes + exact rerank of the R winners against the embedding store.
    * The query subvectors come from re-preparing ONLY the query rows —
    * queries × m rows, never the corpus. */
  private[graft] def pqQueryFromIndex(codes: DataFrame, cb: DataFrame,
      emb: DataFrame, dim: Int, m: Int, r: Int, topK: Int,
      nQueries: Int): DataFrame =
    pqServeOn(codes, cb, emb,
      emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding")),
      dim, m, r, topK, excludeSelf = true)

  /** The s5 query half against an EXPLICIT (query_id, embedding) batch
    * of NEW vectors — the serving path: query subvectors come from
    * re-preparing only the batch (queries × m rows), the ADC scan reads
    * codes only, the rerank touches queries × R vectors. The in-corpus
    * gate form above is this with queries sliced from the corpus and
    * self-matches excluded. */
  private[graft] def pqServeOn(codes: DataFrame, cb: DataFrame,
      emb: DataFrame, queries: DataFrame, dim: Int, m: Int, r: Int,
      topK: Int, excludeSelf: Boolean = false): DataFrame = {
    import graft.operators.ProductQuantizer
    val qsub = ProductQuantizer
      .prepareQuantized(
        queries.select(col("query_id").as("vec_id"),
          TextOps.quantize(col("embedding")).as("q")), dim, m)
      .select(col("vec_id").as("qid"), col("sub"), col("qs").as("qqs"))
    val cand = ProductQuantizer.adcTopK(codes, cb, qsub, r, excludeSelf)
    val vecs = emb.select(col("vec_id"), TextOps.quantize(col("embedding")).as("q"))
    val qfull = queries
      .select(col("query_id"), TextOps.quantize(col("embedding")).as("qq"))
    ProductQuantizer.rerank(cand, vecs, qfull, topK)
  }
  private def pqAdcSql = {
    val subDim = Tables.EmbeddingDim / PqM
    val slice = s"q[(s.s*$subDim+1):(s.s*$subDim+$subDim)]"
    s"""WITH q AS (SELECT vec_id, ${TextOps.quantizeSql("embedding")} AS q FROM embeddings),
       |nrows AS (SELECT COUNT(*) AS n FROM q),
       |sq AS (SELECT vec_id, s.s AS sub, $slice AS qs FROM q, range($PqM) s(s)),
       |e AS (SELECT vec_id, sub, unnest(qs) AS v,
       |    generate_subscripts(qs, 1) AS i FROM sq),
       |c0 AS (SELECT sub, vec_id AS cid, qs AS c FROM sq
       |  WHERE ${XHash.hash60Sql("CAST(vec_id AS VARCHAR)")}
       |    % (SELECT GREATEST(1, n // $PqK) FROM nrows) = 0),
       |ce0 AS (SELECT sub, cid, unnest(c) AS w,
       |    generate_subscripts(c, 1) AS i FROM c0),
       |d0 AS (SELECT e.vec_id, e.sub, c.cid,
       |    CAST(SUM((e.v - c.w) * (e.v - c.w)) AS BIGINT) AS dist
       |  FROM e JOIN ce0 c ON c.sub = e.sub AND c.i = e.i GROUP BY 1, 2, 3),
       |a1 AS (SELECT vec_id, sub, cid AS cell FROM (
       |    SELECT vec_id, sub, cid,
       |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn
       |    FROM d0) WHERE rn = 1),
       |s1 AS (SELECT a1.sub, a1.cell, e.i, CAST(SUM(e.v) AS BIGINT) AS s,
       |    COUNT(1) AS m
       |  FROM a1 JOIN e ON e.vec_id = a1.vec_id AND e.sub = a1.sub
       |  GROUP BY 1, 2, 3),
       |c1 AS (SELECT sub, cell AS cid,
       |    list((s - ((s % m) + m) % m) // m ORDER BY i) AS c
       |  FROM s1 GROUP BY 1, 2),
       |ce1 AS (SELECT sub, cid, unnest(c) AS w,
       |    generate_subscripts(c, 1) AS i FROM c1),
       |d1 AS (SELECT e.vec_id, e.sub, c.cid,
       |    CAST(SUM((e.v - c.w) * (e.v - c.w)) AS BIGINT) AS dist
       |  FROM e JOIN ce1 c ON c.sub = e.sub AND c.i = e.i GROUP BY 1, 2, 3),
       |a2 AS (SELECT vec_id, sub, cid AS code FROM (
       |    SELECT vec_id, sub, cid,
       |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn
       |    FROM d1) WHERE rn = 1),
       |lut AS (SELECT e.vec_id AS qid, c.sub, c.cid,
       |    CAST(SUM((e.v - c.w) * (e.v - c.w)) AS BIGINT) AS pd
       |  FROM e JOIN ce1 c ON c.sub = e.sub AND c.i = e.i
       |  WHERE e.vec_id < $PqNQ GROUP BY 1, 2, 3),
       |ad AS (SELECT l.qid, a.vec_id, CAST(SUM(l.pd) AS BIGINT) AS adist
       |  FROM a2 a JOIN lut l ON l.sub = a.sub AND l.cid = a.code
       |  WHERE l.qid <> a.vec_id GROUP BY 1, 2),
       |ranked AS (SELECT qid AS query_id, vec_id AS neighbor_id, adist,
       |    row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS rk
       |  FROM ad),
       |cand AS (SELECT query_id, neighbor_id FROM ranked WHERE rk <= $PqR),
       |fe AS (SELECT vec_id, unnest(q) AS v,
       |    generate_subscripts(q, 1) AS i FROM q),
       |rd AS (SELECT c.query_id, c.neighbor_id,
       |    CAST(SUM((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS dist
       |  FROM cand c JOIN fe a ON a.vec_id = c.query_id
       |  JOIN fe b ON b.vec_id = c.neighbor_id AND b.i = a.i
       |  GROUP BY 1, 2),
       |rr AS (SELECT query_id, neighbor_id, dist,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rk
       |  FROM rd)
       |SELECT query_id, CAST(rk AS BIGINT) AS rk, neighbor_id, dist
       |FROM rr WHERE rk <= $TopK""".stripMargin
  }

  // ---- s10: IVF-PQ — the production web-scale index composition
  // (Jégou et al. 2011 §IV; the FAISS `IVFx,PQy` default): s3's coarse
  // cells localize, then PQ quantizes the RESIDUAL q − centroid inside
  // each cell — residual energy is a fraction of the vector's, so the
  // same m×k code budget buys far finer resolution than s5's direct
  // encoding. Query: assign to nProbe cells, build one residual LUT per
  // (query, probed cell) — the residual differs per cell — ADC-scan only
  // the codes homed in probed cells, exact-rerank the R winners.
  // Scale shape: codes + home cells are the write-once artifact (bytes,
  // not floats); the LUT is queries × nProbe × m × k rows broadcast; the
  // scan touches probed cells only (nProbe/√n of the corpus); the rerank
  // touches queries × R full vectors. nProbe is the recall dial — 16 of
  // the 64 sf0.01 cells for the gate (weak-neighbor regime, same caveat
  // as s2/s3/s5: recall-of-exact is capped by P(true neighbor's home
  // cell is probed); the near-dup regime probes 1-4 cells at ~100%).
  // nProbe and R interact: more probed cells dilute a fixed ADC top-R
  // (measured recall-of-exact at sf0.01: nProbe/R 16/20 → 0.58,
  // 24/20 → 0.71, 32/20 → 0.67, 32/40 → 0.75 — matching s5's flat-PQ
  // recall at the same m×k budget; SimilarityRecallSpec gates it).
  private val IpqNProbe = 32
  private val IpqR = 40 // ADC candidates per query fed to the rerank
  private val IpqNQ = 8 // query subset (vec_id < IpqNQ, s5's convention)
  private[graft] def ivfPq(s: SparkSession, d: String): DataFrame =
    ivfPqTopKOn(Tables.embeddings(s, d), Tables.EmbeddingDim,
      m = PqM, k = PqK, r = IpqR, topK = TopK, nQueries = IpqNQ,
      nProbe = IpqNProbe, nHint = Tables.embeddingsRows(s, d))
  /** Inline s10 (build fused with the query half). Like s3's
    * [[ivfTopKDf]], the gate path discards the pins (bench clears the
    * cache per query); user-facing callers go through
    * [[ivfPqTopKPinned]] / the facade's `materialized(...)` so no cache
    * entry outlives the call. */
  private[graft] def ivfPqTopKOn(emb: DataFrame, dim: Int, m: Int, k: Int,
      r: Int, topK: Int, nQueries: Int, nProbe: Int,
      nHint: Long = -1L): DataFrame =
    ivfPqTopKPinned(emb, dim, m, k, r, topK, nQueries, nProbe, nHint)._1

  /** [[ivfPqTopKOn]] plus the pinned frames it holds in the session
    * cache (the home-cell table and the prepared residual subvectors) —
    * the s3 ivfTopKPinned pattern, so the facade can release them after
    * materializing the result. */
  private[graft] def ivfPqTopKPinned(emb: DataFrame, dim: Int, m: Int,
      k: Int, r: Int, topK: Int, nQueries: Int, nProbe: Int,
      nHint: Long = -1L): (DataFrame, Seq[DataFrame]) = {
    import graft.operators.ProductQuantizer
    val n = if (nHint > 0) nHint else emb.count()
    // coarse half: home cells for the corpus (arn = 1) + the shared
    // hash-stride centroid table
    val cents = ivfCentroids(emb, n)
    val home = ivfAssignRaw(emb, n, nProbe = 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // no count jobs for home/prepared (r16): the FIRST action that
    // touches them is fit's seed-codebook collect — a single linear
    // chain (init filter → prepared → resid → home), so both caches
    // fill race-free as its side effect; the multi-leg consumers (ADC
    // join, codesWithCell, the later assign rounds) then read filled
    // caches. The old counts paid two extra driver jobs per run.
    // residual half: r = q − centroid(home cell), exact int64, then the
    // PQ pipeline unchanged — prepare/fit never know they see residuals
    val resid = home.join(broadcast(cents), col("cell") === col("cent_id"))
      .select(col("vec_id"),
        zip_with(col("q"), col("cq"), (a, b) => a - b).as("q"))
    val prepared = ProductQuantizer.prepareQuantized(resid, dim, m)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // fitPinned (r16): the final codebook is collected by the assign
    // step anyway; pinning it stops the residual-LUT build from
    // replaying the whole update aggregate through lineage
    val ((codes, cb), cbPins) =
      ProductQuantizer.fitPinned(prepared, k, updates = 1, n)
    val codesWithCell = codes
      .join(home.select(col("vec_id"), col("cell")), "vec_id")
    (ivfPqQueryFromIndex(codesWithCell, cb, cents, emb, dim, m, r, topK,
      nQueries, nProbe), Seq(home, prepared) ++ cbPins)
  }

  /** The s10 query half over an existing (codes-with-home-cell,
    * codebook, centroid) triple — fit inline above, or loaded from the
    * parquet artifact ([[graft.operators.AnnIndex]] family `ivfpq`):
    * rank ALL cells per query by the same (cosine desc, cent_id) order,
    * keep nProbe, residualize the query against EACH probed cell's
    * centroid, ADC-scan only codes homed in probed cells, exact-rerank
    * the R winners. Only the query rows and the R winners per query
    * ever touch the embedding store. */
  private[graft] def ivfPqQueryFromIndex(codesWithCell: DataFrame,
      cb: DataFrame, cents: DataFrame, emb: DataFrame, dim: Int, m: Int,
      r: Int, topK: Int, nQueries: Int, nProbe: Int): DataFrame =
    ivfPqServeOn(codesWithCell, cb, cents, emb,
      emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding")),
      dim, m, r, topK, nProbe, excludeSelf = true)

  /** The s10 query half against an EXPLICIT query batch — the serving
    * path: `queries` is a (query_id, embedding) frame of NEW vectors
    * (not in the indexed corpus), assigned to their nProbe cells against
    * the STORED centroids exactly as [[graft.operators.AnnIndex
    * .appendIvfPq]] assigns increments, then residual-LUT + ADC over
    * probed cells + exact rerank. Scale shape: the query batch (and
    * everything derived from it — probes, LUT, candidates) broadcasts;
    * the corpus codes stream through one broadcast hash join and never
    * shuffle; only the R winners per query touch the embedding store.
    * The in-corpus gate form above is this with queries sliced from the
    * corpus and self-matches excluded. */
  private[graft] def ivfPqServeOn(codesWithCell: DataFrame,
      cb: DataFrame, cents: DataFrame, emb: DataFrame, queries: DataFrame,
      dim: Int, m: Int, r: Int, topK: Int, nProbe: Int,
      excludeSelf: Boolean = false): DataFrame = {
    import graft.operators.ProductQuantizer
    val qv = queries
      .select(col("query_id").as("vec_id"),
        TextOps.quantize(col("embedding")).as("qq"))
      .withColumn("qnn", TextOps.qdot(col("qq"), col("qq")))
    val wq = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cent_id"))
    val qprobe = qv.join(broadcast(cents))
      .withColumn("ccos",
        TextOps.qdot(col("qq"), col("cq")).cast("double") /
          (sqrt(col("qnn").cast("double")) * sqrt(col("cnn").cast("double"))))
      .withColumn("arn", row_number().over(wq))
      .filter(col("arn") <= nProbe)
      .select(col("vec_id").as("qid"), col("cent_id").as("cell"),
        zip_with(col("qq"), col("cq"), (a, b) => a - b).as("rq"))
    val subDim = dim / m
    val qsub = qprobe.select(col("qid"), col("cell"),
        explode(array((0 until m).map(s0 =>
          struct(lit(s0).as("sub"),
            slice(col("rq"), s0 * subDim + 1, subDim).as("qqs"))): _*)).as("e"))
      .select(col("qid"), col("cell"), col("e.sub").as("sub"),
        col("e.qqs").as("qqs"))
    val lut = qsub.join(cb, "sub")
      .select(col("qid"), col("cell"), col("sub"), col("cid"),
        (TextOps.qdot(col("qqs"), col("qqs"))
          - lit(2L) * TextOps.qdot(col("qqs"), col("c")) + col("cnn")).as("pd"))
    val cand = ProductQuantizer.ivfAdcTopK(codesWithCell, lut, r, excludeSelf)
    val vecs = emb.select(col("vec_id"), TextOps.quantize(col("embedding")).as("q"))
    val qfull = queries
      .select(col("query_id"), TextOps.quantize(col("embedding")).as("qq"))
    ProductQuantizer.rerank(cand, vecs, qfull, topK)
  }
  private def ivfPqSql = {
    val subDim = Tables.EmbeddingDim / PqM
    s"""WITH q AS (SELECT vec_id, ${TextOps.quantizeSql("embedding")} AS q FROM embeddings),
       |nrows AS (SELECT COUNT(*) AS n FROM q),
       |strid AS (
       |  SELECT GREATEST(1, n // LEAST(65536, GREATEST(8,
       |    CAST(POWER(2, COALESCE(
       |      MIN(CASE WHEN POWER(4, r.range) >= n THEN r.range END),
       |      16)) AS BIGINT)))) AS st
       |  FROM range(0, 17) r, nrows GROUP BY n),
       |e AS (SELECT vec_id, unnest(q) AS v, generate_subscripts(q, 1) AS i FROM q),
       |norms AS (SELECT vec_id, SUM(v * v) AS nn FROM e GROUP BY 1),
       |cdot AS (
       |  SELECT e.vec_id, c.vec_id AS cent_id, SUM(e.v * c.v) AS dot
       |  FROM e JOIN e c ON e.i = c.i
       |   AND ${XHash.hash60Sql("CAST(c.vec_id AS VARCHAR)")} % (SELECT st FROM strid) = 0
       |  GROUP BY 1, 2),
       |assigned AS (
       |  SELECT vec_id, cent_id AS cell, arn FROM (
       |    SELECT cdot.vec_id, cent_id,
       |      row_number() OVER (PARTITION BY cdot.vec_id ORDER BY
       |        CAST(dot AS DOUBLE) / (sqrt(CAST(n1.nn AS DOUBLE)) * sqrt(CAST(n2.nn AS DOUBLE))) DESC,
       |        cent_id) AS arn
       |    FROM cdot JOIN norms n1 ON n1.vec_id = cdot.vec_id
       |    JOIN norms n2 ON n2.vec_id = cent_id)
       |  WHERE arn = 1 OR (vec_id < $IpqNQ AND arn <= $IpqNProbe)),
       |home AS (SELECT vec_id, cell FROM assigned WHERE arn = 1),
       |ce AS (SELECT vec_id AS cent_id, i, v AS w FROM e
       |  WHERE ${XHash.hash60Sql("CAST(vec_id AS VARCHAR)")} % (SELECT st FROM strid) = 0),
       |rs AS (SELECT h.vec_id, CAST((e.i - 1) // $subDim AS INT) AS sub,
       |    ((e.i - 1) % $subDim) + 1 AS si, e.v - ce.w AS rv
       |  FROM home h JOIN e ON e.vec_id = h.vec_id
       |  JOIN ce ON ce.cent_id = h.cell AND ce.i = e.i),
       |c0 AS (SELECT sub, vec_id AS cid, si, rv AS w FROM rs
       |  WHERE ${XHash.hash60Sql("CAST(vec_id AS VARCHAR)")}
       |    % (SELECT GREATEST(1, n // $PqK) FROM nrows) = 0),
       |d0 AS (SELECT r.vec_id, r.sub, c.cid,
       |    CAST(SUM((r.rv - c.w) * (r.rv - c.w)) AS BIGINT) AS dist
       |  FROM rs r JOIN c0 c ON c.sub = r.sub AND c.si = r.si GROUP BY 1, 2, 3),
       |a1 AS (SELECT vec_id, sub, cid AS cell FROM (
       |    SELECT vec_id, sub, cid,
       |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn
       |    FROM d0) WHERE rn = 1),
       |s1 AS (SELECT a1.sub, a1.cell, r.si, CAST(SUM(r.rv) AS BIGINT) AS s,
       |    COUNT(1) AS m
       |  FROM a1 JOIN rs r ON r.vec_id = a1.vec_id AND r.sub = a1.sub
       |  GROUP BY 1, 2, 3),
       |c1 AS (SELECT sub, cell AS cid, si,
       |    (s - ((s % m) + m) % m) // m AS w FROM s1),
       |d1 AS (SELECT r.vec_id, r.sub, c.cid,
       |    CAST(SUM((r.rv - c.w) * (r.rv - c.w)) AS BIGINT) AS dist
       |  FROM rs r JOIN c1 c ON c.sub = r.sub AND c.si = r.si GROUP BY 1, 2, 3),
       |a2 AS (SELECT vec_id, sub, cid AS code FROM (
       |    SELECT vec_id, sub, cid,
       |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn
       |    FROM d1) WHERE rn = 1),
       |qrs AS (SELECT a.vec_id AS qid, a.cell,
       |    CAST((e.i - 1) // $subDim AS INT) AS sub,
       |    ((e.i - 1) % $subDim) + 1 AS si, e.v - ce.w AS rv
       |  FROM assigned a JOIN e ON e.vec_id = a.vec_id
       |  JOIN ce ON ce.cent_id = a.cell AND ce.i = e.i
       |  WHERE a.vec_id < $IpqNQ AND a.arn <= $IpqNProbe),
       |lut AS (SELECT qr.qid, qr.cell, c.sub, c.cid,
       |    CAST(SUM((qr.rv - c.w) * (qr.rv - c.w)) AS BIGINT) AS pd
       |  FROM qrs qr JOIN c1 c ON c.sub = qr.sub AND c.si = qr.si
       |  GROUP BY 1, 2, 3, 4),
       |ad AS (SELECT l.qid, a.vec_id, CAST(SUM(l.pd) AS BIGINT) AS adist
       |  FROM a2 a JOIN home h ON h.vec_id = a.vec_id
       |  JOIN lut l ON l.cell = h.cell AND l.sub = a.sub AND l.cid = a.code
       |  WHERE l.qid <> a.vec_id GROUP BY 1, 2),
       |ranked AS (SELECT qid AS query_id, vec_id AS neighbor_id, adist,
       |    row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS rk
       |  FROM ad),
       |cand AS (SELECT query_id, neighbor_id FROM ranked WHERE rk <= $IpqR),
       |rd AS (SELECT c.query_id, c.neighbor_id,
       |    CAST(SUM((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS dist
       |  FROM cand c JOIN e a ON a.vec_id = c.query_id
       |  JOIN e b ON b.vec_id = c.neighbor_id AND b.i = a.i
       |  GROUP BY 1, 2),
       |rr AS (SELECT query_id, neighbor_id, dist,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rk
       |  FROM rd)
       |SELECT query_id, CAST(rk AS BIGINT) AS rk, neighbor_id, dist
       |FROM rr WHERE rk <= $TopK""".stripMargin
  }

  // ---- s6: radius (range) similarity search — the retrieval sibling of
  // the top-k family: ALL corpus vectors within cosine ≥ θ of each query
  // vector, not a fixed k. Banded sign-LSH on both sides (d5's shared
  // hyperplanes, so the DuckDB oracle reproduces the exact candidate
  // set), but BIPARTITE: the query-side band table is nQueries×bands
  // rows — always broadcast — so the corpus side never shuffles and the
  // candidate volume is queries × per-band collisions, linear in the
  // corpus at a fixed query set. Same d5 lessons baked in: cosine
  // filter BEFORE the distinct (the dedup exchange carries only
  // survivors), exact int64 dot/norms, sizedHint on the corpus rejoin.
  // θ = 0.3 for the gate (≈2.4σ of the 64-d noise floor — enough true
  // positives at sf0.01 to be a meaningful demo); production radius
  // searches run at task-specific thresholds with autoBandParams.
  private val S6NQ = 32
  private val S6Theta = 0.3
  private[graft] def rangeSearchOn(emb: DataFrame, nQueries: Int = S6NQ,
      threshold: Double = S6Theta, bands: Int = DedupQueries.D5Bands,
      rowBits: Int = DedupQueries.D5Rows, dim0: Int = -1,
      nHint: Long = -1L): DataFrame = {
    val n = if (nHint > 0) nHint else emb.count()
    val dim = if (dim0 >= 0) dim0
      else emb.select(size(col("embedding"))).head().getInt(0)
    val e = emb
      .select(col("vec_id"), TextOps.quantize(col("embedding")).as("q"))
      .withColumn("nn", TextOps.qdot(col("q"), col("q")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e.count() // materialize before the 4-way reference (no leg race)
    val flatWeights = new Array[Long](bands * rowBits * dim)
    for (b <- 0 until bands; j <- 0 until rowBits)
      System.arraycopy(DedupQueries.d5Weights(dim, b, j), 0, flatWeights,
        (b * rowBits + j) * dim, dim)
    // pinned + materialized: the query-band broadcast and the corpus
    // band side otherwise each recompute the bands×rowBits projection
    val bandRows = e.select(col("vec_id"),
        posexplode(graft.functions.BandedSignatures(
          col("q"), flatWeights, bands, rowBits)))
      .toDF("vec_id", "band_idx", "band_sig")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bandRows.count()
    val qBands = bandRows.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("band_idx"), col("band_sig"))
    val cand = broadcast(qBands)
      .join(bandRows, Seq("band_idx", "band_sig"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
    val vecBytes = 8L * dim + 64L
    cand
      .join(broadcast(e.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"),
          col("q").as("qq"), col("nn").as("nq"))), "query_id")
      .join(DedupQueries.sizedHint(e.select(col("vec_id"),
        col("q").as("qc"), col("nn").as("nc")), n, vecBytes), "vec_id")
      .select(col("query_id"), col("vec_id"),
        (TextOps.qdot(col("qq"), col("qc")).cast("double") /
          (sqrt(col("nq").cast("double")) * sqrt(col("nc").cast("double"))))
          .as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct()
  }
  private def rangeSearchSql = {
    import graft.queries.{DedupQueries => DQ}
    s"""WITH q AS (SELECT vec_id, ${TextOps.quantizeSql("embedding")} AS q FROM embeddings),
       |e AS (SELECT vec_id, unnest(q) AS v, generate_subscripts(q, 1) - 1 AS i FROM q),
       |norms AS (SELECT vec_id, SUM(v * v) AS nn FROM e GROUP BY 1),
       |proj AS (
       |  SELECT e.vec_id, b.range AS band_idx, r.range AS j,
       |    SUM(CASE WHEN ${XHash.hash60Sql("concat('d5_', b.range, '_', r.range, '_', e.i)")} % 2 = 0
       |      THEN e.v ELSE -e.v END) AS p
       |  FROM e CROSS JOIN range(${DQ.D5Bands}) b CROSS JOIN range(${DQ.D5Rows}) r
       |  GROUP BY 1, 2, 3),
       |sigs AS (
       |  SELECT vec_id, band_idx,
       |    CAST(SUM(CASE WHEN p > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS band_sig
       |  FROM proj GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS vec_id
       |  FROM sigs a JOIN sigs b
       |    ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
       |  WHERE a.vec_id < $S6NQ AND b.vec_id <> a.vec_id),
       |dot AS (
       |  SELECT c.query_id, c.vec_id, SUM(ea.v * eb.v) AS dot
       |  FROM cand c JOIN e ea ON ea.vec_id = c.query_id
       |  JOIN e eb ON eb.vec_id = c.vec_id AND ea.i = eb.i
       |  GROUP BY 1, 2)
       |SELECT query_id, dot.vec_id AS vec_id,
       |  CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS cosine
       |FROM dot JOIN norms na ON na.vec_id = query_id JOIN norms nb ON nb.vec_id = dot.vec_id
       |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) >= $S6Theta""".stripMargin
  }

  // ---- s7: maximum-inner-product search (MIPS) — the retrieval
  // objective recommenders and learned-retrieval systems actually rank
  // by: raw dot product, NOT cosine. On unnormalized embeddings the two
  // orders genuinely differ (a long vector can out-dot a better-aligned
  // short one), so this is a distinct semantic from s1, not a variant.
  // Exact int64 dots over the quantized vectors — the score itself is
  // hash-gated, no doubles anywhere. Same broadcast-query shape as s1:
  // the corpus side never shuffles; per-query top-k with deterministic
  // tie-break.
  private[graft] def mipsTopK(emb: DataFrame, nQueries: Int = NQueries,
      topK: Int = TopK): DataFrame = {
    val e = emb.select(col("vec_id"), TextOps.quantize(col("embedding")).as("q"))
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qq"))
    val scored = e.join(broadcast(queries), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        TextOps.qdot(col("qq"), col("q")).as("dot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("rk"), col("dot"))
  }
  private val mipsTopKSql =
    s"""WITH q AS (SELECT vec_id, ${TextOps.quantizeSql("embedding")} AS q FROM embeddings),
       |e AS (SELECT vec_id, unnest(q) AS v, generate_subscripts(q, 1) AS i FROM q),
       |dot AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    CAST(SUM(a.v * b.v) AS BIGINT) AS dot
       |  FROM e a JOIN e b ON a.i = b.i AND a.vec_id < $NQueries
       |   AND b.vec_id <> a.vec_id
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY dot DESC, neighbor_id) AS rk, dot
       |  FROM dot)
       |SELECT query_id, neighbor_id, rk, dot
       |FROM ranked WHERE rk <= $TopK""".stripMargin

  // ---- s8: scalar quantization (SQ8) — the OTHER classical compressed
  // index next to s5's product quantization: each dimension is scaled
  // independently into one unsigned byte against the corpus's per-dim
  // min/span, the approximate scan ranks by dot against the
  // RECONSTRUCTED bytes (8× smaller than the floats), and the R=20
  // winners are reranked exactly. Everything is integer arithmetic —
  // codes, reconstruction (min + (c·span) div 255), approx dots — so
  // the pipeline is hash-gated end to end, exact rerank included.
  // Scale shape: per-dim stats are ONE 64-row aggregate folded into the
  // plan as literals (no per-row join against a stats table); the code/
  // reconstruction arrays are per-row; the scan is s1's broadcast-query
  // class over the small reconstructed side; at production scale the
  // codes table is the write-once artifact exactly like s5's.
  private val S8Queries = 8
  private val S8Rerank = 20
  private[graft] def sqTopK(emb: DataFrame, nQueries: Int = S8Queries,
      topK: Int = TopK, rerankR: Int = S8Rerank): DataFrame =
    sqTopKWithStats(emb,
      // per-dim min/span: a 64-row result, embedded as plan literals
      sqStatsOf(emb).collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap,
      nQueries, topK, rerankR)

  /** The s8 per-dim (min, span) stats frame — the write-once SQ8
    * artifact (dim rows): codes and reconstructions are pure functions
    * of it, so persisting these dim rows IS persisting the index. */
  private[graft] def sqStatsOf(emb: DataFrame): DataFrame =
    emb.select(TextOps.quantize(col("embedding")).as("q"))
      .select(posexplode(col("q")).as(Seq("i", "v")))
      .groupBy(col("i"))
      .agg(min(col("v")).as("mn"),
        greatest(max(col("v")) - min(col("v")), lit(1L)).as("sp"))

  /** The s8 query half against known stats (computed inline, or loaded
    * from the parquet artifact). */
  private[graft] def sqTopKWithStats(emb: DataFrame,
      stats: Map[Int, (Long, Long)], nQueries: Int = S8Queries,
      topK: Int = TopK, rerankR: Int = S8Rerank): DataFrame = {
    sqServeWithStats(emb,
      emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding")),
      stats, topK, rerankR, excludeSelf = true)
  }

  /** The s8 query half against an EXPLICIT (query_id, embedding) query
    * batch — the serving path: the reconstructed corpus streams once
    * against the broadcast batch; only rerank winners are scored
    * exactly. The in-corpus gate form above is this with queries sliced
    * from the corpus and self-matches excluded. */
  private[graft] def sqServeWithStats(emb: DataFrame, queryEmb: DataFrame,
      stats: Map[Int, (Long, Long)], topK: Int = TopK,
      rerankR: Int = S8Rerank, excludeSelf: Boolean = false): DataFrame = {
    val queries = queryEmb.select(col("query_id"),
      TextOps.quantize(col("embedding")).as("qq"))
    val e = emb.select(col("vec_id"), TextOps.quantize(col("embedding")).as("q"))
    val dim = stats.size
    val minsSql = (0 until dim).map(i => s"${stats(i)._1}L").mkString("array(", ",", ")")
    val spansSql = (0 until dim).map(i => s"${stats(i)._2}L").mkString("array(", ",", ")")
    // codes then integer reconstruction: recon_i = mn + (c·sp) div 255 —
    // SQL `div` inside the lambdas keeps every step exact int64
    val coded = e.withColumn("recon", expr(
      s"""zip_with(
         |  zip_with(
         |    zip_with(zip_with(q, $minsSql, (v, m) -> v - m),
         |      $spansSql, (d, s) -> (d * 255) div s),
         |    $spansSql, (c, s) -> (c * s) div 255),
         |  $minsSql, (r, m) -> r + m)""".stripMargin))
    val approx = coded.join(broadcast(queries),
        if (excludeSelf) col("query_id") =!= col("vec_id") else lit(true))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("q"),
        TextOps.qdot(col("qq"), col("recon")).as("adot"))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("adot").desc, col("neighbor_id"))
    val cand = approx.withColumn("ark", row_number().over(wA))
      .filter(col("ark") <= rerankR)
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id"))
    cand.join(broadcast(queries), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        TextOps.qdot(col("qq"), col("q")).as("dot"))
      .withColumn("rk", row_number().over(wE).cast("bigint"))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("rk"), col("dot"))
  }
  private val sqTopKSql =
    s"""WITH q AS (SELECT vec_id, ${TextOps.quantizeSql("embedding")} AS q FROM embeddings),
       |e AS (SELECT vec_id, unnest(q) AS v, generate_subscripts(q, 1) AS i FROM q),
       |st AS (SELECT i, MIN(v) AS mn, GREATEST(MAX(v) - MIN(v), 1) AS sp
       |  FROM e GROUP BY 1),
       |r AS (
       |  SELECT e.vec_id, e.i,
       |    st.mn + ((((e.v - st.mn) * 255) // st.sp) * st.sp) // 255 AS rv
       |  FROM e JOIN st USING (i)),
       |ad AS (
       |  SELECT a.vec_id AS query_id, r.vec_id AS neighbor_id,
       |    CAST(SUM(a.v * r.rv) AS BIGINT) AS adot
       |  FROM e a JOIN r ON a.i = r.i AND a.vec_id < $S8Queries
       |   AND r.vec_id <> a.vec_id
       |  GROUP BY 1, 2),
       |cand AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY adot DESC, neighbor_id) AS ark
       |    FROM ad) WHERE ark <= $S8Rerank),
       |ex AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    CAST(SUM(a.v * b.v) AS BIGINT) AS dot
       |  FROM cand c
       |  JOIN e a ON a.vec_id = c.query_id
       |  JOIN e b ON b.vec_id = c.neighbor_id AND b.i = a.i
       |  GROUP BY 1, 2)
       |SELECT query_id, neighbor_id,
       |  row_number() OVER (PARTITION BY query_id
       |    ORDER BY dot DESC, neighbor_id) AS rk, dot
       |FROM ex
       |QUALIFY rk <= $TopK""".stripMargin

  /** ANN recall@k evaluation (s9): the measurement every ANN deployment
    * tunes against — per query, |LSH top-k ∩ exact top-k| / k. At 100 TB
    * nobody can eyeball whether nProbe/bucket-bits are right; this query
    * IS the tuning loop, run on a sampled query set: the exact side is
    * s1's broadcast-queries one-pass scan (linear in n, no shuffle of
    * the corpus), the ANN side is s2's bucketed probe join, and both
    * rank with the same (cosine desc, id) tie-break so recall is
    * deterministic.
    *
    * One signature+norm table is pinned and materialized at build (the
    * r8 cache contract) and feeds BOTH sides — the corpus is scanned
    * once, not once per leg. Probe signatures are pairwise distinct, so
    * each (query, candidate) pair meets at most once — no dedup pass.
    */
  private[graft] def recallEval(emb: DataFrame, nQueries: Int = NQueries,
      topK: Int = TopK, dim0: Int = -1, nHint: Long = -1L,
      nProbe: Int = AnnProbes): DataFrame = {
    require(nProbe >= 1 && nProbe <= 4,
      s"nProbe must be in [1, 4]: $nProbe")
    val dim = if (dim0 >= 0) dim0
      else emb.select(size(col("embedding"))).head().getInt(0)
    val n = if (nHint > 0) nHint else emb.count()
    val mask = (1L << annBucketBits(n)) - 1L
    val base = emb
      .select(col("vec_id"), TextOps.quantize(col("embedding")).as("q"))
      .withColumn("nn", TextOps.qdot(col("q"), col("q")))
      .withColumn("sig", sigCol(dim).bitwiseAND(lit(mask)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count()
    val queries = base.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("nn").as("qnn"), col("sig").as("qsig"))
    def score(cand: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      cand.select(col("query_id"), col("vec_id").as("neighbor_id"),
          (TextOps.qdot(col("qq"), col("q")).cast("double") /
            (sqrt(col("qnn").cast("double")) * sqrt(col("nn").cast("double"))))
            .as("cosine"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= topK)
        .select(col("query_id"), col("neighbor_id"))
    }
    val exactK = score(base.join(broadcast(queries),
      col("query_id") =!= col("vec_id")))
    val flips = (0L +: (0 until nProbe - 1).map(b => 1L << b)).toArray
    val probes = queries.withColumn("psig",
      explode(array(flips.map(f => col("qsig").bitwiseXOR(lit(f))): _*)))
    val annK = score(base.join(broadcast(probes),
        col("psig") === col("sig") && col("query_id") =!= col("vec_id")))
      .withColumn("hit", lit(1L))
    exactK.join(annK, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k"), sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .select(col("query_id"), col("n_hits"),
        (col("n_hits").cast("double") / col("k").cast("double")).as("recall"))
  }
  private val recallEvalSql =
    s"""WITH q AS (SELECT vec_id, ${TextOps.quantizeSql("embedding")} AS q FROM embeddings),
       |nrows AS (SELECT COUNT(*) AS n FROM q),
       |mask AS (
       |  SELECT CAST(POWER(2, LEAST($SigBits, GREATEST(3, COALESCE(
       |      MIN(CASE WHEN POWER(2, r.range + 6) >= n THEN r.range END),
       |      $SigBits)))) AS BIGINT) - 1 AS m
       |  FROM range(0, ${SigBits + 1}) r, nrows GROUP BY n),
       |sig AS ($lshSignatureSql),
       |e AS (SELECT vec_id, unnest(q) AS v, generate_subscripts(q, 1) AS i FROM q),
       |norms AS (SELECT vec_id, SUM(v * v) AS nn FROM e GROUP BY 1),
       |exact_dot AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.v * b.v) AS dot
       |  FROM e a JOIN e b ON a.i = b.i AND a.vec_id < $NQueries
       |   AND b.vec_id <> a.vec_id
       |  GROUP BY 1, 2),
       |exact_k AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY
       |        CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) *
       |          sqrt(CAST(nb.nn AS DOUBLE))) DESC, neighbor_id) AS rk
       |    FROM exact_dot JOIN norms na ON na.vec_id = query_id
       |    JOIN norms nb ON nb.vec_id = neighbor_id)
       |  WHERE rk <= $TopK),
       |flips AS (SELECT unnest([${(0L +: (0 until AnnProbes - 1).map(b => 1L << b)).mkString(", ")}]) AS f),
       |ann_cand AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id
       |  FROM sig a CROSS JOIN flips JOIN sig b
       |    ON xor(a.sig & (SELECT m FROM mask), f) = (b.sig & (SELECT m FROM mask))
       |   AND a.vec_id < $NQueries AND b.vec_id <> a.vec_id),
       |ann_dot AS (
       |  SELECT c.query_id, c.neighbor_id, SUM(ea.v * eb.v) AS dot
       |  FROM ann_cand c JOIN e ea ON ea.vec_id = c.query_id
       |  JOIN e eb ON eb.vec_id = c.neighbor_id AND ea.i = eb.i
       |  GROUP BY 1, 2),
       |ann_k AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY
       |        CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) *
       |          sqrt(CAST(nb.nn AS DOUBLE))) DESC, neighbor_id) AS rk
       |    FROM ann_dot JOIN norms na ON na.vec_id = query_id
       |    JOIN norms nb ON nb.vec_id = neighbor_id)
       |  WHERE rk <= $TopK)
       |SELECT x.query_id,
       |  CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits,
       |  CAST(COUNT(a.neighbor_id) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE) AS recall
       |FROM exact_k x LEFT JOIN ann_k a
       |  ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
       |GROUP BY 1""".stripMargin

  // ---- s17: retrieval-quality evaluation (nDCG@k / MRR) — the
  // offline eval loop every s13/s14 deployment runs against a
  // relevance set, complementing s9's recall@k (which scores the ANN
  // against the EXACT run; this scores any run against GROUND TRUTH).
  // All metrics are integer-scaled so both engines hash-match exactly:
  // the per-rank DCG discount 1/log2(rank+1) is precomputed as the
  // Long array [[DcgW]] (×1e6, one shared literal interpolated into
  // BOTH the Spark plan and the oracle SQL), DCG@k is then a pure
  // integer dot product of gains with those weights, ideal DCG is a
  // prefix-sum lookup [[DcgC]] at min(n_rel, k), and nDCG / MRR are
  // integer divisions (`div` / `//`) — no float summation anywhere.

  /** Eval cutoff: deeper than [[TopK]] so the discount curve actually
    * discounts; matches the k at which serving stacks are tuned. */
  private val EvalK = 10
  /** round(1e6 / log2(i+2)) for rank i+1 — the integer DCG weights. */
  private[graft] val DcgW: Array[Long] =
    Array.tabulate(EvalK)(i => math.round(1e6 / (math.log(i + 2) / math.log(2))))
  /** Prefix sums of [[DcgW]]: DcgC(j-1) = ideal DCG with j relevant. */
  private[graft] val DcgC: Array[Long] = DcgW.scanLeft(0L)(_ + _).tail

  /** Score a ranked retrieval run against a relevance set: per query,
    * integer-scaled nDCG@k, MRR and the supporting counts. `run` is
    * (query_id, neighbor_id, rk) with rk 1-based (any extra columns
    * ignored — the s1/s2/serving outputs plug in directly);
    * `relevance` is the ground-truth pair set (query_id, neighbor_id),
    * binary gains. At scale the run is queries×k and the relevance set
    * is an eval fixture — both broadcast-sized; producing the run is
    * the heavy leg and stays whatever shape its operator has. */
  private[graft] def rankedEval(run: DataFrame, relevance: DataFrame,
      k: Int = EvalK): DataFrame = {
    require(k >= 1 && k <= EvalK, s"k must be in [1, $EvalK]: $k")
    val rel = relevance.select(col("query_id"), col("neighbor_id"))
      .withColumn("rel", lit(1L))
    val nRel = rel.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_rel"))
    val graded = run
      .select(col("query_id"), col("neighbor_id"), col("rk"))
      .filter(col("rk") <= k)
      .join(broadcast(rel), Seq("query_id", "neighbor_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
    val per = graded.groupBy(col("query_id"))
      .agg(
        sum(col("rel") *
          element_at(lit(DcgW), col("rk").cast("int"))).as("dcg_e6"),
        min(when(col("rel") === 1L, col("rk"))).as("fr"))
    per.join(broadcast(nRel), Seq("query_id"), "left")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .withColumn("idcg_e6", when(col("n_rel") > 0,
        element_at(lit(DcgC),
          least(col("n_rel"), lit(k.toLong)).cast("int")))
        .otherwise(lit(0L)))
      .withColumn("ndcg_e6", when(col("idcg_e6") > 0,
        expr("(dcg_e6 * 1000000) div idcg_e6")).otherwise(lit(0L)))
      .withColumn("rr_e6", when(col("fr").isNotNull,
        expr("1000000 div fr")).otherwise(lit(0L)))
      .select(col("query_id"), col("n_rel").cast("bigint").as("n_rel"),
        col("dcg_e6").cast("bigint").as("dcg_e6"),
        col("idcg_e6").cast("bigint").as("idcg_e6"),
        col("ndcg_e6").cast("bigint").as("ndcg_e6"),
        col("rr_e6").cast("bigint").as("rr_e6"))
  }

  /** Label-match relevance set for the eval queries: neighbor relevant
    * iff it shares the query's `label` (self excluded) — the
    * deterministic ground truth the synthetic corpus carries. One
    * broadcast join over the corpus: linear, no shuffle. */
  private[graft] def labelRelevance(emb: DataFrame,
      nQueries: Int = NQueries): DataFrame = {
    val lab = emb.select(col("vec_id"), col("label"))
    val qlab = lab.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"))
    lab.join(broadcast(qlab),
        col("label") === col("qlabel") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
  }

  /** s17: nDCG@10 / MRR of the exact cosine run against the
    * label-match relevance set — the retrieval-quality measurement an
    * s13/s14 deployment runs offline after every index or ranker
    * change. Legs reuse [[cosineTopK]] (the run) verbatim. */
  private[graft] def retrievalEval(emb: DataFrame,
      nQueries: Int = NQueries, k: Int = EvalK): DataFrame =
    rankedEval(cosineTopK(emb, nQueries, k), labelRelevance(emb, nQueries), k)

  private val retrievalEvalSql =
    s"""WITH q AS (SELECT vec_id, ${TextOps.quantizeSql("embedding")} AS q FROM embeddings),
       |e AS (SELECT vec_id, unnest(q) AS v, generate_subscripts(q, 1) AS i FROM q),
       |norms AS (SELECT vec_id, SUM(v * v) AS nn FROM e GROUP BY 1),
       |dot AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.v * b.v) AS dot
       |  FROM e a JOIN e b ON a.i = b.i AND a.vec_id < $NQueries
       |   AND b.vec_id <> a.vec_id
       |  GROUP BY 1, 2),
       |run AS (
       |  SELECT query_id, neighbor_id, rk FROM (
       |    SELECT query_id, neighbor_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY
       |        CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) *
       |          sqrt(CAST(nb.nn AS DOUBLE))) DESC, neighbor_id) AS rk
       |    FROM dot JOIN norms na ON na.vec_id = query_id
       |    JOIN norms nb ON nb.vec_id = neighbor_id)
       |  WHERE rk <= $EvalK),
       |lab AS (SELECT vec_id, label FROM embeddings),
       |qlab AS (SELECT vec_id AS query_id, label AS qlabel FROM lab
       |  WHERE vec_id < $NQueries),
       |rel AS (
       |  SELECT ql.query_id, l.vec_id AS neighbor_id FROM lab l
       |  JOIN qlab ql ON l.label = ql.qlabel AND l.vec_id <> ql.query_id),
       |nrel AS (SELECT query_id, COUNT(*) AS n_rel FROM rel GROUP BY 1),
       |w AS (SELECT unnest([${DcgW.mkString(", ")}]) AS w,
       |  generate_subscripts([${DcgW.mkString(", ")}], 1) AS rk),
       |c AS (SELECT unnest([${DcgC.mkString(", ")}]) AS c,
       |  generate_subscripts([${DcgC.mkString(", ")}], 1) AS j),
       |per AS (
       |  SELECT r.query_id,
       |    SUM(CASE WHEN x.neighbor_id IS NOT NULL THEN w.w ELSE 0 END) AS dcg_e6,
       |    MIN(CASE WHEN x.neighbor_id IS NOT NULL THEN r.rk END) AS fr
       |  FROM run r JOIN w ON w.rk = r.rk
       |  LEFT JOIN rel x ON x.query_id = r.query_id
       |    AND x.neighbor_id = r.neighbor_id
       |  GROUP BY 1)
       |SELECT p.query_id,
       |  CAST(COALESCE(n.n_rel, 0) AS BIGINT) AS n_rel,
       |  CAST(p.dcg_e6 AS BIGINT) AS dcg_e6,
       |  CAST(COALESCE(c.c, 0) AS BIGINT) AS idcg_e6,
       |  CAST(CASE WHEN COALESCE(c.c, 0) > 0
       |    THEN (p.dcg_e6 * 1000000) // c.c ELSE 0 END AS BIGINT) AS ndcg_e6,
       |  CAST(CASE WHEN p.fr IS NOT NULL
       |    THEN 1000000 // p.fr ELSE 0 END AS BIGINT) AS rr_e6
       |FROM per p
       |LEFT JOIN nrel n ON n.query_id = p.query_id
       |LEFT JOIN c ON c.j = LEAST(COALESCE(n.n_rel, 0), $EvalK)""".stripMargin

  // ---- out-of-corpus query-batch serving (s11) — the deployment seam:
  // every family's gate query above slices its query set FROM the
  // indexed corpus (vec_id < nQueries), which exercises the index shape
  // but not the serving contract. A real serving path takes a batch of
  // NEW vectors (an id namespace of its own), derives their probe keys
  // against the STORED quantizers (signatures / centroids / codebooks /
  // stats — never re-fitting anything), and returns top-k per query.
  // Shared scale shape across families: the query batch and everything
  // derived from it broadcasts; the corpus-side artifact (signature
  // table, inverted file, codes) streams through ONE broadcast hash
  // join and never shuffles; only rerank winners touch the embedding
  // store. [[graft.operators.AnnIndex]] wires these to loaded artifacts.

  /** Normalized query batch: (query_id, qq, qnn) exact int64. */
  private[graft] def queryVectors(queries: DataFrame): DataFrame =
    queries.select(col("query_id"), TextOps.quantize(col("embedding")).as("qq"))
      .withColumn("qnn", TextOps.qdot(col("qq"), col("qq")))

  /** s2's serving half: signatures for the NEW query batch under the
    * index's FROZEN mask width (`bucketBits` from the manifest — the
    * mask must match what the signature table was bucketed with, not
    * the batch's size), multi-probe flips on the query side only, then
    * one broadcast bucket join against the stored signature table and
    * an exact cosine top-k per query. */
  private[graft] def lshServeFromSigs(withSig: DataFrame, queries: DataFrame,
      dim: Int, bucketBits: Int, topK: Int = TopK,
      nProbe: Int = AnnProbes): DataFrame = {
    require(nProbe >= 1 && nProbe <= 4,
      s"nProbe must be in [1, 4] (flip bits live inside the 3-bit minimum mask): $nProbe")
    val mask = (1L << bucketBits) - 1L
    val qv = queries
      .select(col("query_id"), TextOps.quantize(col("embedding")).as("q"))
      .withColumn("qnn", TextOps.qdot(col("q"), col("q")))
      .withColumn("qsig", sigCol(dim).bitwiseAND(lit(mask)))
      .select(col("query_id"), col("q").as("qq"), col("qnn"), col("qsig"))
    val flips = (0L +: (0 until nProbe - 1).map(b => 1L << b)).toArray
    val probes = qv.withColumn("psig",
      explode(array(flips.map(f => col("qsig").bitwiseXOR(lit(f))): _*)))
    val scored = withSig.join(broadcast(probes), col("sig") === col("psig"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (TextOps.qdot(col("qq"), col("q")).cast("double") /
          (sqrt(col("qnn").cast("double")) * sqrt(col("nn").cast("double"))))
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("rk"),
        round(col("cosine"), 6).as("cosine_r"))
  }

  /** s3's serving half: assign the NEW batch to its nProbe nearest
    * STORED centroids (the same (cosine desc, cent_id) order as the
    * build-side assignment), then one broadcast join of the probe rows
    * onto the home cells of the stored inverted file and an exact
    * cosine top-k within probed cells. */
  private[graft] def ivfServeFromAssign(assign: DataFrame, cents: DataFrame,
      queries: DataFrame, topK: Int = TopK,
      nProbe: Int = NProbe): DataFrame = {
    val qv = queryVectors(queries)
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cent_id"))
    val qprobe = qv.join(broadcast(cents))
      .withColumn("ccos",
        TextOps.qdot(col("qq"), col("cq")).cast("double") /
          (sqrt(col("qnn").cast("double")) * sqrt(col("cnn").cast("double"))))
      .withColumn("arn", row_number().over(wq))
      .filter(col("arn") <= nProbe)
      .select(col("query_id"), col("qq"), col("qnn"),
        col("cent_id").as("cell"))
    val index = assign.filter(col("arn") === 1) // stored home cells
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    index.join(broadcast(qprobe), Seq("cell"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cell"),
        (TextOps.qdot(col("qq"), col("q")).cast("double") /
          (sqrt(col("qnn").cast("double")) * sqrt(col("nn").cast("double"))))
          .as("cosine"))
      .withColumn("rk", row_number().over(wRank).cast("bigint"))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("cell"), col("rk"),
        round(col("cosine"), 6).as("cosine_r"))
  }

  /** Exact bipartite cosine top-k of a NEW query batch against the
    * corpus — s1's broadcast-queries scan with an external batch: the
    * truth leg for serving-path recall, and the brute-force serving
    * baseline itself. */
  private[graft] def cosineTopKServe(emb: DataFrame, queries: DataFrame,
      topK: Int = TopK): DataFrame = {
    val e = emb
      .select(col("vec_id"), TextOps.quantize(col("embedding")).as("q"))
      .withColumn("nn", TextOps.qdot(col("q"), col("q")))
    val scored = e.join(broadcast(queryVectors(queries)))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (TextOps.qdot(col("qq"), col("q")).cast("double") /
          (sqrt(col("qnn").cast("double")) * sqrt(col("nn").cast("double"))))
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("rk"),
        round(col("cosine"), 6).as("cosine_r"))
  }

  // ---- s12: filtered vector search — the metadata-predicate retrieval
  // every production vector store ships (and every RAG pipeline needs:
  // "top-k among the docs this user may see / in this language / from
  // this source"). PRE-FILTERING semantics: the predicate restricts the
  // candidate set BEFORE scoring, so the result is exactly the top-k of
  // the filtered corpus — post-filtering (rank first, filter the top-k
  // after) silently returns < k rows whenever the unfiltered top-k is
  // predicate-poor, which is the classic filtered-ANN correctness trap.
  // Scale shape: s1's broadcast-query scan over the filtered corpus —
  // the predicate applies AT the scan, before any join or shuffle
  // (plain comparisons additionally reach PushedFilters for row-group
  // pruning; the gate's `% 2` form filters post-read, still pre-join),
  // the query side broadcasts, nothing else changes. The artifact-backed sibling
  // ([[graft.operators.AnnIndex.ivfServeWhere]]) applies the same
  // pre-filter to the stored inverted file via a semi join before the
  // per-cell ranking.
  private[graft] def filteredTopK(emb: DataFrame, nQueries: Int = NQueries,
      topK: Int = TopK): DataFrame = {
    val e = emb.select(col("vec_id"), col("label"),
        TextOps.quantize(col("embedding")).as("q"))
      .withColumn("nn", TextOps.qdot(col("q"), col("q")))
    // queries come from the FULL corpus (a querying user is not subject
    // to the candidate predicate)
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("nn").as("qnn"))
    val cand = e.filter(col("label") % 2 === 0) // the metadata predicate
    val scored = cand.join(broadcast(queries),
        col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("label").cast("bigint").as("label"),
        (TextOps.qdot(col("qq"), col("q")).cast("double") /
          (sqrt(col("qnn").cast("double")) * sqrt(col("nn").cast("double"))))
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("label"), col("rk"),
        round(col("cosine"), 6).as("cosine_r"))
  }
  private val filteredTopKSql =
    s"""WITH q AS (SELECT vec_id, label, ${TextOps.quantizeSql("embedding")} AS q
       |  FROM embeddings),
       |e AS (SELECT vec_id, unnest(q) AS v, generate_subscripts(q, 1) AS i FROM q),
       |norms AS (SELECT vec_id, SUM(v * v) AS nn FROM e GROUP BY 1),
       |dot AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.v * b.v) AS dot
       |  FROM e a JOIN e b ON a.i = b.i AND a.vec_id < $NQueries
       |   AND b.vec_id <> a.vec_id
       |  JOIN q fb ON fb.vec_id = b.vec_id AND fb.label % 2 = 0
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT query_id, neighbor_id, CAST(fq.label AS BIGINT) AS label,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS cosine
       |  FROM dot JOIN norms na ON na.vec_id = query_id
       |  JOIN norms nb ON nb.vec_id = neighbor_id
       |  JOIN q fq ON fq.vec_id = neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, label,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS rk, cosine
       |  FROM scored)
       |SELECT query_id, neighbor_id, label, rk, round(cosine, 6) AS cosine_r
       |FROM ranked WHERE rk <= $TopK""".stripMargin

  // ---- s13: hybrid lexical+vector retrieval with reciprocal-rank
  // fusion (Cormack et al. 2009 — the RAG-standard two-tower fusion):
  // per query, a LEXICAL leg ranks candidates by exact shared-shingle
  // overlap (the term-match signal embeddings blur: rare exact tokens,
  // codes, names) and a VECTOR leg by exact cosine; the fused score is
  // RRF = Σ_leg 1/(k + rank_leg) over each leg's top-R list — rank
  // fusion needs no score calibration between incomparable scales,
  // which is exactly why production hybrid search uses it. Determinism:
  // both leg ranks are integer row_numbers over total orders
  // ((overlap desc, id) / (cosine desc, id)); RRF sums two IEEE
  // divisions of small-int ranks in a fixed order — bit-identical
  // cross-engine, ties broken by doc_id. Scale shape: both legs are
  // s1's broadcast-query scan (the corpus is scanned twice, never
  // shuffled); per-leg truncation at R bounds the fusion join at
  // queries × R rows per leg, the standard top-R-lists RRF form.
  private val HQ = 8
  private val RrfK = 60  // the canonical RRF dampening constant
  private val RrfR = 100 // per-leg list length fed to the fusion

  /** The lexical-leg ranking half: (query_id, doc_id, inter) scored
    * overlaps → per-query rank by (overlap desc, id), truncated at r.
    * Shared by the in-corpus gate query, the exact serve twin and the
    * artifact-backed path (which scores inter over STORED hashed
    * shingle sets) — one rank definition, three candidate sources. */
  private[graft] def lexRankOn(scored: DataFrame, r: Int): DataFrame = {
    val wL = Window.partitionBy(col("query_id"))
      .orderBy(col("inter").desc, col("doc_id"))
    scored.filter(col("inter") > 0)
      .withColumn("lex_rank", row_number().over(wL).cast("bigint"))
      .filter(col("lex_rank") <= r)
      .select(col("query_id"), col("doc_id"), col("lex_rank"))
  }

  /** The RRF fusion half: two (query_id, doc_id, *_rank) legs →
    * Σ 1/(k + rank) over a full outer join, re-ranked, top-k. One
    * fusion definition for every hybrid composition. */
  private[graft] def rrfFuse(lexRank: DataFrame, vecRank: DataFrame,
      kRrf: Int, topK: Int): DataFrame = {
    val wF = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    lexRank.join(vecRank, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(kRrf) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("vec_rank")), lit(0.0)))
      .withColumn("rk", row_number().over(wF).cast("bigint"))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("doc_id"),
        coalesce(col("lex_rank"), lit(-1L)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(-1L)).as("vec_rank"),
        col("rk"), round(col("rrf"), 6).as("rrf_r"))
  }

  private[graft] def hybridRrf(docs: DataFrame, emb: DataFrame,
      nQueries: Int = HQ, topK: Int = TopK, kRrf: Int = RrfK,
      r: Int = RrfR): DataFrame = {
    val sh = docs.select(col("doc_id"), TextOps.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val qsh = sh.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("sh").as("qsh"))
    val lexRank = lexRankOn(
      sh.join(broadcast(qsh), col("query_id") =!= col("doc_id"))
        .select(col("query_id"), col("doc_id"),
          size(array_intersect(col("qsh"), col("sh"))).cast("bigint")
            .as("inter")), r)
    val e = emb.select(col("vec_id"), TextOps.quantize(col("embedding")).as("q"))
      .withColumn("nn", TextOps.qdot(col("q"), col("q")))
    val qv = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("nn").as("qnn"))
    val wV = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("doc_id"))
    val vecRank = e.join(broadcast(qv), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("doc_id"),
        (TextOps.qdot(col("qq"), col("q")).cast("double") /
          (sqrt(col("qnn").cast("double")) * sqrt(col("nn").cast("double"))))
          .as("cosine"))
      .withColumn("vec_rank", row_number().over(wV).cast("bigint"))
      .filter(col("vec_rank") <= r)
      .select(col("query_id"), col("doc_id"), col("vec_rank"))
    rrfFuse(lexRank, vecRank, kRrf, topK)
  }
  private val hybridRrfSql =
    s"""WITH sh AS (SELECT doc_id, ${TextOps.shinglesSql("text")} AS sh
       |  FROM documents WHERE len(${TextOps.tokensSql("text")}) >= 3),
       |lex0 AS (
       |  SELECT q.doc_id AS query_id, c.doc_id AS doc_id,
       |    CAST(len(list_intersect(q.sh, c.sh)) AS BIGINT) AS inter
       |  FROM sh q JOIN sh c ON q.doc_id < $HQ AND c.doc_id <> q.doc_id
       |  WHERE len(list_intersect(q.sh, c.sh)) > 0),
       |lexr AS (
       |  SELECT query_id, doc_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY inter DESC, doc_id) AS lex_rank
       |  FROM lex0 QUALIFY lex_rank <= $RrfR),
       |qv AS (SELECT vec_id, ${TextOps.quantizeSql("embedding")} AS q FROM embeddings),
       |e AS (SELECT vec_id, unnest(q) AS v, generate_subscripts(q, 1) AS i FROM qv),
       |norms AS (SELECT vec_id, SUM(v * v) AS nn FROM e GROUP BY 1),
       |vd AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS doc_id, SUM(a.v * b.v) AS dot
       |  FROM e a JOIN e b ON a.i = b.i AND a.vec_id < $HQ
       |   AND b.vec_id <> a.vec_id
       |  GROUP BY 1, 2),
       |vecr AS (
       |  SELECT query_id, doc_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY
       |        CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) DESC,
       |        doc_id) AS vec_rank
       |  FROM vd JOIN norms na ON na.vec_id = query_id
       |  JOIN norms nb ON nb.vec_id = doc_id
       |  QUALIFY vec_rank <= $RrfR),
       |fused AS (
       |  SELECT COALESCE(l.query_id, v.query_id) AS query_id,
       |    COALESCE(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank,
       |    COALESCE(CAST(1 AS DOUBLE) / ($RrfK + l.lex_rank), 0)
       |      + COALESCE(CAST(1 AS DOUBLE) / ($RrfK + v.vec_rank), 0) AS rrf
       |  FROM lexr l FULL JOIN vecr v
       |    ON v.query_id = l.query_id AND v.doc_id = l.doc_id)
       |SELECT query_id, doc_id,
       |  COALESCE(lex_rank, -1) AS lex_rank,
       |  COALESCE(vec_rank, -1) AS vec_rank,
       |  row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rk,
       |  round(rrf, 6) AS rrf_r
       |FROM fused QUALIFY rk <= $TopK""".stripMargin

  /** Exact cosine ranking RESTRICTED to an explicit (query_id, doc_id)
    * candidate set — the "index candidates + exact rerank" half every
    * artifact-backed retrieval composition shares ([[graft.operators
    * .RagServe]]): only the candidate docs' vectors are joined from
    * the store, the query side broadcasts, and `sim` stays an
    * UNROUNDED double so downstream scoring (MMR) is bit-identical to
    * the exhaustive twin. (query_id, doc_id, sim, vec_rank ≤ r). */
  private[graft] def cosineRankOnPairs(cand: DataFrame, emb: DataFrame,
      queries: DataFrame, r: Int): DataFrame = {
    val e = emb.select(col("vec_id").as("doc_id"),
        TextOps.quantize(col("embedding")).as("q"))
      .withColumn("nn", TextOps.qdot(col("q"), col("q")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("doc_id"))
    cand.join(e, "doc_id")
      .join(broadcast(queryVectors(queries)), "query_id")
      .select(col("query_id"), col("doc_id"),
        (TextOps.qdot(col("qq"), col("q")).cast("double") /
          (sqrt(col("qnn").cast("double")) * sqrt(col("nn").cast("double"))))
          .as("sim"))
      .withColumn("vec_rank", row_number().over(w).cast("bigint"))
      .filter(col("vec_rank") <= r)
  }

  /** The exhaustive twin of [[cosineRankOnPairs]]: every corpus vector
    * scored against the broadcast query batch (s1's serve scan) —
    * unrounded sim, same rank order. The truth leg for the
    * artifact-backed compositions. */
  private[graft] def cosineRankServe(emb: DataFrame, queries: DataFrame,
      r: Int): DataFrame = {
    val e = emb.select(col("vec_id").as("doc_id"),
        TextOps.quantize(col("embedding")).as("q"))
      .withColumn("nn", TextOps.qdot(col("q"), col("q")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("doc_id"))
    e.join(broadcast(queryVectors(queries)))
      .select(col("query_id"), col("doc_id"),
        (TextOps.qdot(col("qq"), col("q")).cast("double") /
          (sqrt(col("qnn").cast("double")) * sqrt(col("nn").cast("double"))))
          .as("sim"))
      .withColumn("vec_rank", row_number().over(w).cast("bigint"))
      .filter(col("vec_rank") <= r)
  }

  // ---- s15: FILTERED hybrid retrieval — s12's pre-filter semantics
  // composed with s13's two-tower RRF fusion: the query a deployed RAG
  // stack actually runs ("hybrid top-k among the docs this user may
  // see"). One keep-set (the metadata predicate's surviving ids)
  // restricts BOTH legs' candidates via a semi join BEFORE any ranking
  // — ranks are positions within the FILTERED corpus, so the fused
  // top-k is exactly the filtered corpus's hybrid top-k
  // (post-filtering either leg under-fills and mis-ranks: a rank
  // computed on the unfiltered corpus is wrong the moment a
  // higher-ranked doc is filtered away). Legs, fusion, determinism and
  // scale shape are s13's verbatim (shared lexRankOn/rrfFuse halves);
  // the predicate adds one semi join per leg, never a rebuild.
  private[graft] def filteredHybridRrf(docs: DataFrame, emb: DataFrame,
      nQueries: Int = HQ, topK: Int = TopK, kRrf: Int = RrfK,
      r: Int = RrfR): DataFrame = {
    // the metadata predicate lives on the embedding side (s12's gate
    // shape); one keep-set drives both legs
    val keep = emb.filter(col("label") % 2 === 0)
      .select(col("vec_id").as("doc_id"))
    val sh = docs.select(col("doc_id"), TextOps.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val qsh = sh.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("sh").as("qsh"))
    val lexRank = lexRankOn(
      sh.join(keep, Seq("doc_id"), "left_semi")
        .join(broadcast(qsh), col("query_id") =!= col("doc_id"))
        .select(col("query_id"), col("doc_id"),
          size(array_intersect(col("qsh"), col("sh"))).cast("bigint")
            .as("inter")), r)
    val e = emb.select(col("vec_id"), col("label"),
        TextOps.quantize(col("embedding")).as("q"))
      .withColumn("nn", TextOps.qdot(col("q"), col("q")))
    val qv = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("nn").as("qnn"))
    val wV = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("doc_id"))
    val vecRank = e.filter(col("label") % 2 === 0)
      .join(broadcast(qv), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("doc_id"),
        (TextOps.qdot(col("qq"), col("q")).cast("double") /
          (sqrt(col("qnn").cast("double")) * sqrt(col("nn").cast("double"))))
          .as("cosine"))
      .withColumn("vec_rank", row_number().over(wV).cast("bigint"))
      .filter(col("vec_rank") <= r)
      .select(col("query_id"), col("doc_id"), col("vec_rank"))
    rrfFuse(lexRank, vecRank, kRrf, topK)
  }
  private val filteredHybridRrfSql =
    s"""WITH keep AS (SELECT vec_id AS doc_id FROM embeddings WHERE label % 2 = 0),
       |sh AS (SELECT doc_id, ${TextOps.shinglesSql("text")} AS sh
       |  FROM documents WHERE len(${TextOps.tokensSql("text")}) >= 3),
       |lex0 AS (
       |  SELECT q.doc_id AS query_id, c.doc_id AS doc_id,
       |    CAST(len(list_intersect(q.sh, c.sh)) AS BIGINT) AS inter
       |  FROM sh q JOIN sh c ON q.doc_id < $HQ AND c.doc_id <> q.doc_id
       |  WHERE c.doc_id IN (SELECT doc_id FROM keep)
       |    AND len(list_intersect(q.sh, c.sh)) > 0),
       |lexr AS (
       |  SELECT query_id, doc_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY inter DESC, doc_id) AS lex_rank
       |  FROM lex0 QUALIFY lex_rank <= $RrfR),
       |qv AS (SELECT vec_id, label, ${TextOps.quantizeSql("embedding")} AS q FROM embeddings),
       |e AS (SELECT vec_id, unnest(q) AS v, generate_subscripts(q, 1) AS i FROM qv),
       |norms AS (SELECT vec_id, SUM(v * v) AS nn FROM e GROUP BY 1),
       |vd AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS doc_id, SUM(a.v * b.v) AS dot
       |  FROM e a JOIN e b ON a.i = b.i AND a.vec_id < $HQ
       |   AND b.vec_id <> a.vec_id
       |  JOIN qv fb ON fb.vec_id = b.vec_id AND fb.label % 2 = 0
       |  GROUP BY 1, 2),
       |vecr AS (
       |  SELECT query_id, doc_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY
       |        CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) DESC,
       |        doc_id) AS vec_rank
       |  FROM vd JOIN norms na ON na.vec_id = query_id
       |  JOIN norms nb ON nb.vec_id = doc_id
       |  QUALIFY vec_rank <= $RrfR),
       |fused AS (
       |  SELECT COALESCE(l.query_id, v.query_id) AS query_id,
       |    COALESCE(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank,
       |    COALESCE(CAST(1 AS DOUBLE) / ($RrfK + l.lex_rank), 0)
       |      + COALESCE(CAST(1 AS DOUBLE) / ($RrfK + v.vec_rank), 0) AS rrf
       |  FROM lexr l FULL JOIN vecr v
       |    ON v.query_id = l.query_id AND v.doc_id = l.doc_id)
       |SELECT query_id, doc_id,
       |  COALESCE(lex_rank, -1) AS lex_rank,
       |  COALESCE(vec_rank, -1) AS vec_rank,
       |  row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rk,
       |  round(rrf, 6) AS rrf_r
       |FROM fused QUALIFY rk <= $TopK""".stripMargin

  // ---- s14: MMR diversity re-ranking (Carbonell & Goldstein 1998 —
  // maximal marginal relevance, the standard RAG diversity pass): a
  // plain top-k hands the generator k near-copies of the same passage;
  // MMR re-picks greedily from a relevance pool, each pick maximizing
  //   λ·sim(q, d) − (1−λ)·max_{s∈Selected} sim(d, s)
  // — relevance minus redundancy against what's already selected. The
  // greedy chain is inherently sequential, but k is tiny and fixed, so
  // the rounds UNROLL (the library's PageRank/BPE pattern): each round
  // is one join + one argmax over the pool, and the DuckDB twin is the
  // identical unrolled CTE chain. Determinism: sims are the established
  // exact-int-dot cosine doubles; the λ = 0.7 combination is scored as
  // score10 = 7·sim − 3·max_redundancy (two IEEE mults + one subtract,
  // fixed order — same order, no decimal literals, bit-identical
  // cross-engine), ties through doc_id.
  // Scale shape: the pool is s1's broadcast-query top-R (corpus scanned
  // once, never shuffled); everything after — pairwise sims and the k
  // selection rounds — touches queries × R (× R) rows only.
  private val MmrNQ = 8
  private val MmrR = 10 // relevance pool per query fed to the greedy picks
  private[graft] def mmrRerank(emb: DataFrame, nQueries: Int = MmrNQ,
      poolR: Int = MmrR, topK: Int = TopK): DataFrame =
    mmrRerankPinned(emb, nQueries, poolR, topK)._1

  // ---- s16: FILTERED MMR — s12's pre-filter semantics on the diversity
  // re-ranker (the s15 move applied to s14): the deployed "diverse top-k
  // among the docs this user may see". One keep-set (the metadata
  // predicate's survivors) restricts the relevance pool BEFORE ranking;
  // the selection rounds and scores are s14's verbatim (shared factored
  // halves), so the only change is WHICH corpus the pool ranks within.
  private[graft] def filteredMmrRerank(emb: DataFrame,
      nQueries: Int = MmrNQ, poolR: Int = MmrR,
      topK: Int = TopK): DataFrame =
    mmrRerankPinned(emb, nQueries, poolR, topK,
      corpusFilter = Some(col("label") % 2 === 0))._1

  /** [[mmrRerank]] plus the pinned frames it holds in the session cache
    * (the relevance pool and the pairwise-sim table — each referenced by
    * every selection round): the gate path discards them (bench clears
    * per query), the facade materializes and releases (the
    * ivfPqTopKPinned pattern). */
  private[graft] def mmrRerankPinned(emb: DataFrame, nQueries: Int = MmrNQ,
      poolR: Int = MmrR, topK: Int = TopK,
      corpusFilter: Option[org.apache.spark.sql.Column] = None)
      : (DataFrame, Seq[DataFrame]) = {
    require(topK == 3, "the unrolled selection (and its oracle) is k = 3")
    def proj(df: DataFrame): DataFrame = df
      .select(col("vec_id"), TextOps.quantize(col("embedding")).as("q"))
      .withColumn("nn", TextOps.qdot(col("q"), col("q")))
    val e = proj(emb)
    // s12's PRE-filter semantics when a corpus predicate is given (s16):
    // the pool ranks within the FILTERED corpus — post-filtering a pool
    // under-fills and mis-ranks the moment a higher-ranked doc is
    // filtered away. Queries stay unfiltered (they are probes).
    val eCorpus = corpusFilter.map(f => proj(emb.filter(f))).getOrElse(e)
    val qv = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("nn").as("qnn"))
    val wP = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("doc_id"))
    // referenced by every selection round: pin + materialize (house
    // cache discipline; the registry path relies on per-query clearCache)
    val pool = eCorpus.join(broadcast(qv), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("doc_id"),
        (TextOps.qdot(col("qq"), col("q")).cast("double") /
          (sqrt(col("qnn").cast("double")) * sqrt(col("nn").cast("double"))))
          .as("sim"))
      .withColumn("pr", row_number().over(wP))
      .filter(col("pr") <= poolR)
      .select(col("query_id"), col("doc_id"), col("sim"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pool.count()
    val (out, dsPins) = mmrSelectFromPool(pool,
      e.select(col("vec_id").as("doc_id"), col("q").as("dq"),
        col("nn").as("dnn")), topK)
    (out, pool +: dsPins)
  }

  /** The greedy MMR selection rounds over a PINNED relevance pool —
    * factored so the in-corpus gate query and the artifact-backed serve
    * path ([[graft.operators.RagServe]]) run the IDENTICAL selection
    * (the streaming-twin pattern): `pool` is (query_id, doc_id, sim)
    * with unrounded sims, already persisted + materialized by the
    * caller; `eVec` is (doc_id, dq, dnn) quantized vectors covering
    * every pool doc. Returns (selection, the ds pin the caller
    * releases). */
  private[graft] def mmrSelectFromPool(pool: DataFrame, eVec: DataFrame,
      topK: Int = TopK): (DataFrame, Seq[DataFrame]) = {
    require(topK == 3, "the unrolled selection (and its oracle) is k = 3")
    // pairwise redundancy sims within each query's pool — queries×R rows
    // of vectors (broadcastable), queries×R×R scored pairs
    val pv = pool.select(col("query_id"), col("doc_id")).join(eVec, "doc_id")
    val ds = pv.as("a").join(pv.as("b"),
        col("a.query_id") === col("b.query_id") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.query_id").as("query_id"), col("a.doc_id").as("d"),
        col("b.doc_id").as("s"),
        (TextOps.qdot(col("a.dq"), col("b.dq")).cast("double") /
          (sqrt(col("a.dnn").cast("double")) * sqrt(col("b.dnn").cast("double"))))
          .as("ds"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ds.count()
    def argmax(cand: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("doc_id"))
      cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("query_id"), col("doc_id"), col("score"))
    }
    // round 1: nothing selected yet — pure relevance
    val sel1 = argmax(pool.withColumn("score", lit(7) * col("sim")))
    // round 2: redundancy against the single selected doc
    val sel2 = argmax(pool
      .join(sel1.select(col("query_id"), col("doc_id").as("s1")), "query_id")
      .filter(col("doc_id") =!= col("s1"))
      .join(ds.select(col("query_id"), col("d").as("doc_id"),
        col("s").as("s1"), col("ds").as("ds1")), Seq("query_id", "doc_id", "s1"))
      .withColumn("score", lit(7) * col("sim") - lit(3) * col("ds1")))
    // round 3: redundancy = max over the two selected docs
    val sel3 = argmax(pool
      .join(sel1.select(col("query_id"), col("doc_id").as("s1")), "query_id")
      .join(sel2.select(col("query_id"), col("doc_id").as("s2")), "query_id")
      .filter(col("doc_id") =!= col("s1") && col("doc_id") =!= col("s2"))
      .join(ds.select(col("query_id"), col("d").as("doc_id"),
        col("s").as("s1"), col("ds").as("ds1")), Seq("query_id", "doc_id", "s1"))
      .join(ds.select(col("query_id"), col("d").as("doc_id"),
        col("s").as("s2"), col("ds").as("ds2")), Seq("query_id", "doc_id", "s2"))
      .withColumn("score",
        lit(7) * col("sim") - lit(3) * greatest(col("ds1"), col("ds2"))))
    val out = sel1.withColumn("rk", lit(1L))
      .unionAll(sel2.withColumn("rk", lit(2L)))
      .unionAll(sel3.withColumn("rk", lit(3L)))
      .select(col("query_id"), col("doc_id"), col("rk"),
        round(col("score"), 6).as("mmr10_r"))
    (out, Seq(ds))
  }
  /** The s14 oracle with a corpus-side predicate hook — `corpusPred`
    * filters the POOL side of the relevance join (pre-filter
    * semantics); "TRUE" gives the unfiltered s14 oracle, the s16 twin
    * injects the keep-set membership. */
  private def mmrSqlWith(corpusPred: String): String =
    s"""WITH q AS (SELECT vec_id, ${TextOps.quantizeSql("embedding")} AS q FROM embeddings),
       |e AS (SELECT vec_id, unnest(q) AS v, generate_subscripts(q, 1) AS i FROM q),
       |norms AS (SELECT vec_id, SUM(v * v) AS nn FROM e GROUP BY 1),
       |dot AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS doc_id, SUM(a.v * b.v) AS dot
       |  FROM e a JOIN e b ON a.i = b.i AND a.vec_id < $MmrNQ
       |   AND b.vec_id <> a.vec_id AND $corpusPred
       |  GROUP BY 1, 2),
       |pool AS (
       |  SELECT query_id, doc_id,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS sim
       |  FROM dot JOIN norms na ON na.vec_id = query_id
       |  JOIN norms nb ON nb.vec_id = doc_id
       |  QUALIFY row_number() OVER (PARTITION BY query_id
       |    ORDER BY sim DESC, doc_id) <= $MmrR),
       |pd AS (
       |  SELECT p1.query_id, p1.doc_id AS d, p2.doc_id AS s, SUM(ea.v * eb.v) AS dot
       |  FROM pool p1 JOIN pool p2
       |    ON p2.query_id = p1.query_id AND p2.doc_id <> p1.doc_id
       |  JOIN e ea ON ea.vec_id = p1.doc_id
       |  JOIN e eb ON eb.vec_id = p2.doc_id AND eb.i = ea.i
       |  GROUP BY 1, 2, 3),
       |dsim AS (
       |  SELECT query_id, d, s,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS ds
       |  FROM pd JOIN norms na ON na.vec_id = d
       |  JOIN norms nb ON nb.vec_id = s),
       |sel1 AS (
       |  SELECT query_id, doc_id, 7 * sim AS score FROM pool
       |  QUALIFY row_number() OVER (PARTITION BY query_id
       |    ORDER BY 7 * sim DESC, doc_id) = 1),
       |sel2 AS (
       |  SELECT p.query_id, p.doc_id, 7 * p.sim - 3 * x.ds AS score
       |  FROM pool p JOIN sel1 ON sel1.query_id = p.query_id
       |   AND p.doc_id <> sel1.doc_id
       |  JOIN dsim x ON x.query_id = p.query_id AND x.d = p.doc_id
       |   AND x.s = sel1.doc_id
       |  QUALIFY row_number() OVER (PARTITION BY p.query_id
       |    ORDER BY 7 * p.sim - 3 * x.ds DESC, p.doc_id) = 1),
       |sel3 AS (
       |  SELECT p.query_id, p.doc_id,
       |    7 * p.sim - 3 * GREATEST(x1.ds, x2.ds) AS score
       |  FROM pool p
       |  JOIN sel1 ON sel1.query_id = p.query_id AND p.doc_id <> sel1.doc_id
       |  JOIN sel2 ON sel2.query_id = p.query_id AND p.doc_id <> sel2.doc_id
       |  JOIN dsim x1 ON x1.query_id = p.query_id AND x1.d = p.doc_id
       |   AND x1.s = sel1.doc_id
       |  JOIN dsim x2 ON x2.query_id = p.query_id AND x2.d = p.doc_id
       |   AND x2.s = sel2.doc_id
       |  QUALIFY row_number() OVER (PARTITION BY p.query_id
       |    ORDER BY 7 * p.sim - 3 * GREATEST(x1.ds, x2.ds) DESC, p.doc_id) = 1)
       |SELECT query_id, doc_id, CAST(1 AS BIGINT) AS rk, round(score, 6) AS mmr10_r FROM sel1
       |UNION ALL
       |SELECT query_id, doc_id, CAST(2 AS BIGINT) AS rk, round(score, 6) AS mmr10_r FROM sel2
       |UNION ALL
       |SELECT query_id, doc_id, CAST(3 AS BIGINT) AS rk, round(score, 6) AS mmr10_r FROM sel3""".stripMargin

  private val mmrRerankSql = mmrSqlWith("TRUE")
  private val filteredMmrSql = mmrSqlWith(
    "b.vec_id IN (SELECT vec_id FROM embeddings WHERE label % 2 = 0)")

  // s11 gate: hold the first S11NQ vectors OUT of the corpus, index the
  // rest, serve the held-out rows as a new query batch through the lsh
  // serving half (mask width frozen at the INDEXED corpus's size). The
  // signature table is referenced once (the batch side broadcasts), so
  // nothing pins.
  private val S11NQ = 8
  private[graft] def annServeLsh(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val n = Tables.embeddingsRows(s, d) - S11NQ
    val corpus = emb.filter(col("vec_id") >= S11NQ)
    val queries = emb.filter(col("vec_id") < S11NQ)
      .select(col("vec_id").as("query_id"), col("embedding"))
    lshServeFromSigs(lshSignatures(corpus, Tables.EmbeddingDim, n),
      queries, Tables.EmbeddingDim, annBucketBits(n))
  }
  private val annServeLshSql =
    s"""WITH q AS (SELECT vec_id, ${TextOps.quantizeSql("embedding")} AS q FROM embeddings),
       |nrows AS (SELECT COUNT(*) AS n FROM q WHERE vec_id >= $S11NQ),
       |mask AS (
       |  SELECT CAST(POWER(2, LEAST($SigBits, GREATEST(3, COALESCE(
       |      MIN(CASE WHEN POWER(2, r.range + 6) >= n THEN r.range END),
       |      $SigBits)))) AS BIGINT) - 1 AS m
       |  FROM range(0, ${SigBits + 1}) r, nrows GROUP BY n),
       |sig AS ($lshSignatureSql),
       |e AS (SELECT vec_id, unnest(q) AS v, generate_subscripts(q, 1) AS i FROM q),
       |norms AS (SELECT vec_id, SUM(v * v) AS nn FROM e GROUP BY 1),
       |flips AS (SELECT unnest([${(0L +: (0 until AnnProbes - 1).map(b => 1L << b)).mkString(", ")}]) AS f),
       |cand AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id
       |  FROM sig a CROSS JOIN flips JOIN sig b
       |    ON xor(a.sig & (SELECT m FROM mask), f) = (b.sig & (SELECT m FROM mask))
       |   AND a.vec_id < $S11NQ AND b.vec_id >= $S11NQ),
       |dot AS (
       |  SELECT c.query_id, c.neighbor_id, SUM(ea.v * eb.v) AS dot
       |  FROM cand c JOIN e ea ON ea.vec_id = c.query_id
       |  JOIN e eb ON eb.vec_id = c.neighbor_id AND ea.i = eb.i
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS cosine
       |  FROM dot JOIN norms na ON na.vec_id = query_id
       |  JOIN norms nb ON nb.vec_id = neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk,
       |    cosine
       |  FROM scored)
       |SELECT query_id, neighbor_id, rk, round(cosine, 6) AS cosine_r
       |FROM ranked WHERE rk <= $TopK""".stripMargin

  val all: Seq[Q] = Seq(
    Q("s1_cosine_topk", (s, d) => cosineTopK(Tables.embeddings(s, d)),
      Some(cosineTopKSql)),
    Q("s2_ann_lsh",
      (s, d) => annLsh(Tables.embeddings(s, d), dim0 = Tables.EmbeddingDim,
        nHint = Tables.embeddingsRows(s, d)),
      Some(annLshSql)),
    Q("s3_ivf_topk", ivfTopK, Some(ivfTopKSql)),
    Q("s4_kmeans", kmeansSummary, Some(kmeansSummarySql)),
    Q("s5_pq_adc", pqAdc, Some(pqAdcSql)),
    Q("s6_range_search",
      (s, d) => rangeSearchOn(Tables.embeddings(s, d),
        dim0 = Tables.EmbeddingDim, nHint = Tables.embeddingsRows(s, d)),
      Some(rangeSearchSql)),
    Q("s7_mips", (s, d) => mipsTopK(Tables.embeddings(s, d)),
      Some(mipsTopKSql)),
    Q("s8_sq8", (s, d) => sqTopK(Tables.embeddings(s, d)),
      Some(sqTopKSql)),
    Q("s9_recall_eval",
      (s, d) => recallEval(Tables.embeddings(s, d), dim0 = Tables.EmbeddingDim,
        nHint = Tables.embeddingsRows(s, d)),
      Some(recallEvalSql)),
    Q("s10_ivfpq", ivfPq, Some(ivfPqSql)),
    Q("s11_ann_serve", annServeLsh, Some(annServeLshSql)),
    Q("s12_filtered_search",
      (s, d) => filteredTopK(Tables.embeddings(s, d)),
      Some(filteredTopKSql)),
    Q("s13_hybrid_rrf",
      (s, d) => hybridRrf(Tables.documents(s, d), Tables.embeddings(s, d)),
      Some(hybridRrfSql)),
    Q("s14_mmr_rerank",
      (s, d) => mmrRerank(Tables.embeddings(s, d)),
      Some(mmrRerankSql)),
    Q("s15_filtered_hybrid",
      (s, d) => filteredHybridRrf(Tables.documents(s, d),
        Tables.embeddings(s, d)),
      Some(filteredHybridRrfSql)),
    Q("s16_filtered_mmr",
      (s, d) => filteredMmrRerank(Tables.embeddings(s, d)),
      Some(filteredMmrSql)),
    Q("s17_retrieval_eval",
      (s, d) => retrievalEval(Tables.embeddings(s, d)),
      Some(retrievalEvalSql)),
    Q("d14_semantic_dedup", semanticDedup, Some(semanticDedupSql)))
}
