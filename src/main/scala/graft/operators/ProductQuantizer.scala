package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.XHash

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) with asymmetric distance
  * computation (ADC) — the COMPRESSED-domain similarity path next to
  * s1 (exact), s2 (LSH buckets) and s3 (IVF cells). Extension surface;
  * the reference has no vector ops (`kompactor.ts`).
  *
  * The idea: split each dim-d vector into m subvectors, k-means each
  * subspace independently, and store a vector as its m nearest-centroid
  * CODES — m small ints instead of d floats. Query time builds one
  * m×k lookup table of exact query↔centroid subdistances and scans
  * CODES, summing m table entries per candidate:
  * `adist(q, x) = Σ_sub ‖q_sub − c_{code(x,sub)}‖²`.
  *
  * Why this is the 100 TB shape: at production sizes (m=8..16, k=256)
  * a 100 TB float corpus compresses to ~1 TB of byte codes — the scan
  * side reads codes only, the float embeddings are never touched after
  * encoding. The LUT is queries × m × k int64s broadcast; the scan is
  * one broadcast join + a map-side-combined (query, vec) sum — no
  * shuffle of the corpus beyond the partial-agg combine, and the codes
  * table is a write-once artifact reusable across every future query
  * batch. The gate query uses m=4 × k=16 on the 64-d corpus so cells
  * stay populated at sf0.001.
  *
  * Everything is the same exact-int64 discipline as [[KMeans]] (which
  * this generalizes with a subspace key): quantized subvectors, integer
  * distances `nns − 2·dot + cnn`, hash-stride seeds, floor-mean
  * updates, (dist, cid) argmin tie-break — so the DuckDB oracle replays
  * fit, encode, LUT and scan bit-for-bit.
  */
object ProductQuantizer {

  /** Subvector split, no shuffle: (vec_id, sub, qs: array<long>, nns).
    * `dim` must be divisible by `m`. */
  def prepare(emb: DataFrame, dim: Int, m: Int): DataFrame =
    prepareQuantized(
      emb.select(col("vec_id"), TextOps.quantize(col("embedding")).as("q")),
      dim, m)

  /** [[prepare]] over an ALREADY-quantized (vec_id, q: array<long>)
    * frame — the residual path: IVF-PQ quantizes `q − centroid` int64
    * residuals, which never existed as float embeddings. */
  def prepareQuantized(qdf: DataFrame, dim: Int, m: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val subDim = dim / m
    qdf.select(col("vec_id"), explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"),
          slice(col("q"), s * subDim + 1, subDim).as("qs"))): _*)).as("e"))
      .select(col("vec_id"), col("e.sub").as("sub"), col("e.qs").as("qs"))
      .withColumn("nns", TextOps.qdot(col("qs"), col("qs")))
  }

  /** Per-subspace seed codebook: the SAME hash-stride vec_id sample in
    * every subspace (KMeans.init's trick, keyed by sub). */
  def init(prepared: DataFrame, k: Int, n: Long): DataFrame = {
    require(k >= 1, s"PQ needs k >= 1 centroids per subspace, got $k")
    val stride = math.max(1L, n / k)
    prepared
      .filter(XHash.hash60(col("vec_id").cast("string")) % stride === 0)
      .select(col("sub"), col("vec_id").as("cid"),
        col("qs").as("c"), col("nns").as("cnn"))
  }

  /** Nearest-centroid assignment per (vector, subspace) — the same
    * broadcast-variable + per-partition argmin loop as
    * [[KMeans.assign]], for the same reason (r15 verdict #3
    * follow-up): the old broadcast-join form blew each of the n·m
    * subvector rows into k candidates and reduced them with
    * `min(struct(dist, cid, qs, nns))`, whose variable-length array
    * fields force a SortAggregate fallback that SORTS n·m·k wide rows
    * — measured 698 s (vs 12 s at 10k) encoding a 100k-vector
    * increment at m=8×k=64, the whole superlinearity of the
    * orchestrated big-batch ingest. Now: codebook grouped by subspace
    * rides a broadcast variable, each (vec, sub) row's argmin is a
    * tight loop — one map over n·m rows, zero shuffle. Semantics
    * bit-identical: same int64 distance algebra, same (dist, cid)
    * tie-break, and a subspace absent from the codebook drops its rows
    * (the inner join's behavior). Driver collect bounded by m·k codes. */
  def assign(prepared: DataFrame, codebook: DataFrame): DataFrame = {
    val spark = prepared.sparkSession
    import spark.implicits._
    val cb: Map[Int, Array[(Long, Array[Long], Long)]] = codebook
      .select(col("sub"), col("cid"), col("c"), col("cnn"))
      .as[(Int, Long, Array[Long], Long)].collect()
      .groupBy(_._1).map { case (s, rs) =>
        s -> rs.map(r => (r._2, r._3, r._4))
      }
    val bc = spark.sparkContext.broadcast(cb)
    prepared.select(col("vec_id"), col("sub"), col("qs"), col("nns"))
      .as[(Long, Int, Array[Long], Long)]
      .mapPartitions { it =>
        val subs = bc.value
        it.flatMap { case (vid, sub, qs, nns) =>
          subs.get(sub) match {
            case None => Iterator.empty
            case Some(cs) =>
              var bd = 0L
              var bid = 0L
              var first = true
              var i = 0
              while (i < cs.length) {
                val (cid, c, cnn) = cs(i)
                var dot = 0L
                var j = 0
                while (j < qs.length) { dot += qs(j) * c(j); j += 1 }
                val d = nns - 2L * dot + cnn
                if (first || d < bd || (d == bd && cid < bid)) {
                  bd = d; bid = cid; first = false
                }
                i += 1
              }
              Iterator.single((vid, sub, bid, qs, nns))
          }
        }
      }
      .toDF("vec_id", "sub", "cell", "qs", "nns")
  }

  /** Top-`nProbe` nearest-centroid assignment by cosine — the
    * broadcast-variable + per-partition loop twin of the
    * (ccos DESC, cent_id) row_number window the IVF family used
    * (r15 verdict #3 follow-up): the window form blows n rows into
    * n×cells candidates each carrying the q array and SORTS them per
    * vector — the same cliff class as the old [[KMeans.assign]], paid
    * on every IVF/IVF-PQ build and every big append. Here centroids
    * ride a broadcast variable and each row keeps a tiny insertion
    * list of its `nProbe` best (cosine desc, cent_id asc) cells — one
    * map over n rows, zero shuffle. Ordering matches Spark's window
    * sort exactly: IEEE-double cosine compared with NaN-largest
    * semantics ([[java.lang.Double.compare]]; a -0.0 never arises —
    * integer dots cast to double), ties on the smaller cent_id.
    * Input (vec_id, q, nn); output (vec_id, q, nn, cell, arn) with
    * arn 1-based, exactly the window's surviving rows. */
  def cosineAssignTop(vecs: DataFrame, centroids: DataFrame,
      nProbe: Int): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1: $nProbe")
    val spark = vecs.sparkSession
    import spark.implicits._
    val cents: Array[(Long, Array[Long], Long)] = centroids
      .select(col("cent_id"), col("cq"), col("cnn"))
      .as[(Long, Array[Long], Long)].collect()
    val bc = spark.sparkContext.broadcast(cents)
    vecs.select(col("vec_id"), col("q"), col("nn"))
      .as[(Long, Array[Long], Long)]
      .flatMap { case (vid, q, nn) =>
        val cs = bc.value
        val keep = math.min(nProbe, cs.length)
        // insertion list of the top `keep` (ccos desc, cent_id asc)
        val bestC = new Array[Double](keep)
        val bestId = new Array[Long](keep)
        var filled = 0
        var i = 0
        while (i < cs.length) {
          val (cid, cq, cnn) = cs(i)
          var dot = 0L
          var j = 0
          while (j < q.length) { dot += q(j) * cq(j); j += 1 }
          val ccos = dot.toDouble /
            (math.sqrt(nn.toDouble) * math.sqrt(cnn.toDouble))
          // rank position: after every strictly-better entry
          var p = filled
          while (p > 0 && {
            val c = java.lang.Double.compare(ccos, bestC(p - 1))
            c > 0 || (c == 0 && cid < bestId(p - 1))
          }) p -= 1
          if (p < keep) {
            val last = math.min(filled, keep - 1)
            var s = last
            while (s > p) { bestC(s) = bestC(s - 1); bestId(s) = bestId(s - 1); s -= 1 }
            bestC(p) = ccos
            bestId(p) = cid
            if (filled < keep) filled += 1
          }
          i += 1
        }
        (0 until filled).iterator.map(r => (vid, q, nn, bestId(r), r + 1))
      }
      .toDF("vec_id", "q", "nn", "cell", "arn")
  }

  /** Lloyd update per (subspace, cell): elementwise integer floor-mean.
    * Emptied cells vanish (both engines identically). */
  def update(assigned: DataFrame): DataFrame =
    assigned.select(col("sub"), col("cell"), posexplode(col("qs")).as(Seq("i", "v")))
      .groupBy(col("sub"), col("cell"), col("i"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("m"))
      .withColumn("cent", expr("(s - pmod(s, m)) div m"))
      .groupBy(col("sub"), col("cell"))
      .agg(collect_list(struct(col("i"), col("cent"))).as("lst"))
      .select(col("sub"), col("cell").as("cid"),
        transform(array_sort(col("lst")), x => x.getField("cent")).as("c"))
      .withColumn("cnn", TextOps.qdot(col("c"), col("c")))

  /** Fit + encode: seed → assign, then `updates` Lloyd rounds. Returns
    * (codes (vec_id, sub, code), codebook (sub, cid, c, cnn)). */
  def fit(prepared: DataFrame, k: Int, updates: Int,
      n: Long): (DataFrame, DataFrame) =
    fitImpl(prepared, k, updates, n, pinFinal = false)._1

  /** [[fit]] with the FINAL codebook pinned (the KMeans.fitPinned
    * contract, r16): the assign collect evaluates it once anyway, and
    * the ADC LUT builds (s5/s10) replayed the whole update aggregate
    * through lineage on every consumer. Caller releases the pins. */
  def fitPinned(prepared: DataFrame, k: Int, updates: Int,
      n: Long): ((DataFrame, DataFrame), Seq[DataFrame]) =
    fitImpl(prepared, k, updates, n, pinFinal = true)

  private def fitImpl(prepared: DataFrame, k: Int, updates: Int,
      n: Long, pinFinal: Boolean): ((DataFrame, DataFrame), Seq[DataFrame]) = {
    require(updates >= 0, s"PQ needs updates >= 0, got $updates")
    var cb = init(prepared, k, n)
    var asg = assign(prepared, cb)
    val pins = scala.collection.mutable.ListBuffer[DataFrame]()
    var r = 0
    while (r < updates) {
      cb = update(asg)
      if (pinFinal && r == updates - 1) {
        cb = cb.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pins += cb
      }
      asg = assign(prepared, cb) // the collect fills cb's cache
      r += 1
    }
    ((asg.select(col("vec_id"), col("sub"), col("cell").as("code")), cb),
      pins.toList)
  }

  /** ADC top-k scan: exact query↔centroid LUT (broadcast), one pass
    * over codes, per-(query, vec) sum combined map-side, then the O(k)
    * [[graft.functions.TopKAgg]] per query — shuffle volume after the
    * combine is queries × candidates, and the final exchange carries
    * queries × topK rows. adist fits a double exactly (≤ ~6e13 at 64
    * dims × 1e-6 quantization, far under 2^53), so the Double-scored
    * TopKAgg loses nothing. */
  def adcTopK(codes: DataFrame, codebook: DataFrame, queries: DataFrame,
      topK: Int, excludeSelf: Boolean = true): DataFrame = {
    val lut = queries.join(codebook, "sub")
      .select(col("qid"), col("sub"), col("cid"),
        (TextOps.qdot(col("qqs"), col("qqs"))
          - lit(2L) * TextOps.qdot(col("qqs"), col("c")) + col("cnn")).as("pd"))
    // explicit aliases: codes and lut share upstream lineage (both built
    // from the prepared subvectors), so Dataset-column references here
    // trip Spark's "trivially true equals predicate" warning while being
    // resolved correctly via dataset-id disambiguation — the alias form
    // is unambiguous and silent
    val summed = codes.alias("pqc")
      .join(broadcast(lut.alias("pql")),
        col("pqc.sub") === col("pql.sub") && col("pqc.code") === col("pql.cid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("pd")).as("adist"))
    // excludeSelf = in-corpus query sets (ids shared with the codes
    // table); serving an OUT-OF-CORPUS batch keeps every candidate —
    // query ids live in their own namespace there
    val adist = if (excludeSelf) summed.filter(col("qid") =!= col("vec_id"))
                else summed
    adist.groupBy(col("qid"))
      .agg(graft.functions.TopKAgg.topK(topK)(
        -col("adist").cast("double"), col("vec_id")).as("tk"))
      .select(col("qid"), posexplode(col("tk.rows")).as(Seq("pos", "r")))
      .select(col("qid").as("query_id"), (col("pos") + 1).cast("bigint").as("rk"),
        col("r.id").as("neighbor_id"), (-col("r.score")).cast("long").as("adist"))
  }

  /** Cell-keyed ADC scan for IVF-PQ (Jégou et al. 2011 §IV: PQ over
    * RESIDUALS inside coarse cells): the LUT carries one subdistance
    * table per (query, PROBED CELL) — the query's residual differs per
    * cell — and a candidate matches only through its HOME cell, so each
    * (query, candidate) pair meets exactly once. Same scale shape as
    * [[adcTopK]]: broadcast LUT (queries × nProbe × m × k rows), one
    * pass over the codes-with-cell table, map-side-combined sum.
    *
    * @param codesWithCell (vec_id, cell, sub, code)
    * @param lut           (qid, cell, sub, cid, pd) exact int64 residual
    *                      subdistances, small — broadcast
    * @return (query_id, rk, neighbor_id, adist) top-k by (adist, id) */
  def ivfAdcTopK(codesWithCell: DataFrame, lut: DataFrame,
      topK: Int, excludeSelf: Boolean = true): DataFrame = {
    val summed = codesWithCell.alias("ipc")
      .join(broadcast(lut.alias("ipl")),
        col("ipc.cell") === col("ipl.cell") &&
          col("ipc.sub") === col("ipl.sub") &&
          col("ipc.code") === col("ipl.cid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("pd")).as("adist"))
    // excludeSelf = in-corpus query sets; out-of-corpus serving keeps
    // every candidate (see [[adcTopK]])
    val adist = if (excludeSelf) summed.filter(col("qid") =!= col("vec_id"))
                else summed
    adist.groupBy(col("qid"))
      .agg(graft.functions.TopKAgg.topK(topK)(
        -col("adist").cast("double"), col("vec_id")).as("tk"))
      .select(col("qid"), posexplode(col("tk.rows")).as(Seq("pos", "r")))
      .select(col("qid").as("query_id"), (col("pos") + 1).cast("bigint").as("rk"),
        col("r.id").as("neighbor_id"), (-col("r.score")).cast("long").as("adist"))
  }

  /** Exact rerank of the ADC candidate lists — the second half of the
    * standard PQ deployment: the compressed scan proposes R candidates
    * per query, and only those R rows ever touch the full vectors
    * (queries × R lookups into the embedding store, vs n for exact
    * search). The candidate list is broadcast onto the vector table —
    * the big side is scanned once, never shuffled — and the final exact
    * top-k comes from the same O(k) [[graft.functions.TopKAgg]].
    *
    * @param cand    ADC output (query_id, neighbor_id, …)
    * @param vecs    (vec_id, q) full quantized vectors
    * @param queries (query_id, qq) full quantized query vectors (small,
    *                broadcast)
    * @return (query_id, rk, neighbor_id, dist) — dist the exact int64
    *         squared L2 over quantized units */
  def rerank(cand: DataFrame, vecs: DataFrame, queries: DataFrame,
      topK: Int): DataFrame = {
    val scored = vecs
      .join(broadcast(cand.select(col("query_id"), col("neighbor_id"))),
        col("vec_id") === col("neighbor_id"))
      .join(broadcast(queries), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        (TextOps.qdot(col("qq"), col("qq"))
          - lit(2L) * TextOps.qdot(col("qq"), col("q"))
          + TextOps.qdot(col("q"), col("q"))).as("dist"))
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.topK(topK)(
        -col("dist").cast("double"), col("neighbor_id")).as("tk"))
      .select(col("query_id"), posexplode(col("tk.rows")).as(Seq("pos", "r")))
      .select(col("query_id"), (col("pos") + 1).cast("bigint").as("rk"),
        col("r.id").as("neighbor_id"), (-col("r.score")).cast("long").as("dist"))
  }
}
