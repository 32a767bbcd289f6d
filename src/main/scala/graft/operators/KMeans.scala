package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.XHash

/** Deterministic distributed k-means (Lloyd's algorithm) over quantized
  * embeddings — the clustering substrate for SemDeDup-style semantic
  * deduplication (extension surface; the reference engine has no
  * clustering — `kompactor.ts` delegates its one query to DuckDB).
  *
  * Everything is EXACT integer arithmetic so the DuckDB oracle can
  * replay it bit-for-bit:
  *  - vectors are int64-quantized ([[TextOps.quantize]], 1e-6 units);
  *  - distances are `nn − 2·dot + cnn` over exact int64 dots — identical
  *    to Σ(v−w)² by algebra, and every term fits int64 at 64 dims;
  *  - the seed centroids are a hash-stride sample (s3's IVF trick:
  *    vec_id is a seed iff hash60(vec_id) % (n div k) == 0 — the
  *    cross-engine md5-60, so the oracle reproduces the exact set);
  *  - updated centroids are elementwise FLOOR(sum/count) computed as
  *    `(s − pmod(s, m)) div m` — floor division written in operations
  *    both engines agree on for negative sums (plain `div`/`//`
  *    disagree: Spark truncates, DuckDB floors);
  *  - argmin ties break on centroid id via lexicographic
  *    `min(struct(dist, cid))` — partial-aggregatable, so assignment is
  *    a broadcast join + map-side-combined groupBy, never a window.
  *
  * Scale shape (100 TB): centroids are k·dim·8 bytes broadcast (k ≤
  * ~50k at 64 dims stays under the 32 MB threshold); each assignment
  * pass is one broadcast join reduced map-side to n rows; each update
  * is one shuffle of n·dim (cell, i, v) rows with map-side partial
  * sums. Iterations are a fixed small constant — total cost linear in
  * n·dim·iters. Lineage grows one join+agg per round; for many rounds
  * callers should persist between iterations (the query surface uses
  * 2 assignment rounds, where plain lineage is cheaper than a pin).
  */
object KMeans {

  /** Prepared frame: (vec_id, q: array<long>, nn: exact ∥q∥²). */
  def prepare(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), TextOps.quantize(col("embedding")).as("q"))
      .withColumn("nn", TextOps.qdot(col("q"), col("q")))

  /** Deterministic seed centroids: hash-stride sample of ~k vectors.
    * With `nHint < 0` the stride comes from a 1-row count aggregate
    * folded into the plan (no separate count job). */
  def init(prepared: DataFrame, k: Int, nHint: Long = -1L): DataFrame = {
    require(k >= 1, s"k-means needs k >= 1, got $k")
    val withStride =
      if (nHint > 0)
        prepared.withColumn("stride", lit(math.max(1L, nHint / k)))
      else
        prepared.crossJoin(broadcast(prepared.agg(count(lit(1)).as("n_rows"))))
          .withColumn("stride",
            expr(s"greatest(CAST(1 AS BIGINT), n_rows div $k)"))
          .drop("n_rows")
    withStride
      .filter(XHash.hash60(col("vec_id").cast("string")) % col("stride") === 0)
      .select(col("vec_id").as("cid"), col("q").as("c"), col("nn").as("cnn"))
  }

  /** Nearest-centroid assignment: (vec_id, cell, dist, q, nn) — the
    * MLlib shape: centroids ride a broadcast variable and each row's
    * argmin is a tight per-partition loop, so the pass is ONE map over
    * n rows with zero shuffle and zero intermediate blow-up. The
    * previous form (broadcast join to n×k candidate rows, reduced by
    * `min(struct(dist, cid, q, nn))`) was correct but its aggregate
    * carried the q array through a SortAggregate fallback (struct
    * minima over variable-length fields have no fixed-size hash-agg
    * buffer), which SORTS n×k wide rows: ~140 GB of sort input at
    * 200k×k=448 and a disk-filling multi-TB spill at 2M×k=1415 — the
    * auto-k regime (r15 verdict #4) made that latent cliff the
    * default path. Semantics are bit-identical: same int64 distance
    * algebra (including wrap behavior), same (dist, cid) lexicographic
    * tie-break, empty centroid set ⇒ empty assignment (the inner
    * join's behavior). The driver-side collect is bounded by k (≤ ~50k
    * at 64 dims per the broadcast budget above). */
  def assign(prepared: DataFrame, centroids: DataFrame): DataFrame = {
    val spark = prepared.sparkSession
    import spark.implicits._
    val cents: Array[(Long, Array[Long], Long)] = centroids
      .select(col("cid"), col("c"), col("cnn"))
      .as[(Long, Array[Long], Long)].collect()
    val bc = spark.sparkContext.broadcast(cents)
    prepared.select(col("vec_id"), col("q"), col("nn"))
      .as[(Long, Array[Long], Long)]
      .mapPartitions { it =>
        val cs = bc.value
        if (cs.isEmpty) Iterator.empty
        else it.map { case (vid, q, nn) =>
          var bd = 0L
          var bid = 0L
          var first = true
          var i = 0
          while (i < cs.length) {
            val (cid, c, cnn) = cs(i)
            var dot = 0L
            var j = 0
            while (j < q.length) { dot += q(j) * c(j); j += 1 }
            val d = nn - 2L * dot + cnn
            if (first || d < bd || (d == bd && cid < bid)) {
              bd = d; bid = cid; first = false
            }
            i += 1
          }
          (vid, bid, bd, q, nn)
        }
      }
      .toDF("vec_id", "cell", "dist", "q", "nn")
  }

  /** Lloyd update: per-cell elementwise integer mean (floor). Cells that
    * lost every member simply vanish (both engines identically). */
  def update(assigned: DataFrame): DataFrame =
    assigned.select(col("cell"), posexplode(col("q")).as(Seq("i", "v")))
      .groupBy(col("cell"), col("i"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("m"))
      .withColumn("cent", expr("(s - pmod(s, m)) div m"))
      .groupBy(col("cell"))
      .agg(collect_list(struct(col("i"), col("cent"))).as("lst"))
      .select(col("cell").as("cid"),
        transform(array_sort(col("lst")), x => x.getField("cent")).as("c"))
      .withColumn("cnn", TextOps.qdot(col("c"), col("c")))

  /** Fit: seed → assign, then `updates` Lloyd rounds (update + assign).
    * Returns the final assignment and the centroids it was scored
    * against. */
  def fit(prepared: DataFrame, k: Int, updates: Int,
      nHint: Long = -1L): (DataFrame, DataFrame) =
    fitImpl(prepared, k, updates, nHint, pinFinal = false)._1

  /** [[fit]] with the FINAL updated centroid table pinned (r16): the
    * assign step's driver collect already evaluates it once, and every
    * downstream consumer of the returned `cent` (s4's l1 leg, the PQ
    * LUT build) replayed the whole update aggregate — an n·dim shuffle
    * — through lineage. The pin is filled as a side effect of that
    * collect (no extra job) and returned for the caller to release
    * (house Pinned contract; the gate path relies on per-query
    * clearCache). `updates = 0` pins nothing — the seed table is a
    * cheap filter over `prepared`. */
  def fitPinned(prepared: DataFrame, k: Int, updates: Int,
      nHint: Long = -1L): ((DataFrame, DataFrame), Seq[DataFrame]) =
    fitImpl(prepared, k, updates, nHint, pinFinal = true)

  private def fitImpl(prepared: DataFrame, k: Int, updates: Int,
      nHint: Long, pinFinal: Boolean): ((DataFrame, DataFrame), Seq[DataFrame]) = {
    require(updates >= 0, s"k-means needs updates >= 0, got $updates")
    var cent = init(prepared, k, nHint)
    var asg = assign(prepared, cent)
    val pins = scala.collection.mutable.ListBuffer[DataFrame]()
    var r = 0
    while (r < updates) {
      cent = update(asg)
      if (pinFinal && r == updates - 1) {
        cent = cent.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pins += cent
      }
      asg = assign(prepared, cent) // the collect fills cent's cache
      r += 1
    }
    ((asg, cent), pins.toList)
  }
}
