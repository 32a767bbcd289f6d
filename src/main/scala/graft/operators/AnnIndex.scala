package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.SimilarityQueries

/** Index-as-artifact for the ANN family: build ONCE, persist as parquet
  * tables + a small JSON manifest, serve MANY query batches from the
  * loaded artifact. The inline query paths (s2/s3/s5/s8 in
  * [[SimilarityQueries]]) rebuild their signature/cell/code tables
  * inside every call — correct for a one-shot gate query, wrong for a
  * deployment: at 100 TB the index build is a large batch job (scan the
  * whole corpus once) and the query side is many small jobs that must
  * NOT pay the build again. This object is the write/load seam between
  * the two; each `*TopK` here runs the IDENTICAL query half as the
  * inline path (same private implementations), so loaded ≡ built is a
  * checkable identity (AnnIndexSpec pins it per family).
  *
  * Layout under `dir` (any Hadoop-visible filesystem — local, HDFS,
  * object store):
  *   manifest.json            family, dim, n, params
  *   lsh_signatures.parquet   (vec_id, q, nn, sig)           [family=lsh]
  *   ivf_assign.parquet       (vec_id, q, nn, cell, arn)     [family=ivf]
  *   ivf_centroids.parquet    (cent_id, cq, cnn)             [family=ivf]
  *   pq_codes.parquet         (vec_id, sub, code)            [family=pq]
  *   pq_codebook.parquet      (sub, cid, c, cnn)             [family=pq]
  *   sq_stats.parquet         (i, mn, sp)                    [family=sq8]
  *
  * Everything in the artifact is exact int64 (the cross-engine
  * quantization contract), so a parquet round-trip is bit-lossless and
  * the loaded query results hash-match the built ones.
  */
object AnnIndex {

  /** What the manifest records: enough to re-plan queries without
    * touching the corpus (bucket masks, cell strides, subspace split).
    * Commit/read/heal live in [[ArtifactIO]] — the compactor's snapshot
    * commit protocol shared with [[DedupIndex]]. */
  type Manifest = ArtifactIO.Manifest
  val Manifest: ArtifactIO.Manifest.type = ArtifactIO.Manifest

  private def writeManifest(spark: SparkSession, dir: String,
      m: Manifest): Unit = ArtifactIO.writeManifest(spark, dir, m)

  /** Read a manifest back; fails loudly on a missing/foreign directory
    * and heals any interrupted commit first ([[ArtifactIO.readManifest]]). */
  def readManifest(spark: SparkSession, dir: String): Manifest =
    ArtifactIO.readManifest(spark, dir)

  private def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Where an index's tables live: the root dir for never-rebuilt
    * artifacts (the build layout), or the committed `v-NNNNN` version
    * dir once [[rebuild]] has swapped in a re-fit ([[tableRoot]]
    * resolves the manifest's `version` pointer). */
  private def versionDir(dir: String, v: Long): String = f"$dir/v-$v%05d"
  private def tableRoot(dir: String, m: Manifest): String =
    m.params.get("version").map(v => versionDir(dir, v)).getOrElse(dir)

  private def expectFamily(m: Manifest, want: String): Unit =
    require(m.family == want,
      s"index at hand is family '${m.family}', expected '$want'")

  // ---- s2: sign-LSH signature index --------------------------------------

  /** Build + persist the LSH signature table. One corpus scan; the
    * signature projection is the same plan as the inline s2 build. */
  def buildLsh(emb: DataFrame, dir: String, dim: Int,
      nHint: Long = -1L): Manifest = {
    val spark = emb.sparkSession
    val n = if (nHint > 0) nHint else emb.count()
    SimilarityQueries.lshSignatures(emb, dim, n)
      .write.mode("overwrite").parquet(s"$dir/lsh_signatures.parquet")
    val m = Manifest("lsh", dim, n,
      Map("bucket_bits" -> SimilarityQueries.annBucketBits(n).toLong))
    writeManifest(spark, dir, m)
    m
  }

  final case class LoadedLsh(manifest: Manifest, signatures: DataFrame)

  def loadLsh(spark: SparkSession, dir: String): LoadedLsh = {
    val m = readManifest(spark, dir)
    expectFamily(m, "lsh")
    LoadedLsh(m,
      minusTombs(spark, dir, m, table(spark, tableRoot(dir, m),
        "lsh_signatures")))
  }

  /** s2's query half against the loaded artifact — the parquet scan IS
    * the index read; no rebuild, no corpus access. */
  def lshTopK(ix: LoadedLsh, topK: Int = 3, nProbe: Int = 4): DataFrame =
    SimilarityQueries.annLshFromSigs(ix.signatures, topK,
      ix.manifest.n, nProbe)

  // ---- s3: IVF inverted file ----------------------------------------------

  /** Build + persist the IVF inverted file (assignment table with the
    * nProbe probe rows per vector) and the centroid table (so FUTURE
    * query batches not in the corpus can assign against it). */
  def buildIvf(emb: DataFrame, dir: String, dim: Int, nHint: Long = -1L,
      nProbe: Int = 4): Manifest = {
    val spark = emb.sparkSession
    val n = if (nHint > 0) nHint else emb.count()
    SimilarityQueries.ivfAssignRaw(emb, n, nProbe)
      .write.mode("overwrite").parquet(s"$dir/ivf_assign.parquet")
    SimilarityQueries.ivfCentroids(emb, n)
      .write.mode("overwrite").parquet(s"$dir/ivf_centroids.parquet")
    val m = Manifest("ivf", dim, n, Map(
      "cells" -> SimilarityQueries.ivfCells(n).toLong,
      "n_probe" -> nProbe.toLong))
    writeManifest(spark, dir, m)
    m
  }

  final case class LoadedIvf(manifest: Manifest, assign: DataFrame,
      centroids: DataFrame)

  def loadIvf(spark: SparkSession, dir: String): LoadedIvf = {
    val m = readManifest(spark, dir)
    expectFamily(m, "ivf")
    LoadedIvf(m,
      minusTombs(spark, dir, m, table(spark, tableRoot(dir, m),
        "ivf_assign")),
      table(spark, tableRoot(dir, m), "ivf_centroids"))
  }

  /** s3's query half against the loaded inverted file. */
  def ivfTopK(ix: LoadedIvf, topK: Int = 3): DataFrame =
    SimilarityQueries.ivfTopKFromAssign(ix.assign, topK)

  // ---- s5: product-quantization codes + codebook ---------------------------

  /** Build + persist the PQ artifact: fit (hash-stride seeds + one Lloyd
    * round, the s5 contract), then write codes (n·m rows — at production
    * scale ~1/100 the float footprint, the table queries scan) and the
    * codebook (m·k rows — broadcast at query time). */
  def buildPq(emb: DataFrame, dir: String, dim: Int, m: Int = 8,
      k: Int = 64, nHint: Long = -1L): Manifest = {
    val spark = emb.sparkSession
    val n = if (nHint > 0) nHint else emb.count()
    val prepared = ProductQuantizer.prepare(emb, dim, m)
    val (codes, cb) = ProductQuantizer.fit(prepared, k, updates = 1, n)
    codes.write.mode("overwrite").parquet(s"$dir/pq_codes.parquet")
    cb.write.mode("overwrite").parquet(s"$dir/pq_codebook.parquet")
    val mf = Manifest("pq", dim, n, Map("m" -> m.toLong, "k" -> k.toLong))
    writeManifest(spark, dir, mf)
    mf
  }

  final case class LoadedPq(manifest: Manifest, codes: DataFrame,
      codebook: DataFrame)

  def loadPq(spark: SparkSession, dir: String): LoadedPq = {
    val m = readManifest(spark, dir)
    expectFamily(m, "pq")
    LoadedPq(m,
      minusTombs(spark, dir, m, table(spark, tableRoot(dir, m),
        "pq_codes")),
      table(spark, tableRoot(dir, m), "pq_codebook"))
  }

  /** s5's query half against the loaded codes: ADC scan + exact rerank.
    * `emb` is the embedding store — only the query rows and the R rerank
    * winners per query are ever read from it. */
  def pqTopK(ix: LoadedPq, emb: DataFrame, r: Int = 20, topK: Int = 3,
      nQueries: Int = 8): DataFrame =
    SimilarityQueries.pqQueryFromIndex(ix.codes, ix.codebook, emb,
      ix.manifest.dim, ix.manifest.params("m").toInt, r, topK, nQueries)

  // ---- s10: IVF-PQ — coarse cells + residual codes --------------------------

  /** Build + persist the IVF-PQ artifact (the FAISS `IVFx,PQy`
    * composition): home-cell table, centroid table, residual-PQ codes
    * (already joined with their home cell — the exact scan-side table)
    * and the residual codebook. One corpus scan builds all four. */
  def buildIvfPq(emb: DataFrame, dir: String, dim: Int, m: Int = 8,
      k: Int = 64, nHint: Long = -1L): Manifest = {
    val spark = emb.sparkSession
    val n = if (nHint > 0) nHint else emb.count()
    val cents = SimilarityQueries.ivfCentroids(emb, n)
    val home = SimilarityQueries.ivfAssignRaw(emb, n, nProbe = 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    home.count() // residual build + code join both read it
    try {
      val resid = home.join(broadcast(cents), col("cell") === col("cent_id"))
        .select(col("vec_id"),
          zip_with(col("q"), col("cq"), (a, b) => a - b).as("q"))
      val prepared = ProductQuantizer.prepareQuantized(resid, dim, m)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      prepared.count()
      try {
        val (codes, cb) = ProductQuantizer.fit(prepared, k, updates = 1, n)
        codes.join(home.select(col("vec_id"), col("cell")), "vec_id")
          .write.mode("overwrite").parquet(deltaPath(dir, 0L))
        cb.write.mode("overwrite").parquet(s"$dir/ivfpq_codebook.parquet")
        cents.write.mode("overwrite").parquet(s"$dir/ivfpq_centroids.parquet")
      } finally prepared.unpersist()
    } finally home.unpersist()
    val mf = Manifest("ivfpq", dim, n, Map(
      "cells" -> SimilarityQueries.ivfCells(n).toLong,
      "m" -> m.toLong, "k" -> k.toLong, "deltas" -> 1L))
    writeManifest(spark, dir, mf)
    mf
  }

  /** Codes live as numbered DELTA directories under the codes root: the
    * manifest's `deltas` count is the COMMIT POINT — readers open
    * exactly the committed delta dirs, so data written by an append that
    * never reached its manifest commit is invisible (never half-read),
    * and a retried append overwrites the orphan dir before committing.
    * (Pre-delta legacy artifacts — no `deltas` param — read the flat
    * codes dir unchanged.) */
  private def deltaPath(dir: String, i: Long): String =
    f"$dir/ivfpq_codes.parquet/delta-$i%05d"

  /** Live code-delta window: `deltas` counts live slots from
    * `deltas_base` (0 when absent). [[compactIvfPqDeltas]] folds the
    * window into one slab at the next slot and advances the base — slot
    * numbers never reset, so staged-but-uncommitted data stays
    * unambiguous. */
  private def deltaWindow(m: Manifest): (Long, Long) =
    (m.params.getOrElse("deltas_base", 0L), m.params("deltas"))

  private def tombPath(root: String, family: String, i: Long): String =
    f"$root/${family}_tombstones.parquet/delta-$i%05d"
  private def ivfTombPath(root: String, i: Long): String =
    tombPath(root, "ivfpq", i)
  /** Tombstone window (both 0 when absent — pre-takedown artifacts and
    * freshly compacted ones; [[rebuild]]'s new version starts empty
    * because its corpus comes from the caller's store). */
  private def ivfTombWindow(m: Manifest): (Long, Long) =
    (m.params.getOrElse("tomb_base", 0L), m.params.getOrElse("tomb_deltas", 0L))
  private def tombsOf(spark: SparkSession, root: String,
      m: Manifest): Option[DataFrame] = {
    val (tb, td) = ivfTombWindow(m)
    if (td == 0) None
    else Some(spark.read.parquet(
      (tb until tb + td).map(tombPath(root, m.family, _)): _*))
  }
  private def ivfTombsOf(spark: SparkSession, root: String,
      m: Manifest): Option[DataFrame] = tombsOf(spark, root, m)
  /** Exact live-tombstone row count from the manifest (`tomb_rows`,
    * accumulated per [[delete]], reset at the physical folds); −1 on
    * pre-accounting manifests with a live window. */
  private def tombRowsOf(m: Manifest): Long =
    m.params.getOrElse("tomb_rows",
      if (ivfTombWindow(m)._2 == 0) 0L else -1L)
  /** [[graft.queries.DedupQueries.idSideHint]] — the shared removal-id
    * join ladder. */
  private def idSideHint(side: DataFrame, rows: Long): DataFrame =
    graft.queries.DedupQueries.idSideHint(side, rows)
  /** Anti-join the per-vector table against the live tombstones. */
  private def minusTombs(spark: SparkSession, dir: String, m: Manifest,
      t: DataFrame): DataFrame =
    tombsOf(spark, tableRoot(dir, m), m) match {
      case None => t
      case Some(tt) => t.join(
          idSideHint(tt.select(col("vec_id")), tombRowsOf(m)),
          Seq("vec_id"), "left_anti")
        .select(t.columns.map(col).toIndexedSeq: _*)
    }

  private def codesTable(spark: SparkSession, dir: String,
      m: Manifest): DataFrame = {
    val root = tableRoot(dir, m)
    val raw = m.params.get("deltas") match {
      case Some(_) =>
        val (b, d) = deltaWindow(m)
        spark.read.parquet((b until b + d).map(deltaPath(root, _)): _*)
      case None => table(spark, root, "ivfpq_codes") // legacy flat layout
    }
    // taken-down vectors vanish from every consumer the instant the
    // delete commits — the tombstone side rides the exact-count ladder
    ivfTombsOf(spark, root, m) match {
      case None => raw
      case Some(t) => raw.join(
        idSideHint(t.select(col("vec_id")), tombRowsOf(m)),
        Seq("vec_id"), "left_anti")
    }
  }

  /** Append a NEW batch of vectors to a persisted IVF-PQ index with
    * FROZEN quantizers — the production ingest contract: centroids and
    * the residual codebook never change on append (re-training is a
    * scheduled rebuild, not an ingest step), so encoding is a pure
    * per-row function and appending in any chunking yields the same
    * codes table (AnnIndexSpec pins chunked ≡ one-shot). One scan of
    * the increment: assign each new vector its home cell against the
    * stored centroid table, encode its residual with the stored
    * codebook, append the (vec_id, cell, sub, code) rows — the
    * existing codes are never read or rewritten, which is what makes
    * nightly ingest O(increment) at any index size. Caller contract:
    * increment vec_ids are disjoint from the indexed corpus (same as
    * every id-keyed table in the library).
    *
    * CRASH-SAFE: the increment's codes go to the NEXT delta dir (an
    * uncommitted path no reader opens), and only then does the atomic
    * manifest commit publish `deltas + 1` / the new `n` — a reader
    * never sees codes the manifest doesn't describe or vice versa. A
    * crash between the two leaves an orphan delta dir that the retry
    * overwrites before committing (convergent), and stale orphans from
    * abandoned appends are healed (deleted) up front.
    *
    * @param batchId replay guard for streaming ingest: when ≥ 0, the
    *   manifest records the applied high-water mark and an append whose
    *   batchId is ≤ it is a no-op — Structured Streaming re-delivers
    *   the last uncommitted micro-batch after a restart, and without
    *   the guard the replay would double every (vec_id, sub, code,
    *   cell) row and corrupt ADC sums. Batch callers omit it.
    * @return rows appended to the codes table (nInc × m); 0 for an
    *   already-applied batchId */
  def appendIvfPq(newEmb: DataFrame, dir: String,
      batchId: Long = -1L): Long = {
    val spark = newEmb.sparkSession
    val mf = readManifest(spark, dir)
    expectFamily(mf, "ivfpq")
    require(mf.params.contains("deltas"),
      "this ivfpq artifact predates the delta layout - rebuild it " +
        "(appending to a flat codes dir cannot be made crash-safe)")
    if (batchId >= 0 && mf.params.get("last_batch").exists(_ >= batchId))
      return 0L // replayed micro-batch: already applied and committed
    // heal→stage→commit under the commit lease: the heal sweep and the
    // staged slot number come from the manifest read above, and a stale
    // mutator without the lease could delete/overwrite a slot a
    // concurrent winner committed from the same numbers (r14 review #1)
    ArtifactIO.withCommitLease(spark, dir) {
    ArtifactIO.requireUnmoved(spark, dir, mf)
    val (base, count) = deltaWindow(mf)
    val committed = base + count // next uncommitted slot
    val root = tableRoot(dir, mf)
    // heal: delete orphan delta dirs from appends/compactions that
    // never committed, and folded dirs a crashed compaction GC left;
    // live reader pins lower the GC floor so a pinned reader's window
    // survives (r14 verdict #4)
    val pins = ArtifactIO.pinnedManifests(spark, dir)
    ArtifactIO.healOrphans(spark, s"$root/ivfpq_codes.parquet", "delta-",
      committed, ArtifactIO.pinnedFloor(pins, "deltas_base", 0L, base))
    val (atb, atd) = ivfTombWindow(mf)
    ArtifactIO.healOrphans(spark, s"$root/ivfpq_tombstones.parquet",
      "delta-", atb + atd,
      ArtifactIO.pinnedFloor(pins, "tomb_base", 0L, atb))
    // re-ingesting a tombstoned id is refused, not silently lost: the
    // live tombstone anti-join would hide the re-appended codes from
    // every reader and the next compaction would drop them physically
    // (r12 ADVICE). Deleted ids become appendable again after a
    // compaction/rebuild empties the window.
    ivfTombsOf(spark, root, mf).foreach { tt =>
      if (!newEmb.select(col("vec_id"))
          .join(idSideHint(tt.select(col("vec_id")), tombRowsOf(mf)),
            Seq("vec_id"), "left_semi").isEmpty)
        throw new TombstonedIdsException(
          "increment re-ingests tombstoned vec_ids - live tombstones would " +
            "hide the codes from every reader and the next compaction would " +
            "drop them; compact or rebuild the index first")
    }
    val (dim, m) = (mf.dim, mf.params("m").toInt)
    val cents = table(spark, root, "ivfpq_centroids")
    val cb = table(spark, root, "ivfpq_codebook")
    // home cell against the FROZEN centroids — the same (cosine desc,
    // cent_id) order as the build-side assignment
    val qv = newEmb
      .select(col("vec_id"), TextOps.quantize(col("embedding")).as("q"))
      .withColumn("nn", TextOps.qdot(col("q"), col("q")))
    // broadcast-loop argmax (ProductQuantizer.cosineAssignTop) instead
    // of the old n×cells row_number window — that window SORTED every
    // increment vector's cells rows with the q array in tow, the
    // measured superlinearity of big orchestrated ingest batches (r15
    // verdict #3 follow-up); order and survivors are identical
    val home = ProductQuantizer.cosineAssignTop(qv, cents, nProbe = 1)
      .join(broadcast(cents), col("cell") === col("cent_id"))
      .select(col("vec_id"), col("q"), col("cell"), col("cq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    home.count() // residual encode + cell join both read it
    try {
      val resid = home.select(col("vec_id"),
        zip_with(col("q"), col("cq"), (a, b) => a - b).as("q"))
      val prepared = ProductQuantizer.prepareQuantized(resid, dim, m)
      val newCodes = ProductQuantizer.assign(prepared, cb)
        .select(col("vec_id"), col("sub"), col("cell").as("code"))
        .join(home.select(col("vec_id"), col("cell")), "vec_id")
        .select(col("vec_id"), col("sub"), col("code"), col("cell"))
      // stage: an uncommitted delta dir (overwrite — idempotent retry).
      // Re-verify lease ownership first: the encode jobs above can
      // outlive the TTL under a pause, and a taken-over holder must
      // refuse before overwriting a slot a takeover winner may have
      // committed (r14 advisor #1)
      ArtifactIO.requireLeaseOwned(spark, dir)
      newCodes.write.mode("overwrite").parquet(deltaPath(root, committed))
      val appended = newEmb.count()
      // commit: the atomic manifest write IS the publish point,
      // CAS-guarded against a concurrent mutator (r12 verdict #1)
      val batchParam =
        if (batchId >= 0) Map("last_batch" -> batchId) else Map.empty
      ArtifactIO.commitManifest(spark, dir, mf,
        mf.copy(n = mf.n + appended,
          params = mf.params + ("deltas" -> (count + 1)) ++ batchParam))
      appended * m
    } finally home.unpersist()
    } // withCommitLease
  }

  /** Fold the accumulated ivfpq code deltas into ONE slab — the
    * small-files cure for a long-running [[graft.streaming
    * .StreamEmbedDedup.indexAppendSink]] stream (one delta dir per
    * micro-batch otherwise; r10 verdict #2). Same protocol as
    * [[graft.operators.DedupIndex.compactDeltas]]: heal → stage the
    * merged slab at the next slot → atomic manifest commit (base jumps
    * past the folded window, count 1). The folded dirs are NOT deleted
    * at the commit: a reader that loaded just before it may still be
    * scanning them, so they get one grace cycle and the NEXT mutation's
    * heal sweeps them — the [[rebuild]] superseded-version contract
    * applied to deltas (storage bounded at ≤ 2 windows). Codes are an
    * unordered bag keyed by
    * (vec_id, sub) — the fold is a pure re-layout, every query result
    * is unchanged (DeltaCompactionSpec pins it). */
  def compactIvfPqDeltas(spark: SparkSession, dir: String): Manifest = {
    val mf = readManifest(spark, dir)
    expectFamily(mf, "ivfpq")
    require(mf.params.contains("deltas"),
      "this ivfpq artifact predates the delta layout - rebuild it")
    val (base, count) = deltaWindow(mf)
    val root = tableRoot(dir, mf)
    val (tb, td) = ivfTombWindow(mf)
    // heal→stage→commit under the commit lease (r14 review #1)
    ArtifactIO.withCommitLease(spark, dir) {
    ArtifactIO.requireUnmoved(spark, dir, mf)
    val pins = ArtifactIO.pinnedManifests(spark, dir)
    ArtifactIO.healOrphans(spark, s"$root/ivfpq_tombstones.parquet",
      "delta-", tb + td, ArtifactIO.pinnedFloor(pins, "tomb_base", 0L, tb))
    // pending tombstones force a fold even at one slab — compaction is
    // where a takedown becomes a PHYSICAL row drop ([[deleteIvfPq]])
    if (count <= 1 && td == 0) mf // already one slab
    else {
    ArtifactIO.healOrphans(spark, s"$root/ivfpq_codes.parquet", "delta-",
      base + count,
      ArtifactIO.pinnedFloor(pins, "deltas_base", 0L, base))
    // codesTable applies the live tombstones — the fold materializes
    // the filtered view as the new slab (ownership re-verified before
    // the staged overwrite, r14 advisor #1)
    ArtifactIO.requireLeaseOwned(spark, dir)
    codesTable(spark, dir, mf)
      .coalesce(32).write.mode("overwrite")
      .parquet(deltaPath(root, base + count))
    val mf2 = mf.copy(params = mf.params +
      ("deltas_base" -> (base + count)) + ("deltas" -> 1L) +
      ("tomb_base" -> (tb + td)) + ("tomb_deltas" -> 0L) +
      ("tomb_rows" -> 0L))
    val committed = ArtifactIO.commitManifest(spark, dir, mf, mf2)
    // no GC at the commit — in-flight readers get one grace cycle; the
    // next mutation's heal sweeps the folded window (scaladoc above)
    committed
    }
    } // withCommitLease
  }

  /** (live code-delta count incl. pending tombstones, lazy bytes of the
    * delta dirs above the base slab) — what a [[CompactionPolicy]]
    * triggers on for the ivfpq artifact. */
  def ivfPqDeltaWindowStats(spark: SparkSession,
      dir: String): (Long, () => Long) = {
    val mf = readManifest(spark, dir)
    expectFamily(mf, "ivfpq")
    require(mf.params.contains("deltas"),
      "this ivfpq artifact predates the delta layout - rebuild it")
    val (base, count) = deltaWindow(mf)
    val (tb, td) = ivfTombWindow(mf)
    val root = tableRoot(dir, mf)
    val live = count + td
    val bytes = () => CompactionPolicy.bytesUnder(spark,
      ((base + 1) until base + count).map(deltaPath(root, _)) ++
        (tb until tb + td).map(ivfTombPath(root, _)))
    (live, bytes)
  }

  /** (live window count a takedown/ingest stream grows, lazy bytes) for
    * ANY takedown-capable family — what a [[CompactionPolicy]] on a
    * takedown sink triggers on: ivfpq counts code deltas + pending
    * tombstones ([[ivfPqDeltaWindowStats]]); the flat families count
    * pending tombstone deltas alone (their per-vector table never
    * accumulates deltas — [[compactTombstones]] is the fold). */
  def takedownWindowStats(spark: SparkSession,
      dir: String): (Long, () => Long) = {
    val mf = readManifest(spark, dir)
    if (mf.family == "ivfpq") ivfPqDeltaWindowStats(spark, dir)
    else {
      val (tb, td) = ivfTombWindow(mf)
      val root = tableRoot(dir, mf)
      (td, () => CompactionPolicy.bytesUnder(spark,
        (tb until tb + td).map(tombPath(root, mf.family, _))))
    }
  }

  /** Takedown for a persisted ANN artifact, every family (r11 verdict
    * #1): remove vectors WITHOUT a rebuild. A `vec_id` tombstone delta
    * is staged and lands in one atomic manifest commit; the family's
    * load (and therefore every consumer — topK, serve, serveWhere, the
    * RagServe vector leg) anti-joins the taken-down ids immediately.
    * Physical removal: ivfpq's [[compactIvfPqDeltas]] drops the code
    * rows and resets the window; the flat-table families (lsh, ivf,
    * pq) fold theirs via [[compactTombstones]] (a frozen-quantizer
    * version swap — no re-fit) or at the next [[rebuild]]. The frozen
    * quantizers are untouched — the [[appendIvfPq]] contract. sq8 is REFUSED:
    * its artifact stores per-dimension stats only; the vectors live in
    * the caller's embedding store, so takedown happens there.
    * Deleting unknown or already-removed ids is a no-op that commits
    * nothing.
    *
    * @param ids one `vec_id` column (extra columns ignored)
    * @param batchId ≥ 0 = the durable streaming replay guard
    *   (`last_delete_batch` — an applied takedown batch is a no-op on
    *   re-delivery; independent of append's `last_batch`)
    * @return vectors actually removed */
  def delete(ids: DataFrame, dir: String, batchId: Long = -1L): Long = {
    val spark = ids.sparkSession
    val mf = readManifest(spark, dir)
    require(mf.family != "sq8",
      "sq8 stores only per-dimension stats - its vectors live in the " +
        "caller's embedding store; take them down there, then rebuild")
    if (batchId >= 0 &&
      mf.params.get("last_delete_batch").exists(_ >= batchId))
      return 0L // replayed takedown batch: already applied and committed
    val root = tableRoot(dir, mf)
    val (tb, td) = ivfTombWindow(mf)
    // heal→stage→commit under the commit lease (r14 review #1)
    ArtifactIO.withCommitLease(spark, dir) {
    ArtifactIO.requireUnmoved(spark, dir, mf)
    ArtifactIO.healOrphans(spark,
      s"$root/${mf.family}_tombstones.parquet", "delta-", tb + td,
      ArtifactIO.pinnedFloor(ArtifactIO.pinnedManifests(spark, dir),
        "tomb_base", 0L, tb))
    // the family's per-vector table, prior tombstones already excluded
    val stored = mf.family match {
      case "ivfpq" =>
        require(mf.params.contains("deltas"),
          "this ivfpq artifact predates the delta layout - rebuild it " +
            "(takedown needs the delta window layout)")
        codesTable(spark, dir, mf) // delta-window + tombstone aware
      case "lsh" => minusTombs(spark, dir, mf,
        table(spark, root, "lsh_signatures"))
      case "ivf" => minusTombs(spark, dir, mf,
        table(spark, root, "ivf_assign"))
      case "pq" => minusTombs(spark, dir, mf,
        table(spark, root, "pq_codes"))
      case other => throw new IllegalArgumentException(
        s"index at hand is family '$other', expected one of " +
          "lsh | ivf | pq | ivfpq (corrupted or newer-format manifest?)")
    }
    // live vectors only, one id per vector — column-pruned scan of
    // vec_id, never the payload columns. The removal batch is NOT
    // assumed queue-sized: one cheap count at entry feeds the sizedHint
    // ladder, so a bulk takedown (millions of ids) rides a shuffle join
    // instead of a driver broadcast (r13 verdict "what's wrong" #1;
    // BulkTakedownSpec pins the shape); the semi join still runs BEFORE
    // distinct so the only wide shuffle is over the surviving ids
    val idSet = ids.select(col("vec_id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nIds = idSet.count()
    val removed = stored.select(col("vec_id"))
      .join(idSideHint(idSet, nIds), Seq("vec_id"), "left_semi")
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nRemoved = removed.count()
    try {
      if (nRemoved == 0) 0L // nothing lives to remove: no commit
      else {
      // ownership re-verified before the staged overwrite: a stale
      // overwrite of a takeover winner's tombstone slot is a silently
      // lost takedown (r14 advisor #1)
      ArtifactIO.requireLeaseOwned(spark, dir)
      removed.write.mode("overwrite")
        .parquet(tombPath(root, mf.family, tb + td))
      val batchParam = if (batchId >= 0)
        Map("last_delete_batch" -> batchId) else Map.empty[String, Long]
      // exact live-tombstone accounting for the readers' join ladder. A
      // pre-accounting artifact (tomb_rows absent) is counted ONCE here
      // instead of staying unknown: unknown keeps the legacy broadcast,
      // and after a bulk delete that broadcasts a millions-of-rows
      // window into every reader (r14 advisor #2)
      val prevRows = tombRowsOf(mf)
      val priorWindow =
        if (prevRows >= 0) prevRows
        else ivfTombsOf(spark, root, mf)
          .map(_.select(col("vec_id")).count()).getOrElse(0L)
      val rowsParam = Map("tomb_rows" -> (priorWindow + nRemoved))
      // CAS-guarded: a silently lost takedown commit is a legal hazard
      ArtifactIO.commitManifest(spark, dir, mf,
        mf.copy(n = mf.n - nRemoved,
          params = mf.params + ("tomb_base" -> tb) +
            ("tomb_deltas" -> (td + 1)) ++ rowsParam ++ batchParam))
      nRemoved
      }
    } finally { removed.unpersist(); idSet.unpersist() }
    } // withCommitLease
  }

  /** [[delete]] (family-dispatched); kept as the ivfpq-named entry. */
  def deleteIvfPq(ids: DataFrame, dir: String, batchId: Long = -1L): Long = {
    expectFamily(readManifest(ids.sparkSession, dir), "ivfpq")
    delete(ids, dir, batchId)
  }

  /** Physical takedown fold for the FLAT-table families (lsh / ivf /
    * pq) — r12 verdict #6: without it, a long-lived flat index under a
    * heavy takedown stream accretes tombstones until someone pays a
    * full quantizer re-fit ([[rebuild]]). The fold drops the
    * tombstoned rows from the per-vector table PHYSICALLY and empties
    * the window, with the quantizers untouched (the [[appendIvfPq]]
    * frozen-quantizer precedent: per-vector rows are pure functions of
    * the vector under the stored masks/centroids/codebooks, so the
    * folded table is row-identical to the pre-delete table filtered —
    * the same identity TakedownSpec pins for ivfpq's delta fold).
    *
    * Protocol — the version-dir variant of the shared commit (flat
    * tables have no delta window to stage into, so the fold stages a
    * complete table set in the next `v-NNNNN` dir, the [[rebuild]]
    * layout):
    *  1. sweep version dirs that never committed (and, once a version
    *     is live, the superseded flat build-layout tables)
    *  2. stage: the per-vector table's LIVE view (tombstones applied)
    *     plus verbatim copies of the family's small quantizer tables
    *     (centroids / codebooks — the frozen fit carries over, which
    *     is exactly what makes this a fold and not a rebuild)
    *  3. commit: the root manifest adopts the version pointer with an
    *     EMPTY tombstone window, CAS-guarded like every mutation
    *  4. the superseded layout survives one grace cycle until the next
    *     fold/rebuild's sweep — in-flight readers finish intact
    * A fold with no pending tombstones is a no-op. ivfpq folds through
    * [[compactIvfPqDeltas]] (its codes already live in a delta window);
    * sq8 stores no per-vector rows, so there is nothing to fold. */
  def compactTombstones(spark: SparkSession, dir: String): Manifest = {
    val mf = readManifest(spark, dir)
    require(Set("lsh", "ivf", "pq")(mf.family),
      s"flat-table tombstone fold applies to lsh | ivf | pq; " +
        s"'${mf.family}' folds via " +
        (if (mf.family == "ivfpq") "compactIvfPqDeltas"
         else "its own lifecycle (sq8 stores no per-vector rows)"))
    val (tb, td) = ivfTombWindow(mf)
    val root = tableRoot(dir, mf)
    // heal→stage→commit under the commit lease (r14 review #1)
    ArtifactIO.withCommitLease(spark, dir) {
    ArtifactIO.requireUnmoved(spark, dir, mf)
    ArtifactIO.healOrphans(spark,
      s"$root/${mf.family}_tombstones.parquet", "delta-", tb + td,
      ArtifactIO.pinnedFloor(ArtifactIO.pinnedManifests(spark, dir),
        "tomb_base", 0L, tb))
    if (td == 0) mf // no pending tombstones: nothing to fold
    else {
    val cur = mf.params.getOrElse("version", 0L)
    val next = cur + 1
    sweepVersions(spark, dir, mf.family, cur)
    // stage: live per-vector view + verbatim quantizer copies
    // (ownership re-verified before the staged writes, r14 advisor #1)
    ArtifactIO.requireLeaseOwned(spark, dir)
    val stage = versionDir(dir, next)
    val vecTable = familyTables(mf.family).head
    val quantTables = familyTables(mf.family).tail
    minusTombs(spark, dir, mf, table(spark, root, vecTable))
      .coalesce(32).write.mode("overwrite")
      .parquet(s"$stage/$vecTable.parquet")
    quantTables.foreach(t => table(spark, root, t)
      .coalesce(1).write.mode("overwrite").parquet(s"$stage/$t.parquet"))
    // commit: version pointer + empty window, same n (already
    // decremented at each delete), CAS against the manifest at entry
    ArtifactIO.commitManifest(spark, dir, mf, mf.copy(params =
      mf.params + ("version" -> next) +
        ("tomb_base" -> (tb + td)) + ("tomb_deltas" -> 0L) +
        ("tomb_rows" -> 0L)))
    }
    } // withCommitLease
  }

  /** Family-dispatched compaction — the ONE owner of the
    * ivfpq-vs-flat routing ([[compactIvfPqDeltas]] folds code deltas +
    * tombstones; [[compactTombstones]] folds the flat families'
    * tombstones via the frozen-quantizer version swap; sq8 is refused
    * there with the store-side instruction). The policy-triggered
    * takedown sinks and the Graft facade both route here. */
  def compactTakedown(spark: SparkSession, dir: String): Manifest =
    readManifest(spark, dir).family match {
      case "ivfpq" => compactIvfPqDeltas(spark, dir)
      case _ => compactTombstones(spark, dir)
    }

  // ---- quantizer refresh: re-fit + atomic version swap -------------------

  /** Step-1 sweep shared by [[rebuild]] and [[compactTombstones]]:
    * delete version dirs that never committed AND superseded ones whose
    * reader-grace cycle ends here (everything but `cur`), plus the flat
    * build-layout tables once some version is live. One implementation
    * so the ≤2-versions storage bound cannot drift between the two
    * mutation paths. Live READER PINS extend the grace cycle (r14
    * verdict #4): a version (or the flat layout, version 0) referenced
    * by an unexpired pin survives any number of sweeps until the pin
    * is released or expires. */
  private def sweepVersions(spark: SparkSession, dir: String,
      family: String, cur: Long): Unit = {
    val pins = ArtifactIO.pinnedManifests(spark, dir)
    // an unreadable pin file protects everything until it expires
    if (pins.exists(_.family == "pinned-unreadable")) return
    val keep = pins.map(_.params.getOrElse("version", 0L)).toSet + cur
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath).filter { p =>
        val s = p.getName.stripPrefix("v-")
        p.getName.startsWith("v-") && s.nonEmpty && s.forall(_.isDigit) &&
          !keep.contains(s.toLong)
      }.foreach(fs.delete(_, true))
    if (cur > 0 && !keep.contains(0L))
      (familyTables(family) :+ s"${family}_tombstones").foreach(t =>
        fs.delete(new org.apache.hadoop.fs.Path(dir, s"$t.parquet"), true))
  }

  private def familyTables(family: String): Seq[String] = family match {
    case "lsh"   => Seq("lsh_signatures")
    case "ivf"   => Seq("ivf_assign", "ivf_centroids")
    case "pq"    => Seq("pq_codes", "pq_codebook")
    case "sq8"   => Seq("sq_stats")
    case "ivfpq" => Seq("ivfpq_codes", "ivfpq_codebook", "ivfpq_centroids")
    case other => throw new IllegalArgumentException(
      s"index at hand is family '$other', expected one of " +
        "lsh | ivf | pq | sq8 | ivfpq (corrupted or newer-format manifest?)")
  }

  /** Re-fit an index's quantizers to the CURRENT corpus and swap the
    * result in atomically (r10 verdict #5) — the maintenance call the
    * stats-derived families need as the corpus grows: append correctly
    * REFUSES lsh/ivf/sq8 (their masks/cells/stats would silently drift),
    * so a growing corpus eventually wants an explicit rebuild without
    * downtime. Works for every family (ivfpq gains a fresh single-delta
    * codes layout too).
    *
    * Protocol — the version-dir variant of the shared commit:
    *  1. sweep version dirs that never committed (and, once a version
    *     is live, the superseded flat build-layout tables)
    *  2. build a COMPLETE new index into the next `v-NNNNN` dir via the
    *     family's own build path (tables + a self-describing manifest —
    *     byte-identical to a fresh build on the same corpus,
    *     AnnRebuildSpec pins it)
    *  3. commit: the ROOT manifest adopts the new geometry with a
    *     `version` pointer — readers flip old→new in one atomic step;
    *     the streaming replay high-water mark is carried over
    *  4. the SUPERSEDED version is NOT deleted here: it survives until
    *     the next rebuild's sweep (step 1), so in-flight readers that
    *     loaded before the swap finish against intact files (storage
    *     stays bounded at ≤ 2 versions)
    */
  def rebuild(emb: DataFrame, dir: String, nHint: Long = -1L): Manifest = {
    val spark = emb.sparkSession
    val mf = readManifest(spark, dir)
    val cur = mf.params.getOrElse("version", 0L) // 0 = flat build layout
    val next = cur + 1
    // the whole sweep→build→commit runs LEASED (r14 verdict #2): the
    // heartbeat renews the lock for the re-fit's full duration — the
    // TTL bounds heartbeat staleness, not build length — closing the
    // one previously unleased mutation (the sweep could race a
    // concurrent mutation's staged dirs)
    ArtifactIO.withCommitLease(spark, dir) {
    ArtifactIO.requireUnmoved(spark, dir, mf)
    // sweep: staged versions that never committed; plus the flat layout
    // once some version is live (it was superseded by an earlier swap)
    sweepVersions(spark, dir, mf.family, cur)
    // stage: a complete self-contained index in the next version dir
    val stage = versionDir(dir, next)
    val sub = mf.family match {
      case "lsh" => buildLsh(emb, stage, mf.dim, nHint)
      case "ivf" => buildIvf(emb, stage, mf.dim, nHint,
        nProbe = mf.params.getOrElse("n_probe", 4L).toInt)
      case "pq" => buildPq(emb, stage, mf.dim,
        m = mf.params("m").toInt, k = mf.params("k").toInt, nHint = nHint)
      case "sq8" => buildSq(emb, stage, mf.dim, nHint)
      case "ivfpq" => buildIvfPq(emb, stage, mf.dim,
        m = mf.params("m").toInt, k = mf.params("k").toInt, nHint = nHint)
      case other => throw new IllegalArgumentException(
        s"index at hand is family '$other', expected one of " +
          "lsh | ivf | pq | sq8 | ivfpq (corrupted or newer-format manifest?)")
    }
    // commit: root manifest adopts the re-fit geometry + version pointer;
    // the streaming replay guards (append AND takedown) survive the
    // swap; the tombstone window does NOT (the new version was built
    // from the caller's store, the takedown authority); tuned_* knobs
    // do NOT either — they were measured against the OLD geometry
    // (cells/masks change under a re-fit), so carrying them over would
    // serve at a stale operating point; re-run [[tuneIndex]] after a
    // rebuild
    val batchParam = Seq("last_batch", "last_delete_batch")
      .flatMap(k => mf.params.get(k).map(k -> _)).toMap
    val mf2 = sub.copy(params =
      sub.params + ("version" -> next) ++ batchParam)
    // CAS against the manifest read at entry (r11 #5 / r12 verdict #1):
    // an append/delete that committed while the re-fit was building is
    // NOT in the new version's tables and its replay guard is fresher
    // than the carried-over one — refuse the swap instead of silently
    // losing that mutation; the caller re-reads and rebuilds again
    ArtifactIO.commitManifest(spark, dir, mf, mf2)
    } // withCommitLease
  }

  final case class LoadedIvfPq(manifest: Manifest, codes: DataFrame,
      codebook: DataFrame, centroids: DataFrame)

  def loadIvfPq(spark: SparkSession, dir: String): LoadedIvfPq = {
    val m = readManifest(spark, dir)
    expectFamily(m, "ivfpq")
    LoadedIvfPq(m, codesTable(spark, dir, m),
      table(spark, tableRoot(dir, m), "ivfpq_codebook"),
      table(spark, tableRoot(dir, m), "ivfpq_centroids"))
  }

  /** s10's query half against the loaded artifact: per-probed-cell
    * residual LUT (broadcast) + ADC scan over the cell-homed codes +
    * exact rerank. `emb` is the embedding store — only the query rows
    * and the R winners per query are read from it. */
  def ivfPqTopK(ix: LoadedIvfPq, emb: DataFrame, r: Int = 40,
      topK: Int = 3, nQueries: Int = 8, nProbe: Int = 32): DataFrame =
    SimilarityQueries.ivfPqQueryFromIndex(ix.codes, ix.codebook,
      ix.centroids, emb, ix.manifest.dim,
      ix.manifest.params("m").toInt, r, topK, nQueries, nProbe)

  // ---- s8: scalar-quantization stats ---------------------------------------

  /** Build + persist the SQ8 artifact: the per-dim (min, span) table —
    * dim rows; codes/reconstructions are pure functions of it. The
    * manifest records the corpus size like every other family (it is
    * the artifact's only self-description). */
  def buildSq(emb: DataFrame, dir: String, dim: Int,
      nHint: Long = -1L): Manifest = {
    val spark = emb.sparkSession
    val n = if (nHint > 0) nHint else emb.count()
    SimilarityQueries.sqStatsOf(emb)
      .write.mode("overwrite").parquet(s"$dir/sq_stats.parquet")
    val m = Manifest("sq8", dim, n, Map.empty)
    writeManifest(spark, dir, m)
    m
  }

  final case class LoadedSq(manifest: Manifest, stats: DataFrame)

  def loadSq(spark: SparkSession, dir: String): LoadedSq = {
    val m = readManifest(spark, dir)
    expectFamily(m, "sq8")
    LoadedSq(m, table(spark, tableRoot(dir, m), "sq_stats"))
  }

  /** s8's query half against the loaded stats (a dim-row collect — plan
    * literals, exactly the inline path). */
  def sqTopK(ix: LoadedSq, emb: DataFrame, nQueries: Int = 8,
      topK: Int = 3, rerankR: Int = 20): DataFrame = {
    val stats = ix.stats.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    SimilarityQueries.sqTopKWithStats(emb, stats, nQueries, topK, rerankR)
  }

  // ---- out-of-corpus query-batch serving -------------------------------
  //
  // The seam between artifact-exists and artifact-serves: each `*Serve`
  // takes a (query_id, embedding) DataFrame of NEW vectors — an id
  // namespace of its own, disjoint from the indexed corpus — derives
  // their probe keys against the STORED quantizers (signatures /
  // centroids / codebooks / stats; nothing is re-fit, exactly as
  // [[appendIvfPq]] assigns increments), and returns top-k per query.
  // Scale shape shared by all five families: the query batch broadcasts;
  // the corpus-side artifact streams through one broadcast hash join and
  // never shuffles; only rerank winners touch the embedding store.
  // AnnServeSpec pins the exhaustive-parameter identities (probe
  // everything ⇒ serve ≡ exact) and the plan gates.

  /** s2 serving: signatures for the batch under the index's FROZEN mask
    * width, multi-probe bucket join against the stored signature table,
    * exact cosine top-k. (query_id, neighbor_id, rk, cosine_r). */
  def lshServe(ix: LoadedLsh, queries: DataFrame, topK: Int = 3,
      nProbe: Int = 4): DataFrame =
    SimilarityQueries.lshServeFromSigs(ix.signatures, queries,
      ix.manifest.dim, ix.manifest.params("bucket_bits").toInt, topK, nProbe)

  /** s3 serving: assign the batch to its nProbe nearest STORED
    * centroids, probe the stored inverted file's home cells, exact
    * cosine top-k. (query_id, neighbor_id, cell, rk, cosine_r). */
  def ivfServe(ix: LoadedIvf, queries: DataFrame, topK: Int = 3,
      nProbe: Int = 4): DataFrame =
    SimilarityQueries.ivfServeFromAssign(ix.assign, ix.centroids, queries,
      topK, nProbe)

  /** s5 serving: batch subvectors against the stored codebook, ADC scan
    * over the stored codes, exact rerank of the R winners against the
    * embedding store. (query_id, rk, neighbor_id, dist). */
  def pqServe(ix: LoadedPq, emb: DataFrame, queries: DataFrame,
      r: Int = 20, topK: Int = 3): DataFrame =
    SimilarityQueries.pqServeOn(ix.codes, ix.codebook, emb, queries,
      ix.manifest.dim, ix.manifest.params("m").toInt, r, topK)

  /** s8 serving: approximate dot against the corpus reconstructed from
    * the stored per-dim stats, exact rerank of the R winners.
    * (query_id, neighbor_id, rk, dot). */
  def sqServe(ix: LoadedSq, emb: DataFrame, queries: DataFrame,
      topK: Int = 3, rerankR: Int = 20): DataFrame = {
    val stats = ix.stats.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    SimilarityQueries.sqServeWithStats(emb, queries, stats, topK, rerankR)
  }

  /** s10 serving: batch → nProbe cells against the stored centroids,
    * per-cell residual LUT against the stored codebook, ADC over probed
    * cells, exact rerank. (query_id, rk, neighbor_id, dist). */
  def ivfPqServe(ix: LoadedIvfPq, emb: DataFrame, queries: DataFrame,
      r: Int = 40, topK: Int = 3, nProbe: Int = 32): DataFrame =
    SimilarityQueries.ivfPqServeOn(ix.codes, ix.codebook, ix.centroids,
      emb, queries, ix.manifest.dim, ix.manifest.params("m").toInt,
      r, topK, nProbe)

  /** Knob resolution for the serving paths: an explicit caller value
    * wins; otherwise the manifest's [[tuneIndex]]-recorded knob;
    * otherwise the family default — so a tuned index serves at its
    * measured operating point with zero caller changes. */
  private def tunedOr(m: Manifest, key: String, explicit: Int,
      dflt: Int): Int =
    if (explicit > 0) explicit
    else m.params.get(key).map(_.toInt).getOrElse(dflt)

  /** Family-dispatched serving against a persisted index dir. `emb` is
    * the embedding store — consulted by the compressed families
    * (pq/sq8/ivfpq) for exact rerank winners only. `r` / `nProbe`
    * default to the manifest's [[tuneIndex]]-recorded knobs when
    * present, else the family defaults. */
  def serveTopK(spark: SparkSession, dir: String, queries: DataFrame,
      emb: DataFrame, topK: Int = 3, r: Int = -1,
      nProbe: Int = -1): DataFrame = {
    val m = readManifest(spark, dir)
    def np(d: Int) = tunedOr(m, "tuned_n_probe", nProbe, d)
    def rr(d: Int) = tunedOr(m, "tuned_r", r, d)
    m.family match {
      case "lsh"   => lshServe(loadLsh(spark, dir), queries, topK,
        nProbe = np(4))
      case "ivf"   => ivfServe(loadIvf(spark, dir), queries, topK,
        nProbe = np(4))
      case "pq"    => pqServe(loadPq(spark, dir), emb, queries,
        r = rr(20), topK = topK)
      case "sq8"   => sqServe(loadSq(spark, dir), emb, queries,
        topK = topK, rerankR = rr(20))
      case "ivfpq" => ivfPqServe(loadIvfPq(spark, dir), emb, queries,
        r = rr(40), topK = topK, nProbe = np(32))
      case other => throw new IllegalArgumentException(
        s"index at hand is family '$other', expected one of " +
          "lsh | ivf | pq | sq8 | ivfpq (corrupted or newer-format manifest?)")
    }
  }

  /** FILTERED serving — the metadata-predicate retrieval every vector
    * store ships ("top-k among the docs this user may see"), with
    * PRE-FILTER semantics: `keepIds` (one `vec_id` column — the
    * predicate's surviving ids, e.g. `attrs.filter(pred)
    * .select("vec_id")`) restricts the STORED scan-side table via one
    * semi join BEFORE scoring, so the result is exactly the top-k of
    * the filtered corpus (post-filtering an unfiltered top-k — the
    * classic trap — under-fills k whenever the neighborhood is
    * predicate-poor). The quantizers are untouched: signatures, cells,
    * codes and stats were built on the full corpus and still apply to
    * its filtered subset, which is what makes the filter one join
    * instead of a rebuild per predicate. AnnServeSpec pins the
    * exhaustive-parameter identity (probe everything ⇒ byte-equal to
    * the exact scan over the filtered corpus).
    *
    * `r` (rerank/candidate budget where the family has one) and
    * `nProbe` (bucket/cell probes) default to each family's serving
    * defaults when < 0; [[graft.operators.RagServe]]'s filtered legs
    * pass them explicitly for the exhaustive identities. */
  def serveTopKWhere(spark: SparkSession, dir: String, queries: DataFrame,
      keepIds: DataFrame, emb: DataFrame, topK: Int = 3, r: Int = -1,
      nProbe: Int = -1): DataFrame = {
    val keep = keepIds.select(col("vec_id"))
    def filteredEmb = emb.join(keep, Seq("vec_id"), "left_semi")
    val m0 = readManifest(spark, dir)
    // explicit > tuned > family default — the [[serveTopK]] resolution
    def orNp(dflt: Int): Int = tunedOr(m0, "tuned_n_probe", nProbe, dflt)
    def orR(dflt: Int): Int = tunedOr(m0, "tuned_r", r, dflt)
    m0.family match {
      case "lsh" =>
        val ix = loadLsh(spark, dir)
        SimilarityQueries.lshServeFromSigs(
          ix.signatures.join(keep, Seq("vec_id"), "left_semi"), queries,
          ix.manifest.dim, ix.manifest.params("bucket_bits").toInt, topK,
          nProbe = orNp(4))
      case "ivf" =>
        val ix = loadIvf(spark, dir)
        SimilarityQueries.ivfServeFromAssign(
          ix.assign.join(keep, Seq("vec_id"), "left_semi"), ix.centroids,
          queries, topK, nProbe = orNp(4))
      case "pq" =>
        val ix = loadPq(spark, dir)
        SimilarityQueries.pqServeOn(
          ix.codes.join(keep, Seq("vec_id"), "left_semi"), ix.codebook,
          filteredEmb, queries, ix.manifest.dim,
          ix.manifest.params("m").toInt, r = orR(20), topK = topK)
      case "sq8" =>
        val ix = loadSq(spark, dir)
        val stats = ix.stats.collect()
          .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        SimilarityQueries.sqServeWithStats(filteredEmb, queries, stats, topK,
          rerankR = orR(20))
      case "ivfpq" =>
        val ix = loadIvfPq(spark, dir)
        SimilarityQueries.ivfPqServeOn(
          ix.codes.join(keep, Seq("vec_id"), "left_semi"), ix.codebook,
          ix.centroids, filteredEmb, queries, ix.manifest.dim,
          ix.manifest.params("m").toInt, r = orR(40), topK = topK,
          nProbe = orNp(32))
      case other => throw new IllegalArgumentException(
        s"index at hand is family '$other', expected one of " +
          "lsh | ivf | pq | sq8 | ivfpq (corrupted or newer-format manifest?)")
    }
  }

  /** Recall@k of the SERVING path against the exact bipartite cosine
    * top-k for the same out-of-corpus query batch — the tuning loop
    * measured on the path a deployment actually runs (the in-corpus
    * [[recallVsExact]] measures the gate shape). One row:
    * (family, n_queries, k, n_truth, n_hits, recall). */
  def recallVsExactOn(spark: SparkSession, dir: String, emb: DataFrame,
      queries: DataFrame, topK: Int = 3, r: Int = -1,
      nProbe: Int = -1): DataFrame = {
    val fam = readManifest(spark, dir).family
    val got = serveTopK(spark, dir, queries, emb, topK, r, nProbe)
      .select(col("query_id"), col("neighbor_id"))
    val truth = SimilarityQueries.cosineTopKServe(emb, queries, topK)
      .select(col("query_id"), col("neighbor_id"))
    val hits = truth.join(got.distinct(),
      Seq("query_id", "neighbor_id"), "left_semi")
    truth.agg(count_distinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("n_truth"))
      .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
      .select(lit(fam).as("family"), col("n_queries"), lit(topK).as("k"),
        col("n_truth"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_truth").cast("double"))
          .as("recall"))
  }

  /** [[recallVsExactOn]] for the FILTERED serving path: recall@k of
    * [[serveTopKWhere]] vs the exact cosine top-k over the keep-set's
    * slice of the store — the tuning loop for the deployed filtered
    * query ("is nProbe still right when the predicate thins every
    * cell?"; a predicate-poor neighborhood needs more probes to fill k,
    * which only this measurement exposes). One row, same schema. */
  def recallVsExactOnWhere(spark: SparkSession, dir: String,
      emb: DataFrame, queries: DataFrame, keepIds: DataFrame,
      topK: Int = 3, r: Int = -1, nProbe: Int = -1): DataFrame = {
    val fam = readManifest(spark, dir).family
    val got = serveTopKWhere(spark, dir, queries, keepIds, emb, topK,
        r, nProbe)
      .select(col("query_id"), col("neighbor_id"))
    val truth = SimilarityQueries.cosineTopKServe(
        emb.join(keepIds.select(col("vec_id")), Seq("vec_id"), "left_semi"),
        queries, topK)
      .select(col("query_id"), col("neighbor_id"))
    val hits = truth.join(got.distinct(),
      Seq("query_id", "neighbor_id"), "left_semi")
    truth.agg(count_distinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("n_truth"))
      .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
      .select(lit(fam).as("family"), col("n_queries"), lit(topK).as("k"),
        col("n_truth"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_truth").cast("double"))
          .as("recall"))
  }

  // ---- recall-targeted auto-tuning -------------------------------------

  /** What [[tuneIndex]] chose and measured: the committed knobs (−1
    * where the family has no such knob), the recall at that operating
    * point, and whether the target was met within the ladder. When the
    * ladder TOPPED OUT below the target, `recommendation` names the
    * concrete way forward (r13 verdict #8) — a capacity miss is a real
    * signal whose right response is never "ship the best rung and hope":
    * lsh is mask-bound at 4 probes; the compressed families cap the
    * rerank budget; the cell families cap at the quantizer fit. */
  final case class TuneResult(family: String, nProbe: Int, r: Int,
      recall: Double, targetMet: Boolean, manifest: Manifest,
      recommendation: String = "")

  /** Recall-targeted auto-tuning (r12 verdict #3, carried from r11 #7):
    * close the loop from the recall MEASUREMENT
    * ([[recallVsExactOn]] / [[recallVsExactOnWhere]]) to the serving
    * KNOBS. Walks the family's knob ladder cheapest-first — nProbe for
    * the probing families (lsh capped at its 4-probe mask bound, ivf /
    * ivfpq doubling up to the cell count), rerank budget R for the
    * compressed families (doubling, capped at the corpus) — measuring
    * the SERVING path's recall@k on the supplied query sample at each
    * rung, and stops at the first rung meeting `targetRecall`. The
    * chosen operating point is recorded in the manifest
    * (`tuned_n_probe` / `tuned_r`, plus the target and the measured
    * recall ×1000) through the CAS commit, and every serve path
    * defaults to it ([[serveTopK]] / [[serveTopKWhere]] resolution:
    * explicit > tuned > family default) — so tuning once re-points the
    * whole deployment.
    *
    * `keepIds` tunes the FILTERED serving path instead: recall is
    * measured through [[serveTopKWhere]] against the keep-set's slice,
    * which is where a predicate-poor neighborhood shows up as "nProbe
    * is no longer enough to fill k". If the ladder tops out below the
    * target the BEST rung is still recorded with `targetMet` = false —
    * a REAL capacity signal, not noise: lsh is hard-capped at 4 probes
    * (still bucket-limited), and the compressed families' rerank
    * budget caps below the corpus beyond 4096 vectors, so a miss means
    * this family/geometry cannot reach the target on this sample — the
    * right response is more probes than the cap allows (a different
    * family) or a rebuild, not shipping the knob. sq8 has one knob (R)
    * like pq. TuneIndexSpec pins
    * target-met-within-budget on the gate corpus, filtered path
    * included. */
  def tuneIndex(spark: SparkSession, dir: String, emb: DataFrame,
      queries: DataFrame, targetRecall: Double = 0.9, topK: Int = 3,
      keepIds: Option[DataFrame] = None): TuneResult = {
    val mf0 = readManifest(spark, dir)
    val cells = mf0.params.getOrElse("cells", 16L).toInt
    def doubling(from: Int, cap: Int): Seq[Int] = {
      val below = Iterator.iterate(math.min(from, cap))(_ * 2)
        .takeWhile(_ < cap).toSeq
      below :+ cap
    }
    val rCap = math.min(mf0.n, 4096L).toInt // rerank budget bound
    val rungs: Seq[(Int, Int)] = mf0.family match {
      case "lsh" => (1 to 4).map((_, -1))
      case "ivf" => doubling(1, cells).map((_, -1))
      case "pq" | "sq8" => doubling(math.max(5 * topK, 10), rCap)
        .map((-1, _))
      case "ivfpq" => doubling(4, cells)
        .map(p => (p, math.min(rCap, math.max(40, p * 5))))
      case other => throw new IllegalArgumentException(
        s"index at hand is family '$other', expected one of " +
          "lsh | ivf | pq | sq8 | ivfpq (corrupted or newer-format manifest?)")
    }
    // ground truth is rung-INVARIANT: one exact bipartite top-k over
    // the (keep-filtered) store, computed once and pinned — each rung
    // then pays only its served path plus one semi-join count, instead
    // of repeating the most expensive scan ~log2(cells) times
    val truthEmb = keepIds
      .map(k => emb.join(k.select(col("vec_id")), Seq("vec_id"),
        "left_semi"))
      .getOrElse(emb)
    val truth = SimilarityQueries.cosineTopKServe(truthEmb, queries, topK)
      .select(col("query_id"), col("neighbor_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nTruth = truth.count().toDouble
      require(nTruth > 0, "tuneIndex needs a non-empty query sample")
      def recallAt(np: Int, rr: Int): Double = {
        val got = (keepIds match {
          case None => serveTopK(spark, dir, queries, emb, topK, rr, np)
          case Some(k) => serveTopKWhere(spark, dir, queries, k, emb,
            topK, rr, np)
        }).select(col("query_id"), col("neighbor_id"))
        truth.join(got.distinct(), Seq("query_id", "neighbor_id"),
          "left_semi").count().toDouble / nTruth
      }
      // walk cheapest-first; keep the best seen so a topped-out ladder
      // still records its best operating point
      var best: (Int, Int, Double) = (-1, -1, -1.0)
      val it = rungs.iterator
      var met = false
      while (!met && it.hasNext) {
        val (np, rr) = it.next()
        val rec = recallAt(np, rr)
        if (rec > best._3) best = (np, rr, rec)
        met = rec >= targetRecall
      }
      val (np, rr, rec) = best
      // the tuning sample's fingerprint + k make the recorded recall
      // re-checkable later ([[recallCheck]]): a re-measure at the same
      // operating point that has drifted past a bound is the trigger
      // for [[rebuildAndTune]]
      val tuned = Map("tuned_target_recall_m" ->
          math.round(targetRecall * 1000),
          "tuned_recall_m" -> math.round(rec * 1000),
          "tuned_k" -> topK.toLong,
          "tuned_sample_fp" -> sampleFingerprint(queries)) ++
        (if (np > 0) Map("tuned_n_probe" -> np.toLong) else Map.empty) ++
        (if (rr > 0) Map("tuned_r" -> rr.toLong) else Map.empty)
      val committed = ArtifactIO.commitManifest(spark, dir, mf0,
        mf0.copy(params = mf0.params ++ tuned))
      // a capacity miss gets a concrete way forward, not just a flag
      // (r13 verdict #8): name what bounds THIS family's ladder and
      // what would lift it
      val recommendation = if (met) "" else mf0.family match {
        case "lsh" =>
          s"lsh is hard-capped at 4 probes by its bucket mask " +
            s"(bucket_bits=${mf0.params.getOrElse("bucket_bits", 0L)}): " +
            "this geometry cannot reach the target on this sample - " +
            "rebuild with a wider mask (more vectors per bucket) or " +
            "switch to ivf/ivfpq, whose probe ladder extends to the " +
            "full cell count"
        case "pq" | "sq8" =>
          s"the rerank budget capped at $rCap (min(corpus, 4096)): the " +
            "quantizer's resolution is the limit - rebuild with more " +
            "subspaces/levels (m/k) or switch to ivfpq"
        case _ =>
          s"the probe ladder reached the full cell count ($cells): " +
            "recall is bounded by the quantizer fit itself - rebuild " +
            "(re-fit centroids on the current corpus) or raise m/k"
      }
      TuneResult(mf0.family, np, rr, rec, met, committed, recommendation)
    } finally truth.unpersist()
  }

  /** Order-insensitive fingerprint of a tuning query sample (XOR-fold
    * of per-row hashes — overflow-free under the ANSI session) —
    * recorded in the manifest so [[recallCheck]] can tell "re-measured
    * on the recorded sample" from "different sample" when interpreting
    * drift. */
  private def sampleFingerprint(queries: DataFrame): Long = {
    val r = queries.select(xxhash64(col("query_id"),
        col("embedding").cast("string")).as("h"))
      .agg(expr("bit_xor(h)")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** What [[recallCheck]] measured, in the manifest's ×1000 units:
    * the recall recorded at tuning time, the recall re-measured NOW at
    * the same operating point, their difference, whether it exceeds
    * the caller's bound (the [[rebuildAndTune]] trigger), and whether
    * the supplied sample is the recorded one (drift on a DIFFERENT
    * sample may be sample shift, not index drift). */
  final case class RecallDrift(family: String, tunedRecallM: Long,
      recallM: Long, driftM: Long, drifted: Boolean,
      sampleMatches: Boolean)

  /** Recall drift detection (r13 verdict #6): re-measure the SERVING
    * path's recall@k at the tuned operating point — appends and
    * compactions shift the corpus under frozen quantizers, and the
    * only honest answer to "is the tuned knob still right?" is the
    * same measurement [[tuneIndex]] made, re-run. Cheap by
    * construction: one exact top-k over the sample plus one served
    * batch (a single ladder rung, not the ladder). `drifted` fires
    * when recall fell more than `driftBoundM` (×1000, default 50 =
    * five points) below the recorded value — the trigger for
    * [[rebuildAndTune]]. RecallDriftSpec pins: a planted distribution
    * shift trips it; a no-op append does not. */
  def recallCheck(spark: SparkSession, dir: String, emb: DataFrame,
      queries: DataFrame, driftBoundM: Long = 50L,
      keepIds: Option[DataFrame] = None): RecallDrift = {
    val m = readManifest(spark, dir)
    require(m.params.contains("tuned_recall_m"),
      "index has no recorded tuning - run tuneIndex first " +
        "(recallCheck re-measures the TUNED operating point)")
    val topK = m.params.getOrElse("tuned_k", 3L).toInt
    // serve resolves the tuned knobs itself (explicit > tuned > default)
    val cur = (keepIds match {
      case None => recallVsExactOn(spark, dir, emb, queries, topK)
      case Some(k) => recallVsExactOnWhere(spark, dir, emb, queries, k,
        topK)
    }).head().getAs[Double]("recall")
    val curM = math.round(cur * 1000)
    val tunedM = m.params("tuned_recall_m")
    val driftM = tunedM - curM
    RecallDrift(m.family, tunedM, curM, driftM, driftM > driftBoundM,
      // exists, not forall: an index tuned before fingerprints were
      // recorded must report NOT-matching (unknown) rather than claim
      // the supplied sample is the recorded one (r14 review #8)
      m.params.get("tuned_sample_fp").exists(_ == sampleFingerprint(queries)))
  }

  /** [[rebuild]] composed with [[tuneIndex]] (r13 verdict #5): rebuild
    * correctly DROPS tuned knobs (they were measured against the old
    * geometry), but a scheduled re-fit that stops there silently serves
    * at family defaults until an operator remembers to re-tune. This is
    * the maintenance call a cron should run — and what a tripped
    * [[recallCheck]] asks for: re-fit the quantizers to the current
    * corpus, swap atomically, then re-measure the knob ladder against
    * the NEW geometry and record it, so serving lands on a measured
    * operating point with zero caller changes. */
  def rebuildAndTune(spark: SparkSession, dir: String, emb: DataFrame,
      queries: DataFrame, targetRecall: Double = 0.9, topK: Int = 3,
      keepIds: Option[DataFrame] = None, nHint: Long = -1L): TuneResult = {
    rebuild(emb, dir, nHint)
    tuneIndex(spark, dir, emb, queries, targetRecall, topK, keepIds)
  }

  // ---- recall@k against a LOADED index ---------------------------------

  /** The s9 tuning loop pointed at a persisted artifact: recall@k of the
    * loaded index's top-k vs the exact cosine top-k over the same query
    * sample — one row (family, n_queries, k, n_truth, n_hits, recall).
    * This is the measurement an operator runs after every build or
    * parameter change (is nProbe/R/bits right for THIS corpus?) without
    * ever rebuilding the index it evaluates; the exact leg is bounded by
    * the sampled query set (s1's broadcast-queries scan). Family output
    * shapes are normalized here: lsh emits undirected pairs (counted in
    * either orientation, the SimilarityRecallSpec convention); the
    * ranked families emit (query_id, neighbor_id) directly. */
  def recallVsExact(spark: SparkSession, dir: String, emb: DataFrame,
      topK: Int = 3, nQueries: Int = 8): DataFrame = {
    val fam = readManifest(spark, dir).family
    val got: DataFrame = fam match {
      case "lsh" =>
        val out = lshTopK(loadLsh(spark, dir), topK)
        out.select(col("vec_a").as("query_id"), col("vec_b").as("neighbor_id"))
          .unionAll(out.select(col("vec_b").as("query_id"),
            col("vec_a").as("neighbor_id")))
      case "ivf" =>
        ivfTopK(loadIvf(spark, dir), topK)
          .select(col("query_id"), col("neighbor_id"))
      case "pq" =>
        pqTopK(loadPq(spark, dir), emb, topK = topK, nQueries = nQueries)
          .select(col("query_id"), col("neighbor_id"))
      case "sq8" =>
        sqTopK(loadSq(spark, dir), emb, nQueries = nQueries, topK = topK)
          .select(col("query_id"), col("neighbor_id"))
      case "ivfpq" =>
        ivfPqTopK(loadIvfPq(spark, dir), emb, topK = topK,
          nQueries = nQueries)
          .select(col("query_id"), col("neighbor_id"))
      case other => throw new IllegalArgumentException(
        s"index at hand is family '$other', expected one of " +
          "lsh | ivf | pq | sq8 | ivfpq (corrupted or newer-format manifest?)")
    }
    val truth = SimilarityQueries.cosineTopK(emb, nQueries, topK)
      .select(col("query_id"), col("neighbor_id"))
    val hits = truth.join(got.distinct(),
      Seq("query_id", "neighbor_id"), "left_semi")
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
      .select(lit(fam).as("family"), lit(nQueries).as("n_queries"),
        lit(topK).as("k"), col("n_truth"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_truth").cast("double"))
          .as("recall"))
  }
}
