package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._
import graft.operators.DedupIndex

/** Streaming ingest into the persisted dedup artifact — the document
  * side of the ingest story next to [[StreamEmbedDedup.indexAppendSink]]
  * (ANN index) and [[StreamEmbedDedup.serveSink]] (retrieval): each
  * micro-batch of (doc_id, text) rows is APPENDED to the
  * [[graft.operators.DedupIndex]] artifact (d16's bipartite increment —
  * shingle sets, signatures, bands, verified pairs vs the stored
  * verify tables, touched-component re-solve) and then PUBLISHED to the
  * corpus directory. The append verifies against the artifact's OWN
  * stored shingle table (r10 verdict #1) — the published text corpus is
  * for downstream consumers (splits, canonicalization, training reads),
  * not for verification, so a batch's cost never scales with it.
  *
  * Exactly-once under crash/restart replays, end to end:
  *  - the index append commits through the artifact's manifest with the
  *    batchId high-water mark — a replayed batch is a durable no-op;
  *  - the corpus publish is a per-batch overwrite dir
  *    (`corpusDir/batch-<id>`), so the replay rewrites identical bytes;
  *  - ORDER: the index commits FIRST — a crash between the two replays
  *    the batch, which no-ops on the index and completes the missing
  *    publish, converging to the no-crash state (the corpus never
  *    describes docs the index hasn't ingested).
  *
  * Contract: `corpusDir` starts seeded with the already-indexed corpus
  * (e.g. `batch-seed/`) so artifact and corpus directory describe the
  * same document set; batch doc_ids are disjoint from everything
  * ingested before (the append contract). StreamDedupIngestSpec pins
  * streamed-in-chunks ≡ one-shot build on the union corpus for
  * signatures, pairs AND components.
  */
object StreamDedupIngest {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** File-source stream over a landing directory of (doc_id, text)
    * parquet files. */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  private def mergedPath(corpusDir: String, upTo: Long): String =
    f"$corpusDir/merged-$upTo%010d"

  /** List the corpus dir's `batch-*` children split into (numeric ids,
    * non-numeric seed dirs). */
  private def batchDirs(spark: org.apache.spark.sql.SparkSession,
      corpusDir: String): (Seq[Long], Seq[String]) = {
    val p = new org.apache.hadoop.fs.Path(corpusDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return (Nil, Nil)
    val names = fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("batch-")).toSeq
    val (num, seed) = names.partition { n =>
      val s = n.stripPrefix("batch-"); s.nonEmpty && s.forall(_.isDigit)
    }
    (num.map(_.stripPrefix("batch-").toLong).sorted, seed)
  }

  private def corpusManifest(spark: org.apache.spark.sql.SparkSession,
      corpusDir: String): Option[graft.operators.ArtifactIO.Manifest] = {
    val fs = new org.apache.hadoop.fs.Path(corpusDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val mp = new org.apache.hadoop.fs.Path(corpusDir, "manifest.json")
    val tp = new org.apache.hadoop.fs.Path(corpusDir, ".manifest.json.tmp")
    if (fs.exists(mp) || fs.exists(tp))
      Some(graft.operators.ArtifactIO.readManifest(spark, corpusDir))
    else None // never compacted: the plain batch-dir layout
  }

  /** The corpus's committed fold boundary, None when never compacted —
    * the guard input both ingest sinks check a fresh checkpoint
    * against. */
  private[streaming] def mergedUpto(spark: SparkSession,
      corpusDir: String): Option[Long] =
    corpusManifest(spark, corpusDir).flatMap(_.params.get("merged_upto"))

  private def takedownPath(corpusDir: String, i: Long): String =
    f"$corpusDir/takedown/delta-$i%05d"
  /** The corpus's live takedown-tombstone window — both 0 when absent
    * ([[corpusDelete]] has never run, or [[compactCorpus]] applied
    * every tombstone physically). */
  private def tombWindow(
      m: graft.operators.ArtifactIO.Manifest): (Long, Long) =
    (m.params.getOrElse("tomb_base", 0L),
      m.params.getOrElse("tomb_deltas", 0L))
  /** [[graft.queries.DedupQueries.idSideHint]] — the shared removal-id
    * join ladder. */
  private def idSideHint(side: DataFrame, rows: Long): DataFrame =
    graft.queries.DedupQueries.idSideHint(side, rows)

  /** The live corpus sources as (path, batch id) pairs: seed dirs get
    * −1 (they predate every takedown), the committed slab gets
    * `merged_upto` (every row in it came from a batch ≤ that), live
    * batch dirs their own id. The ids are what makes corpus tombstones
    * BATCH-SCOPED (r14 review #2): a tombstone hides a row only when
    * the row's batch ≤ the tombstone's recorded publish bound, so a
    * re-publish AFTER a takedown (the poison-pill re-crawl) stays
    * visible — the publish-side twin of the index's
    * deleted-ids-become-appendable-after-a-fold lifecycle. */
  private def liveSources(spark: SparkSession,
      corpusDir: String): Seq[(String, Long)] = {
    val (nums, seeds) = batchDirs(spark, corpusDir)
    corpusManifest(spark, corpusDir)
      .flatMap(_.params.get("merged_upto")) match {
      case None =>
        seeds.map(s => (s"$corpusDir/$s", -1L)) ++
          nums.map(i => (s"$corpusDir/batch-$i", i))
      case Some(upTo) =>
        (mergedPath(corpusDir, upTo), upTo) +:
          nums.filter(_ > upTo).map(i => (s"$corpusDir/batch-$i", i))
    }
  }

  /** Highest batch id published so far — the bound a new tombstone is
    * scoped to. −1 when nothing is published yet. */
  private def maxPublished(spark: SparkSession, corpusDir: String): Long = {
    val (nums, _) = batchDirs(spark, corpusDir)
    val merged = corpusManifest(spark, corpusDir)
      .flatMap(_.params.get("merged_upto")).getOrElse(-1L)
    (nums :+ merged :+ -1L).max
  }

  /** The live tombstone window as (doc_id, upto), with deltas written
    * before the batch-scoping change normalized to upto = Long.MaxValue
    * — the legacy unscoped semantics (hide everywhere), never a null
    * that would silently stop hiding (r14 review pass 2). */
  private def readTombs(spark: SparkSession, corpusDir: String,
      tb: Long, td: Long): DataFrame = {
    val raw = spark.read.parquet(
      (tb until tb + td).map(takedownPath(corpusDir, _)): _*)
    if (raw.columns.contains("upto"))
      raw.select(col("doc_id"),
        org.apache.spark.sql.functions.coalesce(col("upto"),
          lit(Long.MaxValue)).as("upto"))
    else raw.select(col("doc_id"), lit(Long.MaxValue).as("upto"))
  }

  /** Anti-join batch-scoped tombstones (doc_id, upto) out of a frame
    * carrying `_graft_bid`: a row is hidden iff its doc is tombstoned
    * AND its batch is within the tombstone's scope. */
  private def minusScopedTombs(withBid: DataFrame, tombs: DataFrame,
      tombRows: Long): DataFrame = {
    val t = idSideHint(tombs, tombRows)
      .select(col("doc_id").as("_t_doc"), col("upto").as("_t_upto"))
    withBid.join(t,
      withBid("doc_id") === t("_t_doc") &&
        withBid("_graft_bid") <= t("_t_upto"), "left_anti")
  }

  /** The published corpus as one DataFrame — the read seam every
    * downstream consumer should use: the plain batch dirs until the
    * first [[compactCorpus]], then the committed merged slab plus only
    * the batches published after it (folded dirs — including a replayed
    * micro-batch re-creating one — are ignored by construction). Live
    * takedown tombstones ([[corpusDelete]]) are anti-joined
    * batch-scoped, so removed docs vanish from every consumer the
    * instant the delete commits while a post-takedown re-publish stays
    * visible. An empty corpus (nothing published yet) reads as an
    * empty frame, not a path error. */
  def readCorpus(spark: org.apache.spark.sql.SparkSession,
      corpusDir: String): DataFrame = {
    val srcs = liveSources(spark, corpusDir)
    if (srcs.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], docSchema)
    val m = corpusManifest(spark, corpusDir)
    val (_, td) = m.map(tombWindow).getOrElse((0L, 0L))
    if (td == 0) spark.read.parquet(srcs.map(_._1): _*)
    else {
      val (tb, _) = tombWindow(m.get)
      val withBid = srcs.map { case (p, bid) =>
        spark.read.parquet(p).withColumn("_graft_bid", lit(bid))
      }.reduce(_.unionByName(_))
      minusScopedTombs(withBid, readTombs(spark, corpusDir, tb, td),
          m.get.params.getOrElse("tomb_rows", -1L))
        .drop("_graft_bid")
    }
  }

  /** Takedown from the PUBLISHED corpus (r13 verdict #1's third leg):
    * remove documents from what [[readCorpus]] serves without rewriting
    * the batch dirs — a `doc_id` tombstone delta behind the corpus
    * manifest's CAS commit, exactly the [[graft.operators.DedupIndex
    * .delete]] mechanics pointed at the publish side. The rows drop
    * physically at the next [[compactCorpus]] (which also resets the
    * window). Replays are durable no-ops via `last_delete_batch`;
    * deleting ids not (or no longer) in the corpus commits nothing.
    * A corpus that has never been compacted gets its manifest created
    * by the first takedown commit (readCorpus handles both layouts).
    *
    * @return documents actually removed */
  def corpusDelete(ids: DataFrame, corpusDir: String,
      batchId: Long = -1L): Long = {
    val spark = ids.sparkSession
    val base = corpusManifest(spark, corpusDir).getOrElse(
      graft.operators.ArtifactIO.Manifest("corpus", 0, 0L, Map.empty))
    require(base.family == "corpus",
      s"directory at hand holds family '${base.family}', expected 'corpus'")
    if (batchId >= 0 &&
      base.params.get("last_delete_batch").exists(_ >= batchId))
      return 0L // replayed takedown batch: already applied and committed
    val (tb, td) = tombWindow(base)
    // heal→stage→commit under the commit lease: the heal sweep and the
    // staged slot come from the manifest read above (r14 review #1 —
    // without the lease, a stale mutator could overwrite a delta a
    // concurrent takedown committed at the same slot number)
    graft.operators.ArtifactIO.withCommitLease(spark, corpusDir) {
    graft.operators.ArtifactIO.requireUnmoved(spark, corpusDir, base)
    graft.operators.ArtifactIO.healOrphans(spark, s"$corpusDir/takedown",
      "delta-", tb + td, tb)
    val idSet = ids.select(col("doc_id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nIds = idSet.count()
    // column-pruned membership scan; the batch side rides the ladder
    val removed = readCorpus(spark, corpusDir).select(col("doc_id"))
      .join(idSideHint(idSet, nIds), Seq("doc_id"), "left_semi")
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nRemoved = removed.count()
    try {
      if (nRemoved == 0) 0L
      else {
      // tombstones are BATCH-SCOPED (r14 review #2): each carries the
      // max batch id published at takedown time, and readers hide a
      // row only when its batch is ≤ that bound — a re-publish AFTER
      // the takedown (the poison-pill re-crawl) is a new decision and
      // stays visible, matching the index side's re-ingest lifecycle
      val upto = maxPublished(spark, corpusDir)
      removed.withColumn("upto", lit(upto))
        .write.mode("overwrite")
        .parquet(takedownPath(corpusDir, tb + td))
      val batchParam = if (batchId >= 0)
        Map("last_delete_batch" -> batchId) else Map.empty[String, Long]
      val prevRows = base.params.getOrElse("tomb_rows",
        if (td == 0) 0L else -1L)
      val rowsParam = if (prevRows < 0) Map.empty[String, Long]
        else Map("tomb_rows" -> (prevRows + nRemoved))
      graft.operators.ArtifactIO.commitManifest(spark, corpusDir, base,
        base.copy(params = base.params + ("tomb_base" -> tb) +
          ("tomb_deltas" -> (td + 1)) ++ rowsParam ++ batchParam))
      nRemoved
      }
    } finally { removed.unpersist(); idSet.unpersist() }
    } // withCommitLease
  }

  /** Fold the per-batch corpus dirs with id ≤ `upTo` (plus the seed
    * dirs and any previous slab) into one merged slab — the small-files
    * cure for the ingest's publish side (r10 verdict #2; one dir per
    * micro-batch otherwise). Same protocol as the index artifacts:
    * sweep dirs folded by the PREVIOUS compaction plus orphan slabs
    * from crashed ones → stage `merged-<upTo>` → atomic manifest commit
    * (`merged_upto` = upTo). The dirs THIS pass folds are NOT deleted
    * at the commit: a reader that called [[readCorpus]] just before it
    * may still be scanning them, so they survive one grace cycle and
    * the NEXT compaction's sweep removes them (storage bounded at ≤ 2
    * windows — the [[graft.operators.AnnIndex.rebuild]] in-flight-
    * reader contract). Crash anywhere converges on retry, and
    * EXACTLY-ONCE is preserved against streaming replays: a replayed
    * micro-batch that re-creates a folded `batch-<id>` dir is simply
    * ignored by [[readCorpus]] (id ≤ merged_upto) and swept by the next
    * compaction. */
  def compactCorpus(spark: org.apache.spark.sql.SparkSession,
      corpusDir: String, upTo: Long): Unit = {
    val base = corpusManifest(spark, corpusDir)
    val prev = base.flatMap(_.params.get("merged_upto")).getOrElse(-1L)
    require(upTo > prev,
      s"compactCorpus($upTo) must advance past the committed slab ($prev)")
    // pending takedown tombstones drop PHYSICALLY in this fold (the
    // corpusDelete contract); sweep staged orphans and the previous
    // fold's applied deltas first. The whole heal→stage→commit section
    // holds the commit lease (r14 review #1)
    val (tb, td) = base.map(tombWindow).getOrElse((0L, 0L))
    graft.operators.ArtifactIO.withCommitLease(spark, corpusDir) {
    // staleness check must also cover base = None (r14 review pass 2):
    // a first-ever corpusDelete may commit a manifest between our read
    // and the lease acquire, and proceeding with (tb,td)=(0,0) would
    // let the heal sweep below delete its committed tombstone delta
    val fresh = corpusManifest(spark, corpusDir)
    if (fresh.map(graft.operators.ArtifactIO.epochOf) !=
        base.map(graft.operators.ArtifactIO.epochOf))
      throw new graft.operators.ConcurrentMutationException(
        s"corpus manifest at $corpusDir moved since this compaction " +
          "read it (a concurrent mutator committed) - nothing was " +
          "staged; re-run against the fresh state")
    // live reader pins extend the corpus's grace cycle exactly as on
    // the index artifacts (r14 verdict #4): a pinned snapshot at
    // merged_upto = M reads merged-M plus batch dirs > M (a pin with
    // NO merged_upto is a pre-compaction view reading seeds + all
    // batch dirs), so the sweep keeps every pinned slab, floors the
    // batch-dir bound at the minimum pinned M, keeps seeds while any
    // pre-compaction pin is live, and honors the pinned takedown
    // window; an unreadable pin file protects everything until expiry
    val pins = graft.operators.ArtifactIO.pinnedManifests(spark, corpusDir)
    val keepAll = pins.exists(_.family == "pinned-unreadable")
    val pinnedUpto = pins.map(_.params.get("merged_upto"))
    val keepSlabs = pinnedUpto.flatten.toSet + prev
    val batchFloor = (prev +: pinnedUpto.map(_.getOrElse(-1L))).min
    graft.operators.ArtifactIO.healOrphans(spark, s"$corpusDir/takedown",
      "delta-", tb + td,
      graft.operators.ArtifactIO.pinnedFloor(pins, "tomb_base", 0L, tb))
    val fs = new org.apache.hadoop.fs.Path(corpusDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // sweep: slabs that never reached their commit (staged by a crashed
    // compaction — everything but the committed one), plus the grace
    // window the PREVIOUS compaction folded (seed dirs and batch dirs
    // ≤ prev — readers stopped seeing them at that commit; their grace
    // cycle ends here)
    if (!keepAll) {
      fs.listStatus(new org.apache.hadoop.fs.Path(corpusDir))
        .map(_.getPath).filter(_.getName.startsWith("merged-"))
        .filter(p => !keepSlabs.exists(m => m >= 0 &&
          p.getName == new org.apache.hadoop.fs.Path(
            mergedPath(corpusDir, m)).getName))
        .foreach(fs.delete(_, true))
      val (nums0, seeds0) = batchDirs(spark, corpusDir)
      if (prev >= 0 && batchFloor >= 0) {
        seeds0.foreach(s =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$corpusDir/$s"), true))
        nums0.filter(_ <= batchFloor).foreach(i =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$corpusDir/batch-$i"),
            true))
      }
    }
    val (nums, seeds) = batchDirs(spark, corpusDir)
    // fold sources with their batch ids: the previous slab stands for
    // every batch ≤ prev, seeds for −1 — the same scoping readCorpus
    // uses, so the tombstone filter applied here is exactly the view
    // readers already saw
    val foldSrcs: Seq[(String, Long)] =
      (if (prev >= 0) Seq((mergedPath(corpusDir, prev), prev))
       else seeds.map(s => (s"$corpusDir/$s", -1L))) ++
        nums.filter(i => i > prev && i <= upTo)
          .map(i => (s"$corpusDir/batch-$i", i))
    require(foldSrcs.nonEmpty, s"nothing to compact under $corpusDir")
    // count DURING the fold (one pass feeds the count and the write via
    // the cache) instead of re-scanning the freshly published slab just
    // to populate the manifest's n — on an in-stream compaction that
    // second full-corpus read lengthened the micro-batch for bookkeeping.
    // In-scope tombstones drop here: the slab is the filtered view
    val filtered =
      if (td == 0) spark.read.parquet(foldSrcs.map(_._1): _*)
      else {
        val withBid = foldSrcs.map { case (p, bid) =>
          spark.read.parquet(p).withColumn("_graft_bid", lit(bid))
        }.reduce(_.unionByName(_))
        minusScopedTombs(withBid, readTombs(spark, corpusDir, tb, td),
          base.flatMap(_.params.get("tomb_rows")).getOrElse(-1L))
          .drop("_graft_bid")
      }
    val folded = filtered.coalesce(32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = folded.count()
    try folded.write.mode("overwrite").parquet(mergedPath(corpusDir, upTo))
    finally folded.unpersist()
    // the fold made tombstones physical ONLY for rows in its scope —
    // a tombstone whose publish bound extends past upTo still hides
    // rows in live batches (ids in (upTo, bound]) and must CARRY
    // FORWARD as a fresh delta; a blanket window reset would resurface
    // them. The common case (fold covers the bound) carries nothing
    // and the window genuinely empties.
    val nCarried: Long = if (td == 0) 0L else {
      val surviving = readTombs(spark, corpusDir, tb, td)
        .filter(col("upto") > upTo)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val c = surviving.count()
      try {
        if (c > 0) surviving.write.mode("overwrite")
          .parquet(takedownPath(corpusDir, tb + td))
        c
      } finally surviving.unpersist()
    }
    val carriedDeltas = if (nCarried > 0) 1L else 0L
    // CAS against the manifest read at entry — two corpus compactions
    // racing (or one racing a takedown on this manifest) refuse instead
    // of silently overwriting each other's commit. The applied deltas
    // survive one reader-grace cycle until the next pass's heal sweep
    val base0 = base.getOrElse(
      graft.operators.ArtifactIO.Manifest("corpus", 0, 0L, Map.empty))
    graft.operators.ArtifactIO.commitManifest(spark, corpusDir, base0,
      base0.copy(n = n, params = base0.params +
        ("merged_upto" -> upTo) + ("tomb_base" -> (tb + td)) +
        ("tomb_deltas" -> carriedDeltas) + ("tomb_rows" -> nCarried)))
    } // withCommitLease
    // no GC at the commit — this pass's folded dirs keep one grace
    // cycle for in-flight readers; the next compaction's sweep ends it
  }

  /** Start the ingest sink; stop the returned query to stop ingesting.
    *
    * Poison-pill unblock latency (r14 advisor #5): a batch re-ingesting
    * a taken-down id folds the live tombstone window and retries once.
    * The fold rewrites every table slab the tombstoned rows live in —
    * at production scale a multi-minute pause inside ONE micro-batch.
    * A cheaper tombstone-only fold does not exist for this layout
    * (dropping rows physically IS the slab rewrite), so the cliff is
    * inherent; size the compaction policy so takedown windows fold
    * before a re-crawl can arrive if the stall matters.
    *
    * @param compactEvery when > 0, every `compactEvery`-th batch also
    *   folds the artifact's delta dirs ([[graft.operators.DedupIndex
    *   .compactDeltas]]) and the corpus's published batch dirs
    *   ([[compactCorpus]] up to the PREVIOUS batch — the current one
    *   may still replay) — the maintenance loop closed inside the
    *   stream, so a week-long ingest never accumulates unbounded
    *   small dirs. Both calls are replay-safe: compactDeltas is
    *   contents-idempotent and compactCorpus is skipped unless it
    *   advances the committed slab.
    * @param policy threshold-based trigger (r11 verdict #4): fold when
    *   the manifest's LIVE window crosses a bound (`maxDeltas` — delta
    *   count incl. pending tombstones; `maxBytes` — bytes above the
    *   base slabs) rather than on a batch cadence a bursty stream blows
    *   past. When set, it REPLACES `compactEvery` (pass
    *   `CompactionPolicy(every = n)` to combine). */
  def ingestSink(docs: DataFrame, indexDir: String, corpusDir: String,
      checkpointDir: String, compactEvery: Int = 0,
      policy: graft.operators.CompactionPolicy =
        graft.operators.CompactionPolicy()
      ): org.apache.spark.sql.streaming.StreamingQuery = {
    val eff = if (policy.enabled) policy
      else graft.operators.CompactionPolicy(every = compactEvery)
    // checked once, on the first batch this sink processes
    @volatile var checkpointChecked = false
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          if (!checkpointChecked) {
            // fresh-checkpoint-against-compacted-corpus guard: batchIds
            // reset with a new checkpoint dir, so a compacted corpus
            // (merged_upto ≥ the restarted id range) would silently
            // swallow new batch-N dirs (readCorpus ignores ids ≤
            // merged_upto) and a later in-stream compactCorpus would
            // throw its upTo>prev require mid-stream. Fail fast, at
            // start, with the cause named. A genuine restart on the
            // SAME checkpoint always resumes past merged_upto (the
            // in-stream trigger only folds up to batchId - 1).
            corpusManifest(spark, corpusDir)
                .flatMap(_.params.get("merged_upto")).foreach { upto =>
              require(batchId > upto,
                s"ingestSink batchId $batchId is not past the corpus's " +
                  s"committed slab (merged_upto=$upto under $corpusDir): " +
                  "this is a FRESH checkpoint directory pointed at an " +
                  "already-compacted corpus — resume with the original " +
                  "checkpoint, or ingest into a new corpusDir")
            }
            checkpointChecked = true
          }
          // verify runs against the artifact's own stored shingle
          // table — the published text corpus is never read here
          try DedupIndex.append(batch.toDF(), indexDir, batchId)
          catch {
            // poison-pill unblock (r13 ADVICE): a fresh batch carrying
            // a taken-down id is refused while the tombstone window is
            // live, and the replayed batch would wedge the stream on
            // every restart. Fold the window (the documented unblock —
            // a compacted takedown makes the id appendable again) and
            // retry ONCE; a second refusal fails loudly.
            case _: graft.operators.TombstonedIdsException =>
              DedupIndex.compactDeltas(spark, indexDir)
              DedupIndex.append(batch.toDF(), indexDir, batchId)
          }
          batch.toDF().write.mode("overwrite")
            .parquet(s"$corpusDir/batch-$batchId")
          if (eff.enabled) {
            // stats are read lazily: the manifest count only for
            // maxDeltas, one FS content summary only for maxBytes
            lazy val stats = DedupIndex.deltaWindowStats(spark, indexDir)
            if (eff.triggers(batchId, stats._1, stats._2())) {
              DedupIndex.compactDeltas(spark, indexDir)
              val prev = corpusManifest(spark, corpusDir)
                .flatMap(_.params.get("merged_upto")).getOrElse(-1L)
              if (batchId - 1 > prev) // a replayed trigger must not regress
                compactCorpus(spark, corpusDir, batchId - 1)
            }
          }
        }
      }
      .start()
  }
}
