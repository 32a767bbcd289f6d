package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{AnnIndex, DedupIndex}

/** Cross-artifact takedown orchestration (r13 verdict #1): a real
  * GDPR/DMCA request must remove a document from the dedup artifact
  * AND the ANN index AND the published corpus dirs. Running N
  * independent [[StreamTakedown]] sinks gives N checkpoints with no
  * shared accounting — a crash between sink A's commit and sink B's
  * leaves the artifacts divergent until B's replay, and nothing ever
  * verifies they converged on the same excluded id set. This sink is
  * the one-queue, N-artifact composition:
  *
  *  - ONE removal queue (a single `id` column — the pipeline id space
  *    shared by documents and their embeddings) drives every artifact
  *    from a single checkpoint, so there is exactly one batch
  *    high-water mark for the whole takedown surface;
  *  - each artifact keeps its own CAS-committed delete exactly as
  *    today ([[DedupIndex.delete]] / [[AnnIndex.delete]] /
  *    [[StreamDedupIngest.corpusDelete]]), each recording the shared
  *    batchId in its own durable `last_delete_batch`;
  *  - a crash BETWEEN two artifacts' commits replays the micro-batch
  *    on restart: artifacts that committed no-op on their guard (or on
  *    the ids simply being gone), the rest apply — the batch converges
  *    to all-artifacts-applied without double-applying anything
  *    (StreamTakedownAllSpec injects the crash and pins it);
  *  - [[takedownStatus]] is the convergence check the N-sink layout
  *    never had: it reports, per artifact, how many queue ids are
  *    still VISIBLE in the live view — all zeros ⇔ every artifact
  *    excluded the same id set.
  *
  * Artifact order inside a batch is fixed (dedup, ann, corpus) so a
  * crash window is deterministic, but correctness never depends on it.
  */
object StreamTakedownAll {

  /** TEST-ONLY crash seam: popped (one-shot) and thrown AFTER the next
    * artifact delete inside a batch — the exact between-two-commits
    * window the orchestration exists to make safe. */
  @volatile private[graft] var crashHookForTests: Option[() => Unit] = None

  private def crashPoint(): Unit = {
    val hook = crashHookForTests
    if (hook.isDefined) { crashHookForTests = None; hook.foreach(_()) }
  }

  /** Apply one id batch to every artifact — the shared batchId is each
    * artifact's replay guard. Exposed for batch callers that want the
    * same N-artifact apply without a stream. */
  def applyAll(batch: DataFrame, batchId: Long, dedupDirs: Seq[String],
      annDirs: Seq[String], corpusDirs: Seq[String]): Unit = {
    dedupDirs.foreach { d =>
      DedupIndex.delete(batch.select(col("id").as("doc_id")), d, batchId)
      crashPoint()
    }
    annDirs.foreach { d =>
      AnnIndex.delete(batch.select(col("id").as("vec_id")), d, batchId)
      crashPoint()
    }
    corpusDirs.foreach { d =>
      StreamDedupIngest.corpusDelete(
        batch.select(col("id").as("doc_id")), d, batchId)
      crashPoint()
    }
  }

  /** One removal-request stream (single `id LONG` column) driving every
    * artifact. `policy`, when enabled, folds each INDEX artifact whose
    * live window trips the bound after the batch lands (corpus
    * tombstones fold at the next [[StreamDedupIngest.compactCorpus]] —
    * the ingest side owns that cadence). */
  def takedownAllSink(ids: DataFrame, dedupDirs: Seq[String],
      annDirs: Seq[String], corpusDirs: Seq[String], checkpointDir: String,
      policy: graft.operators.CompactionPolicy =
        graft.operators.CompactionPolicy(),
      recall: graft.operators.RecallPolicy =
        graft.operators.RecallPolicy()): StreamingQuery =
    ids.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          applyAll(batch.toDF(), batchId, dedupDirs, annDirs, corpusDirs)
          if (policy.enabled) {
            dedupDirs.foreach { d =>
              lazy val stats = DedupIndex.deltaWindowStats(spark, d)
              if (policy.triggers(batchId, stats._1, stats._2()))
                DedupIndex.compactDeltas(spark, d)
            }
            annDirs.foreach { d =>
              lazy val stats = AnnIndex.takedownWindowStats(spark, d)
              if (policy.triggers(batchId, stats._1, stats._2())) {
                AnnIndex.compactTakedown(spark, d)
                ()
              }
            }
          }
          // in-stream auto-retune on each ANN leg (r14 verdict #5): a
          // takedown that guts a tuned neighborhood re-fits + re-tunes
          // before the next batch serves — same policy as the
          // single-artifact sink, applied per index
          annDirs.foreach(d => recall.applyIfDue(spark, d, batchId))
          ()
        }
      }
      .start()

  /** The convergence report: one row per artifact with how many of the
    * queue's ids are still VISIBLE in its live view. All-zero
    * `n_visible` ⇔ the artifacts excluded the same id set — the check
    * the N-independent-sinks layout could never make. The queue side is
    * bounded by the takedown request log, so one distinct+count feeds
    * the same join ladder the deletes use.
    *
    * @param queue every id ever enqueued (one `id` column)
    * @return (artifact, kind, n_queue, n_visible) */
  def takedownStatus(spark: SparkSession, queue: DataFrame,
      dedupDirs: Seq[String], annDirs: Seq[String],
      corpusDirs: Seq[String]): DataFrame =
    visibilityStatus(spark, queue, dedupDirs, annDirs, corpusDirs,
      countCol = "n_visible")

  /** BOTH convergence reports in one frame, ONE live-view scan per
    * artifact (r15 verdict #7): operators watching an orchestrated
    * deployment ask "did every artifact ingest what was enqueued AND
    * exclude what was taken down" as one question; running
    * [[StreamIngestAll.ingestStatus]] and [[takedownStatus]] separately
    * scans every artifact's live view twice. Here each queue's ids are
    * tagged with (w_ing, w_tak) weights, the union is deduped, and one
    * inner join + sum per artifact yields both counts. Reading:
    * `n_visible` all zero ⇔ takedowns converged; `n_live` equal across
    * rows (and = n_ingest_queue when no ingested id was since taken
    * down) ⇔ ingest converged; a divergent row names the artifact a
    * crash window left behind.
    *
    * @param ingested  every doc id ever enqueued for ingest (`id` col)
    * @param takedowns every id ever enqueued for takedown (`id` col)
    * @return (artifact, kind, n_ingest_queue, n_live,
    *         n_takedown_queue, n_visible) */
  def healthStatus(spark: SparkSession, ingested: DataFrame,
      takedowns: DataFrame, dedupDirs: Seq[String], annDirs: Seq[String],
      corpusDirs: Seq[String]): DataFrame = {
    val tagged = ingested.select(col("id")).distinct()
      .withColumn("w_ing", lit(1L)).withColumn("w_tak", lit(0L))
      .unionByName(takedowns.select(col("id")).distinct()
        .withColumn("w_ing", lit(0L)).withColumn("w_tak", lit(1L)))
      .groupBy(col("id"))
      .agg(max(col("w_ing")).as("w_ing"), max(col("w_tak")).as("w_tak"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (nIng, nTak) = {
      val r = tagged.agg(sum(col("w_ing")), sum(col("w_tak"))).head()
      (if (r.isNullAt(0)) 0L else r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    def counts(live: DataFrame, idCol: String): (Long, Long) = {
      val r = live.join(
          graft.queries.DedupQueries.sizedHint(
            tagged.withColumnRenamed("id", idCol), nIng + nTak, 16L),
          Seq(idCol))
        .agg(sum(col("w_ing")), sum(col("w_tak"))).head()
      (if (r.isNullAt(0)) 0L else r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    try {
      val rows =
        dedupDirs.map { d =>
          val (l, v) = counts(
            DedupIndex.load(spark, d).signatures.select(col("doc_id")),
            "doc_id")
          Row(d, "dedup", nIng, l, nTak, v)
        } ++ annDirs.map { d =>
          val (l, v) = counts(annLiveIds(spark, d), "vec_id")
          Row(d, AnnIndex.readManifest(spark, d).family, nIng, l, nTak, v)
        } ++ corpusDirs.map { d =>
          val (l, v) = counts(
            StreamDedupIngest.readCorpus(spark, d).select(col("doc_id")),
            "doc_id")
          Row(d, "corpus", nIng, l, nTak, v)
        }
      val lt = org.apache.spark.sql.types.LongType
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("artifact",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("kind",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_ingest_queue", lt),
          org.apache.spark.sql.types.StructField("n_live", lt),
          org.apache.spark.sql.types.StructField("n_takedown_queue", lt),
          org.apache.spark.sql.types.StructField("n_visible", lt))))
    } finally tagged.unpersist()
  }

  /** The shared visibility scan both convergence reports are views of:
    * per artifact, how many of the queue's ids its LIVE view contains.
    * The takedown side reads the count as debt (all zero ⇔ excluded
    * everywhere); the ingest side ([[StreamIngestAll.ingestStatus]])
    * reads it as progress (all equal ⇔ ingested everywhere). */
  private[streaming] def visibilityStatus(spark: SparkSession,
      queue: DataFrame, dedupDirs: Seq[String], annDirs: Seq[String],
      corpusDirs: Seq[String], countCol: String): DataFrame = {
    val idSet = queue.select(col("id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nQueue = idSet.count()
    def visible(live: DataFrame, idCol: String): Long =
      live.join(
        graft.queries.DedupQueries.sizedHint(
          idSet.select(col("id").as(idCol)), nQueue, 16L),
        Seq(idCol), "left_semi").count()
    try {
      val rows =
        dedupDirs.map { d =>
          Row(d, "dedup", nQueue, visible(
            DedupIndex.load(spark, d).signatures.select(col("doc_id")),
            "doc_id"))
        } ++ annDirs.map { d =>
          Row(d, AnnIndex.readManifest(spark, d).family, nQueue,
            visible(annLiveIds(spark, d), "vec_id"))
        } ++ corpusDirs.map { d =>
          Row(d, "corpus", nQueue, visible(
            StreamDedupIngest.readCorpus(spark, d).select(col("doc_id")),
            "doc_id"))
        }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("artifact",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("kind",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_queue",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField(countCol,
            org.apache.spark.sql.types.LongType))))
    } finally idSet.unpersist()
  }

  /** The live per-vector id view of any takedown-capable ANN family —
    * what [[takedownStatus]] checks visibility against. */
  private def annLiveIds(spark: SparkSession, dir: String): DataFrame =
    AnnIndex.readManifest(spark, dir).family match {
      case "lsh" => AnnIndex.loadLsh(spark, dir).signatures
        .select(col("vec_id"))
      case "ivf" => AnnIndex.loadIvf(spark, dir).assign
        .select(col("vec_id")).distinct()
      case "pq" => AnnIndex.loadPq(spark, dir).codes
        .select(col("vec_id")).distinct()
      case "ivfpq" => AnnIndex.loadIvfPq(spark, dir).codes
        .select(col("vec_id")).distinct()
      case other => throw new IllegalArgumentException(
        s"takedownStatus cannot enumerate family '$other' " +
          "(sq8 stores no per-vector rows - its takedown authority is " +
          "the caller's embedding store)")
    }
}
