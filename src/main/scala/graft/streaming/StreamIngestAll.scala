package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import graft.operators.{AnnIndex, DedupIndex, TombstonedIdsException}

/** Cross-artifact INGEST orchestration (r14 verdict #1) — the write-path
  * twin of [[StreamTakedownAll]]: a real crawl batch must land in the
  * published corpus AND the dedup artifact AND the ANN index. Running
  * the pieces as independent sinks ([[StreamDedupIngest.ingestSink]]
  * covers corpus+dedup; [[StreamEmbedDedup.indexAppendSink]] is a
  * separate checkpoint) leaves a crash window between the dedup commit
  * and the index append where a document is deduplicated but
  * unsearchable (or vice versa), with nothing verifying the artifacts
  * ever converged — exactly the takedown-side argument, applied to the
  * write path. This sink is the one-queue composition:
  *
  *  - ONE crawl stream (`doc_id`, `text`, `embedding` — the document
  *    and its upstream-computed embedding share the pipeline id space)
  *    drives every artifact from a single checkpoint, so the whole
  *    ingest surface shares one batch high-water mark;
  *  - each artifact keeps its own crash-safe apply exactly as today —
  *    [[DedupIndex.append]] / [[AnnIndex.appendIvfPq]] record the
  *    shared batchId in their durable `last_batch`; the corpus publish
  *    is an idempotent `batch-<id>` dir overwrite;
  *  - a crash BETWEEN two artifacts' commits replays the micro-batch
  *    on restart: artifacts that committed no-op on their guard, the
  *    rest apply — convergence without double-application
  *    (StreamIngestAllSpec injects the crash and pins it);
  *  - [[ingestStatus]] is the convergence check: per artifact, how
  *    many of the batch's doc ids are LIVE in its view — all counts
  *    equal ⇔ every artifact ingested the same id set.
  *
  * Artifact order inside a batch is fixed (dedup, ann, corpus) so a
  * crash window is deterministic, but correctness never depends on it.
  *
  * Poison-pill unblock latency: a batch re-ingesting a taken-down id
  * is refused while the artifact's tombstone window is live; the sink
  * folds the window and retries once (the documented unblock). The
  * fold rewrites the artifact's tables — at production scale a
  * multi-minute pause inside one micro-batch. A cheaper
  * tombstone-only fold does not exist for these layouts: dropping the
  * tombstoned rows physically REQUIRES rewriting every table slab
  * they live in, which is the fold — so the cliff is inherent; size
  * the compaction policy so takedown windows fold before a re-crawl
  * arrives if the stall matters. */
object StreamIngestAll {

  /** TEST-ONLY crash seam: popped (one-shot) and thrown AFTER the next
    * artifact apply inside a batch — the between-two-commits window
    * the orchestration exists to make safe. */
  @volatile private[graft] var crashHookForTests: Option[() => Unit] = None

  private def crashPoint(): Unit = {
    val hook = crashHookForTests
    if (hook.isDefined) { crashHookForTests = None; hook.foreach(_()) }
  }

  /** The crawl-row shape: a document plus its embedding, one row. */
  val crawlSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("embedding", ArrayType(FloatType, containsNull = false))))

  /** File-source stream over a landing directory of crawl parquet. */
  def readCrawl(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(crawlSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Apply one crawl batch to every artifact — the shared batchId is
    * each artifact's replay guard. Exposed for batch callers that want
    * the same N-artifact apply without a stream. Batch rows must carry
    * [[crawlSchema]]'s columns (extra document columns ride along into
    * the corpus). */
  def applyAll(batch: DataFrame, batchId: Long, dedupDirs: Seq[String],
      annDirs: Seq[String], corpusDirs: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val docs = batch.drop("embedding")
    val emb = batch.select(col("doc_id").as("vec_id"), col("embedding"))
    dedupDirs.foreach { d =>
      // poison-pill unblock (scaladoc above): fold the live tombstone
      // window, retry ONCE; a second refusal fails the batch loudly
      try DedupIndex.append(docs, d, batchId)
      catch {
        case _: TombstonedIdsException =>
          DedupIndex.compactDeltas(spark, d)
          DedupIndex.append(docs, d, batchId)
      }
      crashPoint()
    }
    annDirs.foreach { d =>
      try AnnIndex.appendIvfPq(emb, d, batchId)
      catch {
        case _: TombstonedIdsException =>
          AnnIndex.compactIvfPqDeltas(spark, d)
          AnnIndex.appendIvfPq(emb, d, batchId)
      }
      crashPoint()
    }
    corpusDirs.foreach { d =>
      // idempotent publish: a replayed batch overwrites its own dir
      docs.write.mode("overwrite").parquet(s"$d/batch-$batchId")
      crashPoint()
    }
  }

  /** One crawl stream ([[crawlSchema]]) driving every artifact.
    * `policy`, when enabled, folds each artifact whose live window
    * trips the bound after the batch lands — dedup delta window, ann
    * code-delta window, and the corpus's published batch dirs (up to
    * the PREVIOUS batch; the current one may still replay). */
  def ingestAllSink(crawl: DataFrame, dedupDirs: Seq[String],
      annDirs: Seq[String], corpusDirs: Seq[String], checkpointDir: String,
      policy: graft.operators.CompactionPolicy =
        graft.operators.CompactionPolicy(),
      recall: graft.operators.RecallPolicy =
        graft.operators.RecallPolicy()): StreamingQuery = {
    // checked once, on the first batch this sink processes
    @volatile var checkpointChecked = false
    crawl.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          if (!checkpointChecked) {
            // fresh-checkpoint-against-compacted-corpus guard (the
            // [[StreamDedupIngest.ingestSink]] contract): batchIds
            // reset with a new checkpoint dir, and a compacted corpus
            // would silently swallow new batch-N dirs with id ≤
            // merged_upto. Fail fast, at start, with the cause named.
            corpusDirs.foreach { d =>
              StreamDedupIngest.mergedUpto(spark, d).foreach { upto =>
                require(batchId > upto,
                  s"ingestAllSink batchId $batchId is not past the " +
                    s"corpus's committed slab (merged_upto=$upto under " +
                    s"$d): this is a FRESH checkpoint directory pointed " +
                    "at an already-compacted corpus — resume with the " +
                    "original checkpoint, or ingest into a new corpusDir")
              }
            }
            checkpointChecked = true
          }
          applyAll(batch.toDF(), batchId, dedupDirs, annDirs, corpusDirs)
          if (policy.enabled) {
            var anyIndexFolded = false
            dedupDirs.foreach { d =>
              lazy val stats = DedupIndex.deltaWindowStats(spark, d)
              if (policy.triggers(batchId, stats._1, stats._2())) {
                DedupIndex.compactDeltas(spark, d)
                anyIndexFolded = true
              }
            }
            annDirs.foreach { d =>
              lazy val stats = AnnIndex.ivfPqDeltaWindowStats(spark, d)
              if (policy.triggers(batchId, stats._1, stats._2())) {
                AnnIndex.compactIvfPqDeltas(spark, d)
                anyIndexFolded = true
              }
            }
            // the corpus folds on the same decision that folded an
            // index (the [[StreamDedupIngest.ingestSink]] precedent —
            // the publish side accretes one dir per micro-batch at the
            // same rate the index accretes deltas); a corpus-only
            // configuration falls back to the cadence knob. Only up to
            // the PREVIOUS batch — the current one may still replay —
            // and a replayed trigger must not regress the slab.
            val corpusTrig = anyIndexFolded ||
              ((dedupDirs.isEmpty && annDirs.isEmpty) &&
                policy.every > 0 && batchId > 0 &&
                batchId % policy.every == 0)
            if (corpusTrig) corpusDirs.foreach { d =>
              val prev = StreamDedupIngest.mergedUpto(spark, d)
                .getOrElse(-1L)
              if (batchId - 1 > prev)
                StreamDedupIngest.compactCorpus(spark, d, batchId - 1)
            }
          }
          // in-stream auto-retune on each ANN leg (r14 verdict #5): a
          // corpus that grew past its quantizer fit re-fits + re-tunes
          // before the next batch serves
          annDirs.foreach(d => recall.applyIfDue(spark, d, batchId))
          ()
        }
      }
      .start()
  }

  /** The convergence report — [[StreamTakedownAll.takedownStatus]]'s
    * write-path mirror: one row per artifact with how many of the
    * crawl queue's doc ids are LIVE in its view. All `n_live` equal
    * (and equal to `n_queue` when nothing was since taken down) ⇔
    * every artifact ingested the same id set; a smaller count on one
    * artifact names exactly where a crash-window divergence sits.
    *
    * @param queue every doc id ever enqueued (one `id` column)
    * @return (artifact, kind, n_queue, n_live) */
  def ingestStatus(spark: SparkSession, queue: DataFrame,
      dedupDirs: Seq[String], annDirs: Seq[String],
      corpusDirs: Seq[String]): DataFrame =
    StreamTakedownAll.visibilityStatus(spark, queue, dedupDirs, annDirs,
      corpusDirs, countCol = "n_live")
}
