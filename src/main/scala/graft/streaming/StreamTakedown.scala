package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{AnnIndex, DedupIndex}

/** Streaming takedown (the r11 verdict #1 lifecycle as a STREAM): a
  * real pipeline receives removal requests continuously (GDPR/DMCA
  * queues), so the takedown path gets the same streaming twin as
  * ingest. Each micro-batch of ids is one [[DedupIndex.delete]] /
  * [[AnnIndex.delete]] behind the artifact's own atomic commit —
  * consumers exclude the batch the moment its manifest lands.
  *
  * EXACTLY-ONCE under crash/restart replays comes from the artifact's
  * durable `last_delete_batch` high-water mark: when Structured
  * Streaming re-delivers the last uncommitted micro-batch, the replay
  * is a no-op (the [[StreamDedupIngest.ingestSink]] pattern, on an
  * INDEPENDENT guard so takedown batches interleave with ingest
  * batches on the same artifact without confusing either side's
  * replay accounting). A crash between the tombstone write and the
  * manifest commit leaves an orphan delta the retry overwrites.
  *
  * Single-mutator contract — ENFORCED ([[graft.operators.ArtifactIO
  * .commitManifest]]): every artifact mutation commits through an
  * epoch CAS against the manifest it read at entry, so two mutators
  * running CONCURRENTLY (this sink racing an ingest sink on one
  * artifact) no longer lose one side's read-modify-write silently —
  * the loser throws [[graft.operators.ConcurrentMutationException]],
  * fails its micro-batch, and Structured Streaming's retry replays the
  * whole read-modify-write against the fresh state (MutatorRaceSpec
  * pins the refusal; the replay guard keeps the retry exactly-once).
  * Scheduling batches to alternate (availableNow triggers, or one
  * combined sink) remains the SMOOTH path — overlap now costs a retry
  * instead of a lost takedown. StreamTakedownSpec pins streamed ≡
  * batch delete and replay no-ops.
  */
object StreamTakedown {

  /** Apply a (doc_id) takedown stream to a persisted dedup artifact.
    *
    * @param policy when enabled, each applied batch checks the live
    *   window (pending tombstones count toward it) and folds the
    *   artifact ([[DedupIndex.compactDeltas]]) when a bound trips — a
    *   long-lived takedown stream otherwise accretes tombstone deltas
    *   every reader must anti-join until someone folds by hand
    *   (StreamTakedownSpec pins the bound + unchanged results). */
  def dedupTakedownSink(ids: DataFrame, indexDir: String,
      checkpointDir: String,
      policy: graft.operators.CompactionPolicy =
        graft.operators.CompactionPolicy()): StreamingQuery =
    ids.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          DedupIndex.delete(batch.toDF(), indexDir, batchId)
          if (policy.enabled) {
            lazy val stats = DedupIndex.deltaWindowStats(spark, indexDir)
            if (policy.triggers(batchId, stats._1, stats._2()))
              DedupIndex.compactDeltas(spark, indexDir)
          }
          ()
        }
      }
      .start()

  /** Apply a (vec_id) takedown stream to a persisted ANN artifact
    * (any family except sq8 — [[AnnIndex.delete]]'s contract).
    *
    * @param policy when enabled, folds pending tombstones physically
    *   when a bound trips — family-dispatched: ivfpq through its delta
    *   fold, lsh/ivf/pq through the frozen-quantizer version swap
    *   ([[AnnIndex.compactTombstones]]); the window count comes from
    *   [[AnnIndex.takedownWindowStats]].
    * @param recall when enabled (r14 verdict #5), every N-th batch
    *   re-measures serving recall at the tuned operating point against
    *   the policy's live store; drift beyond the bound on the recorded
    *   sample triggers [[AnnIndex.rebuildAndTune]] INSIDE the stream —
    *   a takedown that guts a tuned neighborhood re-fits and re-tunes
    *   before the next batch serves, instead of waiting for a cron. */
  def annTakedownSink(ids: DataFrame, indexDir: String,
      checkpointDir: String,
      policy: graft.operators.CompactionPolicy =
        graft.operators.CompactionPolicy(),
      recall: graft.operators.RecallPolicy =
        graft.operators.RecallPolicy()): StreamingQuery =
    ids.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          AnnIndex.delete(batch.toDF(), indexDir, batchId)
          if (policy.enabled) {
            lazy val stats = AnnIndex.takedownWindowStats(spark, indexDir)
            if (policy.triggers(batchId, stats._1, stats._2())) {
              AnnIndex.compactTakedown(spark, indexDir)
              ()
            }
          }
          // in-stream auto-retune (r14 verdict #5): a takedown that
          // guts a tuned neighborhood re-fits + re-tunes before the
          // next batch serves, instead of waiting for an operator cron
          recall.applyIfDue(spark, indexDir, batchId)
          ()
        }
      }
      .start()
}
