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
  * Single-mutator contract (all artifact mutations share it): the
  * manifest commit is an atomic rename, not a compare-and-swap, so two
  * mutators running CONCURRENTLY can lose one side's read-modify-write.
  * Run the takedown sink and an ingest sink for the same artifact in
  * one driver (Structured Streaming serializes foreachBatch bodies per
  * query; across queries, schedule them so batches alternate rather
  * than overlap — e.g. availableNow triggers, or one combined sink).
  * StreamTakedownSpec pins streamed ≡ batch delete and replay no-ops.
  */
object StreamTakedown {

  /** Apply a (doc_id) takedown stream to a persisted dedup artifact. */
  def dedupTakedownSink(ids: DataFrame, indexDir: String,
      checkpointDir: String): StreamingQuery =
    ids.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          DedupIndex.delete(batch.toDF(), indexDir, batchId)
          ()
        }
      }
      .start()

  /** Apply a (vec_id) takedown stream to a persisted ANN artifact
    * (any family except sq8 — [[AnnIndex.delete]]'s contract). */
  def annTakedownSink(ids: DataFrame, indexDir: String,
      checkpointDir: String): StreamingQuery =
    ids.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          AnnIndex.delete(batch.toDF(), indexDir, batchId)
          ()
        }
      }
      .start()
}
