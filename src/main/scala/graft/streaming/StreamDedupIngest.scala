package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Start the ingest sink; stop the returned query to stop ingesting. */
  def ingestSink(docs: DataFrame, indexDir: String, corpusDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          // verify runs against the artifact's own stored shingle
          // table — the published text corpus is never read here
          DedupIndex.append(batch.toDF(), indexDir, batchId)
          batch.toDF().write.mode("overwrite")
            .parquet(s"$corpusDir/batch-$batchId")
        }
      }
      .start()
}
