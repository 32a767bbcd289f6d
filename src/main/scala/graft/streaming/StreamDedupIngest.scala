package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import graft.operators.DedupIndex

/** Streaming ingest into the persisted dedup artifact — the document
  * side of the ingest story next to [[StreamEmbedDedup.indexAppendSink]]
  * (ANN index) and [[StreamEmbedDedup.serveSink]] (retrieval): each
  * micro-batch of (doc_id, text) rows is APPENDED to the
  * [[graft.operators.DedupIndex]] artifact (d16's bipartite increment —
  * signatures, verified pairs vs the corpus so far, touched-component
  * re-solve) and then PUBLISHED to the corpus directory the next batch
  * verifies against.
  *
  * Exactly-once under crash/restart replays, end to end:
  *  - the index append commits through the artifact's manifest with the
  *    batchId high-water mark — a replayed batch is a durable no-op;
  *  - the corpus publish is a per-batch overwrite dir
  *    (`corpusDir/batch-<id>`), so the replay rewrites identical bytes;
  *  - ORDER matters: the index commits FIRST — a crash between the two
  *    replays the batch, which no-ops on the index and completes the
  *    missing publish, converging to the no-crash state. (Publishing
  *    first would let the next batch verify against docs the index
  *    never ingested.)
  *
  * Contract: `corpusDir` is SEEDED with the already-indexed corpus
  * (e.g. `batch-seed/`) before the sink starts — the artifact and the
  * corpus directory must describe the same document set; batch doc_ids
  * are disjoint from everything ingested before (the append contract).
  * StreamDedupIngestSpec pins streamed-in-chunks ≡ one-shot build on
  * the union corpus for signatures, pairs AND components.
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
          val spark = batch.sparkSession
          // the corpus so far = every published batch dir (incl. the
          // seed); on a replay the crashed batch was never published,
          // so the increment verifies against the same corpus as the
          // original attempt
          val corpus = spark.read.parquet(s"$corpusDir/batch-*")
            .select("doc_id", "text")
          DedupIndex.append(batch.toDF(), corpus, indexDir, batchId)
          batch.toDF().write.mode("overwrite")
            .parquet(s"$corpusDir/batch-$batchId")
        }
      }
      .start()
}
