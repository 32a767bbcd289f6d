package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.TextOps

/** Incremental corpus ingest: the streaming face of the training-data
  * pipeline — new document files land continuously, and each micro-batch
  * is content-fingerprint deduplicated AGAINST ALL PREVIOUSLY INGESTED
  * DATA (state-store keyed by the 60-bit fingerprint: the streaming twin
  * of d1's exact dedup), then quality-gated before it reaches downstream
  * consumers.
  *
  * State story at scale: the dedup state is the corpus's content index —
  * it legitimately grows with DISTINCT content (one 60-bit key per unique
  * document, RocksDB-backed in production), not with stream length;
  * re-ingested duplicates add nothing. This is the one streaming operator
  * family where an unbounded-by-watermark state is the correct semantics
  * (a corpus index never "expires"); bounded-lateness dedup remains
  * available via dropDuplicatesWithinWatermark (EventStreams.dedup).
  */
object CorpusIngest {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source stream over a directory of document parquet files. */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", "1") // per-file batches: state must carry
      .parquet(dir)

  /** fingerprint-dedup + token-count quality gate; append-mode per-doc
    * output (no shuffle beyond the dedup state exchange). */
  def ingest(docs: DataFrame, minTokens: Int = 5): DataFrame =
    docs
      .withColumn("text_fp", TextOps.fingerprint(col("text")))
      .dropDuplicates("text_fp")
      .withColumn("n_tok", size(TextOps.tokens(col("text"))).cast("bigint"))
      .filter(col("n_tok") >= minTokens)
      .select(col("doc_id"), col("lang"), col("text_fp"), col("n_tok"))
}
