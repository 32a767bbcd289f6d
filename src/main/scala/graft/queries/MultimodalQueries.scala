package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.XHash
import graft.operators.Multimodal

/** Multimodal plumbing as oracle-checked queries: the binary column path
  * runs through the typed-Dataset mapPartitions batch decoder using
  * FakeMediaDecoder — the corpus payloads are utf8 text, not images, and
  * the fake's byte-derived arithmetic is what DuckDB can replay exactly.
  * The REAL decoder (ImageIO decode + average-hash, same trait and same
  * Spark path) is exercised on actual PNGs in MultimodalSpec.
  */
object MultimodalQueries {

  /** Batch decode through mapPartitions → flat feature columns. */
  private def mediaMeta(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
    Multimodal.decodeFeatures(media, Multimodal.FakeMediaDecoder)
      .toDF()
      .select(col("doc_id"),
        col("meta.size_bytes").as("size_bytes"),
        col("meta.format").as("format"),
        col("meta.width").cast("bigint").as("width"),
        col("meta.height").cast("bigint").as("height"),
        col("meta.duration_ms").as("duration_ms"),
        col("phash"))
  }
  private val mediaMetaSql = {
    val h = XHash.hash60Sql("text")
    s"""SELECT doc_id,
       |  octet_length(encode(text)) AS size_bytes,
       |  source AS format,
       |  $h % 1280 AS width,
       |  ($h // 1280) % 720 AS height,
       |  octet_length(encode(text)) * 40 AS duration_ms,
       |  $h AS phash
       |FROM documents""".stripMargin
  }

  /** Frame sampling at 1 fps over the decoded durations. */
  private def frameSample(s: SparkSession, d: String): DataFrame = {
    val features = mediaMeta(s, d)
    Multimodal.frameSample(
      features.select(col("doc_id"), col("duration_ms")), fps = 1.0)
      .select(col("doc_id"), col("frame_idx"), col("frame_ts_ms"))
  }
  private val frameSampleSql =
    s"""SELECT doc_id, unnest(range(0, octet_length(encode(text)) * 40 // 1000 + 1)) AS frame_idx,
       |  unnest(range(0, octet_length(encode(text)) * 40 // 1000 + 1)) * 1000 AS frame_ts_ms
       |FROM documents""".stripMargin

  val all: Seq[Q] = Seq(
    Q("m1_media_meta", mediaMeta, Some(mediaMetaSql)),
    Q("m2_frame_sample", frameSample, Some(frameSampleSql)))
}
