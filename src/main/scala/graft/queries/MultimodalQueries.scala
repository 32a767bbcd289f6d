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

  /** Audio analysis frames (m3): the typed-Dataset mapPartitions batch
    * decode again, over the 1-D signal case — fixed 32-sample windows,
    * exact int64 RMS/peak per frame. FakeAudioDecoder treats each payload
    * byte as a centered int8 sample (the corpus is ASCII text, which the
    * oracle replays via ascii()); the REAL RIFF/PCM16 WAV parser runs the
    * same trait + frame rollup on actual waveforms in MultimodalSpec. */
  private val M3Frame = 32
  private def audioFrames(s: SparkSession, d: String): DataFrame =
    Multimodal.audioFrames(
      Multimodal.audioFromDocuments(Tables.documents(s, d)),
      Multimodal.FakeAudioDecoder, M3Frame)
      .toDF()
  private val audioFramesSql =
    s"""WITH smp AS (
       |  SELECT doc_id,
       |    list_transform(range(1, length(text) + 1),
       |      i -> ascii(substr(text, i, 1)) - 64) AS s
       |  FROM documents),
       |fr AS (
       |  SELECT doc_id,
       |    unnest(range(0, (len(s) + ${M3Frame - 1}) // $M3Frame)) AS frame_idx,
       |    s
       |  FROM smp),
       |w AS (
       |  SELECT doc_id, frame_idx,
       |    s[frame_idx * $M3Frame + 1 :
       |      least((frame_idx + 1) * $M3Frame, len(s))] AS f
       |  FROM fr)
       |SELECT doc_id, frame_idx,
       |  CAST(len(f) AS BIGINT) AS n_samples,
       |  CAST(floor(sqrt(CAST(
       |    list_sum(list_transform(f, v -> v * v)) // len(f)
       |    AS DOUBLE))) AS BIGINT) AS rms_q,
       |  CAST(list_max(list_transform(f, v -> abs(v))) AS BIGINT) AS peak_q
       |FROM w""".stripMargin

  /** Video keyframes (m4): documents packed into REAL length-prefixed
    * GVID containers (magic + u32le count + u32le-length frames —
    * genuinely packed binary, m3's RIFF precedent for the video case),
    * then the parser walks the container, samples every 3rd frame, and
    * emits exact byte-level features. The oracle replays the frame
    * arithmetic over the ASCII payload (byte == codepoint). */
  private val M4Every = 3
  private def videoKeyframes(s: SparkSession, d: String): DataFrame =
    Multimodal.videoKeyFrames(
      Multimodal.videoFromDocuments(Tables.documents(s, d)), M4Every)
      .toDF()
  private val videoKeyframesSql =
    s"""WITH p AS (
       |  SELECT doc_id, text, length(text) AS n,
       |    16 + 8 * (doc_id % 3) AS fs
       |  FROM documents),
       |fr AS (
       |  SELECT doc_id, text, n, fs,
       |    unnest(range(0, (n + fs - 1) // fs)) AS frame_idx
       |  FROM p),
       |k AS (SELECT * FROM fr WHERE frame_idx % $M4Every = 0),
       |b AS (
       |  SELECT doc_id, frame_idx,
       |    list_transform(
       |      range(frame_idx * fs + 1, least((frame_idx + 1) * fs, n) + 1),
       |      i -> ascii(substr(text, CAST(i AS INT), 1))) AS bs
       |  FROM k)
       |SELECT doc_id, frame_idx,
       |  CAST(len(bs) AS BIGINT) AS n_bytes,
       |  CAST(list_sum(bs) AS BIGINT) AS sum_b,
       |  CAST(list_max(bs) AS BIGINT) AS max_b
       |FROM b""".stripMargin

  /** Image perceptual near-dup (m5): the LAION-style multimodal dedup
    * stage — perceptual hashes from the batch decoder, then a banded
    * Hamming self-join (d4's simhash banding on the image-hash column)
    * with the exact bit_count verify on collisions only. The gate runs
    * the LOCALITY-preserving fake hash (ahash1d — the 1-D form of the
    * real 8×8 average-hash, byte-replayable by the oracle); the REAL
    * ImageIO aHash runs the identical pair operator on actual
    * near-identical PNGs in MultimodalSpec. */
  private val M5Bands = 4
  private val M5BandBits = 15
  private val M5MaxHamming = 12
  private def imageNearDup(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
    val features = Multimodal
      .decodeFeatures(media, Multimodal.LocalityFakeMediaDecoder)
      .toDF().select(col("doc_id"), col("phash"))
    Multimodal.phashNearDupPairs(features, M5Bands, M5BandBits, M5MaxHamming)
  }
  private val imageNearDupSql =
    s"""WITH a AS (
       |  SELECT doc_id, length(text) AS n,
       |    list_transform(range(1, length(text) + 1),
       |      i -> ascii(substr(text, CAST(i AS INT), 1))) AS bs
       |  FROM documents),
       |t AS (SELECT doc_id, n, bs, CAST(list_sum(bs) AS BIGINT) AS tot FROM a),
       |seg AS (
       |  SELECT doc_id, n, tot, r.range AS j,
       |    CAST(COALESCE(list_sum(bs[CAST((r.range * n) // 60 + 1 AS INT) :
       |      CAST(((r.range + 1) * n) // 60 AS INT)]), 0) AS BIGINT) AS ss,
       |    ((r.range + 1) * n) // 60 - (r.range * n) // 60 AS sl
       |  FROM t CROSS JOIN range(60) r),
       |h AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN sl > 0 AND ss * n > tot * sl
       |      THEN (1::BIGINT << CAST(59 - j AS INT)) ELSE 0 END) AS BIGINT) AS ph
       |  FROM seg GROUP BY 1),
       |sig AS (
       |  SELECT doc_id, ph, b.range AS band,
       |    (ph >> CAST(b.range * $M5BandBits AS INT)) & ${(1L << M5BandBits) - 1} AS bv
       |  FROM h CROSS JOIN range($M5Bands) b),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sig a JOIN sig b
       |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
       |SELECT DISTINCT c.doc_a, c.doc_b,
       |  CAST(bit_count(xor(ha.ph, hb.ph)) AS BIGINT) AS hamming
       |FROM cand c JOIN h ha ON ha.doc_id = c.doc_a
       |JOIN h hb ON hb.doc_id = c.doc_b
       |WHERE bit_count(xor(ha.ph, hb.ph)) <= $M5MaxHamming""".stripMargin

  val all: Seq[Q] = Seq(
    Q("m1_media_meta", mediaMeta, Some(mediaMetaSql)),
    Q("m2_frame_sample", frameSample, Some(frameSampleSql)),
    Q("m3_audio_frames", audioFrames, Some(audioFramesSql)),
    Q("m4_video_keyframes", videoKeyframes, Some(videoKeyframesSql)),
    Q("m5_image_neardup", imageNearDup, Some(imageNearDupSql)))
}
