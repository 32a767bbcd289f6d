package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.XHash

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, batch decode / feature extraction via
  * `mapPartitions` over a typed Dataset (the JVM analog of arrow-batched
  * pandas UDFs: one decoder instantiation per partition, streamed
  * iterator, no per-row setup).
  *
  * The actual codec work is STUBBED ([[RealMediaDecoder]] throws;
  * [[FakeMediaDecoder]] is a deterministic fake) — the container has no
  * image/audio libraries. Everything Spark-side is real and tested:
  * schema, binary column plumbing, partition batching, typed encoders,
  * frame-sampling expansion.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  final case class MediaMeta(
      size_bytes: Long,
      format: String,
      width: Int,
      height: Int,
      duration_ms: Long)

  final case class MediaRow(doc_id: Long, media: Array[Byte], format: String)
  final case class MediaFeatures(
      doc_id: Long,
      meta: MediaMeta,
      phash: Long)

  /** Per-partition batch decoder (one instance per partition — model/codec
    * initialization cost is amortized like a pandas UDF's). */
  trait MediaDecoder extends Serializable {
    def name: String
    def decodeBatch(batch: Iterator[MediaRow]): Iterator[MediaFeatures]
  }

  /** STUB: the real decoder needs image/audio codecs that are not in this
    * container. Plumbing accepts any [[MediaDecoder]]; swap this in when
    * the libraries exist. */
  object RealMediaDecoder extends MediaDecoder {
    val name = "real"
    def decodeBatch(batch: Iterator[MediaRow]): Iterator[MediaFeatures] =
      throw new UnsupportedOperationException(
        "RealMediaDecoder: codec libraries unavailable in this environment " +
          "— use FakeMediaDecoder for tests (deliberate ??? stub)")
  }

  /** Deterministic fake: derives metadata purely from the bytes, so tests
    * and oracles are exact while exercising the full batch path. */
  object FakeMediaDecoder extends MediaDecoder {
    val name = "fake"
    def decodeBatch(batch: Iterator[MediaRow]): Iterator[MediaFeatures] =
      batch.map { r =>
        val h = bytesHash60(r.media)
        MediaFeatures(
          doc_id = r.doc_id,
          meta = MediaMeta(
            size_bytes = r.media.length.toLong,
            format = r.format,
            width = (h % 1280L).toInt,
            height = (h / 1280L % 720L).toInt,
            duration_ms = r.media.length.toLong * 40L),
          phash = h)
      }
  }

  /** Same 60-bit md5 hash as [[XHash.hash60]], computed JVM-side. */
  def bytesHash60(bytes: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** documents → opaque media rows (payload = utf8 bytes; a stand-in for
    * real image/audio blobs with identical plumbing). */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("media"),
      col("source").as("format")).as[MediaRow]
  }

  /** The batch decode operator: typed mapPartitions, decoder instantiated
    * once per partition. */
  def decodeFeatures(media: Dataset[MediaRow], decoder: MediaDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(batch => decoder.decodeBatch(batch))
  }

  /** A resized media payload (binary stays opaque; dims move to metadata). */
  final case class ResizedMedia(
      doc_id: Long, media: Array[Byte], width: Int, height: Int)

  /** Batch resize — same per-partition amortization contract as
    * [[MediaDecoder]]. */
  trait MediaResizer extends Serializable {
    def resizeBatch(batch: Iterator[MediaRow], w: Int, h: Int): Iterator[ResizedMedia]
  }

  /** STUB: real pixel scaling needs codecs absent from this container. */
  object RealMediaResizer extends MediaResizer {
    def resizeBatch(batch: Iterator[MediaRow], w: Int, h: Int): Iterator[ResizedMedia] =
      throw new UnsupportedOperationException(
        "RealMediaResizer: codec libraries unavailable — use FakeMediaResizer " +
          "(deliberate ??? stub)")
  }

  /** Deterministic fake: payload truncated/cycled to the byte budget a
    * w×h thumbnail would occupy — size-realistic, content-deterministic.
    * An empty payload resizes to an empty payload (no modulo on a
    * zero-length array). */
  object FakeMediaResizer extends MediaResizer {
    def resizeBatch(batch: Iterator[MediaRow], w: Int, h: Int): Iterator[ResizedMedia] =
      batch.map { r =>
        val budget = math.max(1, w * h / 8)
        val out =
          if (r.media.isEmpty) Array.emptyByteArray
          else Array.tabulate[Byte](math.min(budget, r.media.length))(
            i => r.media(i % r.media.length))
        ResizedMedia(r.doc_id, out, w, h)
      }
  }

  /** The resize operator: typed mapPartitions over the opaque payloads —
    * schema, batching and partitioning identical to the real path. */
  def resize(
      media: Dataset[MediaRow], w: Int, h: Int,
      resizer: MediaResizer): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(batch => resizer.resizeBatch(batch, w, h))
  }

  /** Frame sampling: one output row per sampled frame timestamp —
    * `posexplode(sequence(...))` keeps it codegen'd and distributed. */
  def frameSample(features: DataFrame, fps: Double = 1.0): DataFrame = {
    val stepMs = math.round(1000.0 / fps)
    features
      .withColumn("frame_idx",
        explode(sequence(lit(0L), expr(s"duration_ms div $stepMs"))))
      .withColumn("frame_ts_ms", col("frame_idx") * lit(stepMs))
  }
}
