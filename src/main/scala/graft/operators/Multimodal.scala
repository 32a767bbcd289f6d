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
  * Two decoder/resizer implementations ship behind the same trait:
  * [[RealMediaDecoder]]/[[RealMediaResizer]] decode actual images on the
  * JDK's own `javax.imageio` codecs (PNG/JPEG/GIF/BMP — no external
  * libraries) with a real 8×8 average-hash as the perceptual fingerprint;
  * [[FakeMediaDecoder]]/[[FakeMediaResizer]] derive everything
  * deterministically from the bytes, for the synthetic text-as-payload
  * corpus whose payloads are not images. Audio/video codecs remain out of
  * scope for this container. Everything Spark-side — schema, binary
  * column plumbing, partition batching, typed encoders, frame-sampling
  * expansion — is shared between the two and tested with both.
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

  /** Real image decode on the JDK's own codecs (`javax.imageio`: PNG,
    * JPEG, GIF, BMP — no external libraries). Metadata comes from the
    * decoded raster; `phash` is a genuine 64-bit average-hash (8×8
    * grayscale downsample, threshold at the mean — the standard aHash),
    * so visually identical images collide and unrelated ones do not.
    * Undecodable payloads fail loudly with the doc id — a silent skip
    * would corrupt downstream joins. Still images carry duration 0. */
  object RealMediaDecoder extends MediaDecoder {
    val name = "imageio"
    def decodeBatch(batch: Iterator[MediaRow]): Iterator[MediaFeatures] =
      batch.map { r =>
        val img = decodeImage(r)
        MediaFeatures(
          doc_id = r.doc_id,
          meta = MediaMeta(
            size_bytes = r.media.length.toLong,
            format = r.format,
            width = img.getWidth,
            height = img.getHeight,
            duration_ms = 0L),
          phash = averageHash(img))
      }
  }

  private def decodeImage(r: MediaRow): java.awt.image.BufferedImage = {
    val img =
      if (r.media.isEmpty) null
      else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
    if (img == null)
      throw new IllegalArgumentException(
        s"undecodable ${r.format} payload for doc_id=${r.doc_id} " +
          s"(${r.media.length} bytes)")
    img
  }

  /** 8×8 average-hash: downsample to 8×8 luma, set bit i when pixel i is
    * above the mean. 64 bits, MSB = pixel (0,0). */
  def averageHash(img: java.awt.image.BufferedImage): Long = {
    val small = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = small.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, 8, 8, null)
    } finally g.dispose()
    val luma = Array.tabulate(64) { i =>
      val rgb = small.getRGB(i % 8, i / 8)
      // integer BT.601 luma — deterministic across JVMs (no float rounding)
      (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
        114 * (rgb & 0xff)) / 1000
    }
    val mean = luma.sum / 64
    luma.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
      if (v > mean) acc | (1L << (63 - i)) else acc
    }
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

  /** Real pixel scaling: decode (JDK ImageIO), bilinear Graphics2D
    * rescale, re-encode as PNG (lossless — a resize must not also be a
    * recompress decision). Headless-safe: BufferedImage rendering needs
    * no display. */
  object RealMediaResizer extends MediaResizer {
    def resizeBatch(batch: Iterator[MediaRow], w: Int, h: Int): Iterator[ResizedMedia] =
      batch.map { r =>
        val img = decodeImage(r)
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val bytes = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bytes)
        ResizedMedia(r.doc_id, bytes.toByteArray, w, h)
      }
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
