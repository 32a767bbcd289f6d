package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("batch decode plumbing: one decoder pass per partition, typed output") {
    import spark.implicits._
    val docs = Seq((1L, "hello world", "en", "srcA", 11L),
        (2L, "abc", "en", "srcB", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.mediaFromDocuments(docs)
    val feats = Multimodal.decodeFeatures(media, Multimodal.FakeMediaDecoder)
      .collect().sortBy(_.doc_id)
    assert(feats.length == 2)
    assert(feats(0).meta.size_bytes == 11L)
    assert(feats(0).meta.duration_ms == 440L)
    assert(feats(0).meta.format == "srcA")
    // phash matches the cross-engine hash definition
    assert(feats(0).phash ==
      Multimodal.bytesHash60("hello world".getBytes("UTF-8")))
    assert(feats(0).meta.width == (feats(0).phash % 1280L).toInt)
  }

  /** Render a real PNG in-test with the same JDK ImageIO the decoder
    * uses: a w×h two-tone image (left half dark, right half bright). */
  private def pngBytes(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y,
        if (x < w / 2) 0x101010 + seed else 0xe0e0e0 - seed)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("real decoder: actual PNGs through the mapPartitions path") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, pngBytes(64, 48, 0), "png"),
      Multimodal.MediaRow(2L, pngBytes(64, 48, 0), "png"), // identical image
      Multimodal.MediaRow(3L, pngBytes(32, 32, 8), "png")) // different image
      .toDS()
    val feats = Multimodal.decodeFeatures(media, Multimodal.RealMediaDecoder)
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).meta.width == 64 && feats(1L).meta.height == 48)
    assert(feats(3L).meta.width == 32 && feats(3L).meta.height == 32)
    assert(feats(1L).meta.duration_ms == 0L) // still image
    // perceptual hash: identical pixels => identical hash, and the
    // left-dark/right-bright pattern sets exactly the right-half bits
    assert(feats(1L).phash == feats(2L).phash)
    val expected = (0 until 64).foldLeft(0L)((acc, i) =>
      if (i % 8 >= 4) acc | (1L << (63 - i)) else acc)
    assert(feats(1L).phash == expected)
  }

  /** A textured pseudorandom PNG (deterministic LCG per (seed, x, y))
    * with an optional localized brightness perturbation — the planted
    * near-identical variant for the perceptual-dedup test. */
  private def texturedPng(w: Int, h: Int, seed: Long,
      perturb: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      var v = seed * 6364136223846793005L + (x * 131L + y) * 1442695040888963407L
      v ^= (v >>> 31)
      var g = ((v & 0xffL) % 200L + 28L).toInt
      // a small bright patch in one corner — moves a couple of the 64
      // aHash cells, leaves the rest untouched
      if (perturb && x < w / 8 && y < h / 8) g = math.min(255, g + 90)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("m5 real path: banded Hamming join finds planted near-identical PNGs") {
    import spark.implicits._
    // 1/2: identical; 3: near-identical to 1 (small patch); 4..9: unrelated
    val media = (Seq(
      Multimodal.MediaRow(1L, texturedPng(64, 64, 7L), "png"),
      Multimodal.MediaRow(2L, texturedPng(64, 64, 7L), "png"),
      Multimodal.MediaRow(3L, texturedPng(64, 64, 7L, perturb = true), "png")) ++
      (4L to 9L).map(i =>
        Multimodal.MediaRow(i, texturedPng(64, 64, 100L + i), "png"))).toDS()
    val feats = Multimodal.decodeFeatures(media, Multimodal.RealMediaDecoder)
      .toDF().select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("phash"))
    val pairs = Multimodal.phashNearDupPairs(
        feats, bands = 4, bandBits = 16, maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    spark.catalog.clearCache()
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) == 0L,
      s"identical images must collide at hamming 0: $pairs")
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) > 0L,
      s"planted near-identical pair must be found: $pairs")
    // no unrelated pair sneaks under the threshold
    assert(pairs.keySet.subsetOf(Set((1L, 2L), (1L, 3L), (2L, 3L))),
      s"unexpected pairs: $pairs")
  }

  test("ahash1d is locality-preserving on byte payloads") {
    val base = Array.tabulate[Byte](600)(i => ((i * 37 + 11) % 251).toByte)
    val near = base.clone(); (0 until 12).foreach(i => near(i) = 127.toByte)
    val far = Array.tabulate[Byte](600)(i => ((i * 101 + 5) % 251).toByte)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(Multimodal.ahash1d(base) == Multimodal.ahash1d(base.clone()))
    val nearH = ham(Multimodal.ahash1d(base), Multimodal.ahash1d(near))
    val farH = ham(Multimodal.ahash1d(base), Multimodal.ahash1d(far))
    assert(nearH <= 6, s"small edit must move few bits: $nearH")
    assert(farH >= 15, s"unrelated payloads must sit far apart: $farH")
  }

  test("real decoder fails loudly on undecodable payloads") {
    import spark.implicits._
    val media = Seq(Multimodal.MediaRow(9L, Array[Byte](1, 2, 3), "png")).toDS()
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFeatures(media, Multimodal.RealMediaDecoder).collect()
    }
    assert(ex.getMessage != null)
  }

  test("real resizer: decoded output has the target raster") {
    import spark.implicits._
    val media = Seq(Multimodal.MediaRow(1L, pngBytes(64, 48, 0), "png")).toDS()
    val out = Multimodal.resize(media, 16, 12, Multimodal.RealMediaResizer)
      .collect().head
    assert(out.width == 16 && out.height == 12)
    // re-decode the emitted PNG: raster dims must match the declared ones
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.media))
    assert(img.getWidth == 16 && img.getHeight == 12)
    // bilinear scaling preserves the left-dark/right-bright structure
    assert(Multimodal.averageHash(img) == Multimodal.averageHash(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        pngBytes(64, 48, 0)))))
  }

  test("frame sampling expands inclusive frame range") {
    import spark.implicits._
    val f = Seq((1L, 2500L)).toDF("doc_id", "duration_ms")
    val frames = Multimodal.frameSample(f, fps = 1.0)
      .select("frame_idx", "frame_ts_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(frames.toSeq == Seq((0L, 0L), (1L, 1000L), (2L, 2000L)))
  }

  test("resize plumbing: deterministic payloads sized to target dims") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world of pixels", "en", "img", 21L),
      (2L, "tiny", "en", "img", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.resize(
        Multimodal.mediaFromDocuments(docs), 16, 16, Multimodal.FakeMediaResizer)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(1L).width == 16 && out(1L).height == 16)
    // byte budget = 16*16/8 = 32, capped at source length
    assert(out(1L).media.length == 21 && out(2L).media.length == 4)
    // deterministic across runs
    val again = Multimodal.resize(
        Multimodal.mediaFromDocuments(docs), 16, 16, Multimodal.FakeMediaResizer)
      .collect().map(r => r.doc_id -> r.media.toSeq).toMap
    assert(again(1L) == out(1L).media.toSeq)
  }

  /** Build real RIFF/WAVE PCM16 bytes in-test: `chans` interleaved
    * channels of the given int16 samples. */
  private def wavBytes(samples: Array[Short], chans: Int = 1,
      sr: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * chans * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(chans.toShort).putInt(sr)
      .putInt(sr * chans * 2).putShort((chans * 2).toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => (0 until chans).foreach(_ => bb.putShort(s)))
    bb.array()
  }

  test("real WAV decoder: PCM16 frames through the mapPartitions path") {
    import spark.implicits._
    // 800 samples of a 10k-amplitude square-ish wave: RMS = amplitude
    // exactly, peak = amplitude; plus a silent tail frame
    val tone = Array.tabulate[Short](800)(i =>
      if (i % 2 == 0) 10000 else -10000)
    val silent = Array.fill[Short](40)(0)
    val media = Seq(
      Multimodal.AudioRow(1L, wavBytes(tone ++ silent)),
      Multimodal.AudioRow(2L, wavBytes(tone, chans = 2))) // stereo avg
      .toDS()
    val frames = Multimodal.audioFrames(media, Multimodal.RealWavDecoder, 160)
      .collect().groupBy(_.doc_id)
    // doc 1: 840 samples → 6 frames (5×160 + 1×40)
    val f1 = frames(1L).sortBy(_.frame_idx)
    assert(f1.length == 6)
    assert(f1.take(5).forall(f => f.n_samples == 160 &&
      f.rms_q == 10000L && f.peak_q == 10000L))
    assert(f1.last.n_samples == 40 && f1.last.rms_q == 0L &&
      f1.last.peak_q == 0L)
    // doc 2: stereo channels identical → averaging preserves the wave
    val f2 = frames(2L).sortBy(_.frame_idx)
    assert(f2.length == 5 && f2.forall(_.rms_q == 10000L))
  }

  test("real WAV decoder fails loudly on non-WAV payloads") {
    import spark.implicits._
    val media = Seq(Multimodal.AudioRow(7L,
      "this is not audio at all just text".getBytes("UTF-8"))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.audioFrames(media, Multimodal.RealWavDecoder, 160).collect()
    }
    assert(e.getMessage.contains("doc_id=7") ||
      Option(e.getCause).exists(_.getMessage.contains("doc_id=7")))
  }

  test("fake audio decoder equals a hand computation") {
    import spark.implicits._
    // "abc" → bytes 97,98,99 → centered 33,34,35; one 2-sample frame +
    // one 1-sample tail at frameSamples=2
    val media = Seq(Multimodal.AudioRow(1L, "abc".getBytes("UTF-8"))).toDS()
    val fr = Multimodal.audioFrames(media, Multimodal.FakeAudioDecoder, 2)
      .collect().sortBy(_.frame_idx)
    assert(fr.length == 2)
    // frame 0: msq = (33²+34²)/2 = (1089+1156)/2 = 1122 → floor(sqrt) = 33
    assert(fr(0).n_samples == 2 && fr(0).rms_q == 33L && fr(0).peak_q == 34L)
    assert(fr(1).n_samples == 1 && fr(1).rms_q == 35L && fr(1).peak_q == 35L)
  }

  test("GVID container round-trips, including frames past the 1-byte length range") {
    val frames = Seq(
      Array.fill[Byte](3)(7),
      Array.fill[Byte](300)(42), // length 300 needs the second LE byte
      Array.emptyByteArray,
      Array.tabulate[Byte](17)(i => i.toByte))
    val packed = Multimodal.packGvid(frames)
    val back = Multimodal.parseGvid(packed, docId = 1L)
    assert(back.length == frames.length)
    frames.zip(back).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("GVID parser fails loudly on bad magic, truncation, trailing bytes") {
    val good = Multimodal.packGvid(Seq(Array.fill[Byte](5)(1)))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(intercept[IllegalArgumentException] {
      Multimodal.parseGvid(badMagic, 7L)
    }.getMessage.contains("doc_id=7"))
    intercept[IllegalArgumentException] {
      Multimodal.parseGvid(good.dropRight(2), 7L) // truncated payload
    }
    intercept[IllegalArgumentException] {
      Multimodal.parseGvid(good ++ Array[Byte](0), 7L) // trailing byte
    }
  }

  test("video keyframes: every-3rd sampling with exact byte features") {
    import spark.implicits._
    val payload = (0 until 100).map(i => ('A' + i % 26).toChar).mkString
    val docs = Seq((33L, payload)).toDF("doc_id", "text")
    // doc 33: fs = 16 + 8*(33 % 3) = 16 -> 7 frames (last = 4 bytes);
    // sampled idx 0, 3, 6
    val kf = Multimodal.videoKeyFrames(
      Multimodal.videoFromDocuments(docs), 3).collect()
      .sortBy(_.frame_idx)
    assert(kf.map(_.frame_idx).toSeq == Seq(0L, 3L, 6L))
    assert(kf(0).n_bytes == 16 && kf(2).n_bytes == 4)
    val bytes = payload.getBytes("UTF-8").map(_ & 0xff)
    def sum(lo: Int, hi: Int) = bytes.slice(lo, hi).map(_.toLong).sum
    assert(kf(0).sum_b == sum(0, 16))
    assert(kf(1).sum_b == sum(48, 64))
    assert(kf(2).sum_b == sum(96, 100))
    assert(kf(2).max_b == bytes.slice(96, 100).max.toLong)
  }
}
