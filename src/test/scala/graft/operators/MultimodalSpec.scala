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

  test("real decoder is an explicit stub") {
    import spark.implicits._
    val docs = Seq((1L, "x", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFeatures(
        Multimodal.mediaFromDocuments(docs), Multimodal.RealMediaDecoder)
        .collect()
    }
    assert(ex.getMessage != null)
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
}
