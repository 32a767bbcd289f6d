package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Cross-batch IMAGE near-duplicate detection — the streaming twin of
  * batch m5 ([[graft.operators.Multimodal.phashNearDupPairs]]) and the
  * third modality of the ingest-dedup triad (documents:
  * [[CorpusIngest.nearDupMatches]] on MinHash state; embeddings:
  * [[StreamEmbedDedup.nearDupMatches]] on sign-LSH state; images:
  * Hamming-banded perceptual-hash state): every arriving image is
  * checked against ALL previously ingested images sharing a phash band
  * slice, in the same micro-batch pass that files it — the LAION
  * ingest reality, where the same image re-encoded arrives again and
  * again and the question is asked at landing time.
  *
  * Mechanics: the per-row band values are the SAME bit slices as the
  * batch join key (`(phash >>> b·bandBits) & mask`), computed without
  * a shuffle; state is keyed by (band_idx, band_val) and each bucket
  * holds (doc_id, phash) — 16 bytes per band per unique image, the
  * cheapest state of the three modalities. A new image emits one row
  * per already-filed bucket member within `maxHamming` (exact
  * `Long.bitCount(xor)` — the same count as the batch `bit_count`
  * verify, on collisions only, never all-pairs). Streaming ≡ batch on
  * the distinct pair set is pinned by StreamingImageDedupSpec.
  *
  * Output (append mode): `(doc_id, dup_of, hamming)` with `dup_of` the
  * earlier-ingested side; a pair sharing several bands emits once per
  * shared band (dedup downstream — the batch twin's DISTINCT).
  */
object StreamImageDedup {

  /** Hamming-banded phash state dedup over a (doc_id, phash) feature
    * stream (decode upstream — any [[graft.operators.Multimodal.MediaDecoder]]
    * via mapPartitions works on a streaming Dataset). Parameters mirror
    * batch m5. */
  def nearDupMatches(features: DataFrame, bands: Int = 4,
      bandBits: Int = 15, maxHamming: Int = 12): DataFrame = {
    require(bands >= 1 && bandBits >= 1 && bands * bandBits <= 64,
      s"bands x bandBits must fit one long: $bands x $bandBits")
    val spark = features.sparkSession
    StateStores.useRocksDb(spark) // corpus-index state: disk-backed (r12 #4)
    import spark.implicits._
    val mask = (1L << bandBits) - 1L
    features.select(col("doc_id"), col("phash"),
        posexplode(array((0 until bands).map(b =>
          shiftrightunsigned(col("phash"), b * bandBits)
            .bitwiseAND(lit(mask))): _*)).as(Seq("band_idx", "band_val")))
      .as[(Long, Long, Int, Long)]
      .groupByKey { case (_, _, bandIdx, bandVal) => (bandIdx, bandVal) }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, Long), rows: Iterator[(Long, Long, Int, Long)],
            state: org.apache.spark.sql.streaming.GroupState[List[(Long, Long)]]) => {
          var filed = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[(Long, Long, Long)]
          // doc_id order makes within-batch matching deterministic
          rows.map(r => (r._1, r._2)).toList.sortBy(_._1)
            .foreach { case (id, phash) =>
              if (!filed.exists(_._1 == id)) { // re-ingest adds nothing
                filed.foreach { case (pid, pph) =>
                  val h = java.lang.Long.bitCount(phash ^ pph).toLong
                  if (h <= maxHamming) out += ((id, pid, h))
                }
                filed = (id, phash) :: filed
              }
            }
          state.update(filed)
          out.result().iterator
        })
      .toDF("doc_id", "dup_of", "hamming")
  }
}
