package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import graft.operators.TextOps
import graft.queries.DedupQueries

/** Cross-batch EMBEDDING near-duplicate detection — the streaming twin
  * of batch d5 ([[DedupQueries.embNearDupBanded]]) and the vector-side
  * sibling of [[CorpusIngest.nearDupMatches]]: every arriving vector is
  * checked against ALL previously ingested vectors sharing a sign-LSH
  * band bucket, in the same micro-batch pass that files it — the
  * image/embedding ingest stage of a LAION-style pipeline, where the
  * question at ingest time is "have we already got this (or nearly
  * this)?" and a nightly batch job is too late.
  *
  * Mechanics: the per-row banded signature is the SAME native
  * [[graft.functions.BandedSignatures]] projection (same d5Weights
  * hyperplanes) as the batch join key, computed without a shuffle;
  * the state store is keyed by (band_idx, band_sig) and each bucket
  * holds the (vec_id, quantized vector, norm) of every vector ever
  * filed under it. A new vector emits one row per already-filed bucket
  * member whose EXACT quantized cosine reaches `threshold` — the same
  * int64 dot + IEEE sqrt/divide as the batch verify, so streaming ≡
  * batch is bit-exact on the distinct pair set
  * (StreamingEmbedDedupSpec pins it).
  *
  * Output (append mode): `(vec_id, dup_of, cosine)` with `dup_of` the
  * earlier-ingested side; a pair sharing several bands emits once per
  * shared band (dedup downstream — the batch twin's DISTINCT).
  *
  * State story at scale: the band buckets are the corpus's vector
  * near-dup index — one (id, dim-long vector, norm) entry per band per
  * unique vector (bands× the corpus footprint; RocksDB-backed via [[StateStores]] in
  * production). Holding the vectors IN state is what buys the exact
  * in-stream verify; [[nearDupMatchesLean]] is the other end of the
  * dial — ids-only state (bands × 8 B per vector), exact verify
  * deferred to a join against the vector store.
  */
object StreamEmbedDedup {

  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType, containsNull = false)),
    StructField("label", IntegerType)))

  /** File-source stream over a directory of embedding parquet files. */
  def readEmbeddings(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(embSchema)
      .option("maxFilesPerTrigger", "1") // per-file batches: state must carry
      .parquet(dir)

  /** Keep a persisted IVF-PQ index fresh from a landing directory: a
    * foreachBatch sink that [[graft.operators.AnnIndex.appendIvfPq]]s
    * each arriving embedding file. Frozen quantizers make per-batch
    * encoding a pure per-row function, so ANY micro-batch split yields
    * the same codes table as a one-shot append; EXACTLY-ONCE under
    * crash/restart replays comes from the index's own commit protocol
    * (r9 ADVICE #1): the batchId is passed through and the manifest
    * records the applied high-water mark DURABLY, so when Structured
    * Streaming re-delivers the last uncommitted micro-batch after a
    * restart, the replay is a no-op — and a crash BETWEEN the delta
    * write and the manifest commit leaves only an orphan dir the retry
    * overwrites (never duplicated (vec_id, sub, code, cell) rows, which
    * would double ADC sums and corrupt rankings).
    * Returns the started query; stop it to stop ingesting. */
  /** Poison-pill unblock latency (r14 advisor #5): a batch
    * re-ingesting a taken-down id folds the code-delta window
    * (tombstones drop physically there — ivfpq's takedown fold IS the
    * delta fold) and retries once. At production scale that is a
    * multi-minute pause inside one micro-batch; the cliff is inherent
    * to making the id appendable again, so size the compaction policy
    * to fold takedown windows before a re-crawl can arrive.
    *
    * @param compactEvery when > 0, every `compactEvery`-th batch also
    *   folds the accumulated code deltas into one slab
    *   ([[graft.operators.AnnIndex.compactIvfPqDeltas]] — contents
    *   idempotent, replay-safe): the maintenance loop closed inside
    *   the stream.
    * @param policy threshold-based trigger on the manifest's LIVE
    *   window (delta count / bytes — r11 verdict #4); when set it
    *   replaces `compactEvery`.
    * @param recall when enabled (r14 verdict #5), every N-th batch
    *   re-measures serving recall at the tuned operating point; drift
    *   on the recorded sample triggers
    *   [[graft.operators.AnnIndex.rebuildAndTune]] in-stream, so a
    *   corpus that grew past its quantizer fit re-tunes before the
    *   next batch serves. */
  def indexAppendSink(emb: DataFrame, indexDir: String,
      checkpointDir: String, compactEvery: Int = 0,
      policy: graft.operators.CompactionPolicy =
        graft.operators.CompactionPolicy(),
      recall: graft.operators.RecallPolicy =
        graft.operators.RecallPolicy()
      ): org.apache.spark.sql.streaming.StreamingQuery = {
    val eff = if (policy.enabled) policy
      else graft.operators.CompactionPolicy(every = compactEvery)
    emb.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          try graft.operators.AnnIndex.appendIvfPq(batch.toDF(), indexDir,
            batchId = batchId)
          catch {
            // poison-pill unblock (r13 ADVICE): a FRESH batch carrying
            // an id taken down earlier is refused while the tombstone
            // window is live — and Structured Streaming re-delivers
            // the same batch on every restart, wedging the stream
            // until someone compacts by hand. Empty the window (the
            // documented unblock: a compacted takedown makes the id
            // appendable again) and retry ONCE; a second refusal is a
            // real contract violation and fails the query loudly.
            case _: graft.operators.TombstonedIdsException =>
              graft.operators.AnnIndex.compactIvfPqDeltas(
                batch.sparkSession, indexDir)
              graft.operators.AnnIndex.appendIvfPq(batch.toDF(), indexDir,
                batchId = batchId)
          }
          if (eff.enabled) {
            lazy val stats = graft.operators.AnnIndex
              .ivfPqDeltaWindowStats(batch.sparkSession, indexDir)
            if (eff.triggers(batchId, stats._1, stats._2()))
              graft.operators.AnnIndex.compactIvfPqDeltas(
                batch.sparkSession, indexDir)
          }
          // in-stream auto-retune (r14 verdict #5): a corpus that grew
          // past its quantizer fit re-fits + re-tunes before the next
          // batch serves, instead of waiting for an operator cron
          recall.applyIfDue(batch.sparkSession, indexDir, batchId)
          ()
        }
      }
      .start()
  }

  val querySchema: StructType = StructType(Seq(
    StructField("query_id", LongType),
    StructField("embedding", ArrayType(FloatType, containsNull = false))))

  /** File-source stream over a directory of (query_id, embedding)
    * parquet files — the landing zone of [[serveSink]]. */
  def readQueries(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(querySchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Serve a STREAM of query vectors from a persisted ANN index — the
    * retrieval half of the streaming story next to [[indexAppendSink]]'s
    * ingest half: each micro-batch of (query_id, embedding) rows is
    * answered through [[graft.operators.AnnIndex.serveTopK]] (stored
    * quantizers, no rebuild, batch side broadcast) and written to
    * `outDir/batch-<id>` with overwrite — idempotent under post-restart
    * replays, the per-batch analogue of the index commit protocol;
    * readers union the batch dirs (`outDir/batch-*`). Per-query top-k
    * is independent of batching, so ANY micro-batch split yields the
    * same result rows as one batch serve (StreamingEmbedDedupSpec pins
    * it). `emb` is the embedding store for the compressed families'
    * exact rerank. Returns the started query; stop it to stop serving. */
  def serveSink(queries: DataFrame, indexDir: String, emb: DataFrame,
      outDir: String, checkpointDir: String,
      topK: Int = 3): org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.AnnIndex.serveTopK(batch.sparkSession, indexDir,
            batch.toDF(), emb, topK)
            .write.mode("overwrite").parquet(s"$outDir/batch-$batchId")
        }
      }
      .start()

  /** Banded sign-LSH state dedup; append-mode (vec_id, dup_of, cosine)
    * rows at exact cosine ≥ threshold. Parameters mirror batch d5 —
    * use [[DedupQueries.autoBandParams]] for production thresholds. */
  def nearDupMatches(emb: DataFrame, bands: Int, rowBits: Int,
      threshold: Double, dim: Int): DataFrame = {
    val spark = emb.sparkSession
    StateStores.useRocksDb(spark) // corpus-index state: disk-backed (r12 #4)
    import spark.implicits._
    val flatWeights = new Array[Long](bands * rowBits * dim)
    for (b <- 0 until bands; j <- 0 until rowBits)
      System.arraycopy(DedupQueries.d5Weights(dim, b, j), 0, flatWeights,
        (b * rowBits + j) * dim, dim)
    emb
      .select(col("vec_id"), TextOps.quantize(col("embedding")).as("q"))
      .withColumn("nn", TextOps.qdot(col("q"), col("q")))
      .select(col("vec_id"), col("nn"), col("q"),
        posexplode(graft.functions.BandedSignatures(
          col("q"), flatWeights, bands, rowBits)))
      .toDF("vec_id", "nn", "q", "band_idx", "band_sig")
      .as[(Long, Long, Array[Long], Int, Long)]
      .groupByKey { case (_, _, _, bandIdx, bandSig) => (bandIdx, bandSig) }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, Long), rows: Iterator[(Long, Long, Array[Long], Int, Long)],
            state: org.apache.spark.sql.streaming.GroupState[List[(Long, Array[Long], Long)]]) => {
          var filed = state.getOption.getOrElse(Nil)
          // membership via a Set: bucket occupancy is LSH-bounded, but
          // a skewed bucket must not turn the check O(bucket²)
          var filedIds = filed.iterator.map(_._1).toSet
          val out = List.newBuilder[(Long, Long, Double)]
          // vec_id order makes within-batch matching deterministic
          rows.map(r => (r._1, r._3, r._2)).toList.sortBy(_._1)
            .foreach { case (id, q, nn) =>
              if (!filedIds.contains(id)) { // re-ingest adds nothing
                filed.foreach { case (pid, pq, pnn) =>
                  // exact int64 dot + the batch verify's IEEE ops —
                  // bit-identical to the column form
                  var dot = 0L
                  var i = 0
                  while (i < q.length) { dot += q(i) * pq(i); i += 1 }
                  val cos = dot.toDouble /
                    (math.sqrt(nn.toDouble) * math.sqrt(pnn.toDouble))
                  if (cos >= threshold) out += ((id, pid, cos))
                }
                filed = (id, q, nn) :: filed
                filedIds += id
              }
            }
          state.update(filed)
          out.result().iterator
        })
      .toDF("vec_id", "dup_of", "cosine")
  }

  /** [[nearDupMatches]]'s LEAN-STATE twin (the r9 verdict #7 dial): the
    * state store holds ONLY the filed vec_ids per band bucket — bands ×
    * 8 B per vector instead of bands × (vector + norm), the shape that
    * keeps web-scale streaming state bounded — and the exact cosine
    * verify is deferred OUT of the stateful operator: the candidate
    * stream (which carries the arriving row's own vector through, it is
    * in the input anyway) LEFT-joins the external vector `store` for
    * the earlier side's vector, then applies the identical int64 dot +
    * IEEE sqrt/divide. Output is (vec_id, dup_of, cosine, verified):
    * verified rows are exactly the in-state verify's matches when the
    * store covers every previously-filed vector
    * (StreamingEmbedDedupSpec pins the match sets equal); a candidate
    * whose earlier-side vector is NOT yet visible in the store (store
    * lag — the same pipeline usually feeds both) is EMITTED with
    * cosine = null, verified = false rather than silently dropped, so
    * the caller can quarantine/retry it once the store catches up. A
    * store-covered candidate below the threshold is a verified
    * non-match and is dropped — only coverage gaps defer. */
  def nearDupMatchesLean(emb: DataFrame, store: DataFrame, bands: Int,
      rowBits: Int, threshold: Double, dim: Int): DataFrame = {
    val spark = emb.sparkSession
    StateStores.useRocksDb(spark) // corpus-index state: disk-backed (r12 #4)
    import spark.implicits._
    val flatWeights = new Array[Long](bands * rowBits * dim)
    for (b <- 0 until bands; j <- 0 until rowBits)
      System.arraycopy(DedupQueries.d5Weights(dim, b, j), 0, flatWeights,
        (b * rowBits + j) * dim, dim)
    val cand = emb
      .select(col("vec_id"), TextOps.quantize(col("embedding")).as("q"))
      .withColumn("nn", TextOps.qdot(col("q"), col("q")))
      .select(col("vec_id"), col("nn"), col("q"),
        posexplode(graft.functions.BandedSignatures(
          col("q"), flatWeights, bands, rowBits)))
      .toDF("vec_id", "nn", "q", "band_idx", "band_sig")
      .as[(Long, Long, Array[Long], Int, Long)]
      .groupByKey { case (_, _, _, bandIdx, bandSig) => (bandIdx, bandSig) }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, Long), rows: Iterator[(Long, Long, Array[Long], Int, Long)],
            state: org.apache.spark.sql.streaming.GroupState[List[Long]]) => {
          var filed = state.getOption.getOrElse(Nil)
          // membership via a Set: bucket occupancy is LSH-bounded, but
          // a skewed bucket must not turn the check O(bucket²)
          var filedIds = filed.toSet
          val out = List.newBuilder[(Long, Long, Array[Long], Long)]
          // vec_id order makes within-batch candidates deterministic —
          // the same traversal as the in-state verify
          rows.map(r => (r._1, r._3, r._2)).toList.sortBy(_._1)
            .foreach { case (id, q, nn) =>
              if (!filedIds.contains(id)) { // re-ingest adds nothing
                filed.foreach(pid => out += ((id, nn, q, pid)))
                filed = id :: filed
                filedIds += id
              }
            }
          state.update(filed)
          out.result().iterator
        })
      .toDF("vec_id", "nn", "q", "dup_of")
    // exact verify as a stream-static LEFT join: only candidates ever
    // look up the store, the math is bit-identical to the in-state
    // form, and a store miss (earlier-side vector not yet visible)
    // surfaces as an unverified row instead of vanishing
    val storeQ = store
      .select(col("vec_id").as("dup_of"),
        TextOps.quantize(col("embedding")).as("pq"))
      .withColumn("pnn", TextOps.qdot(col("pq"), col("pq")))
    cand.join(storeQ, Seq("dup_of"), "left")
      .select(col("vec_id"), col("dup_of"),
        (TextOps.qdot(col("q"), col("pq")).cast("double") /
          (sqrt(col("nn").cast("double")) * sqrt(col("pnn").cast("double"))))
          .as("cosine"),
        col("pq").isNotNull.as("verified"))
      .filter(!col("verified") || col("cosine") >= threshold)
  }
}
