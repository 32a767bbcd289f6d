package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** The streaming state-size story, MEASURED (r3 verdict next-round #7):
  * the batch families have octave-scaling data; these tests drive the
  * stateful streaming operators through a 10×-shaped input and assert the
  * state store tracks the operator's declared asymptote — distinct
  * content for corpus ingest, active keys for sessionization — never
  * stream length. Metrics come from StreamingQueryProgress.stateOperators
  * (the same numbers a production monitor would alert on).
  */
class StreamingScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Run to completion on available input; return (result, per-progress
    * state-store row totals in batch order). */
  private def runWithStateMetrics(df: DataFrame, name: String)
      : (DataFrame, Seq[Long]) = {
    val q = df.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft_ckpt_$name").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val state = q.recentProgress.toSeq
      .flatMap(p => p.stateOperators.map(_.numRowsTotal))
    (spark.table(name), state)
  }

  test("corpus ingest state rows = distinct content, not stream length (10x + full re-crawl)") {
    val dir = Files.createTempDirectory("graft_ingest_scale").toString
    val docs = Tables.documents(spark, sf)
    val nBase = docs.count() // 500

    // 10 independent replicas (the octave fixture's bijective salting) =
    // 10x distinct content, one file per replica; then the ENTIRE 10x
    // corpus re-crawled under new doc_ids — 10 more files of pure
    // duplicates. Stream length 20x, distinct content 10x.
    (0 until 10).foreach { r =>
      graft.bench.ScaleFixture.saltDocs(docs, r)
        .coalesce(1).write.mode("append").parquet(dir)
    }
    (0 until 10).foreach { r =>
      graft.bench.ScaleFixture.saltDocs(docs, r)
        .withColumn("doc_id", col("doc_id") + 5000000L)
        .coalesce(1).write.mode("append").parquet(dir)
    }

    val (out, state) = runWithStateMetrics(
      CorpusIngest.ingest(CorpusIngest.readDocs(spark, dir)), "ingest_scale")

    val distinct = 10L * nBase
    val streamLen = 20L * nBase
    assert(state.nonEmpty, "no state metrics reported")
    // the dedup state holds exactly one row per distinct fingerprint —
    // the re-crawl half of the stream must add NOTHING
    assert(state.max == distinct,
      s"state ${state.max} != distinct content $distinct (stream $streamLen)")
    // and the output carries each distinct doc once (minus quality gate)
    assert(out.count() <= distinct)
    assert(out.select("text_fp").distinct().count() == out.count())
  }

  test("sessionizer state rows = active users, not events; closed sessions leave the store") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sess_scale").toString
    val base = 1737928800L * 1000000000L
    val minNs = 60L * 1000000000L
    val users = 2000

    // 3 events per user inside a 10-minute span => 6000 events, one open
    // session per user; two files so state must carry across batches
    def burst(eventOffset: Long, tsOffset: Long) =
      (0 until users).flatMap { u =>
        (0 until 3).map { i =>
          (eventOffset + u * 3L + i, base + tsOffset + i * minNs,
            u.toLong, "click", 1.0, "{}")
        }
      }
    burst(0L, 0L).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)
    burst(100000L, 5L * minNs)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)
    // sentinel far in the future: watermark passes every session's
    // timeout, so the store must drain to just the sentinel's session
    Seq((999999L, base + 1000L * 60 * minNs, 999999L, "sentinel", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)

    val events = spark.readStream
      .schema(EventStreams.eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withColumnRenamed("ts", "ts_ns")
    val (out, state) = runWithStateMetrics(
      StatefulSessions.sessionize(events).toDF(), "sess_scale")

    assert(state.nonEmpty, "no state metrics reported")
    // peak state = one SessState per ACTIVE user — 2001 keys against a
    // 6001-event stream; growth with events (not keys) would show ~6000
    assert(state.max <= users + 1L,
      s"peak state ${state.max} exceeds active-user count ${users + 1}")
    // after the watermark passes, every closed session is REMOVED: only
    // the sentinel's still-open session may remain
    assert(state.last <= 1L,
      s"state store must drain after sessions close, still ${state.last}")
    assert(out.filter(col("user_id") < users).count() == users.toLong,
      "every user's session must close exactly once")
  }
}
