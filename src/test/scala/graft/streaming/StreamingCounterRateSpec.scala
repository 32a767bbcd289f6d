package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.queries.TimeSeriesQueries

/** ts14's streaming twin must equal the batch operator exactly: the
  * per-series carried state (last reading) continues a series across
  * micro-batch boundaries, so the union of incrementally-emitted delta
  * rows — fed through the SAME rollup — reproduces batch ts14 on the
  * same data. Three time-split files → three micro-batches, so
  * boundary deltas exist only if cross-batch state works.
  */
class StreamingCounterRateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("streaming counter deltas + shared rollup equal batch ts14") {
    val dir = Files.createTempDirectory("graft_ctr_stream").toString
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts_ns"), col("value"))
    val Array(lo, hi) = ev.agg(min(col("ts_ns")), max(col("ts_ns")))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val (c1, c2) = (lo + (hi - lo) / 3, lo + 2 * ((hi - lo) / 3))
    // three time-ordered files -> three micro-batches; per-series order
    // across batches is preserved (the scrape pattern)
    ev.filter(col("ts_ns") < c1).coalesce(1).write.mode("append").parquet(dir)
    ev.filter(col("ts_ns") >= c1 && col("ts_ns") < c2).coalesce(1)
      .write.mode("append").parquet(dir)
    ev.filter(col("ts_ns") >= c2).coalesce(1).write.mode("append").parquet(dir)

    val stream = StreamCounterRate.deltas(
      spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir))
    val q = stream.toDF().writeStream
      .outputMode("append").format("memory").queryName("ctr_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ckpt_ctr").toString)
      .start()
    val batches = try {
      q.processAllAvailable()
      q.recentProgress.count(_.numInputRows > 0)
    } finally q.stop()
    assert(batches >= 3, s"expected >= 3 micro-batches, got $batches")

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))
    }.toSet

    val streamed = rows(TimeSeriesQueries.counterRollup(
      spark.table("ctr_stream"), "user_id"))
    val batch = rows(TimeSeriesQueries.counterRateOn(
      spark.read.parquet(dir)
        .select(col("user_id"), col("event_id"),
          expr("ts_ns div 1000").as("ts_us"),
          round(col("value") * 100).cast("bigint").as("c")),
      "user_id", "event_id", "ts_us", "c"))
    assert(batch.nonEmpty, "empty batch twin — the gate tested nothing")
    assert(streamed == batch,
      s"streaming diverged: ${streamed.size} vs ${batch.size} rows; " +
        s"only-stream=${(streamed -- batch).take(3)} " +
        s"only-batch=${(batch -- streamed).take(3)}")
  }
}
