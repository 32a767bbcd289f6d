package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.queries.TimeSeriesQueries

/** ts15's streaming twin must equal the batch operator exactly: bucket
  * counts are mergeable per-(series, hour) state, so the LATEST emitted
  * count per (key, bucket) — counts are monotone — fed through the SAME
  * interpolation half reproduces batch ts15 on the same data. Three
  * time-split files → three micro-batches; hours that straddle a file
  * cut only come out right if cross-batch state accumulation works.
  */
class StreamingHistogramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("streaming bucket state + shared interpolation equal batch ts15") {
    val dir = Files.createTempDirectory("graft_hist_stream").toString
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("ts_ns"), col("value"))
    val Array(lo, hi) = ev.agg(min(col("ts_ns")), max(col("ts_ns")))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val (c1, c2) = (lo + (hi - lo) / 3, lo + 2 * ((hi - lo) / 3))
    ev.filter(col("ts_ns") < c1).coalesce(1).write.mode("append").parquet(dir)
    ev.filter(col("ts_ns") >= c1 && col("ts_ns") < c2).coalesce(1)
      .write.mode("append").parquet(dir)
    ev.filter(col("ts_ns") >= c2).coalesce(1).write.mode("append").parquet(dir)

    val stream = StreamHistogram.buckets(
      spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir))
    val q = stream.toDF().writeStream
      .outputMode("append").format("memory").queryName("hist_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ckpt_hist").toString)
      .start()
    val batches = try {
      q.processAllAvailable()
      q.recentProgress.count(_.numInputRows > 0)
    } finally q.stop()
    assert(batches >= 3, s"expected >= 3 micro-batches, got $batches")

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2),
        (3 to 5).map(i => if (r.isNullAt(i)) None else Some(r.getDouble(i))))
    }.toSet

    // counts per (key, bucket) are monotone across batches: the final
    // state is the max emission
    val finalBuckets = spark.table("hist_stream")
      .groupBy(col("event_type"), col("hour"), col("b"))
      .agg(max(col("cnt")).as("cnt"))
    val streamed = rows(TimeSeriesQueries.quantilesFromBuckets(
      finalBuckets, Seq("event_type", "hour")))
    val batch = rows(TimeSeriesQueries.histogramQuantileOn(
      spark.read.parquet(dir)
        .select(col("event_type"),
          expr(s"(ts_ns div 1000) div ${TimeSeriesQueries.HourUs}").as("hour"),
          round(col("value") * 100).cast("bigint").as("c")),
      Seq("event_type", "hour"), "c"))
    assert(batch.nonEmpty, "empty batch twin — the gate tested nothing")
    assert(streamed == batch,
      s"streaming diverged: ${streamed.size} vs ${batch.size} rows; " +
        s"only-stream=${(streamed -- batch).take(3)} " +
        s"only-batch=${(batch -- streamed).take(3)}")
  }
}
