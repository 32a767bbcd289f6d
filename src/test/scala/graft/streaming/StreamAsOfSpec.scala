package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.AsOf

/** Streaming point-in-time enrichment ≡ its batch twin, batch-boundary
  * independent (the operator is stateless per row, so HOW the stream is
  * chopped into micro-batches must not matter), plus the loud guard on
  * an unstreamable build size.
  */
class StreamAsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = 1737928800L * 1000000000L // ns epoch > 2^53

  test("stream enrichment equals batch as-of, across micro-batch splits") {
    // probe: 60 events over 3 keys; build: 12 quotes at staggered times
    val probeRows = (0 until 60).map(i =>
      (i.toLong % 3, base + i.toLong * 1000000000L, 1000L + i))
    val buildRows = (0 until 12).map(j =>
      (j.toLong % 3, base + j.toLong * 5000000000L + 1L, 7000L + j))
    val build = buildRows.toDF("key", "ts", "value")

    val expected = AsOf.broadcastProbe(spark,
        probeRows.toDF("key", "ts", "id"), build, "key", "ts", "id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet

    // file stream with maxFilesPerTrigger=1: two files = two micro-batches,
    // proving batch-boundary independence
    val dir = Files.createTempDirectory("graft_asof_stream").toString
    probeRows.take(25).toDF("key", "ts", "id")
      .coalesce(1).write.mode("append").parquet(dir)
    probeRows.drop(25).toDF("key", "ts", "id")
      .coalesce(1).write.mode("append").parquet(dir)
    val probeStream = spark.readStream
      .schema("key LONG, ts LONG, id LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

    val streamed = EventStreams.runToMemory(spark,
        StreamAsOf.enrich(spark, probeStream, build, "key", "ts", "id", "value"),
        "asof_enrich")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet
    assert(streamed == expected)
    assert(streamed.exists(_._4.isEmpty),
      "fixture must include probe rows before any build row (null value)")
    assert(streamed.exists(_._4.nonEmpty))
  }

  test("oversized build throws the actionable error, not an opaque plan failure") {
    val dir = Files.createTempDirectory("graft_asof_stream2").toString
    Seq((1L, base, 1L)).toDF("key", "ts", "id")
      .write.mode("append").parquet(dir)
    val probeStream = spark.readStream
      .schema("key LONG, ts LONG, id LONG").parquet(dir)
    val build = (0 until 10).map(j => (j.toLong, base + j, j.toLong))
      .toDF("key", "ts", "value")
    val e = intercept[IllegalArgumentException] {
      StreamAsOf.enrich(spark, probeStream, build,
        "key", "ts", "id", "value", maxBuildRows = 5)
    }
    assert(e.getMessage.contains("interval join"))
  }
}
