package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-encoding regression gate (round-6 verdict #2): the driver corpus
  * has shipped `events.ts` as BOTH parquet timestamp[ns] (read as int64 ns
  * under nanosAsLong) and parquet timestamp[us] (TIMESTAMP / TIMESTAMP_NTZ).
  * Tables.events must adapt every encoding to one int64-ns `ts_ns` contract
  * so this class of environment drift fails HERE, in `sbt test`, not in the
  * driver's bench. */
class EventsEncodingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // µs-aligned instants (a µs corpus cannot carry sub-µs precision), spanning
  // an epoch second boundary and a negative-epoch value
  private val tsNs = Seq(1735689600123456000L, 1735689601000000000L,
    999999999000L, -1000000L)

  private def writeCorpus(tsCol: String => org.apache.spark.sql.Column): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_events_enc").toString
    tsNs.zipWithIndex
      .map { case (ns, i) => (i.toLong, ns, i.toLong % 2, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .select(col("event_id"), tsCol("ts").as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def loadPairs(dir: String): Seq[(Long, Long)] =
    Tables.events(spark, dir)
      .select("event_id", "ts_ns").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

  test("ns-long, µs-timestamp and µs-timestamp_ntz corpora yield identical ts_ns") {
    val asLong = writeCorpus(c => col(c))                         // int64 ns
    val asTs = writeCorpus(c => timestamp_micros((col(c) / lit(1000L)).cast("long"))) // timestamp[us] UTC
    val asNtz = writeCorpus(c =>                                  // timestamp[us] NTZ
      timestamp_micros((col(c) / lit(1000L)).cast("long")).cast("timestamp_ntz"))

    val expected = tsNs.zipWithIndex.map { case (ns, i) => (i.toLong, ns) }
    for ((dir, label) <- Seq(asLong -> "int64-ns", asTs -> "timestamp[us]",
                             asNtz -> "timestamp_ntz[us]")) {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts_ns").dataType == LongType, s"$label: ts_ns type")
      assert(ev.columns.toSeq ==
        Seq("event_id", "ts_ns", "user_id", "event_type", "value", "props"),
        s"$label: column order must be preserved")
      assert(loadPairs(dir) == expected, s"$label: ts_ns values")
    }
  }

  test("eventsBetween agrees across encodings, incl. non-µs-aligned ns bounds") {
    val dirs = Seq(
      writeCorpus(c => col(c)) -> "int64-ns",
      writeCorpus(c => timestamp_micros((col(c) / lit(1000L)).cast("long"))) -> "timestamp[us]",
      writeCorpus(c => timestamp_micros((col(c) / lit(1000L)).cast("long"))
        .cast("timestamp_ntz")) -> "timestamp_ntz[us]")
    // lo sits 1 ns ABOVE the first instant (must exclude it — ceil-div,
    // not floor), hi 1 ns above the second (must include it)
    val lo = tsNs.min + 1L
    val hi = tsNs.sorted.apply(1) + 1L
    val expected = tsNs.zipWithIndex
      .collect { case (ns, i) if ns >= lo && ns < hi => i.toLong }.sorted
    for ((dir, label) <- dirs) {
      val got = Tables.eventsBetween(spark, dir, lo, hi)
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == expected, s"$label: eventsBetween [$lo,$hi) -> $got")
    }
  }

  test("the shipped corpus loads under the ts_ns contract") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts_ns").dataType == LongType)
    assert(ev.filter(col("ts_ns") > 0L).count() > 0L)
  }
}
