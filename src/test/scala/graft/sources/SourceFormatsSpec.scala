package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Source/sink breadth: the same events slice survives round-trips through
  * every built-in columnar/text format with identical query results
  * (int64 ns timestamps intact — the engine's data-model invariant). */
class SourceFormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("csv / json / orc / parquet round-trips preserve query results") {
    val events = Tables.events(spark, sf)
      .select("event_id", "ts_ns", "user_id", "event_type", "value")
    val expected = events
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), min("ts_ns").as("mn"), max("ts_ns").as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    def roundTrip(fmt: String): Set[(String, Long, Long, Long)] = {
      val dir = Files.createTempDirectory(s"graft_src_$fmt").toString + "/data"
      val w = events.write.mode("overwrite").format(fmt)
      (if (fmt == "csv") w.option("header", "true") else w).save(dir)
      val r = spark.read.format(fmt)
      val read =
        if (fmt == "csv") r.option("header", "true").schema(events.schema).load(dir)
        else r.load(dir)
      read.groupBy("event_type")
        .agg(count(lit(1)).as("n"), min("ts_ns").as("mn"), max("ts_ns").as("mx"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    }
    Seq("parquet", "orc", "json", "csv").foreach { fmt =>
      assert(roundTrip(fmt) == expected, s"format $fmt")
    }
  }

  test("registered SQL functions work from plain SQL") {
    val got = spark.sql(
      "SELECT long_array_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d, " +
        "graft_hash60('hello') AS h").head
    assert(got.getLong(0) == 32L)
    assert(got.getLong(1) == 419982666956583591L)
  }
}
