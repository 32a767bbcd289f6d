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

  test("schema evolution: mergeSchema unions evolving parquet footers") {
    // the reference unions files with schema-from-footers and no evolution
    // story (SURVEY.md §1.1); ours: additive evolution via mergeSchema
    val dir = Files.createTempDirectory("graft_evolve").toString + "/data"
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "name").write.mode("append").parquet(dir)
    Seq((2L, "b", 9.5)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "name", "score"))
    val rows = merged.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(rows.toSeq == Seq((1L, "a", None), (2L, "b", Some(9.5))))
  }

  test("registered SQL functions work from plain SQL") {
    val got = spark.sql(
      "SELECT long_array_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d, " +
        "graft_hash60('hello') AS h, " +
        "word_shingles('a b c d', 3) AS sh").head
    assert(got.getLong(0) == 32L)
    assert(got.getLong(1) == 419982666956583591L)
    assert(got.getSeq[String](2) == Seq("a b c", "b c d"))
  }
}
