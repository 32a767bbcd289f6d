package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** ClickHouse-named aliases (GraftFunctions/GraftExtensions): CH
  * semantics where they diverge from Spark's own functions, plus the
  * literal-separator escaping in splitByChar. q43_ch_aliases covers the
  * full surface against the DuckDB oracle; these pin the corner cases.
  */
class ChAliasSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    GraftFunctions.register(s)
    s
  }

  private def one[T](sql: String): T =
    spark.sql(sql).head.get(0).asInstanceOf[T]

  test("date helpers: toYYYYMM / toYYYYMMDD / toStartOfMonth") {
    assert(one[Int]("SELECT toYYYYMM(toDate('2024-03-15'))") == 202403)
    assert(one[Int]("SELECT toYYYYMMDD(toDate('2024-03-15'))") == 20240315)
    assert(one[java.sql.Date](
      "SELECT toStartOfMonth(toDate('2024-03-15'))").toString == "2024-03-01")
  }

  test("toDayOfWeek is Monday=1 (ClickHouse), not Sunday=1 (Spark)") {
    // 2024-03-18 is a Monday, 2024-03-24 a Sunday
    assert(one[Int]("SELECT toDayOfWeek(toDate('2024-03-18'))") == 1)
    assert(one[Int]("SELECT toDayOfWeek(toDate('2024-03-24'))") == 7)
  }

  test("splitByChar takes the separator first and splits literally") {
    // '.' must be treated as a char, not a regex wildcard
    assert(spark.sql("SELECT splitByChar('.', 'a.b.c')")
      .head.getSeq[String](0) == Seq("a", "b", "c"))
  }

  test("indexOf returns position or 0 when absent; empty/notEmpty") {
    assert(one[Long]("SELECT indexOf(array(10, 20, 30), 20)") == 2L)
    assert(one[Long]("SELECT indexOf(array(10, 20, 30), 99)") == 0L)
    assert(one[Boolean]("SELECT empty('')"))
    assert(one[Boolean]("SELECT notEmpty('x')"))
  }

  test("JSON extraction + ifNull") {
    assert(one[String](
      """SELECT JSONExtractString('{"a": "hi", "k": 7}', 'a')""") == "hi")
    assert(one[Long](
      """SELECT JSONExtractInt('{"k": 7}', 'k')""") == 7L)
    assert(one[String](
      """SELECT ifNull(JSONExtractString('{}', 'zz'), 'none')""") == "none")
  }

  test("word_shingles rejects a non-literal or non-integer n clearly") {
    val nonLiteral = intercept[Exception] {
      spark.sql("SELECT word_shingles(text, n) FROM (SELECT 'a b' AS text, 3 AS n)")
    }
    assert(nonLiteral.getMessage.contains("integer literal"),
      s"got: ${nonLiteral.getMessage}")
    val nonInteger = intercept[Exception] {
      spark.sql("SELECT word_shingles('a b c d', 2.5)")
    }
    assert(nonInteger.getMessage.contains("integer literal"),
      s"got: ${nonInteger.getMessage}")
  }

  test("GraftExtensions injects the same surface at session build time") {
    val names = GraftFunctions.functions.map(_._1)
    assert(names.contains("toYYYYMM") && names.contains("splitByChar") &&
      names.contains("long_array_dot"))
  }
}
