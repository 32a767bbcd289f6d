package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** SpaceOut ≡ trim(regexp_replace(word, '(.)', '$1 ')) — the r16 BPE
  * seed rewrite's exactness gate, on the corpus vocabulary plus the
  * adversarial cases where a per-char loop could diverge from the Java
  * regex engine: code points above the BMP ('.' matches a CODE POINT),
  * line terminators ('.' does not match \n \r U+0085 U+2028 U+2029,
  * so they get no trailing space), empties and space-adjacent trims. */
class SpaceOutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def regexTwin = trim(regexp_replace(col("w"), "(.)", "$1 "))

  test("corpus vocabulary: native equals the regex form") {
    val words = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(lower(col("text")), " ")).as("w"))
    val diff = words
      .select(col("w"), SpaceOut(col("w")).as("a"), regexTwin.as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.isEmpty, s"diverged: ${diff.take(5).mkString(", ")}")
  }

  test("adversarial inputs: surrogates, line terminators, empties") {
    import spark.implicits._
    val cases = Seq("", "a", "ab", "héllo", "日本語", "a\nb", "\n", "x\ry",
      "ab", "p q", "r s", "😀ok", "😀",
      "mixé😀\nz", "trailing\n", "\nleading")
    val df = cases.toDF("w")
      .select(col("w"), SpaceOut(col("w")).as("a"), regexTwin.as("b"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"input ${r.getString(0).map(_.toInt.toHexString)}: " +
          s"native '${r.getString(1)}' vs regex '${r.getString(2)}'")
    }
  }
}
