package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** NfcNormalize: canonical composition happens, compatibility folding
  * does NOT, the already-normalized fast path allocates nothing, and the
  * codegen'd column path agrees with the direct compute. Every non-ASCII
  * character is spelled as a backslash-u escape so the test cannot be
  * corrupted by an editor normalizing source bytes. */
class NfcNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def norm(s: String): String =
    NfcNormalize.compute(UTF8String.fromString(s)).toString

  test("composes decomposed sequences (UAX #15 canonical composition)") {
    assert(norm("e" + "\u0301") == "\u00E9") // e + acute -> e-acute
    assert(norm("A" + "\u030A") == "\u00C5") // A + ring -> A-ring
    assert(norm("o" + "\u0308") == "\u00F6") // o + diaeresis -> o-umlaut
    assert(norm("cafe" + "\u0301" + " menu") == "caf\u00E9 menu")
  }

  test("NFC, not NFKC: the fi ligature and other compat chars survive") {
    assert(norm("\uFB01n") == "\uFB01n") // fi ligature untouched
    assert(norm("\u00B2") == "\u00B2")   // superscript two untouched
  }

  test("already-NFC input returns the SAME UTF8String instance (no alloc)") {
    val in = UTF8String.fromString("plain ascii text, caf\u00E9 included")
    assert(NfcNormalize.compute(in) eq in)
  }

  test("idempotent and codepoint-monotone on mixed content") {
    val samples = Seq("", " ", "\u00E9" + "e\u0301", "a\u0308\u0301",
      "s\u0323\u0307", "ascii only")
    samples.foreach { s =>
      val once = norm(s)
      assert(norm(once) == once,
        s"idempotence on ${s.map(c => f"u+${c.toInt}%04X").mkString(" ")}")
      assert(once.codePointCount(0, once.length) <=
        s.codePointCount(0, s.length))
    }
    // the canonical multi-mark case: s + dot-below + dot-above composes
    // to the single codepoint U+1E69
    assert(norm("s\u0323\u0307") == "\u1E69")
  }

  test("column path (codegen) agrees with compute, nulls pass through") {
    val df = Seq(Some("e\u0301 x"), Some("plain"), None).toDF("t")
      .select(NfcNormalize(col("t")).as("n"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("\u00E9 x"), Some("plain"), None))
    // registered SQL name too (GraftFunctions)
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT nfc_normalize('e' || '\u0301')").head().getString(0)
      == "\u00E9")
  }
}
