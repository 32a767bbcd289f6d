package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.{GramHashes, XHash}

/** d12 exact repeated-substring spans: semantics on planted corpora (the
  * Lee et al. substring-dedup behaviors — cross-doc quotes, intra-doc
  * repetition, span merge/split), plus bit-parity of the native
  * [[GramHashes]] expression against both the declarative Spark chain and
  * the JVM-side [[XHash.hash60Local]] it must reproduce.
  */
class SubstringSpanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val L = DedupQueries.SpanGram // 8

  private def spans(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    DedupQueries.substringSpans(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
  }

  // unique filler tokens so only the planted phrases repeat
  private def uniq(doc: Int, n: Int, tag: String = "u"): Seq[String] =
    (0 until n).map(i => s"$tag${doc}x$i")

  test("cross-doc quote: the shared phrase becomes one exact span in both docs") {
    val phrase = (0 until 15).map(i => s"p$i") // 15 tokens -> 8 dup windows
    val a = (uniq(0, 10) ++ phrase ++ uniq(0, 10, "v")).mkString(" ")
    val b = (phrase ++ uniq(1, 20)).mkString(" ")
    val c = uniq(2, 30).mkString(" ") // no repeats -> no rows
    val got = spans(Seq((1L, a), (2L, b), (3L, c)))
    // doc 1: phrase at tokens [10, 25); dup windows at pos 10..17
    // doc 2: phrase at tokens [0, 15); dup windows at pos 0..7
    assert(got == Set(
      (1L, 10L, 25L, 15L, 8L),
      (2L, 0L, 15L, 15L, 8L)), got.toString)
  }

  test("intra-doc back-to-back repetition merges into one contiguous span") {
    // P P within one doc: copies at [0,15) and [15,30). Dup windows are
    // 0..7 (copy1) and 15..22 (copy2) — junction-straddling grams occur
    // once. Gap 15-7 = 8 = L: touching windows MERGE (the union [0,30) is
    // contiguously covered), one span over both copies.
    val phrase = (0 until 15).map(i => s"q$i")
    val doc = (phrase ++ phrase ++ uniq(0, 10)).mkString(" ")
    val got = spans(Seq((1L, doc)))
    assert(got == Set((1L, 0L, 30L, 30L, 16L)), got.toString)
  }

  test("gap wider than L splits spans; short docs never emit") {
    // same 15-token phrase twice in doc 1, separated by 17 unique tokens:
    // dup windows 0..7 and 32..39, gap 25 > L -> two spans
    val phrase = (0 until 15).map(i => s"r$i")
    val doc1 = (phrase ++ uniq(0, 17) ++ phrase).mkString(" ")
    // doc 2 shares the phrase (so doc 1's windows are cross-doc dups too)
    // but is only 7 tokens long -> below one window, contributes nothing
    val doc2 = phrase.take(7).mkString(" ")
    val got = spans(Seq((1L, doc1), (2L, doc2)))
    assert(got == Set(
      (1L, 0L, 15L, 15L, 8L),
      (1L, 32L, 47L, 15L, 8L)), got.toString)
  }

  test("GramHashes: bit-parity with the declarative chain and hash60Local") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "exactly eight little tokens sit right in here", // 8 -> one gram
      "short doc", // < L -> empty
      "", // split('') = [''] -> empty
      "Mixed CASE and  double  space tokens here for the lowercase path"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val toks = split(lower(col("text")), " ")
    val declarative = when(size(toks) >= L,
      transform(sequence(lit(0), size(toks) - L),
        i => XHash.hash60(array_join(slice(toks, i + lit(1), lit(L)), " "))))
      .otherwise(array().cast("array<long>"))
    val rows = docs.select(col("doc_id"),
      GramHashes(col("text"), L).as("native"), declarative.as("decl"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"doc ${r.getLong(0)}: native != declarative")
    }
    // and against the JVM-side reference hash on a known gram
    val gram = "the quick brown fox jumps over the lazy"
    val h = spark.range(1).select(
      GramHashes(lit("the quick brown fox jumps over the lazy dog"), L))
      .head().getSeq[Long](0)
    assert(h.head == XHash.hash60Local(gram))
  }
}
