package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Generative properties for the native winnowing expression, beyond the
  * single oracle example: (1) it equals an independently-written
  * straight-line reference implementation on random word sequences
  * (including duplicate-heavy ones that exercise the rightmost
  * tie-break), and (2) the Schleimer guarantee — every window of w grams
  * contains a selected position — holds on every trial.
  */
class WinnowPicksProps extends AnyFunSuite {
  private val N = 3
  private val W = 4
  private val Trials = 300

  private def hash60(s: String): Long = XHash.hash60Local(s)

  /** Reference semantics, written independently of the expression: all
    * (pos, fp) window argmins (rightmost on ties), globally distinct. */
  private def reference(words: Seq[String]): Seq[(Long, Long)] = {
    val grams = words.sliding(N).map(_.mkString(" ")).toVector
    if (grams.length < W) return Nil
    val hs = grams.map(hash60)
    val picks = (0 to grams.length - W).map { s =>
      val win = (s until s + W)
      // rightmost index attaining the window minimum
      val j = win.maxBy(i => (-hs(i), i))
      ((j + 1).toLong, hs(j))
    }
    picks.distinct
  }

  private def native(words: Seq[String]): Seq[(Long, Long)] = {
    val arr = WinnowPicks.compute(
      UTF8String.fromString(words.mkString(" ")), N, W)
    (0 until arr.numElements()).map { i =>
      val row = arr.get(i, null).asInstanceOf[InternalRow]
      (row.getLong(0), row.getLong(1))
    }
  }

  test("native equals the reference on random word sequences") {
    val rnd = new scala.util.Random(7)
    // tiny vocabulary on purpose: repeated grams → repeated hashes →
    // the rightmost tie-break actually fires
    val vocab = Vector("a", "b", "c", "aa", "bb")
    (1 to Trials).foreach { _ =>
      val n = rnd.nextInt(30)
      val words = Seq.fill(n)(vocab(rnd.nextInt(vocab.length)))
      assert(native(words) == reference(words), s"words=$words")
    }
  }

  test("the winnowing guarantee: every window of w grams has a pick") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("x", "y", "z", "q", "r", "s", "t")
    (1 to Trials).foreach { _ =>
      val n = 6 + rnd.nextInt(40)
      val words = Seq.fill(n)(vocab(rnd.nextInt(vocab.length)))
      val grams = words.sliding(N).size
      val picks = native(words).map(_._1 - 1).toSet // 0-based gram index
      (0 to grams - W).foreach { s =>
        assert((s until s + W).exists(i => picks.contains(i.toLong)),
          s"window [$s, ${s + W}) has no pick; words=$words")
      }
    }
  }

  test("lowercasing and empty-token handling match the tokenizer contract") {
    // "A  b" splits to ["a", "", "b"] — empty tokens are KEPT (split -1)
    val mixed = native(Seq("A", "", "b", "C", "dd", "E", "ff", "G"))
    val lower = native(Seq("a", "", "b", "c", "dd", "e", "ff", "g"))
    assert(mixed == lower && mixed.nonEmpty)
  }
}
