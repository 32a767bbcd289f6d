package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** ts12: the unrolled 8-lag filter weights must be exactly the Holt
  * recursion's, and the truncated forecast must track the full
  * sequential recursion within the documented tail mass. */
class HoltSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("weight table is the exact matrix-power sequence; mass sums to 65536 minus tail") {
    assert(TimeSeriesQueries.HoltWeights ==
      Seq(49152L, 28672L, 11264L, -256L, -5952L, -7312L, -6164L, -4049L))
    assert(TimeSeriesQueries.HoltWeights.sum == 65536L - 181L)
  }

  test("truncated filter tracks the full sequential Holt recursion") {
    // full recursion on a trending series with noise
    val xs = (1 to 40).map(i => 100.0 * i + (if (i % 3 == 0) 50 else -30))
    var l = xs.head; var b = 0.0
    val full = xs.tail.map { x =>
      val l1 = 0.5 * x + 0.5 * (l + b)
      b = 0.5 * (l1 - l) + 0.5 * b
      l = l1
      l + b
    }
    // truncated filter at position i (0-based in xs, needs 7 lags)
    val w = TimeSeriesQueries.HoltWeights.map(_.toDouble / 65536.0)
    // start past the init transient: the state matrix's spectral radius
    // is sqrt(1/2), so the l0/b0 imprint decays ~0.707^i (6% at i=8,
    // <2% from i=12)
    (12 until xs.length).foreach { i =>
      val trunc = (0 until 8).map(j => w(j) * xs(i - j)).sum
      val fullV = full(i - 1)
      assert(math.abs(trunc - fullV) / math.abs(fullV) < 0.05,
        s"i=$i trunc=$trunc full=$fullV")
    }
  }

  test("forecast leads the EWMA on a pure trend (the reason ts12 exists)") {
    // on x_i = i the Holt forecast reproduces the trend almost exactly,
    // while a flat EWMA lags by ~the smoothing window
    val w = TimeSeriesQueries.HoltWeights.map(_.toDouble / 65536.0)
    val i = 100.0
    val holt = (0 until 8).map(j => w(j) * (i - j)).sum
    val ewmaW = (0 until 8).map(j => (1L << (7 - j)).toDouble / 255.0)
    val ewma = (0 until 8).map(j => ewmaW(j) * (i - j)).sum
    assert(math.abs(holt - i) < 1.0, s"holt $holt should track $i")
    assert(i - ewma > 0.9, s"ewma $ewma lags the trend")
  }
}

/** s7: maximum-inner-product ordering genuinely differs from cosine on
  * unnormalized vectors — the case that makes MIPS its own operator. */
class MipsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("MIPS prefers the long vector where cosine prefers the aligned one") {
    // query 0 = [1, 0]; neighbor 10 = [5, 5] (long, 45 degrees),
    // neighbor 11 = [0.9, 0] (short, perfectly aligned)
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (10L, Array(5.0f, 5.0f)),
      (11L, Array(0.9f, 0.0f)))
      .toDF("vec_id", "embedding")
    val mips = SimilarityQueries.mipsTopK(emb, nQueries = 1, topK = 2)
      .collect().sortBy(_.getLong(2)).map(_.getLong(1)).toSeq
    val cos = SimilarityQueries.cosineTopK(emb, nQueries = 1, topK = 2)
      .collect().sortBy(_.getLong(2)).map(_.getLong(1)).toSeq
    assert(mips == Seq(10L, 11L), s"MIPS ranks the long vector first: $mips")
    assert(cos == Seq(11L, 10L), s"cosine ranks the aligned vector first: $cos")
  }
}
