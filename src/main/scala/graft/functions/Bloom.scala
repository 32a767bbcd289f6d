package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}
import org.apache.spark.sql.Encoders

/** Bloom filter over int64 gram hashes — the decontamination prefilter
  * for eval suites too large to broadcast as raw gram sets (d13).
  *
  * A benchmark suite of 10^9 distinct n-grams is ~8 GB as raw hashes —
  * far over any broadcast budget — but 2^27 bloom BITS (16 MB) still
  * gives ~1% false positives at that cardinality (k=4, m/n ≈ 134/10^9
  * per-slot load ~7.5). False positives only cost exact-verify work;
  * false negatives are impossible, so `bloom-prefilter → exact join`
  * returns EXACTLY the exact join's rows — the oracle stays the plain
  * exact SQL and the gate proves the identity end to end.
  *
  * Double hashing (Kirsch–Mitzenmacher): position_i = h1 + i·h2 mod m
  * with h2 forced odd and m a power of two, so the k probes hit k
  * distinct slots. The mixer is splitmix64's finalizer — gram hashes are
  * md5-60 (already uniform), the mix only decorrelates h2 from h1.
  */
object Bloom {
  val DefaultBits: Int = 1 << 20 // 128 KB — sized for the test corpus
  val K: Int = 4

  def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def set(words: Array[Long], gh: Long): Unit = {
    val m = words.length << 6
    val h2 = mix(gh) | 1L
    var i = 0
    while (i < K) {
      val pos = ((gh + i * h2) & (m - 1)).toInt
      words(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  def contains(words: ArrayData, gh: Long): Boolean = {
    val nWords = words.numElements()
    val m = nWords << 6
    val h2 = mix(gh) | 1L
    var i = 0
    while (i < K) {
      val pos = ((gh + i * h2) & (m - 1)).toInt
      if ((words.getLong(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Aggregation buffer/output wrapper (product encoder → columnar). */
final case class BloomWords(words: Array[Long])

/** Builds the bloom bitset as a partial-aggregatable typed Aggregator:
  * each map task ORs its grams into a local bitset, the exchange carries
  * one bitset per partition, merge is wordwise OR — shuffle volume is
  * partitions × m/8 bytes, independent of eval-set size. */
final class BloomAgg(bits: Int) extends Aggregator[Long, BloomWords, BloomWords] {
  require(bits >= 64 && (bits & (bits - 1)) == 0,
    s"bloom bits must be a power of two >= 64, got $bits")

  override def zero: BloomWords = BloomWords(new Array[Long](bits >>> 6))
  override def reduce(b: BloomWords, gh: Long): BloomWords = {
    Bloom.set(b.words, gh); b
  }
  override def merge(x: BloomWords, y: BloomWords): BloomWords = {
    val w = x.words; val v = y.words
    var i = 0
    while (i < w.length) { w(i) |= v(i); i += 1 }
    x
  }
  override def finish(b: BloomWords): BloomWords = b
  override def bufferEncoder = Encoders.product[BloomWords]
  override def outputEncoder = Encoders.product[BloomWords]
}

object BloomAgg {
  def agg(bits: Int = Bloom.DefaultBits): UserDefinedFunction =
    udaf(new BloomAgg(bits), Encoders.scalaLong)
}

/** Membership probe against a [[BloomAgg]] bitset — one generated call
  * into the shared k-probe loop, never a false negative. */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(LongType, containsNull = false) ||
      left.dataType == ArrayType(LongType, containsNull = true)) {
      if (right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"bloom_contains needs a long probe, got ${right.dataType.sql}")
    } else TypeCheckResult.TypeCheckFailure(
      s"bloom_contains needs array<bigint> bits, got ${left.dataType.sql}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def nullSafeEval(words: Any, gh: Any): Any =
    Bloom.contains(words.asInstanceOf[ArrayData], gh.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, g) =>
      s"${ev.value} = graft.functions.Bloom.contains($w, $g);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BloomContains = copy(left = newLeft, right = newRight)
}

object BloomContains {
  def apply(words: Column, gh: Column): Column =
    columnOf(BloomContains(expressionOf(words), expressionOf(gh)))
}
