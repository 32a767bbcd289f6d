package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType}

/** Byte-packed bucket-count digest of a hashed shingle set — the compact
  * "suffix content" the d11 containment join's digest filter compares
  * BEFORE shipping full shingle arrays to the verify (PPJoin+'s suffix
  * filter, Xiao et al. WWW'08, re-expressed for a dataflow engine: a
  * value-partitioned upper bound on the unmatched tail's possible
  * overlap, computed from per-doc state instead of per-pair recursion).
  *
  * 128 buckets over the 60-bit hash space (bucket = h >>> 53), one
  * SATURATING unsigned byte counter each: 128 bytes per doc vs ~8·|set|
  * for the full array. Saturation keeps the digest sound for any doc
  * size — see [[HistMinSum]].
  */
case class ShingleHist(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hist needs array<bigint> input, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "shingle_hist"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val out = new Array[Byte](128)
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val b = ((x.getLong(i) >>> 53) & 127L).toInt
      if (out(b) != -1) out(b) = (out(b) + 1).toByte // -1 == 0xFF == saturated
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val out = ctx.freshName("out")
      s"""
         |byte[] $out = new byte[128];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  int $b = (int) (($a.getLong($i) >>> 53) & 127L);
         |  if ($out[$b] != (byte) -1) $out[$b] = (byte) ($out[$b] + 1);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): ShingleHist =
    copy(child = c)
}

object ShingleHist {
  def apply(hs: Column): Column = columnOf(ShingleHist(expressionOf(hs)))
}

/** Upper bound on |A ∩ B| from two [[ShingleHist]] digests:
  * Σ_i min(cntA_i, cntB_i) — intersection elements in bucket i number at
  * most the smaller of the two bucket counts, so any pair whose bound
  * falls below the verify's minimum qualifying intersection provably
  * fails the verify and is pruned without ever shipping its full sets.
  *
  * Returns -1 ("no bound — pass the pair through") when any bucket is
  * saturated on BOTH sides: a capped counter under-states its true
  * count, and min(cap, cap) could under-state the true min — the one
  * case the digest cannot bound soundly. One-sided saturation is fine:
  * min(true_a ≥ 255, b) = b exactly. With 128 uniform md5 buckets a doc
  * needs ~10k+ shingles to saturate at all.
  */
case class HistMinSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hist_min_sum needs binary inputs, got ${l.sql} / ${r.sql}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hist_min_sum"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var s = 0
    var i = 0
    while (i < n) {
      val xa = x(i) & 0xFF
      val yb = y(i) & 0xFF
      if (xa == 255 && yb == 255) return -1
      s += math.min(xa, yb)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val xa = ctx.freshName("xa")
      val yb = ctx.freshName("yb")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |int $s = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  int $xa = $a[$i] & 0xFF;
         |  int $yb = $b[$i] & 0xFF;
         |  if ($xa == 255 && $yb == 255) { $s = -1; break; }
         |  $s += java.lang.Math.min($xa, $yb);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HistMinSum =
    copy(left = newLeft, right = newRight)
}

object HistMinSum {
  def apply(a: Column, b: Column): Column =
    columnOf(HistMinSum(expressionOf(a), expressionOf(b)))
}
