package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `bands` sign-LSH band signatures of a quantized vector in ONE
  * native codegen'd loop: sig[b] = Σ_j (q · w[b][j] > 0 ? 1<<j : 0).
  *
  * The previous formulation unrolled bands × rowBits literal-weight dot
  * products into a single projection expression; at auto-banded widths
  * (50 bands × 20 bits at the 100× octave) the generated method crossed
  * janino's 64 KB limit and the whole stage silently ran interpreted
  * (~2× slower — BENCH_NOTES 100× finding #2, r4 verdict next-round #3).
  * Here the flattened weight tensor is attached as a REFERENCED OBJECT
  * (`ctx.addReferenceObj`), not program text, and the generated code is a
  * fixed ~20-line triple loop — O(1) code size in bands, rowBits and dim,
  * under the method limit at any auto-banded configuration.
  *
  * Weight layout: `weights[(b·rowBits + j)·dim + i]` = component i of the
  * hyperplane for band b, bit j. Semantics (dot over min(len, dim),
  * strict `> 0` sign test, bit j = 1L << j) are identical to the unrolled
  * `when(LongArrayDot(q, lit(w)) > 0, 1L << j)` chain, so the DuckDB
  * oracle twin is unchanged.
  */
case class BandedSignatures(child: Expression, weights: Array[Long],
    bands: Int, rowBits: Int) extends UnaryExpression {
  require(bands > 0 && rowBits > 0 && rowBits <= 62,
    s"banded_signatures needs bands > 0 and rowBits in [1, 62], " +
      s"got $bands x $rowBits")
  require(weights.length % (bands * rowBits) == 0 && weights.length > 0,
    s"weights length ${weights.length} is not bands x rowBits x dim")

  private val dim = weights.length / (bands * rowBits)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"banded_signatures needs an array<bigint> input, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "banded_signatures"
  override def toString: String =
    s"banded_signatures($child, ${bands}x$rowBits)"

  override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    val n = math.min(q.numElements(), dim)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var j = 0
      while (j < rowBits) {
        val off = (b * rowBits + j) * dim
        var s = 0L
        var i = 0
        while (i < n) { s += q.getLong(i) * weights(off + i); i += 1 }
        if (s > 0) sig |= (1L << j)
        j += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, q => {
      val w = ctx.addReferenceObj("bandWeights", weights, "long[]")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      val off = ctx.freshName("off")
      s"""
         |int $n = java.lang.Math.min($q.numElements(), $dim);
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $sig = 0L;
         |  for (int $j = 0; $j < $rowBits; $j++) {
         |    int $off = ($b * $rowBits + $j) * $dim;
         |    long $s = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $q.getLong($i) * $w[$off + $i];
         |    }
         |    if ($s > 0) $sig |= (1L << $j);
         |  }
         |  $out[$b] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BandedSignatures =
    copy(child = newChild)
}

object BandedSignatures {
  def apply(q: Column, weights: Array[Long], bands: Int, rowBits: Int): Column =
    columnOf(BandedSignatures(expressionOf(q), weights, bands, rowBits))
}
