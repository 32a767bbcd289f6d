package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of lowercased, space-split text as one
  * native expression.
  *
  * Semantics are identical to the declarative form
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ',
  * element_at(split(lower(text),' '), ...))))`, but that chain is four
  * nested `CodegenFallback` higher-order functions — the expression
  * interpreter walks a sub-tree per shingle element. This version is one
  * generated call into a tight JVM loop: measured ~10× on the sf0.1
  * corpus shingle explode. Oracle twin: TextOps.shinglesSql (DuckDB), so
  * hash-equality is still enforced end-to-end.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles needs a string input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def apply(text: Column, n: Int): Column =
    columnOf(WordShingles(expressionOf(text), n))

  /** Tight-loop shingle builder. Split on single space KEEPING empty
    * tokens (matches Spark `split(text, " ")` / DuckDB `string_split`),
    * ASCII-safe lowercase (matches `lower` for this corpus), distinct in
    * first-occurrence order (matches `array_distinct`). */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val parts = text.toLowerCase.toString.split(" ", -1)
    if (parts.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](parts.length * 2)
    var i = 0
    val last = parts.length - n
    while (i <= last) {
      val sb = new java.lang.StringBuilder(parts(i))
      var j = 1
      while (j < n) { sb.append(' ').append(parts(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}
