package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `trim(regexp_replace(word, '(.)', '$1 '))` — the BPE "split a word
  * into spaced symbols" seed — as one native expression.
  *
  * The regex form runs the java.util.regex engine once per CHARACTER of
  * every word occurrence (find + group copy + append), which made the
  * t15 encode's seed the most expensive scalar in the BPE family. This
  * is a single generated call into a tight code-point loop: measured on
  * the sf0.1 corpus it removes the regex engine from the per-occurrence
  * path entirely (the WordShingles/NfcNormalize lesson, r16).
  *
  * Exactness: Java regex `.` matches one CODE POINT and does not match
  * line terminators (\n, \r, U+0085, U+2028, U+2029), so the loop
  * appends one space after every code point EXCEPT those five, then
  * strips leading/trailing U+0020 exactly like Spark's `trim()`.
  * SpaceOutSpec pins equality against the regex form on the corpus plus
  * adversarial inputs; the DuckDB oracle keeps its own regexp twin, so
  * cross-engine hash equality still gates the composite. */
case class SpaceOut(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"space_out needs a string input, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "space_out"

  override def nullSafeEval(input: Any): Any =
    SpaceOut.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SpaceOut.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SpaceOut =
    copy(child = newChild)
}

object SpaceOut {
  def apply(word: Column): Column = columnOf(SpaceOut(expressionOf(word)))

  private def isLineTerminator(cp: Int): Boolean =
    cp == 0x0A || cp == 0x0D || cp == 0x85 || cp == 0x2028 || cp == 0x2029

  def compute(word: UTF8String): UTF8String = {
    val s = word.toString
    if (s.isEmpty) return word
    val sb = new java.lang.StringBuilder(s.length * 2)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      sb.appendCodePoint(cp)
      if (!isLineTerminator(cp)) sb.append(' ')
      i += Character.charCount(cp)
    }
    // trim(): strip leading/trailing U+0020 only (Spark StringTrim)
    var st = 0
    var en = sb.length
    while (st < en && sb.charAt(st) == ' ') st += 1
    while (en > st && sb.charAt(en - 1) == ' ') en -= 1
    UTF8String.fromString(sb.substring(st, en))
  }
}
