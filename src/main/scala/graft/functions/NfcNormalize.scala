package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) as one native
  * codegen'd expression — the text-canonicalization stage a crawl
  * pipeline runs BEFORE any hashing/dedup: the same visible text arrives
  * both precomposed ("é" U+00E9) and decomposed ("e"+U+0301) across
  * sources, and every downstream fingerprint (t5, d1, d2 shingles)
  * treats those as different bytes unless normalized first.
  *
  * Spark SQL has no normalization builtin; the JDK's
  * `java.text.Normalizer` (ICU-equivalent canonical composition per
  * UAX #15) is the public, deterministic implementation. Oracle twin:
  * DuckDB's `nfc_normalize` — same UAX #15 form, so outputs are
  * byte-identical. NFC (not NFKC) on purpose: canonical equivalence is
  * safe to apply before hashing, while compatibility folding (ﬁ → fi)
  * changes visible text — pinned by the ligature case in the t16 gate.
  *
  * Per-row scalar, no shuffle; the `isNormalized` fast path returns the
  * input UTF8String unchanged (zero allocation) for already-NFC text —
  * the overwhelmingly common case in a real corpus.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a string input, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def apply(text: Column): Column =
    columnOf(NfcNormalize(expressionOf(text)))

  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}
