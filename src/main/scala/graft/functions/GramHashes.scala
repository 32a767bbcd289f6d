package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** POSITIONAL word n-gram hashes of lowercased, space-split text: element
  * i is `XHash.hash60` of the n-gram starting at token i (every window, in
  * order, duplicates KEPT — unlike [[WordShingles]], which distincts).
  * Docs shorter than n tokens yield an empty array.
  *
  * This is the substring-dedup primitive (d12): the repeated-substring
  * scan needs (position, gram) for every window, and the declarative form
  * `transform(sequence(0, n-L), i -> hash60(array_join(slice(toks, i+1,
  * L), ' ')))` is three nested CodegenFallback higher-order functions
  * that also md5 through a per-element expression-tree walk. Here the
  * whole row is one generated call into a tight JVM loop, and only the
  * int64 hashes ever leave the expression — the gram STRINGS never
  * materialize into the explode, so the downstream shuffle carries
  * 8 bytes per window instead of ~8·n-byte text.
  *
  * Oracle twin (DuckDB): `hash60(array_to_string(toks[pos+1:pos+L], ' '))`
  * over `unnest(range(greatest(len(toks)-L+1, 0)))` — same md5-60
  * ([[XHash.hash60Sql]]), so positions AND hashes are bit-identical
  * across engines.
  */
case class GramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "gram width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gram_hashes needs a string input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override def nullSafeEval(input: Any): Any =
    GramHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object GramHashes {
  def apply(text: Column, n: Int): Column =
    columnOf(GramHashes(expressionOf(text), n))

  /** Split on single space KEEPING empty tokens (matches Spark
    * `split(text, " ")` / DuckDB `string_split`), ASCII-safe lowercase
    * (matches `lower` for this corpus), md5-60 per window (matches
    * [[XHash.hash60Local]] == both engines' SQL hash). */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val parts = text.toLowerCase.toString.split(" ", -1)
    if (parts.length < n) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](parts.length - n + 1)
    var i = 0
    val last = parts.length - n
    while (i <= last) {
      val sb = new java.lang.StringBuilder(parts(i))
      var j = 1
      while (j < n) { sb.append(' ').append(parts(i + j)); j += 1 }
      md.reset()
      val hex = md.digest(sb.toString.getBytes("UTF-8"))
      // first 15 hex chars = high 60 bits of the digest
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (hex(k) & 0xffL); k += 1 }
      out(i) = h >>> 4 // 64 digest bits -> leading 60 (15 hex chars)
      i += 1
    }
    new GenericArrayData(out)
  }
}
