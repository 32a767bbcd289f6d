package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-surface registration of graft's native expressions, so
  * `spark.sql("SELECT long_array_dot(a, b)")` and `graft_hash60(x)` work
  * alongside the Column API — via `SparkSessionExtensions` for cluster
  * deployments (`spark.sql.extensions=graft.functions.GraftExtensions`)
  * or [[GraftFunctions.register]] on an existing session.
  */
object GraftFunctions {

  /** The cross-engine 60-bit hash as a composite of built-in expressions
    * (stays fully codegen'd): conv(substr(md5(x),1,15),16,10)::long. */
  def hash60Expr(e: Expression): Expression =
    Cast(
      Conv(
        Substring(Md5(Cast(e, BinaryType)), Literal(1), Literal(15)),
        Literal(16), Literal(10)),
      LongType)

  /** word_shingles(text, n): n must be an integer literal — anything
    * else (a column, a null, a non-integral type) fails here with a
    * clear plan-time error instead of an opaque ClassCastException. */
  private[functions] def wordShinglesBuilder(exprs: Seq[Expression]): Expression = {
    val nExpr = exprs(1)
    if (!nExpr.foldable)
      throw new IllegalArgumentException(
        "word_shingles(text, n): n must be an integer literal, not a column")
    val n = nExpr.eval() match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        "word_shingles(text, n): n must be an integer literal, got " +
          (if (other == null) "NULL" else other.getClass.getSimpleName))
    }
    WordShingles(exprs(0), n)
  }

  /** ClickHouse-named aliases over Spark built-in expressions — the
    * intent of the reference's `INSTALL chsql; LOAD chsql`
    * (kompactor.ts:154-162: the ClickHouse-compatible function surface
    * is declared available, though never invoked). Each alias resolves
    * to a composition of codegen'd catalyst built-ins, so the CH names
    * cost nothing at runtime. Semantics follow ClickHouse where they
    * diverge from Spark (`toDayOfWeek` is Monday=1, `splitByChar` takes
    * the separator FIRST and splits on the literal char, `indexOf`
    * returns 0 when absent). */
  private def chAliases: Seq[(String, Seq[Expression] => Expression)] = {
    def yyyymm(e: Expression): Expression =
      new Add(new Multiply(Year(e), Literal(100)), Month(e))
    def yyyymmdd(e: Expression): Expression =
      new Add(new Multiply(yyyymm(e), Literal(100)), DayOfMonth(e))
    // literal separators are regex-escaped: CH splits on the char itself
    def litQuote(sep: Expression): Expression = sep match {
      case s if s.foldable => s.eval() match {
        case u: UTF8String =>
          Literal(java.util.regex.Pattern.quote(u.toString))
        case _ => sep
      }
      case _ => sep
    }
    def jsonPath(key: Expression): Expression =
      Concat(Seq(Literal("$."), key))
    Seq(
      "toString" -> (e => Cast(e.head, StringType)),
      "toInt32" -> (e => Cast(e.head, IntegerType)),
      "toInt64" -> (e => Cast(e.head, LongType)),
      "toFloat64" -> (e => Cast(e.head, DoubleType)),
      "toDate" -> (e => Cast(e.head, DateType)),
      "toYear" -> (e => Year(e.head)),
      "toMonth" -> (e => Month(e.head)),
      "toDayOfMonth" -> (e => DayOfMonth(e.head)),
      "toHour" -> (e => Hour(e.head)),
      "toMinute" -> (e => Minute(e.head)),
      "toSecond" -> (e => Second(e.head)),
      // CH: Monday=1..Sunday=7; Spark dayofweek: Sunday=1
      "toDayOfWeek" -> (e =>
        new Add(new Pmod(new Add(DayOfWeek(e.head), Literal(5)), Literal(7)),
          Literal(1))),
      "toYYYYMM" -> (e => yyyymm(e.head)),
      "toYYYYMMDD" -> (e => yyyymmdd(e.head)),
      "toStartOfHour" -> (e => TruncTimestamp(Literal("hour"), e.head)),
      "toStartOfDay" -> (e => TruncTimestamp(Literal("day"), e.head)),
      "toStartOfMonth" -> (e => TruncDate(e.head, Literal("month"))),
      "toUnixTimestamp" -> (e =>
        UnixTimestamp(e.head, Literal("yyyy-MM-dd HH:mm:ss"))),
      "splitByChar" -> (e => StringSplit(e(1), litQuote(e(0)), Literal(-1))),
      "has" -> (e => ArrayContains(e(0), e(1))),
      "indexOf" -> (e => ArrayPosition(e(0), e(1))),
      "empty" -> (e => EqualTo(Length(e.head), Literal(0))),
      "notEmpty" -> (e => GreaterThan(Length(e.head), Literal(0))),
      "lengthUTF8" -> (e => Length(e.head)),
      "JSONExtractString" -> (e => GetJsonObject(e(0), jsonPath(e(1)))),
      "JSONExtractInt" -> (e =>
        Cast(GetJsonObject(e(0), jsonPath(e(1))), LongType)),
      "ifNull" -> (e => Coalesce(Seq(e(0), e(1)))),
      "intDiv" -> (e => new IntegralDivide(e(0), e(1))),
      "modulo" -> (e => new Remainder(e(0), e(1))))
  }

  private val nativeFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "long_array_dot" -> (exprs => LongArrayDot(exprs(0), exprs(1))),
    "graft_hash60" -> (exprs => hash60Expr(exprs.head)),
    "word_shingles" -> (exprs => wordShinglesBuilder(exprs)),
    "nfc_normalize" -> (exprs => NfcNormalize(exprs.head)))

  private[functions] val functions: Seq[(String, Seq[Expression] => Expression)] =
    nativeFunctions ++ chAliases

  /** Register on an already-built session (temp functions). Idempotent:
    * `graft_hash60` is uniquely ours, so its presence means this session
    * already carries the full set — re-registering is harmless but spams
    * `function X replaced a previously registered function` warnings
    * from every callsite (session build + q43 + facade; r7 verdict #4). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (registry.functionExists(FunctionIdentifier("graft_hash60"))) return
    functions.foreach { case (name, builder) =>
      // `ifNull` already exists as a Spark built-in with identical
      // semantics (coalesce of two args) — replacing it would only warn
      if (!registry.functionExists(FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

/** Injectable extensions: permanent function registration at session
  * build time (`spark.sql.extensions=graft.functions.GraftExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(GraftFunctions.getClass.getName, name),
        builder))
    }
}
