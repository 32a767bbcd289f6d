package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{BinaryType, LongType}

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

  private val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "long_array_dot" -> (exprs => LongArrayDot(exprs(0), exprs(1))),
    "graft_hash60" -> (exprs => hash60Expr(exprs.head)),
    "word_shingles" -> (exprs => wordShinglesBuilder(exprs)))

  /** Register on an already-built session (temp functions). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

/** Injectable extensions: permanent function registration at session
  * build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("long_array_dot"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "long_array_dot"),
      (exprs: Seq[Expression]) => LongArrayDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hash60"),
      new ExpressionInfo(GraftFunctions.getClass.getName, "graft_hash60"),
      (exprs: Seq[Expression]) => GraftFunctions.hash60Expr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) => GraftFunctions.wordShinglesBuilder(exprs)))
  }
}
