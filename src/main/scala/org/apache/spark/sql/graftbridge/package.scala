package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's Column↔Expression conversion (package-private in
  * spark-sql): lets graft define native codegen'd Catalyst expressions and
  * expose them as ordinary `Column`s. Standard extension-library pattern.
  */
package object graftbridge {
  def columnOf(e: Expression): Column = ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)
}
