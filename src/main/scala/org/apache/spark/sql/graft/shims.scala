package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between `Column` and Catalyst `Expression` for graft's custom
  * codegen expressions. Spark 4 hides the direct constructor behind
  * `private[sql]` (the Connect column-node refactor), so this shim lives
  * in the sql package namespace — the standard pattern for libraries
  * that inject native expressions without going through a string parser.
  */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function into an existing session's registry so custom
    * expressions are callable from `spark.sql` (the builder-time
    * `SparkSessionExtensions.injectFunction` path needs control of
    * session construction; this is the equivalent for a live session).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
