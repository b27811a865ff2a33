package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 removed `Column.expr` / `new Column(expr)` from the public
  * surface (Column is backed by ColumnNode to support both classic and
  * Connect backends); the classic-backend converters live behind
  * `private[sql]`. This object sits in a subpackage of
  * `org.apache.spark.sql` purely to re-export those two conversions to the
  * graft library — the sanctioned pattern for third-party Catalyst
  * extensions that target the classic engine.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL scalar function on an EXISTING session (the
    * `spark.sql.extensions` config route only applies to newly built
    * sessions). `builder` maps argument expressions to the expression.
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** DataFrame from a LogicalPlan (runs the analyzer) — the classic
    * `Dataset.ofRows` went `private[sql]` with the Connect split.
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
