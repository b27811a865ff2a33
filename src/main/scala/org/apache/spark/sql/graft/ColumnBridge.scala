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

  /** Canonicalize -0.0/NaN in a (possibly nested) floating-point expression
    * — NormalizeFloatingNumbers.normalize is `private[sql]`, but third-party
    * operators that hash or group on float keys must apply it themselves
    * (the optimizer rule only visits nodes it knows).
    */
  def normalizeFloating(e: Expression): Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)

  /** True if the type (recursively) contains FloatType/DoubleType. */
  def containsFloat(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt.existsRecursively {
      case org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType => true
      case _ => false
    }

  /** DataFrame from a LogicalPlan (runs the analyzer) — the classic
    * `Dataset.ofRows` went `private[sql]` with the Connect split.
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
