package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Fused dot product over two `array<double>` columns.
  *
  * Why a custom Catalyst expression (SURVEY.md §4.2's one sanctioned perf
  * extension): the built-in composition
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)` allocates
  * an intermediate array and evaluates two lambda closures per element —
  * measured ~10 µs per 64-dim pair, which dominates all-pairs similarity
  * queries. This expression emits a primitive loop inside whole-stage
  * codegen (no allocation, no virtual calls) and computes the identical
  * left-to-right IEEE-double fold.
  *
  * Null semantics mirror the built-in composition EXACTLY (required for
  * [[FuseDotProduct]] to be a semantics-preserving rewrite): null if either
  * array is null, if the lengths differ (`zip_with` pads the shorter side
  * with nulls, poisoning the sum), or if any element is null.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "array_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  /** Column-API form: `array_dot(a, b)`. Inputs must be `array<double>`. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      ArrayDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Session extension registering graft's SQL functions, so
  * `SELECT array_dot(a, b)`, `nfc_normalize(s)`, and
  * `sorted_array_intersect_count(a, b)` work from plain SQL:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  * (`nfc_normalize` deliberately matches DuckDB's function of the same
  * name — the dedup normalization chain is then the same TEXT on both
  * engines.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.sqlFunctions.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[ArrayDotProduct].getName, name),
        builder))
    }
    ext.injectOptimizerRule(_ => FuseDotProduct)
  }
}

object GraftExtensions {
  private def arity(name: String, n: Int)(
      f: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == n,
        s"$name expects $n argument(s), got ${exprs.length}")
      f(exprs)
    }

  /** The SQL-exposed scalar functions (codegen'd Catalyst expressions). */
  private[graft] val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] =
    Seq(
      "array_dot" -> arity("array_dot", 2)(e => ArrayDotProduct(e(0), e(1))),
      "nfc_normalize" -> arity("nfc_normalize", 1)(e => NfcNormalize(e(0))),
      "sorted_array_intersect_count" ->
        arity("sorted_array_intersect_count", 2)(e =>
          SortedArrayIntersectCount(e(0), e(1))))

  /** Register graft's SQL functions on an already-running session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    sqlFunctions.foreach { case (name, builder) =>
      ColumnBridge.registerFunction(spark, name, builder)
    }
}
