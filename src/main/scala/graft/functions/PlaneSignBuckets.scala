package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Hyperplane layout for sign-LSH bucketing, shipped to executors ONCE as a
  * Spark broadcast instead of being unrolled into the query plan.
  *
  * Why: the previous formulation inlined every plane as a `typedLit` array
  * literal inside a per-plane `when(array_dot(v, lit) > 0, mask)` chain.
  * Correct, and fine at toy parameters — but at production ANN settings
  * (16-64 planes × 384-768 dims) that is 10⁴-10⁵ literal values COMPILED
  * INTO THE PLAN: generated methods blow past the JVM's 64 KB bytecode
  * limit (silently dropping the projection out of whole-stage codegen),
  * and the fat plan is re-shipped with every task. Here the matrix is
  * DATA, not code: the expression's generated loop is a few hundred bytes
  * regardless of plane count, and executors fetch the matrix once via
  * torrent broadcast.
  *
  * @param planes row i = plane i's components
  * @param masks  bit OR-ed into the bucket when dot(v, planes(i)) > 0
  * @param bandOf index of the output bucket plane i feeds (all 0 for the
  *               single-bucket form)
  * @param numBands number of output buckets (length of the result array)
  */
case class PlaneMatrix(
    planes: Array[Array[Double]],
    masks: Array[Long],
    bandOf: Array[Int],
    numBands: Int)

/** `array<double> vector → array<long> buckets` (one element per band).
  *
  * Per-plane semantics mirror the inline-literal formulation EXACTLY
  * (`when(array_dot(v, plane) > 0, mask).otherwise(0)` OR-folded): a null
  * vector, a length mismatch, or a null element contributes NO bit —
  * never a null bucket — so rewriting a query from the literal form to
  * this expression can never change its result, only its plan size.
  * NaN dot products compare false against 0, as in the `when` form.
  */
case class PlaneSignBuckets(child: Expression, bc: Broadcast[PlaneMatrix])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "plane_sign_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"plane_sign_buckets requires array<double>, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val m = bc.value
    val acc = new Array[Long](m.numBands)
    val a = child.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var i = 0
      while (i < m.planes.length) {
        val p = m.planes(i)
        if (p.length == n) {
          var s = 0.0
          var ok = true
          var j = 0
          while (ok && j < n) {
            if (arr.isNullAt(j)) ok = false
            else { s += arr.getDouble(j) * p(j); j += 1 }
          }
          if (ok && s > 0) acc(m.bandOf(i)) |= m.masks(i)
        }
        i += 1
      }
    }
    new GenericArrayData(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = classOf[Broadcast[_]].getName
    val matCls = classOf[PlaneMatrix].getName
    val gadCls = classOf[GenericArrayData].getName
    val bcRef = ctx.addReferenceObj("planesBc", bc, s"$bcCls<$matCls>")
    // broadcast value resolved once per generated-class instance, not per row
    val mat = ctx.addMutableState(matCls, "planeMatrix",
      v => s"$v = ($matCls) $bcRef.value();")
    val childGen = child.genCode(ctx)
    val acc = ctx.freshName("acc")
    val arr = ctx.freshName("arr")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val p = ctx.freshName("p")
    val s = ctx.freshName("s")
    val ok = ctx.freshName("ok")
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val body =
      s"""
         |long[] $acc = new long[$mat.numBands()];
         |if (!${childGen.isNull}) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $arr = ${childGen.value};
         |  for (int $i = 0; $i < $mat.planes().length; $i++) {
         |    double[] $p = $mat.planes()[$i];
         |    if ($p.length == $arr.numElements()) {
         |      double $s = 0.0;
         |      boolean $ok = true;
         |      for (int $j = 0; $ok && $j < $p.length; $j++) {
         |        if ($arr.isNullAt($j)) { $ok = false; }
         |        else { $s += $arr.getDouble($j) * $p[$j]; }
         |      }
         |      if ($ok && $s > 0) $acc[$mat.bandOf()[$i]] |= $mat.masks()[$i];
         |    }
         |  }
         |}
         |final ${org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
                  .javaType(dataType)} ${ev.value} = new $gadCls($acc);
         |""".stripMargin
    ev.copy(code = childGen.code + code"$body", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PlaneSignBuckets =
    copy(child = newChild)
}

object PlaneSignBuckets {
  /** Column-API form. `v` must be `array<double>`. */
  def apply(v: Column, bc: Broadcast[PlaneMatrix]): Column =
    ColumnBridge.column(PlaneSignBuckets(ColumnBridge.expression(v), bc))
}
