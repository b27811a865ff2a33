package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `|A ∩ B|` for two SORTED `array<bigint>` columns, via a primitive
  * two-pointer merge inside whole-stage codegen.
  *
  * Why: candidate verification in the dedup operators needs the shingle
  * intersection size for each candidate pair. The relational formulation —
  * explode both documents' shingle sets, self-join on the hash, re-group —
  * shuffles an intermediate proportional to Σ_cand |shingles(doc)| (a
  * ~200M-row exchange at the 50k-doc smoke scale). With each document's
  * (already distinct) shingle hashes pre-aggregated ONCE into a sorted
  * array, the intersection is a row-local O(|A|+|B|) merge: no exploded
  * intermediate, no extra exchange, and the verify join shuffles only the
  * candidate ids plus one compact array per side.
  *
  * Both inputs MUST be sorted ascending (callers build them with
  * `sort_array(collect_list(h))`) and duplicate-free per side; equal runs
  * across sides count once. Null array → null; null elements are not
  * expected (shingle hashes are non-null) but tolerated by treating the
  * comparison positionally via ArrayData accessors — callers guarantee
  * non-null elements.
  */
case class SortedArrayIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = left.nullable || right.nullable

  override def prettyName: String = "sorted_array_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_array_intersect_count requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var common = 0L
    while (i < nx && j < ny) {
      val vx = x.getLong(i)
      val vy = y.getLong(j)
      if (vx < vy) i += 1
      else if (vx > vy) j += 1
      else { common += 1; i += 1; j += 1 }
    }
    common
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val vx = ctx.freshName("vx")
      val vy = ctx.freshName("vy")
      val acc = ctx.freshName("common")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |int $i = 0;
         |int $j = 0;
         |long $acc = 0L;
         |while ($i < $nx && $j < $ny) {
         |  final long $vx = $a.getLong($i);
         |  final long $vy = $b.getLong($j);
         |  if ($vx < $vy) { $i++; }
         |  else if ($vx > $vy) { $j++; }
         |  else { $acc++; $i++; $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedArrayIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedArrayIntersectCount {
  /** Column-API form. Inputs must be sorted `array<bigint>`. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedArrayIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
