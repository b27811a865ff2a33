package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of non-negative (x, y), each < 2^bits — the
  * order-`bits` xy2d quadrant walk as ONE codegen'd expression.
  *
  * Why a custom expression rather than composed built-ins: the fold
  * mutates (x, y) every round, so the Column form needs either one
  * projection per bit (a 16-deep chained-projection plan that Catalyst's
  * CollapseProject can re-expand into an exponentially-sized expression
  * tree when composed under windows/joins — measured as a planner hang on
  * `q_curve_locality`'s shape) or a single folded Column whose tree is
  * exponential by construction. A `bits`-iteration primitive loop inside
  * whole-stage codegen is the honest shape: row-local, zero allocation,
  * zero shuffle — [[graft.operators.Layout.zOrderKey]]'s contract with a
  * loop instead of a bit-sum.
  *
  * Per round (s = 2^r, top bit first): quadrant digit
  * d += s²·(3·rx + ry − 2·rx·ry) — the arithmetic form of (3rx)⊕ry,
  * identical in any engine without a portable XOR — then the flip/swap
  * rotation into the quadrant with every intermediate masked to [0, s):
  * no negative value ever exists, so the SQL mirror
  * ([[graft.operators.Layout.hilbertSqlCtes]]) needs no two's-complement
  * caveats. Spec-pinned: bijective on the 2^bits × 2^bits grid and every
  * consecutive pair of curve positions is grid-adjacent (the locality
  * property itself), plus value-equality against the SQL chain run in
  * Spark.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "hilbert_index"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index requires two bigint arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    var d = 0L
    var r = bits - 1
    while (r >= 0) {
      val s = 1L << r
      val rx = (x >> r) & 1L
      val ry = (y >> r) & 1L
      d += s * s * (3L * rx + ry - 2L * rx * ry)
      val xm = x & (s - 1)
      val ym = y & (s - 1)
      val nx = if (ry == 1L) xm else if (rx == 1L) s - 1 - ym else ym
      val ny = if (ry == 1L) ym else if (rx == 1L) s - 1 - xm else xm
      x = nx
      y = ny
      r -= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val r = ctx.freshName("r")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val xm = ctx.freshName("xm")
      val ym = ctx.freshName("ym")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      s"""
         |long $x = $a;
         |long $y = $b;
         |long $d = 0L;
         |for (int $r = ${bits - 1}; $r >= 0; $r--) {
         |  final long $s = 1L << $r;
         |  final long $rx = ($x >> $r) & 1L;
         |  final long $ry = ($y >> $r) & 1L;
         |  $d += $s * $s * (3L * $rx + $ry - 2L * $rx * $ry);
         |  final long $xm = $x & ($s - 1L);
         |  final long $ym = $y & ($s - 1L);
         |  final long $nx = $ry == 1L ? $xm : ($rx == 1L ? $s - 1L - $ym : $ym);
         |  final long $ny = $ry == 1L ? $ym : ($rx == 1L ? $s - 1L - $xm : $xm);
         |  $x = $nx;
         |  $y = $ny;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Column-API form: `hilbert_index(x, y)` over bigint inputs. */
  def apply(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(
      HilbertIndex(ColumnBridge.expression(x), ColumnBridge.expression(y), bits))
}
