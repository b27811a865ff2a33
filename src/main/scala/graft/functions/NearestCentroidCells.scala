package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** IVF coarse-quantizer layout, shipped to executors ONCE as a Spark
  * broadcast (the [[PlaneMatrix]] discipline — matrices are DATA, not plan
  * literals; see [[PlaneSignBuckets]] for why that matters at production
  * parameters: k≈1024 cells × 768 dims inlined as literals would blow the
  * generated method past the JVM's 64 KB limit and re-ship with every task).
  *
  * Rows are sorted by ascending `cid` at construction — the selection
  * kernel's earlier-index-wins tie rule then IS the rounded-score
  * centroid-id tie-break of the windowed formulation it replaces.
  *
  * @param cids   centroid ids, ascending
  * @param cvs    row i = centroid cids(i)'s components
  * @param cnrms  L2 norm per centroid (precomputed once on the driver)
  * @param nprobe how many nearest cells each vector emits
  */
case class CentroidMatrix(
    cids: Array[Long],
    cvs: Array[Array[Double]],
    cnrms: Array[Double],
    nprobe: Int)

/** `(vector array<double>, nrm double) → array<long>`: the vector's `nprobe`
  * nearest centroid ids by rounded cosine (descending score, centroid-id
  * tie-break) — the ZERO-EXCHANGE form of IVF cell assignment.
  *
  * This expression exists to kill a scale bug: the previous formulation
  * (`crossJoin(broadcast(centroids))` + per-id `row_number` window) was a
  * narrow map in spirit, but the ranking window forced a hash exchange of
  * corpus × k rows EACH CARRYING THE FULL EMBEDDING ARRAY — at 100 TB with
  * k≈1024 that is a ~1000× corpus shuffle inside what should be a pure map
  * (and Lloyd's training paid it again every round). Here the top-nprobe
  * selection folds over the broadcast centroid matrix inside the row, so
  * the plan contains no exchange at all below the final probe join.
  *
  * Semantics mirror the windowed form EXACTLY, element for element:
  *  - score(c) = round(dot(v, cv_c) / (nrm · cnrm_c), 4), the dot a
  *    sequential left fold (bit-identical to [[ArrayDotProduct]]), the
  *    round Spark's `round(_, 4)` on doubles (HALF_UP via
  *    `BigDecimal.valueOf`, NaN/±Inf passed through);
  *  - a null vector / null nrm / length-mismatched centroid / null element
  *    yields a NULL score, ordered LAST (`desc` default NULLS LAST) — an
  *    all-null row still emits the first `nprobe` cids in id order, exactly
  *    as `row_number` over all-null scores did;
  *  - NaN scores order GREATEST (Spark's nan-safe double ordering);
  *  - result length = min(nprobe, k), ids in rank order.
  */
case class NearestCentroidCells(
    left: Expression, right: Expression, bc: Broadcast[CentroidMatrix])
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "nearest_centroid_cells"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid_cells requires (array<double>, double), got (${l.simpleString(10)}, ${r.simpleString(10)})")
  }

  /** Spark's `round(x, 4)` on DoubleType, verbatim: NaN/±Inf pass through,
    * everything else via the shortest-decimal BigDecimal at HALF_UP.
    */
  private def round4(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** Row kernel, shared verbatim by eval and codegen (one virtual call per
    * row; the loops inside JIT like any expression body). Null inputs are
    * passed as Java nulls.
    */
  def kernel(v: ArrayData, nrm: java.lang.Double): ArrayData = {
    val m = bc.value
    val k = m.cids.length
    val scores = new Array[Double](k)
    val isNull = new Array[Boolean](k)
    val n = if (v == null) -1 else v.numElements()
    var c = 0
    while (c < k) {
      val cv = m.cvs(c)
      if (v == null || nrm == null || cv.length != n) isNull(c) = true
      else {
        var s = 0.0
        var ok = true
        var j = 0
        while (ok && j < n) {
          if (v.isNullAt(j)) ok = false
          else { s += v.getDouble(j) * cv(j); j += 1 }
        }
        if (!ok) isNull(c) = true
        else scores(c) = round4(s / (nrm.doubleValue() * m.cnrms(c)))
      }
      c += 1
    }
    // partial selection sort: nprobe is small (1-16); rows are cid-ascending
    // so earlier-index-wins on ties IS the cid tie-break, and NULL scores
    // sort last (desc NULLS LAST), exactly like the window ordering
    val take = math.min(m.nprobe, k)
    val out = new Array[Long](take)
    val used = new Array[Boolean](k)
    var r = 0
    while (r < take) {
      var best = -1
      var c2 = 0
      while (c2 < k) {
        if (!used(c2)) {
          if (best < 0) best = c2
          else if (!isNull(c2) && (isNull(best) ||
            org.apache.spark.sql.catalyst.util.SQLOrderingUtil
              .compareDoubles(scores(c2), scores(best)) > 0))
            best = c2
        }
        c2 += 1
      }
      used(best) = true
      out(r) = m.cids(best)
      r += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    val nr = right.eval(input)
    kernel(
      if (v == null) null else v.asInstanceOf[ArrayData],
      if (nr == null) null else java.lang.Double.valueOf(nr.asInstanceOf[Double]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearestCells", this, classOf[NearestCentroidCells].getName)
    val lg = left.genCode(ctx)
    val rg = right.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val body =
      s"""
         |final ${org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
                  .javaType(dataType)} ${ev.value} = $self.kernel(
         |  ${lg.isNull} ? null : ${lg.value},
         |  ${rg.isNull} ? null : (java.lang.Double) ${rg.value});
         |""".stripMargin
    ev.copy(code = lg.code + rg.code + code"$body", isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroidCells =
    copy(left = newLeft, right = newRight)
}

object NearestCentroidCells {
  /** Column-API form. `v` must be `array<double>`, `nrm` `double`. */
  def apply(v: Column, nrm: Column, bc: Broadcast[CentroidMatrix]): Column =
    ColumnBridge.column(NearestCentroidCells(
      ColumnBridge.expression(v), ColumnBridge.expression(nrm), bc))
}
