package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Upper-triangle Gram matrix of an `array<long>` column as a
  * `TypedImperativeAggregate` — the bounded-state form of "all pairwise
  * dimension cross-products in one pass". For input vectors v of fixed
  * length `d`, the buffer is the d(d+1)/2 upper-triangle sums
  * G[i][j] = Σ_rows v(i)·v(j) (i ≤ j, row-major flat layout
  * idx = i·d − i(i−1)/2 + (j − i)), merged by elementwise addition.
  *
  * Why this beats the compositional plan: computing d² cross-moments with
  * built-ins needs a pair EXPLODE (each row becomes d(d+1)/2 rows before
  * the aggregation — the corpus multiplied by ~2k at d=64, dominating the
  * exchange even with map-side combine partials of the same final size) or
  * d(d+1)/2 separate aggregate columns (a plan with thousands of named
  * expressions — codegen and analyzer cost explode). As a typed aggregate,
  * each task folds rows into ONE flat long array (16.6 KB at d=64) and the
  * exchange carries one buffer per task — the sketch shape
  * ([[MisraGriesAgg]], HLL) applied to exact second moments.
  *
  * Appending a constant-1 homogeneous coordinate to the input vector makes
  * this one buffer carry the FULL covariance sufficient statistics: cell
  * (i, d) = Σ v(i) (the first moments) and cell (d, d) = n — what
  * [[graft.operators.Similarity.dimCovariance]] exploits to audit
  * redundant dimensions in a single corpus pass.
  *
  * DETERMINISM: integer addition is commutative/associative, so unlike
  * [[MisraGriesAgg]] the result is independent of partitioning and merge
  * order — safe to cross an oracle boundary directly. Overflow contract:
  * int64 sums are exact while n·max|v|² < 2⁶³ (micro-unit-fenced inputs,
  * |v| ≤ 10⁶: exact past 9·10⁶ rows); wider corpora shard the corpus and
  * lift the final per-shard merge to DECIMAL(38,0).
  *
  * Null/shape policy: null vectors are skipped (nothing counted — callers
  * wanting null accounting filter first); a non-null vector of the wrong
  * length throws (a silent skip would desynchronize the homogeneous n from
  * the caller's row count).
  */
case class GramMatrixAgg(
    child: Expression,
    d: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(d > 0, "gram_matrix: vector length must be positive")
  private val cells = d * (d + 1) / 2

  override def createAggregationBuffer(): Array[Long] = new Array[Long](cells)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData].toLongArray()
      if (arr.length != d) throw new IllegalArgumentException(
        s"gram_matrix: expected vectors of length $d, got ${arr.length}")
      var i = 0
      var idx = 0
      while (i < d) {
        val vi = arr(i)
        var j = i
        while (j < d) {
          buf(idx) += vi * arr(j)
          idx += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < cells) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](cells * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    buf.foreach(bb.putLong)
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(cells)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "gram_matrix"

  override def withNewMutableAggBufferOffset(offset: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMatrixAgg =
    copy(child = newChildren.head)
}

object GramMatrix {
  /** Aggregate Column: flat upper-triangle Gram sums of an `array<long>`
    * column of fixed length `d`, as `array<long>` of d(d+1)/2 cells.
    */
  def apply(vec: Column, d: Int): Column =
    ColumnBridge.column(
      GramMatrixAgg(ColumnBridge.expression(vec), d).toAggregateExpression())

  /** Flat index of upper-triangle cell (i, j), 0-based, i ≤ j < d. */
  def flatIndex(i: Int, j: Int, d: Int): Int = i * d - i * (i - 1) / 2 + (j - i)
}
