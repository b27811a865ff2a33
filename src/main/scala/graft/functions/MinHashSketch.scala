package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature sketch as a `TypedImperativeAggregate` (the
  * mutable-buffer aggregate class Spark uses for HLL/percentile sketches).
  *
  * Input: one 64-bit base hash per set element (e.g. `xxhash64(shingle)`).
  * Buffer: `Array[Long]` of `numHashes` running minima, where the i-th hash
  * of an element is `XXH64(base, seed = i)` — a fresh universal hash per
  * slot without rehashing the original string. Output: the signature as
  * `array<bigint>`.
  *
  * Why an imperative sketch instead of `numHashes` separate `min(...)`
  * aggregates: one buffer object and one update call per row instead of N
  * independent aggregate buffers and N codegen'd update paths, and the
  * buffer serializes compactly for partial-aggregate shuffle — the
  * standard shape for sketches at 100 TB (map-side partials merge by
  * element-wise min, so the exchange carries `numHashes` longs per group).
  */
case class MinHashSketchAgg(
    child: Expression,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashLong(base, i.toLong)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "minhash_sketch"

  override def withNewMutableAggBufferOffset(offset: Int): MinHashSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSketchAgg =
    copy(child = newChildren.head)
}

object MinHashSketch {
  /** Aggregate Column: minhash signature (length `numHashes`) of the group's
    * base-hash column.
    */
  def apply(baseHash: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSketchAgg(ColumnBridge.expression(baseHash), numHashes)
        .toAggregateExpression())
}
