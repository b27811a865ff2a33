package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter summary as a `TypedImperativeAggregate` —
  * the (b)-rung Catalyst form of the bounded-state candidate pass that
  * [[graft.operators.TextAnalysis.heavyHitters]] previously ran behind a
  * `mapPartitions` seam.
  *
  * Buffer: ≤ k (token, counter) pairs (Misra & Gries 1982 — counter
  * overflow decrements all). Partial buffers MERGE by the
  * mergeable-summaries combine (Agarwal et al., PODS'12): key-wise add,
  * then subtract the (k+1)-th largest count from every counter and drop
  * the non-positive — so the merged global summary keeps the full-stream
  * guarantee: every token with freq > n/(k+1) survives, and each
  * retained counter is in [freq − n/(k+1), freq].
  *
  * Why this beats both alternatives: a plain `groupBy(token)` builds
  * aggregation state and an exchange PROPORTIONAL TO DISTINCT-TOKEN
  * CARDINALITY (what dies on web text); the earlier `mapPartitions` form
  * was bounded but opaque to Catalyst (an extra DeserializeToObject /
  * SerializeFromObject hop and a per-partition union that needed its own
  * distinct). As an aggregate, the candidate pass is one `agg(...)` whose
  * partials are ≤ k entries per task and whose exchange carries exactly
  * one serialized buffer per partial — the standard sketch shape
  * ([[MinHashSketchAgg]], HLL, percentile_approx).
  *
  * DETERMINISM CONTRACT: the summary's counter VALUES (and which
  * sub-threshold stragglers it retains) depend on merge order, which
  * Spark does not fix — so this output must never cross an oracle
  * boundary directly. Its guarantees (bounded size, superset, counter
  * bounds) are merge-order-independent, which is exactly what the
  * two-pass heavy-hitters operator consumes: candidates here, EXACT
  * recount + threshold after, deterministic final output.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String].toString
      buf.get(t) match {
        case Some(c) => buf.update(t, c + 1)
        case None if buf.size < k => buf.update(t, 1L)
        case None =>
          // decrement-all: O(k), amortized O(1) (once per k+1 arrivals)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.foreach { case (w, c) =>
            if (c == 1L) dead += w else buf.update(w, c - 1) }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest from everyone; ≤ k stay positive
      val cut = a.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      val dead = mutable.ArrayBuffer.empty[String]
      a.foreach { case (t, c) =>
        if (c - cut <= 0L) dead += t else a.update(t, c - cut) }
      dead.foreach(a.remove)
    }
    a
  }

  /** array<struct<token,count>> ordered by (−count, token) — a stable
    * presentation order; see the determinism contract above for why the
    * CONTENT is still merge-order-dependent.
    */
  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.toSeq.sortBy { case (t, c) => (-c, t) }
        .map { case (t, c) =>
          InternalRow(UTF8String.fromString(t), c) }.toArray[Any])

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val bytes = t.getBytes(StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    m
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "misra_gries_sketch"

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGriesSketch {
  /** Aggregate Column: the group's ≤ k-entry Misra–Gries summary as
    * `array<struct<token string, count bigint>>`.
    */
  def apply(token: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(token), k).toAggregateExpression())
}
