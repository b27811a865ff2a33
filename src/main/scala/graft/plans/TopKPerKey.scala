package graft.plans

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, File, FileInputStream, FileOutputStream}

import scala.collection.mutable

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge

/** Whole-operator Catalyst extension (the (c) rung of the custom-operator
  * ladder): per-key top-k with bounded heaps.
  *
  * Why a physical operator: the declarative form —
  * `row_number().over(partitionBy(key).orderBy(o)) <= k` — must SORT every
  * key's entire history inside each shuffle partition before it can rank
  * (O(n log n) per partition, full materialization under memory pressure).
  * This operator keeps only a k-element heap per key while streaming the
  * partition once: O(n log k) time, O(min(#keys, spill threshold)·k) memory
  * — the difference between sorting 100 TB of events and heap-scanning
  * them when k is 1-100.
  *
  * Semantics are identical to the window form given a total `order`
  * (deterministic tie-break), which is exactly how it is verified (oracle =
  * the window SQL; EngineSpec compares against the window implementation).
  *
  * Memory model: per-key heaps live in a JVM HashMap up to
  * `spillThresholdRows` retained rows (Σ heap sizes, ≤ #keys·k). Beyond
  * that the operator SPILLS: the current map is sorted by key bytes and
  * written to a local temp file as (key, rows≤k) runs, the map is cleared,
  * and at end-of-partition the spill runs are merged key-by-key with the
  * in-memory remainder — a streaming k-way merge that holds ONE key's
  * partial heaps at a time, so ultra-high-cardinality partitions degrade
  * to sequential disk I/O instead of OOM. (Per-spill partial top-k is
  * lossless: top-k is a mergeable aggregate — merging per-chunk top-k
  * heaps yields exactly the global top-k.) Byte-wise key ordering is
  * merely a grouping device — any total order consistent with UnsafeRow
  * equality works; output order stays "arbitrary key order, rows
  * best-first within key", same as the in-memory path.
  */
final case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    spillThresholdRows: Long,
    child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

final case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    spillThresholdRows: Long,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Rows of one key must meet in one partition — Catalyst's
    * EnsureRequirements inserts the hash exchange (or reuses an existing
    * compatible partitioning, e.g. bucketed input: then NO shuffle at all).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  /** Total order on key bytes, consistent with UnsafeRow equality (equal
    * keys are byte-identical for a fixed projection layout). Unsigned
    * lexicographic on (bytes, length).
    */
  private def compareKeyBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    val limit = k
    val spillThreshold = spillThresholdRows
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // children are not contractually UnsafeRow producers — normalize
      // non-Unsafe rows (identity projection) instead of blind casting
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val ord = new LazilyGeneratedOrdering(sortOrder, childOutput)
        .asInstanceOf[Ordering[UnsafeRow]]
      // max-heap under the sort order: head = worst retained row of the key
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      var retained = 0L
      val spills = mutable.ArrayBuffer.empty[File]
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
        spills.foreach(f => if (f.exists()) f.delete())
      })

      def spillMap(): Unit = {
        val file = File.createTempFile("graft-topk-spill", ".bin")
        val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(file), 1 << 16))
        try {
          val sorted = heaps.toArray.sortWith((x, y) =>
            compareKeyBytes(x._1.getBytes, y._1.getBytes) < 0)
          sorted.foreach { case (key, h) =>
            val kb = key.getBytes
            out.writeInt(kb.length)
            out.write(kb)
            val rows = h.toArray // heap order irrelevant; merge re-heaps
            out.writeInt(rows.length)
            rows.foreach { r =>
              val rb = r.getBytes
              out.writeInt(rb.length)
              out.write(rb)
            }
          }
        } finally out.close()
        spills += file
        heaps.clear()
        retained = 0L
      }

      iter.foreach { r =>
        val row = r match {
          case u: UnsafeRow => u
          case other => toUnsafe(other)
        }
        val key = keyProj(row)
        heaps.get(key) match {
          case None if limit > 0 =>
            if (retained >= spillThreshold) spillMap()
            val h = mutable.PriorityQueue.empty[UnsafeRow](ord)
            h += row.copy()
            heaps.put(key.copy(), h)
            retained += 1
          case Some(h) =>
            if (h.size < limit) { h += row.copy(); retained += 1 }
            else if (ord.lt(row, h.head)) { h.dequeue(); h += row.copy() }
          case None => () // k <= 0: nothing retained (guarded in TopK.perKey)
        }
      }

      def emit(h: mutable.PriorityQueue[UnsafeRow]): Iterator[InternalRow] =
        // emit each key's rows in sort order (dequeueAll yields worst-first)
        h.dequeueAll.reverseIterator

      if (spills.isEmpty) {
        heaps.valuesIterator.flatMap(emit)
      } else {
        spillMap() // fold the in-memory remainder into the merge as one more run
        val numValueFields = childOutput.size

        // one sorted run of (keyBytes, rows) per spill file
        final class Run(file: File) {
          private val in = new DataInputStream(
            new BufferedInputStream(new FileInputStream(file), 1 << 16))
          var key: Array[Byte] = _
          var rows: Array[UnsafeRow] = _
          advance()
          def advance(): Unit = {
            try {
              val kl = in.readInt()
              val kb = new Array[Byte](kl)
              in.readFully(kb)
              val n = in.readInt()
              val rs = new Array[UnsafeRow](n)
              var i = 0
              while (i < n) {
                val rl = in.readInt()
                val rb = new Array[Byte](rl)
                in.readFully(rb)
                val row = new UnsafeRow(numValueFields)
                row.pointTo(rb, rl)
                rs(i) = row
                i += 1
              }
              key = kb; rows = rs
            } catch {
              case _: EOFException => in.close(); key = null; rows = null
            }
          }
          def exhausted: Boolean = key == null
        }

        val runs = spills.map(new Run(_)).filterNot(_.exhausted)
        // streaming merge: repeatedly take the minimal key across runs,
        // merge that key's partial top-k heaps (bounded by k), emit
        new Iterator[InternalRow] {
          private var current: Iterator[InternalRow] = Iterator.empty
          private def loadNextKey(): Unit = {
            val live = runs.filterNot(_.exhausted)
            if (live.isEmpty) { current = null; return }
            val minKey = live.map(_.key).reduce((a, b) =>
              if (compareKeyBytes(a, b) <= 0) a else b)
            val h = mutable.PriorityQueue.empty[UnsafeRow](ord)
            live.foreach { run =>
              if (compareKeyBytes(run.key, minKey) == 0) {
                run.rows.foreach { row =>
                  if (h.size < limit) h += row
                  else if (ord.lt(row, h.head)) { h.dequeue(); h += row }
                }
                run.advance()
              }
            }
            current = emit(h)
          }
          override def hasNext: Boolean = {
            while (current != null && !current.hasNext) loadNextKey()
            current != null && current.hasNext
          }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            current.next()
          }
        }
      }
    }
  }
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, spill, child) =>
      TopKPerKeyExec(keys, order, k, spill, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** User-facing entry. */
object TopK {

  /** Idempotently install the planner strategy on a live session. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }

  /** Top `k` rows per key, ordered by `(column, ascending?)` pairs —
    * include a unique tie-break column for deterministic results. Columns
    * are resolved by name against the input's analyzed output (Spark 4's
    * public Column wrappers resolve lazily and never materialize inside a
    * third-party logical node, so names are the robust currency here):
    * exact match first, case-insensitive fallback, ambiguity rejected.
    *
    * Floating-point key columns are wrapped with Catalyst's
    * NormalizeFloatingNumbers.normalize — the optimizer applies that rule
    * only to nodes it knows (window/aggregate/join), so a third-party node
    * must normalize itself or `-0.0`/`0.0` (and NaN bit patterns) would
    * hash to different partitions and heaps despite being SQL-equal.
    *
    * `spillThresholdRows` bounds retained rows (Σ per-key heap sizes) per
    * partition before heaps spill to sorted disk runs (see
    * [[TopKPerKey]]); the default ~2M rows ≈ a few hundred MB of typical
    * rows. Lower it for wide rows or tight executors.
    */
  def perKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[(String, Boolean)],
      k: Int,
      spillThresholdRows: Long = 1L << 21): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(spillThresholdRows >= 1, s"spillThresholdRows must be >= 1")
    val spark = df.sparkSession
    install(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute = {
      val exact = analyzed.output.filter(_.name == name)
      val found = if (exact.nonEmpty) exact
        else analyzed.output.filter(_.name.equalsIgnoreCase(name))
      require(found.size == 1,
        s"column $name ${if (found.isEmpty) "not found in" else "is ambiguous among"} " +
          analyzed.output.map(_.name).mkString(","))
      found.head
    }
    val keys = keyCols.map(attr).map { a =>
      if (ColumnBridge.containsFloat(a.dataType)) ColumnBridge.normalizeFloating(a)
      else a
    }
    val order = orderCols.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    ColumnBridge.ofRows(spark, TopKPerKey(keys, order, k, spillThresholdRows, analyzed))
  }
}
