package graft.plans

import scala.collection.mutable

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
  * partition once: O(n log k) time, O(#keys·k) memory — the difference
  * between sorting 100 TB of events and heap-scanning them when k is 1-100.
  *
  * Semantics are identical to the window form given a total `order`
  * (deterministic tie-break), which is exactly how it is verified (oracle =
  * the window SQL; EngineSpec compares against the window implementation).
  *
  * Memory constraint: the per-key heaps live in a plain JVM HashMap that is
  * NOT tracked by Spark's task memory manager, so unlike the window form it
  * cannot spill — the O(#keys·k) working set must fit the executor heap.
  * The bound is per PARTITION (#distinct keys in the partition × k rows),
  * so size partitions accordingly for ultra-high-cardinality keys, or fall
  * back to the window form; a BytesToBytesMap-backed variant is the upgrade
  * path if tracked allocation is ever required.
  */
final case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
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

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // children are not contractually UnsafeRow producers — normalize
      // non-Unsafe rows (identity projection) instead of blind casting
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val ord = new LazilyGeneratedOrdering(sortOrder, childOutput)
        .asInstanceOf[Ordering[UnsafeRow]]
      // max-heap under the sort order: head = worst retained row of the key
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { r =>
        val row = r match {
          case u: UnsafeRow => u
          case other => toUnsafe(other)
        }
        val key = keyProj(row)
        heaps.get(key) match {
          case None if limit > 0 =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](ord)
            h += row.copy()
            heaps.put(key.copy(), h)
          case Some(h) =>
            if (h.size < limit) h += row.copy()
            else if (ord.lt(row, h.head)) { h.dequeue(); h += row.copy() }
          case None => () // k <= 0: nothing retained (guarded in TopK.perKey)
        }
      }
      // emit each key's rows in sort order (dequeueAll yields worst-first)
      heaps.valuesIterator.flatMap(h => h.dequeueAll.reverseIterator)
    }
  }
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
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
    */
  def perKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
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
    ColumnBridge.ofRows(spark, TopKPerKey(keys, order, k, analyzed))
  }
}
