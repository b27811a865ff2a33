package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** THE shared two-level "global ordered fold without a one-task window"
  * implementation — the single copy of the shape that r11–r14 grew four
  * divergent copies of ([[Hygiene.cellsCum]]/[[Hygiene.cellsCumByKey]],
  * [[Temporal.shardedPrefix]], [[Splits.globalOrder]]'s and
  * [[Splits.packBatchesSharded]]'s offset stitches, the
  * [[TextAnalysis.bpeEncode]] vocab rank). The r14 NULL-key offset bug
  * existed only because the keyed copy diverged from the unkeyed one;
  * unifying them is the r14 verdict's task #3.
  *
  * Shape: shard the frame so that shard id is MONOTONE in (key, order)
  * — range partitioning, or any deterministic bucketing the caller
  * guarantees monotone per key group — then compute ranks / prefix sums
  * WITHIN each shard with an ordinary window, and add each shard's
  * exclusive prefix of lower-shard aggregate mass, computed on a tiny
  * (≤ keys-that-straddle + shards row) side frame that broadcasts. No
  * step ever funnels the big side through a single ordered-window task.
  *
  * Adaptivity (the r14 verdict's task #2): the fold materializes its
  * input once (`localCheckpoint` — also what pins the sampled range
  * boundaries so the offsets branch and the main branch cannot disagree
  * on a row's shard) and counts it; below [[minRowsPerShard]] per
  * requested shard the shard machinery costs more than the single
  * window it replaces (the measured q_cusum_segments 0.32 → 2.36 s
  * fixture-scale regression), so the effective shard count is
  * `clamp(n / minRowsPerShard, 1, requested)` and `eff == 1` falls back
  * to the plain window plan. PropertySpec proves the outputs are
  * bit-identical at ANY shard count, so the dispatch is a pure cost
  * knob, never a semantics switch.
  */
private[graft] object ShardedFold {

  /** Adaptive floor: a shard below this row count is not worth its
    * stitch overhead. Package-visible and mutable ONLY so tests can
    * force the sharded path on fixture-sized inputs; production callers
    * never touch it.
    */
  @volatile private[graft] var minRowsPerShard: Long = 65536L

  /** `clamp(n / minRowsPerShard, 1, requested)` — the effective shard
    * count for an `n`-row fold input.
    */
  private[graft] def effectiveShards(n: Long, requested: Int): Int = {
    require(requested >= 1, s"shards must be >= 1: $requested")
    math.max(1L, math.min(requested.toLong, n / minRowsPerShard)).toInt
  }

  /** The tiny-side offset kernel every two-level fold shares: per
    * (`partCols`, `shardCol`) group compute `aggs` (each an aggregate
    * expression over the group's rows, e.g. `count(lit(1))` or
    * `sum(col("v"))`), then give each group the EXCLUSIVE prefix-sum of
    * its aggregate over strictly-lower shards of the same `partCols`
    * values, as `<outName>` columns. The result is the offsets frame the
    * caller broadcast-joins back onto the sharded rows.
    *
    * `contiguousKeys = true` enables the straddler cut: when every
    * `partCols` group occupies a CONTIGUOUS run of shards (true for
    * range partitioning on (partCols, orderCols), and for any
    * bucket-contiguous labeling like [[Temporal.cusumSegments]]'
    * segments), only groups that SPAN more than one shard can have a
    * nonzero offset, and at most `shards` groups can straddle a
    * boundary — so the offsets frame is ≤ 2·shards rows at ANY key
    * cardinality, and the key-partitioned prefix window runs over the
    * straddlers alone instead of a keys+shards-row frame. Callers whose
    * groups span shards non-contiguously (hash sharding WITHIN each key
    * group, e.g. [[Splits.packBatchesSharded]]) must pass `false` and
    * own the "partCols cardinality is broadcast-tiny" contract instead.
    *
    * NULL-safe on `partCols` throughout (`<=>` joins, groupBy keeps the
    * NULL group): a NULL key group that straddles a shard boundary gets
    * its offset rows like any other — the r14 NULL-key bug class this
    * unification exists to prevent.
    */
  private[graft] def shardOffsets(
      sh: DataFrame, partCols: Seq[String], shardCol: String,
      aggs: Seq[(Column, String)], contiguousKeys: Boolean): DataFrame = {
    require(aggs.nonEmpty, "need at least one aggregate to offset")
    val aggExprs = aggs.map { case (c, name) => c.as("_m_" + name) }
    val groupCols = (shardCol +: partCols).map(col)
    val perShard = sh.groupBy(groupCols: _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
    // same order-free exactness contract as [[prefix]], enforced on the
    // resolved aggregate types so DIRECT callers (packBatchesSharded,
    // globalOrder, cusumSegments) are covered too: a float/double
    // per-shard aggregate depends on partition order and would make the
    // stitch non-reproducible
    aggs.foreach { case (_, name) =>
      val dt = perShard.schema("_m_" + name).dataType
      import org.apache.spark.sql.types._
      require(dt.isInstanceOf[DecimalType] || dt == LongType ||
        dt == IntegerType || dt == ShortType || dt == ByteType,
        s"ShardedFold.shardOffsets: aggregate '$name' must be integral " +
          s"or decimal (order-free across partitions); got $dt")
    }
    val wOff = (if (partCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(partCols.map(col): _*))
      .orderBy(col(shardCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val base =
      if (partCols.isEmpty || !contiguousKeys) perShard
      else {
        // straddler cut: groups living entirely inside one shard have a
        // zero offset by the contiguity contract — drop them BEFORE the
        // key-partitioned window so the stitch side stays ≤ 2·shards
        // rows at any key cardinality (NULL-SAFE semi-join: the NULL
        // group straddles like any other)
        val spanning = perShard.groupBy(partCols.map(col): _*)
          .agg(count(lit(1)).as("_ns")).filter(col("_ns") > 1L)
          .select(partCols.map(col): _*)
        val cond = partCols
          .map(k => perShard(k) <=> spanning(k))
          .reduce(_ && _)
        perShard.join(spanning, cond, "left_semi")
      }
    val withOffs = aggs.foldLeft(base) { case (df, (_, name)) =>
      df.withColumn(name,
        coalesce(sum(col("_m_" + name)).over(wOff), lit(0L)))
    }
    // rows whose every offset is zero contribute nothing to the stitch —
    // dropping them keeps the broadcast minimal and makes the downstream
    // join's left-outer + coalesce(…, 0) form exact. The shard/key columns
    // come back `_o_`-prefixed so the caller's join back onto the (same-
    // lineage) sharded frame never trips ambiguous-self-join resolution.
    // `=!= 0`, NOT `> 0`: sum offsets over SIGNED values can be negative
    // for a spanning group (count offsets are always ≥ 1 when present,
    // but a sums-only signed fold has no count column to save it)
    withOffs
      .filter(aggs.map { case (_, name) => col(name) =!= 0L }.reduce(_ || _))
      .select((shardCol +: partCols).map(k => col(k).as("_o_" + k)) ++
        aggs.map { case (_, name) => col(name) }: _*)
  }

  /** Full range-sharded ordered prefix fold with adaptive dispatch.
    *
    * Input: `df` carrying `keyCols` (optional, NULL-safe), `orderCols`
    * (the fold order within a key group; (keyCols, orderCols) must be
    * duplicate-free for a deterministic rank), and the value columns
    * named in `sums`. Output: every input column, plus `idxCol` (if
    * requested — the 1-based LONG rank within the key group in
    * orderCols order) and one inclusive prefix sum per `(valCol →
    * outCol)` entry of `sums`.
    *
    * The input is materialized once (`localCheckpoint`) and counted;
    * the effective shard count adapts per [[effectiveShards]], and a
    * 1-shard fold IS the plain window plan (no shard column, no stitch
    * join — the exact pre-r14 fixture-scale shape).
    */
  private[graft] def prefix(
      df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      sums: Seq[(String, String)], idxCol: Option[String],
      shards: Int): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    require(idxCol.nonEmpty || sums.nonEmpty, "nothing to fold")
    // EXACTNESS CONTRACT (ADVICE r15): the sharded path's per-shard sums
    // + offset stitch add in a different order than the single running
    // window, so the adaptive dispatch is only a pure cost knob when the
    // sums are ORDER-FREE — integral or decimal. Float/double sums would
    // make the 65536-row floor a silent semantics switch; reject them at
    // the API (cast through DECIMAL first — the Graph fencing discipline).
    sums.foreach { case (valCol, _) =>
      val dt = df.schema(valCol).dataType
      import org.apache.spark.sql.types._
      require(dt.isInstanceOf[DecimalType] || dt == LongType ||
        dt == IntegerType || dt == ShortType || dt == ByteType,
        s"ShardedFold.prefix: sum column '$valCol' must be integral or " +
          s"decimal (order-free exact addition across shards); got $dt — " +
          "cast through DecimalType first")
    }
    val outCols = df.columns.toSeq ++ idxCol.toSeq ++ sums.map(_._2)
    val base = df.localCheckpoint()
    val n = base.count()
    val eff = effectiveShards(n, shards)
    if (eff <= 1) {
      val w = (if (keyCols.isEmpty) Window.partitionBy()
        else Window.partitionBy(keyCols.map(col): _*))
        .orderBy(orderCols.map(col): _*)
      val wRange = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val withIdx = idxCol.fold(base)(name =>
        base.withColumn(name, row_number().over(w).cast("long")))
      return sums.foldLeft(withIdx) { case (acc, (valCol, outCol)) =>
        acc.withColumn(outCol, sum(col(valCol)).over(wRange))
      }.select(outCols.map(col): _*)
    }
    val shardCol = "_fold_shard"
    val sh = base
      .repartitionByRange(eff, (keyCols ++ orderCols).map(col): _*)
      .withColumn(shardCol, spark_partition_id().cast("long"))
      .localCheckpoint()
    val offAggs =
      idxCol.map(name => (count(lit(1)), "_off_" + name)).toSeq ++
        sums.map { case (valCol, outCol) => (sum(col(valCol)), "_off_" + outCol) }
    val offs = shardOffsets(sh, keyCols, shardCol, offAggs,
      contiguousKeys = true)
    val joinCond = ((col(shardCol) === col("_o_" + shardCol)) +:
      keyCols.map(k => col(k) <=> col("_o_" + k))).reduce(_ && _)
    val wLoc = Window.partitionBy((shardCol +: keyCols).map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val wLocRange = wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = sh.join(broadcast(offs), joinCond, "left")
      .select(sh.columns.map(col) ++
        offAggs.map { case (_, name) => col(name) }: _*)
    val withIdx = idxCol.fold(joined)(name =>
      joined.withColumn(name,
        coalesce(col("_off_" + name), lit(0L)) +
          row_number().over(wLoc).cast("long")))
    sums.foldLeft(withIdx) { case (acc, (valCol, outCol)) =>
      acc.withColumn(outCol,
        coalesce(col("_off_" + outCol), lit(0L)) +
          sum(col(valCol)).over(wLocRange))
    }.select(outCols.map(col): _*)
  }
}
