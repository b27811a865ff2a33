package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering keys and the
  * zone-map statistics that justify them.
  *
  * Why this exists at 100 TB: partition pruning and parquet row-group
  * skipping work off per-file min/max ranges, and those ranges are only
  * tight for columns the data is SORTED by. A plain sort tightens exactly
  * one column; interleaving the bits of two keys (Morton order — the
  * space-filling-curve layout used by every warehouse's OPTIMIZE ZORDER)
  * gives every file a bounded rectangle in (x, y), so predicates on
  * EITHER column skip most files. The key itself is pure integer
  * arithmetic — codegen'd, row-local, zero shuffle — and the clustering
  * write is one range exchange, the same cost as any global sort.
  */
object Layout {

  /** Morton key: interleave the low `bits` bits of two non-negative
    * integer columns — x occupies even result bits, y odd. Built as a
    * fixed sum of shift/mask terms (no UDF, no loop at runtime), so it
    * stays inside whole-stage codegen and constant-folds per row to ~4
    * long ops per bit. Callers guarantee non-negative inputs (ids/keys);
    * bits ≤ 31 keeps the result in a positive long.
    */
  def zOrderKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** The identical Morton arithmetic as portable SQL (DuckDB and Spark
    * both parse it), generated from the same parameters so the operator
    * and its oracle cannot drift — the house `splitCaseSql` discipline.
    */
  def zOrderSql(xCol: String, yCol: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    (0 until bits).map { i =>
      s"(($xCol >> $i) & 1) * ${1L << (2 * i)} + (($yCol >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")
  }

  /** Zone-map audit of a Z-order layout: bucket rows by the top bits of
    * their Morton key (each bucket = one would-be file after a clustered
    * write) and emit the per-bucket min/max rectangle for both source
    * columns — exactly the statistics a scan planner would skip on. One
    * map-side-combined aggregation; bucket count is bounded by
    * 4^bits / 2^bucketShift regardless of data volume.
    */
  def zOrderStats(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 16, bucketShift: Int = 24): DataFrame =
    df.select(
        zOrderKey(col(xCol), col(yCol), bits).as("zkey"),
        col(xCol).as("x"), col(yCol).as("y"))
      .groupBy(shiftright(col("zkey"), bucketShift).as("z_bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))

  /** Hilbert-curve key: map non-negative (x, y) (each < 2^bits) to their
    * distance along the order-`bits` Hilbert curve — the space-filling
    * curve with strictly better LOCALITY than Morton (consecutive curve
    * positions are always grid neighbors, so clustered-write buckets get
    * tighter (x, y) rectangles and zone-map skipping prunes more files;
    * `q_curve_locality` measures the gap on real keys rather than
    * asserting it). Backed by the codegen'd
    * [[graft.functions.HilbertIndex]] expression — a `bits`-iteration
    * primitive loop inside whole-stage codegen (the Column-composition
    * alternatives are either an exponential expression tree or a
    * bits-deep projection chain CollapseProject can re-expand into one —
    * a measured planner hang). Row-local, zero shuffle, like
    * [[zOrderKey]]. Callers guarantee non-negative inputs.
    */
  def hilbertKey(x: Column, y: Column, bits: Int): Column =
    graft.functions.HilbertIndex(x.cast("long"), y.cast("long"), bits)

  /** The identical Hilbert fold as a SQL CTE chain (both engines parse
    * it), generated from the same parameters — the [[zOrderSql]]
    * discipline, one CTE per bit round. `h0` selects from `from` and
    * carries `keep` columns through untouched; the final CTE
    * `h<bits>` exposes them plus `hkey`. Spec-pinned value-identical to
    * [[hilbertKey]] by running the chain in Spark itself.
    */
  def hilbertSqlCtes(from: String, xCol: String, yCol: String, bits: Int,
      keep: Seq[String]): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    val keepSel = keep.map(k => s"$k, ").mkString
    val sb = new StringBuilder
    sb ++= s"h0 AS (SELECT $keepSel$xCol AS hx, $yCol AS hy, CAST(0 AS BIGINT) AS hd FROM $from)"
    var k = 0
    for (r <- (bits - 1) to 0 by -1) {
      val s = 1L << r
      sb ++= s""",
                |h${k + 1} AS (
                |  SELECT $keepSel
                |    hd + ${s * s} * (3*((hx >> $r) & 1) + ((hy >> $r) & 1)
                |         - 2*((hx >> $r) & 1)*((hy >> $r) & 1)) AS hd,
                |    CASE WHEN ((hy >> $r) & 1) = 1 THEN hx & ${s - 1}
                |         WHEN ((hx >> $r) & 1) = 1 THEN ${s - 1} - (hy & ${s - 1})
                |         ELSE hy & ${s - 1} END AS hx,
                |    CASE WHEN ((hy >> $r) & 1) = 1 THEN hy & ${s - 1}
                |         WHEN ((hx >> $r) & 1) = 1 THEN ${s - 1} - (hx & ${s - 1})
                |         ELSE hx & ${s - 1} END AS hy
                |  FROM h$k)""".stripMargin
      k += 1
    }
    sb ++= s""",
              |hfin AS (SELECT ${keepSel}hd AS hkey FROM h$k)""".stripMargin
    sb.toString
  }

  /** [[zOrderStats]] for the Hilbert key: per-bucket rectangles of a
    * would-be Hilbert-clustered write — the apples-to-apples zone-map
    * audit against the Morton layout.
    */
  def hilbertStats(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 16, bucketShift: Int = 24): DataFrame =
    df.select(col(xCol).as("x"), col(yCol).as("y"))
      .withColumn("hkey", hilbertKey(col("x"), col("y"), bits))
      .groupBy(shiftright(col("hkey"), bucketShift).as("h_bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))

  /** Equal-count range-file assignment along a curve key — the file
    * boundaries a `repartitionByRange(numFiles).write` actually produces,
    * made DETERMINISTIC: global rank by (ckey, x, y) via the sharded-rank
    * composition ([[graft.operators.Splits.globalOrder]]'s discipline —
    * curve-key HIGH BITS are range-aligned, so sharding on them preserves
    * order), then file = rank·numFiles div n. One hash exchange on the
    * shard; the offsets/total frames are ≤ 2^(bits·2−shardShift)+1 rows.
    */
  private def rangeFileId(keyed: DataFrame, numFiles: Int,
      shardShift: Int): DataFrame = {
    val wRank = Window.partitionBy(col("_shard"))
      .orderBy(col("ckey"), col("x"), col("y"))
    val wOff = Window.orderBy(col("_shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val sharded = keyed.withColumn("_shard", shiftright(col("ckey"), shardShift))
    // CACHED: the broadcast join AND the total agg both read this
    // ≤ 2^(bits·2−shardShift)+1-row frame — uncached, each re-ran the
    // full shard count-agg over the corpus (r20; guide §5)
    val offsets = graft.operators.Dedup.cached(sharded.groupBy(col("_shard"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("_off", coalesce(sum(col("n_rows")).over(wOff), lit(0L))))
    val total = offsets.agg(sum(col("n_rows")).as("n_total"))
    sharded
      .withColumn("_lr", row_number().over(wRank).cast("long") - 1L)
      .join(broadcast(offsets.select(col("_shard"), col("_off"))), Seq("_shard"))
      .crossJoin(broadcast(total))
      .withColumn("file", expr(s"((_off + _lr) * ${numFiles}L) div n_total"))
      .drop("_shard", "_lr", "_off", "n_total")
  }

  /** Measured curve-locality comparison — the evidence for CHOOSING a
    * clustering key: split the same (x, y) population into `numFiles`
    * equal-count RANGE files along its Morton key and along its Hilbert
    * key (the boundaries a clustered write actually produces — bit-
    * aligned power-of-4 buckets are perfect squares under BOTH curves
    * and cannot discriminate), and emit per curve the file count plus
    * the summed and maximal bounding-rectangle areas (exact integers).
    * Smaller areas = tighter zone maps = more files skipped by a
    * two-column predicate; Hilbert's adjacency guarantee (consecutive
    * curve positions are grid neighbors) is what keeps an unaligned file
    * span compact where a Morton span straddling a quadrant seam goes
    * wide — measured here rather than taken on faith.
    *
    * Determinism: rows tie-broken by (ckey, x, y); rows with identical
    * triples are interchangeable, so every engine produces the same
    * per-file rectangles.
    */
  def curveLocality(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 16, numFiles: Int = 32, shardShift: Int = 24): DataFrame = {
    // ONE CACHED scan carries BOTH curve keys: uncached, each curve's
    // branch re-derived (x, y) + its key from the source for the ranked
    // frame, the shard-offsets agg, and the total agg — six corpus scans
    // for one (x, y) population (r20; guide §5 cache-when-reused). The
    // key folds are row-local, so computing both keys in one pass costs
    // one extra column, not a pass.
    val keyed = Dedup.cached(df
      .select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("zk", zOrderKey(col("x"), col("y"), bits))
      .withColumn("hk", hilbertKey(col("x"), col("y"), bits)))
    def summarize(ckeyCol: String, curve: String): DataFrame =
      rangeFileId(keyed.select(col("x"), col("y"), col(ckeyCol).as("ckey")),
          numFiles, shardShift)
        .groupBy(col("file"))
        .agg(min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          min(col("y")).as("y_min"), max(col("y")).as("y_max"))
        .select(
          ((col("x_max") - col("x_min") + 1L) *
            (col("y_max") - col("y_min") + 1L)).as("area"))
        .agg(
          count(lit(1)).as("n_files"),
          sum(col("area")).as("sum_area"),
          max(col("area")).as("max_area"))
        .select(lit(curve).as("curve"), col("n_files"),
          col("sum_area"), col("max_area"))
    summarize("zk", "morton").unionAll(summarize("hk", "hilbert"))
  }

  /** Small-file compaction plan: group a file inventory (one row per
    * file: `prefixCol` directory/partition, `keyCol` sort key unique
    * within its prefix, `sizeCol` bytes) into target-sized output bins,
    * preserving key contiguity — each bin is one rewrite task producing
    * one near-target-size file whose key range never interleaves with a
    * sibling bin's. This is the planning half of the OPTIMIZE/compaction
    * loop every large parquet lake runs continuously: billions of small
    * files are the #1 operational scan-cost pathology at 100 TB (per-file
    * open cost, tiny rowgroups, starved readers).
    *
    * Binning rule: files walk in key order per prefix; a file's bin is
    * ⌊exclusive-prefix-sum(size) / targetBytes⌋ — the single-window-pass
    * form of greedy packing. It is deterministic and SQL-portable;
    * compared to a stateful greedy packer it differs only around files
    * larger than the target (such a file overfills its bin and SKIPS the
    * following bin ids, so ids can be sparse). Only a prefix's last bin —
    * or one adjacent to an oversized file — can be undersized.
    *
    * Scale shape: ONE exchange (hash on the prefix), a per-prefix sort
    * whose width is files-per-directory (bounded by lake layout fan-out,
    * not corpus size), and a map-side-combinable final aggregation; no
    * self-join, no driver state. Integral `div` keeps the bin id exact —
    * no float seam even past 2⁵³ cumulative bytes.
    */
  def compactionPlan(inv: DataFrame, targetBytes: Long,
      prefixCol: String = "prefix", keyCol: String = "key",
      sizeCol: String = "size"): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be >= 1: $targetBytes")
    val w = Window.partitionBy(col(prefixCol)).orderBy(col("fkey"))
      .rowsBetween(Window.unboundedPreceding, -1)
    inv.select(col(prefixCol), col(keyCol).as("fkey"),
        col(sizeCol).cast("long").as("sz"))
      .withColumn("bef", coalesce(sum(col("sz")).over(w), lit(0L)))
      .withColumn("bin_id", expr(s"bef div ${targetBytes}L"))
      .groupBy(col(prefixCol), col("bin_id"))
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("sz")).as("bytes"),
        min(col("fkey")).as("first_key"),
        max(col("fkey")).as("last_key"))
  }

  /** Cluster a frame for writing in Z order: one range exchange on the
    * Morton key plus a partition-local sort — after `.write`, every
    * output file owns a contiguous zkey range and therefore a bounded
    * (x, y) rectangle. `numFiles` sizes the range partitioner; pick it so
    * files land near the rowgroup/file-size target, as with any
    * repartitionByRange write.
    */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 16, numFiles: Int = 32): DataFrame = {
    val keyed = df.withColumn("zkey", zOrderKey(col(xCol), col(yCol), bits))
    keyed.repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
  }

  /** [[clusterByZ]] on the Hilbert key — same one-range-exchange write
    * plan, tighter per-file rectangles (measured by [[curveLocality]]).
    */
  def clusterByH(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 16, numFiles: Int = 32): DataFrame =
    df.withColumn("hkey", hilbertKey(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("hkey"))
      .sortWithinPartitions(col("hkey"))
}
