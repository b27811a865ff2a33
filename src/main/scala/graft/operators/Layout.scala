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
}
