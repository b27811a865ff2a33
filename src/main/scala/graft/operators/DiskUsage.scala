package graft.operators

import java.util.concurrent.{Executors, ScheduledExecutorService, ThreadFactory, TimeUnit}
import java.util.concurrent.atomic.AtomicReference
import scala.concurrent.duration.FiniteDuration
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One aggregate row per address.
  * Reference: the external `DiskUsage` output type, /root/reference/README.md:44-48.
  */
final case class DiskUsage(address: String, sizeBytes: Long, numberFiles: Long)

/** The reference's single query — hash group-by with SUM + COUNT over the
  * first path segment of an object key — as one declarative DataFrame chain.
  *
  * Reference pipeline re-expressed (all cites into /root/reference/handler.go):
  *  - projection of `key`,`size` out of the 20-column inventory schema
  *    (:205-221) → `select` (Catalyst prunes the parquet scan down to the two
  *    columns, strictly better than the reference's decode-everything
  *    `ReadTable` at :190);
  *  - malformed-key filter, keys without `/` dropped (:234-238) → `filter`;
  *  - first-path-segment extraction (:234,239) → `substring_index(key,"/",1)`;
  *  - hash aggregate SUM(size), COUNT(*) by address (:231-251) →
  *    `groupBy.agg` = partial (map-side) + final `HashAggregate` with a
  *    single shuffle on `address`, spill-capable — the 100 TB form of the
  *    reference's in-RAM Go map.
  */
object DiskUsageOp {

  /** inventory(keyCol: string, sizeCol: long) → (address, size_bytes, number_files). */
  def aggregate(
      inventory: DataFrame,
      keyCol: String = "key",
      sizeCol: String = "size"): DataFrame =
    inventory
      .select(col(keyCol).cast("string").as("key"), col(sizeCol).cast("long").as("size"))
      .filter(col("key").contains("/")) // handler.go:234-238
      .groupBy(substring_index(col("key"), "/", 1).as("address"))
      .agg(
        sum(col("size")).as("size_bytes"),
        count(lit(1)).as("number_files"))

  /** Same shape for a fractional size column (fixtures use double `value`);
    * sums go through DECIMAL(18,4) so results are exact and order-insensitive
    * (double summation order varies across partitions/engines). `size_bytes`
    * stays DECIMAL(28,4) — this is the PARTIALS CARRIER for
    * [[mergeSnapshots]]: keeping the exact type end-to-end is what makes
    * merge == full-recompute hold at any magnitude (a double carrier rounds
    * per-address totals beyond 2^53 scaled units, i.e. ~0.9 TB at scale 4 —
    * exactly the regime a 100 TB inventory lives in).
    */
  def aggregateFractionalDecimal(
      inventory: DataFrame,
      keyCol: String = "key",
      sizeCol: String = "size"): DataFrame =
    inventory
      .select(col(keyCol).cast("string").as("key"), col(sizeCol).as("size"))
      .filter(col("key").contains("/"))
      .groupBy(substring_index(col("key"), "/", 1).as("address"))
      .agg(
        sum(col("size").cast(DecimalType(18, 4))).cast(DecimalType(28, 4)).as("size_bytes"),
        count(lit(1)).as("number_files"))

  /** [[aggregateFractionalDecimal]] with `size_bytes` cast to double — the
    * SERVING-EDGE form (the reference serves float64, handler.go:24-28).
    * Snapshots that will be re-merged incrementally should use the decimal
    * form and cast at the edge instead.
    */
  def aggregateFractional(
      inventory: DataFrame,
      keyCol: String = "key",
      sizeCol: String = "size"): DataFrame =
    aggregateFractionalDecimal(inventory, keyCol, sizeCol)
      .withColumn("size_bytes", col("size_bytes").cast("double"))

  /** Skew-hardened two-phase variant for hot address prefixes at 100 TB scale:
    * salt the group key, partially aggregate per (address, salt), then combine.
    * Identical result to [[aggregate]]; the extra narrow aggregation bounds the
    * per-key fan-in of the final shuffle. (SURVEY.md §7.2 step 4 — AQE skew
    * handling applies to joins, not aggregates, so salting is the mitigation.)
    */
  def aggregateSalted(
      inventory: DataFrame,
      keyCol: String = "key",
      sizeCol: String = "size",
      saltBuckets: Int = 64): DataFrame =
    inventory
      .select(col(keyCol).cast("string").as("key"), col(sizeCol).cast("long").as("size"))
      .filter(col("key").contains("/"))
      .select(
        substring_index(col("key"), "/", 1).as("address"),
        (pmod(xxhash64(col("key")), lit(saltBuckets))).as("salt"),
        col("size"))
      .groupBy(col("address"), col("salt"))
      .agg(sum(col("size")).as("s"), count(lit(1)).as("n"))
      .groupBy(col("address"))
      .agg(sum(col("s")).as("size_bytes"), sum(col("n")).as("number_files"))

  /** INCREMENTAL refresh: combine already-aggregated snapshots (yesterday's
    * served table + today's delta aggregate) instead of rescanning the full
    * history — the SUM/COUNT aggregate is decomposable, so merging partials
    * is exact and the refresh cost drops from O(history) to O(delta +
    * |addresses|). At 100 TB this is the difference between a daily full
    * scan and a daily delta scan; the reference recomputes from scratch
    * every cycle (handler.go:77-92), which this extension makes optional.
    *
    * Inputs are (address, size_bytes, number_files) snapshots
    * ([[aggregate]]/[[aggregateFractionalDecimal]] output); sums re-run
    * through DECIMAL and the output KEEPS the DECIMAL(28,4) carrier type,
    * so merges are exact, order-insensitive, and chainable (today's merge
    * output is tomorrow's history input) at any magnitude below 10^24
    * scaled units. Cast to double only at the serving edge. Feeding
    * snapshots that already passed through a double edge works but caps
    * exactness at 2^53 scaled units — keep the carrier decimal end-to-end.
    * Result is value-identical to aggregating the concatenated inventories
    * (EngineSpec asserts it; the registry row's oracle IS the full
    * recompute).
    */
  def mergeSnapshots(snapshots: DataFrame*): DataFrame = {
    require(snapshots.nonEmpty, "need at least one snapshot")
    snapshots.reduce(_ unionAll _)
      .groupBy(col("address"))
      .agg(
        sum(col("size_bytes").cast(DecimalType(28, 4)))
          .cast(DecimalType(28, 4)).as("size_bytes"),
        sum(col("number_files")).as("number_files"))
  }
}

/** Periodic-refresh serving handler: the reference's whole lifecycle
  * (/root/reference/handler.go:39-92,257-262) on Spark.
  *
  *  - `loadInventory` produces the current inventory DataFrame (manifest
  *    resolution + multi-path parquet read; injectable so fixtures swap in
  *    for S3 — SURVEY.md §7.4).
  *  - Construction runs one synchronous refresh (run-at-start, handler.go:58)
  *    so callers can query immediately, then schedules the periodic job
  *    (handler.go:56-66).
  *  - Each refresh fully replaces the served snapshot via AtomicReference swap
  *    — the race-free version of handler.go:30,252,258.
  *  - A failed refresh logs and KEEPS the previous snapshot. This deliberately
  *    fixes the reference's `log.Fatalf`-kills-the-process behavior on decode
  *    errors (handler.go:176,186,192).
  *
  * The collected map is valid while address cardinality fits driver memory
  * (true for the reference's use case). At higher cardinality, serve from the
  * aggregated DataFrame itself (cached / complete-mode memory sink) and probe
  * with `filter(col("address") === addr)` — see [[DiskUsageOp.aggregate]].
  */
final class DiskUsageHandler(
    loadInventory: () => DataFrame,
    refreshEvery: FiniteDuration,
    keyCol: String = "key",
    sizeCol: String = "size")
    extends AutoCloseable {

  private val snapshot = new AtomicReference[Map[String, DiskUsage]](Map.empty)
  private val refreshes = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Synchronized: overlapping refreshes (scheduler tick + manual call)
    * would otherwise race compute-then-set and could publish the OLDER
    * inventory's snapshot over the newer one.
    */
  def refreshOnce(): Unit = synchronized {
    val rows = DiskUsageOp
      .aggregate(loadInventory(), keyCol, sizeCol)
      .withColumnsRenamed(Map("size_bytes" -> "sizeBytes", "number_files" -> "numberFiles"))
      .as(Encoders.product[DiskUsage])
      .collect()
    snapshot.set(rows.iterator.map(d => d.address -> d).toMap) // handler.go:252, race-free
    refreshes.incrementAndGet(): Unit
  }

  private val exec: ScheduledExecutorService =
    Executors.newSingleThreadScheduledExecutor(new ThreadFactory {
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, "disk-usage-refresh"); t.setDaemon(true); t
      }
    })

  refreshOnce() // handler.go:58 — blocking first refresh
  exec.scheduleAtFixedRate(
    () =>
      try refreshOnce()
      catch { // cron.Recover chain, handler.go:48 — survive, keep old snapshot
        case NonFatal(e) => System.err.println(s"[disk-usage] refresh failed: ${e.getMessage}")
      },
    refreshEvery.toMillis,
    refreshEvery.toMillis,
    TimeUnit.MILLISECONDS)

  /** Point lookup (/root/reference/handler.go:257-262); `None` is the
    * idiomatic `ErrNotFound` (/root/reference/types.go:6).
    */
  def getDiskUsage(address: String): Option[DiskUsage] = snapshot.get.get(address)

  def refreshCount: Long = refreshes.get()

  def close(): Unit = exec.shutdownNow() // handler.go:70-72
}
