package graft.operators

import java.time.Instant

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{Inventory, Manifest}

/** The reference's whole refresh pipeline as one composition
  * (/root/reference/handler.go:77-92): resolve the dated manifest key
  * (01:00-UTC pin + previous-day fallback), parse the manifest, scan its
  * file list as ONE multi-path parquet read (the §2.4 accumulate-not-
  * overwrite fix), aggregate, serve.
  *
  * I/O is injected: `fetch` returns the manifest JSON for a key (None =
  * not found, mapping the reference's ErrNotFound probe,
  * handler.go:146-164); `dataRoot` prefixes manifest file keys into
  * concrete paths (`file:/…` fixtures and `s3a://bucket` production run
  * the identical code — SURVEY.md §7.4's injectability requirement).
  */
object InventoryPipeline {

  /** Manifest + inventory DataFrame for `now`'s day, or yesterday's on
    * fallback; None when neither day has a manifest.
    */
  def inventoryForDay(
      spark: SparkSession,
      dataRoot: String,
      prefix: String,
      now: Instant,
      fetch: String => Option[String]): Option[(Inventory, DataFrame)] =
    Manifest
      .resolveWithFallback(now)(ts => fetch(Manifest.manifestKey(prefix, ts)))
      .map(Manifest.parseInventory)
      .map(inv => (inv, spark.read.parquet(inv.dataPaths(dataRoot): _*)))

  /** Serving handler over the manifest-driven pipeline: every refresh
    * re-resolves the manifest for the current day — i.e. the cron job of
    * handler.go:56-66 end to end. Throws at construction if no manifest
    * exists for today or yesterday (matching the reference's fatal first
    * run); later refresh failures keep the previous snapshot.
    */
  def servingHandler(
      spark: SparkSession,
      dataRoot: String,
      prefix: String,
      clock: () => Instant,
      fetch: String => Option[String],
      refreshEvery: FiniteDuration): DiskUsageHandler =
    new DiskUsageHandler(
      () =>
        inventoryForDay(spark, dataRoot, prefix, clock(), fetch)
          .map(_._2)
          .getOrElse(sys.error("no manifest found for today or yesterday")),
      refreshEvery)
}
