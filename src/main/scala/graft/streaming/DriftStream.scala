package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Streaming distribution-drift monitor — the unbounded twin of
  * [[graft.operators.Hygiene.driftReport]]: an ingest stream's value
  * distributions fold into running per-column counts, and at ANY point
  * the served row per column is the floor-share ppm total-variation
  * distance against a fixed REFERENCE dump — the data-drift alarm a
  * pipeline keeps on a live feed (new crawl vs last known-good dump).
  *
  * Reference scope note: the reference engine has no streaming surface
  * (`handler.go:77-92` is a fixed refresh loop); extension-mandate
  * operator.
  *
  * Why this shape: value counts are ADDITIVE across any batching — the
  * [[CmsStream]] argument, applied to an NDV-bounded counts table
  * (bounded by the WATCHED COLUMNS' cardinality by contract: drift is
  * monitored on categorical/bucketed columns, the same contract as the
  * batch operator — bucket numerics first). Per batch: one
  * map-side-combined count per column, merged into the lineage-cut
  * running table (union + re-group, the [[PhashStream]] swap
  * discipline). The served TVD is DERIVED at read time from the folded
  * counts with the IDENTICAL integer algebra as the batch operator —
  * EngineSpec pins `current` ≡ `Hygiene.driftReport(reference, all
  * delivered rows)` row-for-row, under any batch split.
  *
  * Exactly-once accounting: count merge is not idempotent, so the
  * monotone batch-id guard drops re-deliveries ([[CmsStream.SketchStore]]
  * discipline).
  */
object DriftStream {

  /** Running per-column value counts vs a fixed reference dump. */
  final class DriftStore(spark: SparkSession, cols: Seq[String],
      reference: DataFrame) {
    require(cols.nonEmpty, "need at least one column to monitor")
    import spark.implicits._

    private def materialize(df: DataFrame): DataFrame = {
      val cut = spark.createDataFrame(df.rdd, df.schema)
        .persist(StorageLevel.MEMORY_AND_DISK)
      cut.count() // force now: a failed merge must fail BEFORE the swap
      cut
    }

    // the batch operator's null-safe key discipline: (coalesced value,
    // is-null flag), so a NULL category matches itself across the
    // reference and the stream instead of double-counting
    private def colCounts(df: DataFrame): DataFrame = cols.map { c =>
      df.groupBy(coalesce(col(c).cast("string"), lit("")).as("v"),
          col(c).isNull.as("vn"))
        .agg(count(lit(1)).as("n"))
        .select(lit(c).as("col_name"), col("v"), col("vn"), col("n"))
    }.reduce(_ unionAll _)

    // the reference side is counted ONCE at construction
    private val refCounts = materialize(colCounts(reference))
    private val runRef = new AtomicReference[DataFrame](materialize(
      Seq.empty[(String, String, Boolean, Long)].toDF("col_name", "v", "vn", "n")))
    @volatile private var lastBatch = -1L

    /** Fold one micro-batch's counts in; replays drop on the guard. */
    def merge(batch: DataFrame, batchId: Long): Boolean = synchronized {
      if (batchId <= lastBatch) return false
      val merged = runRef.get().unionAll(colCounts(batch))
        .groupBy(col("col_name"), col("v"), col("vn"))
        .agg(sum(col("n")).as("n"))
      val next = materialize(merged)
      val old = runRef.get()
      runRef.set(next)
      lastBatch = batchId
      old.unpersist()
      true
    }

    /** Per-column drift of everything delivered so far vs the reference:
      * `(col_name, n_a, n_b, ndv_union, tvd_ppm)` — the EXACT
      * [[graft.operators.Hygiene.driftReport]] floor-share integer
      * algebra over the folded counts (spec-pinned equal), derived at
      * read time so the served row is always consistent with the counts.
      */
    def current: DataFrame = {
      val a = refCounts.select(col("col_name"), col("v"), col("vn"),
        col("n").as("na_v"))
      val b = runRef.get().select(col("col_name"), col("v"), col("vn"),
        col("n").as("nb_v"))
      val j = a.join(b, Seq("col_name", "v", "vn"), "full_outer")
        .select(col("col_name"),
          coalesce(col("na_v"), lit(0L)).as("na_v"),
          coalesce(col("nb_v"), lit(0L)).as("nb_v"))
      val tot = j.groupBy(col("col_name"))
        .agg(sum(col("na_v")).as("n_a"), sum(col("nb_v")).as("n_b"))
      j.join(broadcast(tot), Seq("col_name"))
        .select(col("col_name"), col("n_a"), col("n_b"),
          expr("CASE WHEN n_a > 0 THEN na_v * 1000000 DIV n_a ELSE 0 END")
            .as("pa_ppm"),
          expr("CASE WHEN n_b > 0 THEN nb_v * 1000000 DIV n_b ELSE 0 END")
            .as("pb_ppm"))
        .groupBy(col("col_name"))
        .agg(min(col("n_a")).as("n_a"), min(col("n_b")).as("n_b"),
          count(lit(1)).as("ndv_union"),
          sum(abs(col("pa_ppm") - col("pb_ppm"))).as("sad_ppm"))
        .select(col("col_name"), col("n_a"), col("n_b"), col("ndv_union"),
          expr("sad_ppm DIV 2").as("tvd_ppm"))
    }
  }

  /** `(batch, batchId) => Unit` for `writeStream.foreachBatch`. */
  def sink(store: DriftStore): (DataFrame, Long) => Unit =
    (batch, id) => { store.merge(batch, id); () }

  /** Wire a streaming source into `store` and start the query; callers
    * read `store.current` at any time.
    */
  def run(rows: DataFrame, store: DriftStore, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(sink(store))
      .outputMode("update")
      .start()
}
