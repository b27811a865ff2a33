package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Streaming Poisson-bootstrap CI — the unbounded twin of
  * [[graft.operators.Splits.bootstrapCiMean]]: the error bar on a live
  * feed's running mean, served at any point WITHOUT replaying the feed.
  *
  * Reference scope note: the reference engine has no streaming surface
  * (`handler.go:77-92` is a fixed refresh loop); extension-mandate
  * operator.
  *
  * Why this works: the bootstrap's replica state is the per-replica
  * `(sw, swx)` partials, and those are plain SUMS — additive across any
  * batching ([[CmsStream]]'s argument applied to a B-row state table).
  * Each micro-batch folds one map-side-combined replica-partials agg
  * (the batch operator's OWN fold,
  * [[graft.operators.Splits.poissonReplicaPartials]] — shared code, and
  * the Poisson draw is keyed on (row id, replica) so it is
  * batching-invariant) into the running B-row table, plus a 1-row
  * (n, Σx) totals fold for the exact mean. The served row derives the
  * percentile CI through
  * [[graft.operators.Splits.ciFromReplicaPartials]] — again shared
  * code — so EngineSpec pins `current` ≡ `bootstrapCiMean(all delivered
  * rows)` row-for-row under any split.
  *
  * Exactly-once accounting: partial sums are not idempotent, so the
  * monotone batch-id guard drops re-deliveries ([[CmsStream.SketchStore]]
  * discipline).
  */
object BootstrapStream {

  /** Running replica partials + exact totals for one monitored measure.
    * When `durable` carries a snapshot directory, every applied batch
    * writes BOTH state tables as one multi-table snapshot
    * ([[SnapshotStore.writeMulti]] — complete iff both tables landed, so
    * a crash mid-snapshot falls back to the previous one and the gap
    * replays on the guard) BEFORE the batch is acknowledged. State is
    * B+1 rows — KBs. Restore via [[BootstrapStore.restore]].
    */
  final class BootstrapStore(spark: SparkSession, idCol: String,
      valCol: String, b: Int, alphaPpm: Long = 50000L,
      durable: Option[String] = None) {
    require(b >= 4, s"need at least 4 replicas: $b")
    import spark.implicits._

    private def materialize(df: DataFrame): DataFrame = {
      val cut = spark.createDataFrame(df.rdd, df.schema)
        .persist(StorageLevel.MEMORY_AND_DISK)
      cut.count() // force now: a failed merge must fail BEFORE the swap
      cut
    }

    private val partialsRef = new AtomicReference[DataFrame](materialize(
      Seq.empty[(Int, Long, BigDecimal)].toDF("j", "sw", "swx")
        .select(col("j"), col("sw"), col("swx").cast("decimal(38,0)"))))
    private val totalsRef = new AtomicReference[DataFrame](materialize(
      Seq((0L, BigDecimal(0))).toDF("n", "sx")
        .select(col("n"), col("sx").cast("decimal(38,0)"))))
    @volatile private var lastBatch = -1L

    private[streaming] def seed(partials: DataFrame, totals: DataFrame,
        upto: Long): Unit = synchronized {
      val nP = materialize(partials.select(col("j"), col("sw"),
        col("swx").cast("decimal(38,0)").as("swx")))
      val nT = materialize(totals.select(col("n"),
        col("sx").cast("decimal(38,0)").as("sx")))
      val (oP, oT) = (partialsRef.get(), totalsRef.get())
      partialsRef.set(nP); totalsRef.set(nT)
      lastBatch = upto
      oP.unpersist(); oT.unpersist()
    }

    /** Fold one micro-batch in; replays drop on the guard. */
    def merge(batch: DataFrame, batchId: Long): Boolean = synchronized {
      if (batchId <= lastBatch) return false
      val bp = graft.operators.Splits
        .poissonReplicaPartials(batch, idCol, Nil, valCol, b)
      val mergedP = partialsRef.get().unionAll(bp)
        .groupBy(col("j"))
        .agg(sum(col("sw")).as("sw"),
          sum(col("swx")).cast("decimal(38,0)").as("swx"))
      val bt = batch.agg(count(lit(1)).as("n"),
        coalesce(sum(col(valCol).cast("long")).cast("decimal(38,0)"),
          lit(0).cast("decimal(38,0)")).as("sx"))
      val mergedT = totalsRef.get().unionAll(bt)
        .agg(sum(col("n")).as("n"),
          sum(col("sx")).cast("decimal(38,0)").as("sx"))
      val nextP = materialize(mergedP)
      val nextT = materialize(mergedT)
      // durable: both tables snapshot atomically BEFORE acknowledging
      durable.foreach(dir => SnapshotStore.writeMulti(spark, dir,
        Seq("partials" -> nextP, "totals" -> nextT), batchId))
      val (oldP, oldT) = (partialsRef.get(), totalsRef.get())
      partialsRef.set(nextP)
      totalsRef.set(nextT)
      lastBatch = batchId
      oldP.unpersist(); oldT.unpersist()
      true
    }

    /** `(b_reps, n_rows, mean_ppm, lo_ppm, hi_ppm)` over everything
      * delivered so far — the EXACT batch-operator row (shared folds),
      * derived at read time from the additive state.
      */
    def current: DataFrame = {
      val exact = totalsRef.get().select(col("n").as("n_rows"),
        (signum(col("sx")).cast("long") *
          expr("(CAST(1000000 AS DECIMAL(38,0)) * abs(sx)) div n"))
          .as("mean_ppm"))
      val ci = graft.operators.Splits
        .ciFromReplicaPartials(partialsRef.get(), b, alphaPpm)
      exact.crossJoin(broadcast(ci))
        .select(lit(b.toLong).as("b_reps"), col("n_rows"), col("mean_ppm"),
          col("lo_ppm"), col("hi_ppm"))
    }
  }

  object BootstrapStore {
    /** Rebuild a durable store from `dir`'s newest complete snapshot —
      * the restart path; a missing/empty `dir` restores a cold store.
      */
    def restore(spark: SparkSession, dir: String, idCol: String,
        valCol: String, b: Int, alphaPpm: Long = 50000L): BootstrapStore = {
      val store = new BootstrapStore(spark, idCol, valCol, b, alphaPpm,
        Some(dir))
      SnapshotStore.newestMulti(spark, dir, Seq("partials", "totals"))
        .foreach { case (upto, tables) =>
          store.seed(tables("partials"), tables("totals"), upto)
        }
      store
    }
  }

  /** `(batch, batchId) => Unit` for `writeStream.foreachBatch`. */
  def sink(store: BootstrapStore): (DataFrame, Long) => Unit =
    (batch, id) => { store.merge(batch, id); () }

  /** Wire a streaming source into `store` and start the query; callers
    * read `store.current` at any time.
    */
  def run(rows: DataFrame, store: BootstrapStore, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(sink(store))
      .outputMode("update")
      .start()
}
