package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Streaming CUSUM changepoint monitor — the unbounded twin of
  * [[graft.operators.Temporal.cusumChangepoints]]: a drift alarm that
  * stays current as events arrive.
  *
  * Reference scope note: the reference engine has no streaming surface
  * (`handler.go:77-92`); extension-mandate operator.
  *
  * The algebra: the statistic is a pure function of the per-bucket value
  * SUMS, and bucket sums are ADDITIVE across any batching of the stream —
  * so the ONLY state is the (bucket, v) table (time-bounded, the batch
  * operator's contract), merged per batch by keyed FULL OUTER + sum (the
  * [[TransitionsStream]] count-merge shape) behind a monotone batch-id
  * guard. No boundary row is needed (unlike transitions): addition has
  * no order. `current` derives the full scan — scaled statistics and the
  * argmax flag — from the folded table at read time via the SHARED batch
  * operator, so streamed-vs-batch equality is an algebraic identity, and
  * late/out-of-order events are handled exactly (they just add into
  * their bucket; a changepoint can legitimately move — the monitor
  * recomputes, it never rewrites history because the statistic owns no
  * history).
  */
object CusumStream {

  /** Per-bucket value sums across micro-batches. When `durable` carries
    * a snapshot directory, every applied batch writes the merged table
    * (time-bounded by contract) BEFORE the batch is acknowledged, so a
    * driver restart rebuilds the exact folded state via [[restore]] and
    * checkpoint-replayed batches drop on the monotone guard — the
    * [[CmsStream.SketchStore]] durability shape.
    */
  final class CusumStore(spark: SparkSession, durable: Option[String] = None) {
    import spark.implicits._

    private def materialize(df: DataFrame): DataFrame = {
      val cut = spark.createDataFrame(df.rdd, df.schema)
        .persist(StorageLevel.MEMORY_AND_DISK)
      cut.count()
      cut
    }

    private val sumsRef = new AtomicReference[DataFrame](materialize(
      Seq.empty[(Long, Long)].toDF("bucket", "v")))
    @volatile private var lastBatch = -1L

    private[streaming] def seed(df: DataFrame, upto: Long): Unit = synchronized {
      val nc = materialize(df.select(col("bucket"), col("v")))
      val oc = sumsRef.get()
      sumsRef.set(nc)
      lastBatch = upto
      oc.unpersist()
    }

    /** The monitor read: the batch operator over the folded sums. */
    def current: DataFrame =
      graft.operators.Temporal.cusumChangepoints(sumsRef.get())

    /** The raw folded (bucket, v) table, for spec equality checks. */
    private[graft] def sums: DataFrame = sumsRef.get()

    /** Fold one micro-batch of (bucket, v) rows; single-writer
      * synchronized, monotone batch-id guard (at-least-once delivery
      * folds each batch exactly once).
      */
    def merge(batch: DataFrame, batchId: Long): Boolean = synchronized {
      if (batchId <= lastBatch) return false
      val bc = batch.groupBy(col("bucket")).agg(sum(col("v")).as("bv"))
      val merged = sumsRef.get().as("o")
        .join(bc.as("b"), col("o.bucket") === col("b.bucket"), "full_outer")
        .select(
          coalesce(col("o.bucket"), col("b.bucket")).as("bucket"),
          (coalesce(col("o.v"), lit(0L)) + coalesce(col("b.bv"), lit(0L))).as("v"))
      val nc = materialize(merged)
      // durable: snapshot BEFORE acknowledging, so a crash between write
      // and ack only re-folds a batch the guard then drops
      durable.foreach(dir => SnapshotStore.write(spark, dir, nc, batchId))
      val oc = sumsRef.get()
      sumsRef.set(nc)
      lastBatch = batchId
      oc.unpersist()
      true
    }
  }

  object CusumStore {
    /** Rebuild a durable store from `dir`'s newest complete snapshot —
      * the restart path; a missing/empty `dir` restores a cold store.
      */
    def restore(spark: SparkSession, dir: String): CusumStore = {
      val store = new CusumStore(spark, Some(dir))
      SnapshotStore.newest(spark, dir).foreach { case (upto, df) =>
        store.seed(df, upto)
      }
      store
    }
  }

  /** `(batch, batchId) => Unit` for `writeStream.foreachBatch`. */
  def sink(store: CusumStore): (DataFrame, Long) => Unit =
    (batch, id) => { store.merge(batch, id); () }
}
