package graft.streaming

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming heavy hitters — a running Misra–Gries summary over an
  * unbounded document stream, the streaming twin of
  * [[graft.operators.TextAnalysis.heavyHitters]]' candidate pass.
  *
  * Reference scope note: the reference engine has no streaming surface
  * (`handler.go:77-92` is a fixed refresh loop); this is part of the
  * build's training-data-pipeline extension mandate.
  *
  * Why this shape: MG summaries are MERGEABLE (Agarwal, Cormode, Huang,
  * Phillips, Wei, Yi, "Mergeable Summaries", PODS'12): combining two
  * k-counter summaries by key-wise addition and then subtracting the
  * (k+1)-th largest count from every counter yields a k-counter summary
  * of the CONCATENATED stream with the same error bound — so the
  * micro-batch is the unit of merge exactly as in [[CmsStream]]. Each
  * batch runs the [[graft.functions.MisraGriesAgg]] aggregate (bounded
  * ≤ k partials, buffer-merged distributedly), collects the single ≤ k
  * summary row, and MG-merges it into the driver-held running summary. The invariant served at any
  * point in the stream: freq(t) − N/(k+1) ≤ ĉ(t) ≤ freq(t) over all N
  * tokens delivered so far — every token above the N/(k+1) support line
  * is guaranteed present. (The batch operator's second exact-recount pass
  * has no streaming form without reprocessing the corpus; the summary IS
  * the streaming deliverable, and a periodic batch recount of its ≤ k
  * candidates hardens it when the source is retained.)
  *
  * Exactly-once accounting under `foreachBatch`'s at-least-once replay:
  * MG-merge is not idempotent, so the store keeps the last applied batch
  * id and drops re-deliveries — the same monotone-batch-id discipline as
  * [[CmsStream.SketchStore]], with the same single-store-per-query
  * topology and the same durable-snapshot restart path (`durable` +
  * [[MgStore.restore]]): the ≤ k summary writes to the snapshot table
  * before the batch is acknowledged, so a driver restart rebuilds the
  * exact summary and replayed batches are dropped by the guard.
  */
object HeavyHittersStream {

  /** The mergeable-summaries combine step: key-wise add, then, if over
    * `k` counters, subtract the (k+1)-th largest count from every
    * counter and drop the non-positive — at most k survive and every
    * counter absorbed the same offset (preserving the MG error bound).
    */
  private[graft] def mgMerge(
      a: Map[String, Long], b: collection.Map[String, Long], k: Int): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      val cut = combined.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      combined.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }

  /** One micro-batch's MG(k) summary via the
    * [[graft.functions.MisraGriesAgg]] aggregate (bounded partials,
    * buffer-merged distributedly): ONE collected row of ≤ k pairs.
    */
  private[graft] def batchSummary(
      batch: DataFrame, k: Int, textCol: String): Map[String, Long] = {
    val row = batch
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .agg(graft.functions.MisraGriesSketch(col("token"), k).as("mg"))
      .select(explode(col("mg")).as("c"))
      .select(col("c.token"), col("c.count"))
      .collect()
    row.map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Running MG summary, merged per micro-batch. Same concurrency
    * contract as [[CmsStream.SketchStore]]: `add` is one atomic
    * guard+merge step; reads are lock-free on the immutable map.
    */
  final class MgStore(val k: Int,
      durable: Option[(SparkSession, String)] = None) {
    require(k >= 2, s"k must be >= 2: $k")
    private val ref = new AtomicReference[Map[String, Long]](Map.empty)
    private val lastBatch = new AtomicLong(-1L)

    /** Current summary: ≤ k (token, lower-bound count) pairs. */
    def summary: Map[String, Long] = ref.get()

    /** The last applied batch id (−1 when nothing applied yet). */
    def lastApplied: Long = lastBatch.get()

    private[streaming] def seed(s: Map[String, Long], upto: Long): Unit = {
      ref.set(s)
      lastBatch.set(upto)
    }

    /** MG-merge one batch summary; re-delivered batch ids are dropped.
      * When durable, the merged ≤ k summary writes to the snapshot table
      * FIRST ([[CmsStream.SketchStore]]'s ordering: a failed write fails
      * the batch so it replays — never a committed batch with lost
      * counts).
      */
    def add(batchId: Long, batch: Map[String, Long]): Boolean = synchronized {
      if (batchId <= lastBatch.get()) return false
      val merged = mgMerge(ref.get(), batch, k)
      durable.foreach { case (spark, dir) =>
        MgStore.writeSnapshot(spark, dir, merged, batchId)
      }
      ref.set(merged)
      lastBatch.set(batchId)
      true
    }
  }

  object MgStore {
    private[streaming] def writeSnapshot(spark: SparkSession, dir: String,
        summary: Map[String, Long], batchId: Long): Unit = {
      import spark.implicits._
      SnapshotStore.write(spark, dir, summary.toSeq.toDF("token", "count"),
        batchId)
    }

    /** Rebuild a durable store from `dir`'s newest complete snapshot —
      * the restart path ([[CmsStream.SketchStore.restore]] semantics:
      * `_SUCCESS`-gated newest snapshot, replays below the restored id
      * dropped, cold start on a missing dir; any Spark-writable scheme
      * via [[SnapshotStore]]).
      */
    def restore(spark: SparkSession, dir: String, k: Int): MgStore = {
      val store = new MgStore(k, Some((spark, dir)))
      SnapshotStore.newest(spark, dir).foreach { case (upto, df) =>
        store.seed(df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap,
          upto)
      }
      store
    }
  }

  /** `(batch, batchId) => Unit` for `writeStream.foreachBatch`. */
  def sink(store: MgStore, textCol: String = "text"): (DataFrame, Long) => Unit =
    (batch, batchId) => store.add(batchId, batchSummary(batch, store.k, textCol))

  /** Wire a streaming document source into `store` and start the query;
    * callers read `store.summary` at any time.
    */
  def run(docs: DataFrame, store: MgStore, checkpointDir: String,
          textCol: String = "text"): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(sink(store, textCol))
      .outputMode("update")
      .start()
}
