package graft.streaming

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.TextAnalysis

/** Streaming Count-Min Sketch — running token-frequency estimates over an
  * unbounded document stream, the streaming twin of
  * [[graft.operators.TextAnalysis.cmsTokenEstimates]].
  *
  * Reference scope note: the reference engine has no streaming surface
  * (`handler.go:77-92` is a fixed refresh loop); this is part of the
  * build's training-data-pipeline extension mandate.
  *
  * Why this shape: CMS counter tables MERGE by key-wise addition — the
  * same property that lets the batch operator's map-side partials combine
  * makes the micro-batch the unit of merge here. Each batch runs the
  * distributed build half ([[TextAnalysis.cmsCells]], map-side combined to
  * ≤ d·w rows per task partial), collects the BOUNDED d·w counter table,
  * and adds it into the driver-held running map. Holding the merged
  * counters on the driver is not a scale compromise — a bounded driver
  * sketch is the entire point of CMS (the alternative, exact distinct-key
  * counting state, is what stops fitting); d·w longs serve any probe rate.
  *
  * Exactly-once accounting under `foreachBatch`'s at-least-once replay:
  * counting is NOT idempotent (re-adding a delivered batch double-counts —
  * unlike [[ComponentsStream]]'s min-label merge), so the store keeps the
  * last applied batch id and drops re-deliveries at or below it — the
  * standard idempotent-sink discipline ([[IdempotentSink]]), applied to a
  * monotone batch counter instead of a key overwrite.
  */
object CmsStream {

  /** Running counter map (key `j·width + b`), merged per micro-batch.
    *
    * Concurrency contract: [[add]] is `synchronized` — the batch-id guard
    * plus the read-modify-write merge must be one atomic step, or two
    * writers (e.g. two queries wired to one store) could both pass the
    * guard and double-count, or interleave merges and lose one. The
    * expected topology is still ONE streaming query per store
    * (`foreachBatch` invokes the sink serially); the lock makes the
    * multi-writer misuse safe instead of silently wrong. Reads
    * ([[counters]], [[estimates]]) stay lock-free on the immutable map.
    *
    * Restart durability: with `durable = Some((spark, dir))`, every
    * applied batch writes the MERGED counter table (d·w rows — bounded,
    * so the write is a few KB) plus the applied batch id to
    * `dir/upto=<batchId>` BEFORE the in-memory swap and before the sink
    * returns — i.e. before Structured Streaming's checkpoint commits the
    * batch. A driver restart therefore cannot lose an acknowledged
    * batch: [[SketchStore.restore]] rebuilds the store from the newest
    * complete snapshot (its `_SUCCESS` marker gates completeness), and
    * any batch the checkpoint replays at or below the restored id is
    * dropped by the monotone guard — the counters and the checkpoint can
    * never disagree. Older snapshots are pruned to the last two. Without
    * `durable` the store is memory-only (the previous behavior, fine for
    * probes over a replayable source).
    */
  final class SketchStore(val width: Int, val depth: Int,
      durable: Option[(SparkSession, String)] = None) {
    require(width >= 2 && depth >= 1, s"need width>=2, depth>=1: $width/$depth")
    private val ref = new AtomicReference[Map[Long, Long]](Map.empty)
    private val lastBatch = new AtomicLong(-1L)

    def counters: Map[Long, Long] = ref.get()

    /** The last applied batch id (−1 when nothing applied yet). */
    def lastApplied: Long = lastBatch.get()

    private[streaming] def seed(counters: Map[Long, Long], upto: Long): Unit = {
      ref.set(counters)
      lastBatch.set(upto)
    }

    /** Key-wise add one batch's collected cells; re-delivered batch ids
      * (≤ the last applied) are dropped, so replay never double-counts.
      * Returns whether the batch was applied. Atomic w.r.t. concurrent
      * `add` calls (see class note). When durable, the snapshot write
      * happens FIRST — a failed write fails the batch (so the checkpoint
      * does not commit it and it replays), never the other way around.
      */
    def add(batchId: Long, cells: Map[Long, Long]): Boolean = synchronized {
      if (batchId <= lastBatch.get()) return false
      val cur = ref.get()
      val merged = cells.foldLeft(cur) { case (m, (k, n)) =>
        m.updated(k, m.getOrElse(k, 0L) + n)
      }
      durable.foreach { case (spark, dir) =>
        SketchStore.writeSnapshot(spark, dir, merged, batchId)
      }
      ref.set(merged)
      lastBatch.set(batchId)
      true
    }

    /** Row-local probe against the CURRENT merged counters — identical
      * estimation semantics to the batch operator (min over rows, absent
      * counter = 0, always an overestimate, exact without collisions).
      */
    def estimates(probes: DataFrame, probeCol: String = "token"): DataFrame =
      TextAnalysis.cmsProbe(counters, probes, width, depth, probeCol)
  }

  object SketchStore {
    private[streaming] def writeSnapshot(spark: SparkSession, dir: String,
        counters: Map[Long, Long], batchId: Long): Unit = {
      import spark.implicits._
      SnapshotStore.write(spark, dir, counters.toSeq.toDF("cell", "n"),
        batchId)
    }

    /** Rebuild a durable store from `dir`'s newest complete snapshot —
      * the restart path. The restored store keeps writing snapshots to
      * the same `dir`; checkpoint-replayed batches at or below the
      * restored id are dropped by the monotone guard. A missing or empty
      * `dir` restores a cold store (first run). `dir` may be any
      * Spark-writable scheme ([[SnapshotStore]]).
      */
    def restore(spark: SparkSession, dir: String,
        width: Int, depth: Int): SketchStore = {
      val store = new SketchStore(width, depth, Some((spark, dir)))
      SnapshotStore.newest(spark, dir).foreach { case (upto, df) =>
        store.seed(df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
          upto)
      }
      store
    }
  }

  /** `(batch, batchId) => Unit` for `writeStream.foreachBatch`: run the
    * distributed build half on the batch, collect the bounded cell table,
    * merge.
    */
  def sink(store: SketchStore, textCol: String = "text"): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      store.add(batchId, TextAnalysis.cmsCollect(
        TextAnalysis.cmsCells(batch, store.width, store.depth, textCol),
        store.width))

  /** Wire a streaming document source into `store` and start the query;
    * callers probe `store.estimates(...)` at any time.
    */
  def run(docs: DataFrame, store: SketchStore, checkpointDir: String,
          textCol: String = "text"): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(sink(store, textCol))
      .outputMode("update")
      .start()
}
