package graft.streaming

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.sql.DataFrame

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
    * Restart limitation (by design, documented not hidden): the merged
    * counters live in driver memory only. If the driver restarts, the
    * checkpoint marks delivered batches as committed, so they are NOT
    * replayed into the fresh empty store — counts before the restart are
    * lost, and estimates undercount until the store is rebuilt (re-run
    * over the retained source, or periodically snapshot `counters` — the
    * d·w table is bounded — and seed a new store from the snapshot).
    */
  final class SketchStore(val width: Int, val depth: Int) {
    require(width >= 2 && depth >= 1, s"need width>=2, depth>=1: $width/$depth")
    private val ref = new AtomicReference[Map[Long, Long]](Map.empty)
    private val lastBatch = new AtomicLong(-1L)

    def counters: Map[Long, Long] = ref.get()

    /** Key-wise add one batch's collected cells; re-delivered batch ids
      * (≤ the last applied) are dropped, so replay never double-counts.
      * Returns whether the batch was applied. Atomic w.r.t. concurrent
      * `add` calls (see class note).
      */
    def add(batchId: Long, cells: Map[Long, Long]): Boolean = synchronized {
      if (batchId <= lastBatch.get()) return false
      val cur = ref.get()
      ref.set(cells.foldLeft(cur) { case (m, (k, n)) =>
        m.updated(k, m.getOrElse(k, 0L) + n)
      })
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
