package graft.streaming

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.Multimodal

/** Streaming perceptual image dedup — the streaming twin of the batch
  * `mm_phash_dup` composition: micro-batches of (doc_id, payload) images
  * are average-hashed row-locally ([[Multimodal.imageAHash]], the verified
  * batch operator) and merged into a hash-group registry held across
  * batches, so every arriving image gets a near-dup verdict against ALL
  * content seen so far, not just its own batch.
  *
  * Reference scope note: the reference engine has no image or streaming
  * surface (`handler.go:77-92` is a fixed refresh loop); this is part of
  * the build's training-data-pipeline extension mandate.
  *
  * Why this shape: a perceptual-dup registry MERGES by key — per 64-bit
  * hash, `rep_id` combines by MIN and `n_dups` by SUM — the same
  * mergeability that lets the batch groupBy combine map-side makes the
  * micro-batch the unit of merge ([[CmsStream]]'s argument, applied to a
  * DataFrame-sized registry instead of a bounded driver sketch: the
  * registry is one row per DISTINCT content hash, corpus-scale state that
  * belongs in a table, not on the driver). Per batch: hash the batch
  * (row-local, zero exchanges), group it (map-side combined on the hash
  * key), union with the registry, re-group — cost is |batch| + |registry|
  * with no pair join anywhere; corrupt payloads (the (-1, -1) sentinel)
  * are excluded from grouping exactly as the batch registry row excludes
  * them.
  *
  * Exactly-once accounting under `foreachBatch`'s at-least-once replay:
  * `n_dups` SUM-merge is NOT idempotent (unlike [[ComponentsStream]]'s
  * min-label merge), so the store keeps the last applied batch id and
  * drops re-deliveries at or below it — the [[CmsStream.SketchStore]]
  * monotone-guard discipline. The swap is atomic and lineage-cut
  * ([[ComponentsStream.LabelStore]]'s materialize-before-swap), so a
  * failed merge keeps the previous registry and batch N's plan never
  * re-derives batches 0..N-1.
  */
object PhashStream {

  /** (ahash_hi, ahash_lo, rep_id, n_dups) registry held across batches. */
  final class HashGroupStore(spark: SparkSession, initial: DataFrame) {
    private def materialize(df: DataFrame): DataFrame = {
      val cut = spark.createDataFrame(df.rdd, df.schema)
        .persist(StorageLevel.MEMORY_AND_DISK)
      cut.count() // force now: a failed merge must fail BEFORE the swap
      cut
    }
    private val ref = new AtomicReference[DataFrame](materialize(
      initial.select(col("ahash_hi"), col("ahash_lo"), col("rep_id"), col("n_dups"))))
    private val lastBatch = new AtomicLong(-1L)

    /** The current registry — always fully materialized, never mid-merge. */
    def current: DataFrame = ref.get()

    /** Merge one micro-batch of hashed rows (doc_id, ahash_hi, ahash_lo);
      * re-delivered batch ids (≤ the last applied) are dropped so replay
      * never double-counts. Returns whether the batch was applied.
      */
    def merge(batchId: Long, hashed: DataFrame): Boolean = synchronized {
      if (batchId <= lastBatch.get()) return false
      val old = ref.get()
      val grouped = hashed
        .filter(col("ahash_hi") >= 0)
        .groupBy(col("ahash_hi"), col("ahash_lo"))
        .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_dups"))
      if (!grouped.isEmpty) {
        val next = materialize(old.unionAll(grouped)
          .groupBy(col("ahash_hi"), col("ahash_lo"))
          .agg(min(col("rep_id")).as("rep_id"), sum(col("n_dups")).as("n_dups")))
        ref.set(next)
        old.unpersist()
      }
      lastBatch.set(batchId)
      true
    }
  }

  /** An empty cold-start registry with the store's schema. */
  def emptyGroups(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long, Long)]
      .toDF("ahash_hi", "ahash_lo", "rep_id", "n_dups")
  }

  /** `(batch, batchId) => Unit` for `writeStream.foreachBatch`: hash the
    * batch's payloads row-locally, merge the groups.
    */
  def sink(store: HashGroupStore, grid: Int = 8): (DataFrame, Long) => Unit =
    (batch, batchId) => store.merge(batchId, Multimodal.imageAHash(batch, grid))

  /** Wire a streaming (doc_id, payload) source into `store` and start the
    * query; callers read `store.current` at any time.
    */
  def run(images: DataFrame, store: HashGroupStore, checkpointDir: String,
          grid: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    images.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(sink(store, grid))
      .outputMode("update")
      .start()
}
