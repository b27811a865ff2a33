package graft.streaming

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.Splits

/** Streaming fixed-size per-stratum sampling — the streaming twin of
  * [[graft.operators.Splits.samplePerStratum]]: micro-batches of documents
  * maintain a RUNNING "k per language/source" sample over everything seen
  * so far, the always-fresh eval/inspection cut a continuously-ingesting
  * corpus pipeline wants without re-scanning history.
  *
  * Reference scope note: the reference engine has no streaming surface
  * (`handler.go:77-92` is a fixed refresh loop); this is part of the
  * build's training-data-pipeline extension mandate.
  *
  * Why this shape: the batch operator's selection — the k smallest
  * `md5(id:seed)` keys per stratum — is a MERGEABLE top-k under a total
  * order, so the micro-batch is the unit of merge (the exact property the
  * batch form's two-level shard merge exploits, applied across TIME
  * instead of across shards): per batch, take the batch's own per-stratum
  * top-k (the verified batch operator, bounded heaps), union with the
  * held sample, and re-select top-k. State is ≤ k rows per stratum —
  * stratum-count-sized, never corpus-sized — and each merge costs
  * |batch| + |state| with no history re-scan.
  *
  * Replay semantics: unlike the counter merges ([[CmsStream]],
  * [[PhashStream]]), min-k selection over a DEDUPLICATED union is
  * IDEMPOTENT — re-delivering a batch re-unions rows that are already
  * in or below the held sample and changes nothing. The
  * `dropDuplicates(stratum, id)` before re-selection is what makes that
  * true (a replayed row must not appear twice and occupy two of a
  * stratum's k slots); the monotone batch-id guard is kept anyway so a
  * replay skips the merge work entirely, not just its effect. The swap is
  * atomic and lineage-cut ([[ComponentsStream.LabelStore]]'s
  * materialize-before-swap): a failed merge keeps the previous sample and
  * batch N's plan never re-derives batches 0..N-1.
  */
object SampleStream {

  /** (stratum, id, sample_key) running sample held across batches. When
    * `durable` carries a snapshot directory, every applied batch writes
    * the merged sample (≤ k rows per stratum — bounded) BEFORE the batch
    * is acknowledged; a rebuilt store restores the newest snapshot via
    * [[SampleStore.restore]] instead of serving a reset sample while the
    * checkpoint marks batches delivered. Merge idempotence means a
    * replay that slips the restored guard is harmless anyway.
    */
  final class SampleStore(
      spark: SparkSession, initial: DataFrame,
      stratumCol: String, idCol: String, k: Int, seed: Long = 12345L,
      durable: Option[String] = None) {
    require(k >= 1, "k must be positive")

    private def reselect(df: DataFrame): DataFrame =
      graft.plans.TopK.perKey(
        df.dropDuplicates(stratumCol, idCol),
        Seq(stratumCol), Seq(("sample_key", true), (idCol, true)), k)

    private def materialize(df: DataFrame): DataFrame = {
      val cut = spark.createDataFrame(df.rdd, df.schema)
        .persist(StorageLevel.MEMORY_AND_DISK)
      cut.count() // force now: a failed merge must fail BEFORE the swap
      cut
    }

    private val ref = new AtomicReference[DataFrame](materialize(
      reselect(initial.select(col(stratumCol), col(idCol), col("sample_key")))))
    private val lastBatch = new AtomicLong(-1L)

    /** The current sample — always fully materialized, never mid-merge. */
    def current: DataFrame = ref.get()

    /** Merge one micro-batch of (stratum, id) rows. Re-delivered batch ids
      * (≤ the last applied) are skipped — a no-op by idempotence anyway.
      * Returns whether the batch was applied.
      */
    def merge(batchId: Long, batch: DataFrame): Boolean = synchronized {
      if (batchId <= lastBatch.get()) return false
      val old = ref.get()
      val batchTop = Splits.samplePerStratum(
        batch.select(col(stratumCol), col(idCol)), idCol, stratumCol, k, seed = seed)
      if (!batchTop.isEmpty) {
        val next = materialize(reselect(old.unionByName(
          batchTop.select(col(stratumCol), col(idCol), col("sample_key")))))
        // durable: snapshot BEFORE acknowledging (empty batches skip —
        // replaying one is trivially idempotent)
        durable.foreach(dir => SnapshotStore.write(spark, dir, next, batchId))
        ref.set(next)
        old.unpersist()
      }
      lastBatch.set(batchId)
      true
    }

    private[streaming] def seed(df: DataFrame, upto: Long): Unit = synchronized {
      val next = materialize(
        df.select(col(stratumCol), col(idCol), col("sample_key")))
      val old = ref.get()
      ref.set(next)
      lastBatch.set(upto)
      old.unpersist()
    }
  }

  object SampleStore {
    /** Rebuild a durable store from `dir`'s newest complete snapshot —
      * the restart path; a missing/empty `dir` restores a cold store.
      */
    def restore(spark: SparkSession, dir: String, stratumCol: String,
        idCol: String, k: Int, seed: Long = 12345L): SampleStore = {
      val store = new SampleStore(spark, emptySample(spark, stratumCol, idCol),
        stratumCol, idCol, k, seed, Some(dir))
      SnapshotStore.newest(spark, dir).foreach { case (upto, df) =>
        store.seed(df, upto)
      }
      store
    }
  }

  /** An empty cold-start sample with the store's schema. */
  def emptySample(
      spark: SparkSession, stratumCol: String, idCol: String): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long, String)].toDF(stratumCol, idCol, "sample_key")
  }

  /** `(batch, batchId) => Unit` for `writeStream.foreachBatch`. */
  def sink(store: SampleStore): (DataFrame, Long) => Unit =
    (batch, batchId) => store.merge(batchId, batch)

  /** Wire a streaming (stratum, id) source into `store` and start the
    * query; callers read `store.current` at any time.
    */
  def run(docs: DataFrame, store: SampleStore, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(sink(store))
      .outputMode("update")
      .start()
}
