package graft.streaming

import org.apache.spark.sql.DataFrame

/** Idempotent `foreachBatch` sink: each micro-batch lands in its own
  * `batch_id=` partition with DYNAMIC partition overwrite, so re-processing
  * a batch (at-least-once redelivery, checkpoint replay after a crash)
  * REPLACES that batch's partition instead of appending duplicates —
  * effectively-once output on top of Structured Streaming's at-least-once
  * `foreachBatch` contract, with no transactional sink required.
  *
  * This is the standard discipline for plain-file sinks at scale: the
  * batch id is the idempotence key the engine already guarantees to be
  * stable across replays; dynamic overwrite scopes the replacement to
  * exactly the replayed batch's partition, never the table.
  */
object IdempotentSink {

  /** A `(batch, batchId) => Unit` function for `writeStream.foreachBatch`,
    * writing parquet partitioned by `batch_id` under `path`.
    */
  def partitionedParquet(path: String)(batch: DataFrame, batchId: Long): Unit =
    batch
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)
}
