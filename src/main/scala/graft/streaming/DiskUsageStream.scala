package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.DiskUsageOp

/** Structured-Streaming form of the periodic refresh (SURVEY.md §2.9 T1-T4):
  * a file-source stream over inventory parquet drops, the same declarative
  * aggregation as the batch path, and a complete-mode in-memory table as the
  * serving snapshot.
  *
  * Semantics vs the reference (/root/reference/handler.go:48-66): each
  * micro-batch recomputes the full aggregate over all files seen so far —
  * i.e. the *accumulating* semantics the reference README intends
  * (README.md:15-17), with the first micro-batch playing the run-at-start
  * role (handler.go:58). Complete output mode means readers of the memory
  * table always see a whole consistent snapshot — the streaming analogue of
  * the AtomicReference swap in [[graft.operators.DiskUsageHandler]].
  *
  * At scale: the aggregation state is Spark streaming state (spillable,
  * checkpointed); a real deployment points `dir` at the inventory delivery
  * prefix and swaps `memory` for a queryable sink. File-source listing
  * handles late-arriving files; event-time watermarks don't apply because
  * inventory deliveries are full replacements, not append streams
  * (SURVEY.md §2.9 T3).
  */
object DiskUsageStream {

  /** Start the refresh stream; results served from `spark.table(queryName)`. */
  def start(
      spark: SparkSession,
      dir: String,
      schemaDdl: String,
      queryName: String = "disk_usage",
      keyCol: String = "key",
      sizeCol: String = "size",
      triggerMs: Long = 1000L): StreamingQuery = {
    val inventory: DataFrame = spark.readStream.schema(schemaDdl).parquet(dir)
    DiskUsageOp
      .aggregate(inventory, keyCol, sizeCol)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .start()
  }
}
