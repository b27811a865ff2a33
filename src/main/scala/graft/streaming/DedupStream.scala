package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the unbounded-stream form of
  * [[graft.operators.Dedup.exact]] for continuously-arriving corpora
  * (crawl deliveries, telemetry, inventory drops).
  *
  * The naive streaming `dropDuplicates(keys)` keeps EVERY key ever seen in
  * the state store — unbounded growth, the classic way a streaming dedup
  * job dies after a week. `dropDuplicatesWithinWatermark` bounds state by
  * the watermark: a key's state is evicted once the watermark passes its
  * event time + delay, so the store holds only the lateness window. The
  * trade is explicit and documented here: duplicates farther apart in
  * event time than `watermarkDelay` are NOT collapsed — cross-window dedup
  * is the batch operator's job ([[graft.operators.Dedup.exact]] over the
  * accumulated table), and the standard pipeline composes both: streaming
  * dedup collapses the burst-duplicates (re-delivered crawl batches,
  * at-least-once sources), the periodic batch pass collapses history.
  */
object DedupStream {

  /** Drop rows whose `textCol` md5 was already seen within the watermark
    * window. Works on streaming DataFrames (batch falls back to plain
    * dropDuplicates semantics over the whole input).
    *
    * @param tsCol event-time column (TimestampType) the watermark rides on
    */
  def dedupWithinWatermark(
      docs: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      textCol: String = "text"): DataFrame =
    docs
      .withColumn("text_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("text_hash")
}
