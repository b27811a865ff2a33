package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermarking — the streaming
  * capability layer beyond the reference's processing-time cron (the
  * reference has no event-time concept at all, SURVEY.md §2.9).
  *
  * Append-mode semantics: a window's row is emitted once, when the
  * watermark (max observed event time − `watermarkDelay`) passes the window
  * end; events later than the watermark are dropped. State is bounded by
  * the watermark — the property that makes this viable on an unbounded
  * 100 TB/day stream, since expired windows are evicted from the state
  * store instead of accumulating.
  */
object EventTimeWindows {

  /** Tumbling-window counts per key. Works on both streaming and batch
    * DataFrames (batch ignores the watermark — same query shape as the
    * oracle-checked `q_window_tumbling`).
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDur: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col(keyCol), col("n"))
}
