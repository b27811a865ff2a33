package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the two-stream capability layer beyond the
  * reference's single periodic batch (the reference has no join surface at
  * all, SURVEY.md §2.5): correlate one event stream with the other stream's
  * events of the same key inside a bounded look-back window (clicks to the
  * purchases at most N seconds before them, impressions to conversions,
  * spans to their parents).
  *
  * Scale properties:
  *  - BOTH sides carry watermarks and the join predicate bounds r_ts within
    *  [ts − within, ts], so Structured Streaming derives a state watermark
  *    for each side and EVICTS buffered rows once no future match is
  *    possible — state is O(rate × (within + lateness)), never unbounded
  *    (an unconstrained stream-stream join must buffer forever);
  *  - the same function applied to two BATCH DataFrames is the identical
  *    plain interval join (one plan, two execution modes) — EngineSpec
  *    asserts streaming output equals the batch result on the same rows.
  *
  * Column contract (positional): left = (key, ts: timestamp, l_id),
  * right = (key, ts: timestamp, r_id).
  */
object StreamJoin {

  /** @param joinType "inner" (default) or "left_outer" — the outer form
    *                  emits an unmatched left row (NULL `r_id`/`r_ts`) once
    *                  BOTH watermarks prove no in-window match can still
    *                  arrive; on batch frames it is the plain left outer
    *                  interval join (same plan, two execution modes).
    */
  def joinWithin(
      left: DataFrame,
      right: DataFrame,
      watermarkDelay: String,
      withinSeconds: Long,
      joinType: String = "inner"): DataFrame = {
    require(withinSeconds >= 0, "look-back window must be non-negative")
    val l = left.toDF("key", "ts", "l_id").withWatermark("ts", watermarkDelay)
    val r = right.toDF("r_key", "r_ts", "r_id").withWatermark("r_ts", watermarkDelay)
    l.join(
        r,
        col("key") === col("r_key") &&
          col("r_ts") >= col("ts") - expr(s"INTERVAL $withinSeconds SECONDS") &&
          col("r_ts") <= col("ts"),
        joinType)
      .select(col("key"), col("l_id"), col("ts"), col("r_id"), col("r_ts"))
  }
}
