package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}

/** Temporal / event-time operators over per-key ordered history — the
  * batch forms of the classic event-pipeline primitives.
  *
  * Scale notes: every operator here is a per-key window (`partitionBy(key)
  * .orderBy(time)`) — one shuffle on the key, per-partition sort, no global
  * ordering anywhere, so they hold at 100 TB exactly like any keyed
  * aggregation. Session ids are assigned with the standard
  * gap-flag → running-sum trick (two window passes over the same
  * partitioning, which Spark executes with a single exchange + sort).
  */
object Temporal {

  /** Gap-based sessionization: a new session starts when the time since the
    * key's previous event exceeds `gapMicros`. Emits one row per session
    * with start/end/duration/size. Time is an epoch-microsecond long column
    * (caller converts; keeps the arithmetic exact and engine-portable).
    */
  def sessionize(
      events: DataFrame,
      keyCol: String,
      tsUsCol: String,
      idCol: String,
      gapMicros: Long): DataFrame =
    withSessionIds(events, keyCol, tsUsCol, idCol, gapMicros)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        min(col(tsUsCol)).as("session_start_us"),
        max(col(tsUsCol)).as("session_end_us"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_us", col("session_end_us") - col("session_start_us"))

  /** The per-EVENT form of [[sessionize]]: every input row plus its
    * `session_idx` (per-key session ordinal from the gap-flag →
    * running-sum trick; both windows share one exchange + sort). This is
    * the composition surface — attribution, per-session paths, session
    * feature joins all start from events carrying their session id.
    */
  def withSessionIds(
      events: DataFrame,
      keyCol: String,
      tsUsCol: String,
      idCol: String,
      gapMicros: Long): DataFrame = {
    val order = Window.partitionBy(col(keyCol)).orderBy(col(tsUsCol), col(idCol))
    events.withColumn(
        "is_new",
        when(
          lag(col(tsUsCol), 1).over(order).isNull ||
            col(tsUsCol) - lag(col(tsUsCol), 1).over(order) > gapMicros,
          lit(1L)).otherwise(lit(0L)))
      .withColumn("session_idx",
        sum(col("is_new")).over(
          order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("is_new")
  }

  /** Interval coalescing — merge overlapping/touching spans per key into
    * maximal disjoint spans (time-coverage measurement, span dedup,
    * outage/window union — the interval-algebra primitive
    * [[intervalJoin]] consumes but nothing so far produced): a span is
    * NEW iff its start lies strictly past the running max end of every
    * earlier interval (ordered by (start, end)); touching intervals
    * (start == previous max end) therefore MERGE — closed-interval
    * semantics, documented contract. Emits one row per coalesced span:
    * `(keyCol, span_idx, span_start, span_end, n_intervals)`.
    *
    * Plan shape — the [[sessionize]] discipline: the new-span flag and
    * its running sum share ONE (key) exchange + (start, end) sort (the
    * running-max window is the same partitioning/ordering, so Spark
    * plans a single Window node chain), then the span aggregation keys
    * on (key, span_idx). Per-key partitions are key-bounded, never
    * corpus-ordered. Equal (start, end) duplicates are
    * permutation-invariant under the frame (a twin's running max
    * already covers its sibling), so the output is deterministic for
    * any input order.
    */
  def coalesceIntervals(
      df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val order = Window.partitionBy(col(keyCol)).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol)).over(
      order.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("is_new",
        when(prevMax.isNull || col(startCol) > prevMax, lit(1L)).otherwise(lit(0L)))
      .withColumn("span_idx", sum(col("is_new")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("span_idx"))
      .agg(
        min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_intervals"))
  }

  /** Gap-AND-cap sessionization — the batch form of
    * [[graft.streaming.SessionizeStream]]'s policy: sessions split on a
    * silence gap (like [[sessionize]]) AND after `maxEvents` rows (a bot
    * storm must not produce one million-event session). A gap-session's
    * events are numbered in event-time order and chopped into consecutive
    * `maxEvents`-sized runs, which is exactly what the streaming operator's
    * in-order fold produces — EngineSpec asserts the two outputs equal on
    * the same events.
    *
    * Plan: ALL the window passes (gap flag, row number, running max) share
    * one (key) partitioning and one (time, id) sort, so Spark plans a
    * single exchange + sort — the cap costs nothing over plain
    * sessionization. The session start is identified by the running max of
    * the flagged row numbers (no second window partitioning on the derived
    * session id, which would be another exchange).
    */
  def sessionizeCapped(
      events: DataFrame,
      keyCol: String,
      tsUsCol: String,
      idCol: String,
      gapMicros: Long,
      maxEvents: Long): DataFrame = {
    require(maxEvents >= 1, "maxEvents must be >= 1")
    val order = Window.partitionBy(col(keyCol)).orderBy(col(tsUsCol), col(idCol))
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn(
        "is_new",
        when(
          lag(col(tsUsCol), 1).over(order).isNull ||
            col(tsUsCol) - lag(col(tsUsCol), 1).over(order) > gapMicros,
          lit(1L)).otherwise(lit(0L)))
      .withColumn("rnk", row_number().over(order).cast("long"))
      .withColumn("sess_first", max(when(col("is_new") === 1, col("rnk"))).over(run))
      .withColumn("sub_idx", expr(s"(rnk - sess_first) div $maxEvents"))
      .groupBy(col(keyCol), col("sess_first"), col("sub_idx"))
      .agg(
        min(col(tsUsCol)).as("session_start_us"),
        max(col(tsUsCol)).as("session_end_us"),
        count(lit(1)).as("n_events"))
      .select(col(keyCol), col("session_start_us"), col("session_end_us"), col("n_events"))
  }

  /** As-of (previous-row) self-join per key: for each row, the key's most
    * recent earlier row by `timeCol` (deterministic `idCol` tie-break).
    * Returns the input plus `prev_<id>` and `prev_<time>` columns — the
    * window form of `ASOF JOIN` when the joined table is the history of the
    * same key.
    */
  def previousByKey(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeCol), col(idCol))
    df.withColumn(s"prev_$idCol", lag(col(idCol), 1).over(w))
      .withColumn(s"prev_$timeCol", lag(col(timeCol), 1).over(w))
  }

  /** Two-table AS-OF join — for each left row, the right table's most
    * recent row at-or-before it (per key): the price/telemetry/feature
    * lookup primitive. Implemented with the UNION-AND-SWEEP rewrite, the
    * scale-safe form: both sides union into one (key, time)-ordered stream
    * (right rows sorted BEFORE left rows at equal times — "at-or-before"
    * is inclusive) and one window carries the latest right id/time forward
    * (`last(..., ignoreNulls)`). Cost is ONE exchange on the key + one
    * per-partition sort — never the quadratic theta-join a naive
    * `l.t >= r.t` formulation plans to, and unlike [[pairsWithin]]'s
    * binning there is no window-width parameter: matches reach back
    * arbitrarily far. (DuckDB's native ASOF JOIN is the oracle.)
    *
    * Unmatched left rows keep NULL `asof_rid`/`asof_rt` (left-join
    * semantics). Among right ties at one (key, time), the LARGEST right id
    * wins — deterministic; pre-aggregate the right side to unique
    * (key, time) when the oracle must agree on ties. Ids and times must be
    * long-typed (the registry's epoch-micros convention).
    *
    * `payload` names right-side columns to carry through onto the matched
    * row, emitted as `asof_<col>` — the price/feature lookup that is the
    * operator's first real use, without a second join back on `asof_rid`
    * (which would pay the exchange this rewrite exists to avoid). All
    * carried values ride ONE `last(struct(...), ignoreNulls)` sweep — a
    * struct per RIGHT row (null on left rows), so the matched row's id,
    * time and payload move ATOMICALLY: a NULL payload value in the matched
    * right row is carried as that NULL, never skipped past to an older
    * row's value (which per-column ignoreNulls sweeps would do). Plan is
    * unchanged: no join node, one exchange (EngineSpec pin).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      leftIdCol: String,
      rightIdCol: String,
      payload: Seq[String] = Nil,
      direction: String = "backward",
      toleranceMicros: Option[Long] = None): DataFrame = {
    // "backward" (default): most recent right at-or-before the left
    // (ties on rt → LARGEST rid). "forward": earliest right at-or-after
    // the left (ties on rt → SMALLEST rid) — the next-reading /
    // next-delivery lookup. Same union-and-sweep, the window frame and
    // tie order mirror: both directions stay one exchange, no join node.
    require(direction == "backward" || direction == "forward",
      s"asofJoin: direction must be backward|forward, got '$direction'")
    // loud failures instead of ambiguous output columns: duplicate payload
    // names would emit two asof_<c> columns, and a payload literally named
    // rid/rt would collide with the reserved asof_rid/asof_rt outputs
    require(payload.distinct == payload,
      s"asofJoin: duplicate payload columns: ${payload.mkString(", ")}")
    payload.filter(Set("rid", "rt")).foreach { c =>
      throw new IllegalArgumentException(
        s"asofJoin: payload column '$c' collides with the reserved asof_$c output column")
    }
    val pTypes = payload.map(c => c -> right.schema(c).dataType)
    val l = left.select(
      (col(keyCol) +: col(timeCol).as("t") +: col(leftIdCol).as("lid") +:
        lit(1).as("side") +: lit(null).cast("long").as("rid") +:
        lit(null).cast("long").as("rt") +:
        pTypes.map { case (c, dt) => lit(null).cast(dt).as(s"p_$c") }): _*)
    val r = right.select(
      (col(keyCol) +: col(timeCol).as("t") +: lit(null).cast("long").as("lid") +:
        lit(0).as("side") +: col(rightIdCol).cast("long").as("rid") +:
        col(timeCol).as("rt") +:
        payload.map(c => col(c).as(s"p_$c"))): _*)
    val matched = struct(
      (col("rid") +: col("rt") +: payload.map(c => col(s"p_$c"))): _*)
    // backward: rights sort BEFORE lefts at equal t (side 0 < 1) so an
    // equal-ts right is inside [-inf, current]; `last` takes the largest
    // rid among equal-rt rights. forward mirrors: lefts first at equal t
    // (side desc), frame [current, +inf], `first` takes the smallest rid.
    val base = Window.partitionBy(col(keyCol))
    val sweep =
      if (direction == "backward")
        last(when(col("side") === 0, matched), ignoreNulls = true).over(
          base.orderBy(col("t"), col("side"), col("rid"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else
        first(when(col("side") === 0, matched), ignoreNulls = true).over(
          base.orderBy(col("t"), col("side").desc, col("rid"))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val swept = l.unionAll(r)
      .withColumn("m", sweep)
      .filter(col("side") === 1)
      .select(
        (col(keyCol) +: col("lid").as(leftIdCol) +: col("t").as(timeCol) +:
          col("m.rid").as("asof_rid") +: col("m.rt").as("asof_rt") +:
          payload.map(c => col(s"m.p_$c").as(s"asof_$c"))): _*)
    // tolerance (pandas merge_asof semantics): a sweep match farther than
    // `toleranceMicros` from the left row reads as NO match — every asof_*
    // column nulls together. Correctness needs no re-sweep: the sweep
    // already picked the NEAREST eligible right, so "nearest is too far"
    // ⟺ "nothing within tolerance". Row-local post-map, plan unchanged.
    toleranceMicros.fold(swept) { tol =>
      val stale = (if (direction == "backward") col(timeCol) - col("asof_rt")
                   else col("asof_rt") - col(timeCol)) > tol
      val fixed = Set(keyCol, leftIdCol, timeCol)
      swept.select(swept.columns.toIndexedSeq.map { c =>
        if (fixed(c)) col(c)
        else when(stale, lit(null)).otherwise(col(c)).as(c)
      }: _*)
    }
  }

  /** Range (interval) self-join via time-binning — all ordered pairs (a, b)
    * with `0 < ts_b − ts_a ≤ windowUs`, without ever forming the quadratic
    * theta-join. Spark has no native interval-join operator; the naive
    * `a JOIN b ON b.ts BETWEEN a.ts AND a.ts + w` plans as a nested-loop
    * over every pair — O(n²) and dead at any real volume.
    *
    * The binned form is the standard scale-safe rewrite: bucket time into
    * `windowUs`-wide bins; `bin(b) ∈ {bin(a), bin(a)+1}` for every
    * qualifying pair, so replicating the b-side to its own bin and the one
    * below turns the theta-join into an EQUI-join on the bin id (each
    * qualifying pair meets on exactly one key — no dedup needed) plus a
    * residual range filter. Cost: one 2× replication and a hash join
    * keyed on bin — fan-out per bin is the stream's rate × window, not n².
    * At 100 TB the bin key partitions evenly as long as event rates do; a
    * hot bin (flash-crowd second) is AQE-skew-splittable since the join is
    * a plain shuffle-hash equi-join.
    *
    * Emits `a_<c>`/`b_<c>` for each payload column plus `a_us`/`b_us`.
    * Pairs at EXACTLY equal timestamps are excluded (no self-pairs, no
    * double-counted symmetric pairs).
    */
  def pairsWithin(
      events: DataFrame,
      tsUsCol: String,
      windowUs: Long,
      payload: Seq[String]): DataFrame = {
    require(windowUs > 0, "window must be positive")
    // FLOOR division, not `div` (which truncates toward zero): for negative
    // (pre-epoch) timestamps truncation breaks the bin(b) ∈ {bin(a),
    // bin(a)+1} adjacency invariant and silently drops qualifying pairs.
    // Long-exact floor: subtract the non-negative remainder first.
    val floorBin = s"(($tsUsCol - ((($tsUsCol % $windowUs) + $windowUs) % $windowUs)) div $windowUs)"
    val aSide = events.select(
      (col(tsUsCol).as("a_us") +: expr(floorBin).as("bin") +:
        payload.map(c => col(c).as(s"a_$c"))): _*)
    val bSide = events.select(
      (col(tsUsCol).as("b_us") +:
        explode(array(expr(floorBin), expr(s"$floorBin - 1")))
          .as("bin") +:
        payload.map(c => col(c).as(s"b_$c"))): _*)
    aSide.join(bSide, "bin")
      .filter(col("b_us") > col("a_us") && col("b_us") <= col("a_us") + windowUs)
      .drop("bin")
  }

  /** Epoch-microseconds from a nanosecond-long column, by exact integer
    * division (`div`) — `/` would route through double and can mis-floor at
    * 1e18 magnitudes.
    */
  def nanosToMicros(colName: String): Column = expr(s"$colName div 1000")

  /** Unit-agnostic epoch-microsecond extraction: decide by the type Spark's
    * reader actually produced, not by an assumed physical unit. Inventory
    * exports vary in timestamp physical type (the reference consumes
    * TIMESTAMP_MILLIS natively — `/root/reference/types.go:17`), and the
    * fixtures have shipped both `timestamp[ns]` and `timestamp[us]`:
    *   - `TimestampType` — parquet ms/us, tz-adjusted → `unix_micros`;
    *   - `TimestampNTZType` — parquet ms/us with isAdjustedToUTC=false (what
    *     pandas/arrow write) → cast to `TimestampType` first (`unix_micros`
    *     rejects NTZ). The cast interprets the naive wall clock in the
    *     SESSION timezone — every harness builder pins
    *     `spark.sql.session.timeZone=UTC`, which matches how DuckDB's
    *     `epoch_us` reads the same naive column;
    *   - `LongType` — raw int64 nanos (the `parquet.nanosAsLong` legacy read
    *     path for TIMESTAMP(NANOS)) → exact `div 1000`.
    * Anything else fails loudly rather than computing 1000×-off gaps.
    */
  def microsOf(df: DataFrame, colName: String): Column =
    df.schema(colName).dataType match {
      case TimestampType    => unix_micros(col(colName))
      case TimestampNTZType => unix_micros(col(colName).cast(TimestampType))
      case LongType         => nanosToMicros(colName)
      case other => throw new IllegalArgumentException(
        s"$colName: expected TimestampType (ms/us parquet) or LongType " +
          s"(raw-nanos legacy read), got $other")
    }

  /** The events table read WITHOUT a forced schema — the physical timestamp
    * unit is whatever the export shipped — with `ts_us` (epoch-micros)
    * appended via the type-driven rule above. All event-time registry
    * queries go through this one seam so a fixture unit change is absorbed
    * (or rejected loudly) in exactly one place.
    */
  def eventsMicros(s: SparkSession, dir: String): DataFrame = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.withColumn("ts_us", microsOf(raw, "ts"))
  }

  /** Ordered funnel analysis — how many users progress through `steps`
    * IN ORDER (each step strictly after the previous one's first
    * completion): the product-analytics conversion query. Step i's
    * reached-set is "earliest step-i event after the user's step-(i−1)
    * completion time", so a user converts exactly when a strictly
    * increasing event chain exists, computed greedily (earliest-possible
    * times — greedy is optimal here: taking the earliest valid event at
    * every step only ever widens what later steps can match).
    *
    * Shape: one user-keyed filter+join+agg PER STEP (no windows, no
    * per-user event sorting — a user's whole history is never collected
    * in one task); emitted as one (step_idx, step, n_users) row per step
    * via tiny 1-row aggregates.
    */
  def funnel(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts_us"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, s"duplicate funnel steps: $steps")
    val e = events.select(col(userCol), col(typeCol), col(tsCol))
    var reached = e.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
    var out = reached.agg(count(lit(1)).as("n_users"))
      .select(lit(1L).as("step_idx"), lit(steps.head).as("step"), col("n_users"))
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      reached = e.filter(col(typeCol) === step)
        .join(reached, Seq(userCol))
        .filter(col(tsCol) > col("t"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
      out = out.unionAll(reached.agg(count(lit(1)).as("n_users"))
        .select(lit((i + 1).toLong).as("step_idx"), lit(step).as("step"),
          col("n_users")))
    }
    out
  }

  /** SCD2 (slowly-changing-dimension type 2) history build from an event
    * log — the dimension-table form every warehouse derives from CDC
    * feeds: per key, CONSECUTIVE equal attribute values are compressed to
    * one validity interval, each interval carrying `[valid_from, valid_to)`
    * bounds, a per-key version number, and an `is_current` flag on the
    * open-ended last interval (Kimball's type-2 dimension, The Data
    * Warehouse Toolkit ch. 5 — public methodology, no code).
    *
    * Shape: ONE exchange on the key + one per-partition sort shared by all
    * three window functions (lag for change detection, row_number for the
    * version, lead for the closing bound — the filter between them
    * preserves both the partitioning and the sort order, so Catalyst
    * plans a single Exchange/Sort pair). A key's partition holds only
    * that key's history — bounded by per-entity event volume, never by
    * corpus size, exactly like [[sessionize]].
    *
    * Determinism: ties in the timestamp are broken by `tieCol`, so the
    * change sequence — and therefore every interval bound — is a pure
    * function of the data on both engines.
    */
  def scd2History(events: DataFrame, keyCol: String = "user_id",
      attrCol: String = "event_type", tsUsCol: String = "ts_us",
      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsUsCol), col(tieCol))
    val changes = events
      .select(col(keyCol), col(attrCol), col(tsUsCol), col(tieCol))
      .withColumn("prev_attr", lag(col(attrCol), 1).over(w))
      .filter(col("prev_attr").isNull || col("prev_attr") =!= col(attrCol))
    changes
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to_us", lead(col(tsUsCol), 1).over(w))
      .select(col(keyCol), col("version"), col(attrCol).as("attr"),
        col(tsUsCol).as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
  }

  /** Rolling exponentially-weighted moving average (α = 1/4) over each
    * key's last `span` observations — the classic smoothing signal
    * (monitoring, trend features) computed in FIXED-POINT micro-units so
    * the result is a pure integer function of the data on any engine:
    * values scale to `round(v·10⁶)` longs, and the frame's values are
    * folded left-to-right with `acc ← ⌊(3·acc + x)/4⌋` seeded from the
    * frame's FIRST value — exactly DuckDB's `list_reduce` contract
    * (first element is the init), so the oracle replays the identical
    * fold. The /4 is a power of two, so the double division inside
    * `floor` is exact for any sum below 2⁵³ — no float round-off exists
    * anywhere in the chain (a double fold was measurably half-ulp flaky
    * at the final rounding boundary; integers cannot be).
    *
    * Shape: one exchange on the key + per-partition sort; the frame is
    * `span` rows, so the collected list is O(span) per row regardless of
    * key cardinality or history length.
    */
  def ewmaSmooth(events: DataFrame, keyCol: String = "user_id",
      tsUsCol: String = "ts_us", tieCol: String = "event_id",
      valCol: String = "value", span: Int = 8): DataFrame = {
    require(span >= 1, s"span must be >= 1: $span")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsUsCol), col(tieCol))
      .rowsBetween(-(span - 1), Window.currentRow)
    val lst = collect_list(col("value_u6")).over(w)
    val ew = aggregate(slice(lst, 2, span), element_at(lst, 1),
      (acc, x) => floor((acc * lit(3L) + x) / lit(4L)).cast("long"))
    events.select(col(keyCol), col(tsUsCol), col(tieCol),
      round(col(valCol) * lit(1000000L), 0).cast("long").as("value_u6"))
      .withColumn("ewma_u6", ew)
  }

  /** Time-weighted average per key over IRREGULARLY sampled values — the
    * telemetry mean that refuses to over-weight chatty periods: each
    * sample holds until the next one, so the mean is
    * Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_n−t₀) (the step-function integral; standard
    * monitoring math). A plain AVG of the same rows over-counts bursts —
    * the spec pins a case where the two disagree.
    *
    * Overflow-safe integer algebra: values in CENTI-units (≤ ~5·10⁴ for
    * the fixture range), durations in MILLISECONDS — a per-interval
    * product ≤ ~10¹⁴, so int64 sums survive ~10⁴-sample histories with
    * four orders of magnitude to spare; the final floor-div is pure
    * int64. One lag-window exchange + one keyed agg.
    */
  def timeWeightedAvg(events: DataFrame, keyCol: String = "user_id",
      tsUsCol: String = "ts_us", tieCol: String = "event_id",
      valCol: String = "value"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsUsCol), col(tieCol))
    events
      .select(col(keyCol), col(tsUsCol), col(tieCol),
        round(col(valCol) * lit(100L), 0).cast("long").as("v_u2"))
      .withColumn("next_ts", lead(col(tsUsCol), 1).over(w))
      .filter(col("next_ts").isNotNull) // the last sample has no span
      .select(col(keyCol), col("v_u2"),
        expr(s"(next_ts - $tsUsCol) DIV 1000").as("dt_ms"))
      .filter(col("dt_ms") > 0)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dt_ms")).as("total_ms"),
        sum(col("v_u2") * col("dt_ms")).as("vdt"))
      .select(col(keyCol), col("n_intervals"),
        expr("CAST(vdt DIV total_ms AS BIGINT)").as("twa_u2"))
  }

  /** Churn-label construction — the leakage-free supervised-label builder
    * for retention models: split time at `cutoff = max(ts) − horizon`,
    * build features ONLY from events at or before the cutoff, and label
    * each user churned iff they have NO event after it. Features and
    * label never read the same rows, so the label cannot leak into the
    * features by construction.
    *
    * Shape: the cutoff is a broadcast 1-row bounds agg (the gap-fill
    * pattern — no driver-formatted literal); then one user-keyed agg on
    * the feature side and one LEFT ANTI/semi-style join against the
    * post-cutoff user set. Integer hours; no floats.
    */
  def churnLabels(events: DataFrame, horizonUs: Long,
      keyCol: String = "user_id", tsUsCol: String = "ts_us",
      valCol: String = "value"): DataFrame = {
    require(horizonUs > 0, s"horizonUs must be > 0: $horizonUs")
    val bounds = events.agg(max(col(tsUsCol)).as("max_ts"))
      .select((col("max_ts") - horizonUs).as("cutoff"))
    val withCut = events.crossJoin(broadcast(bounds))
    val feats = withCut.filter(col(tsUsCol) <= col("cutoff"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_before"),
        max(col(tsUsCol)).as("last_ts"),
        min(col("cutoff")).as("cutoff"))
      .select(col(keyCol), col("n_before"),
        expr(s"(cutoff - last_ts) DIV 3600000000").as("hours_since_last"))
    val active = withCut.filter(col(tsUsCol) > col("cutoff"))
      .select(col(keyCol)).distinct()
      .withColumn("active", lit(1L))
    feats.join(active, Seq(keyCol), "left")
      .select(col(keyCol), col("n_before"), col("hours_since_last"),
        col("active").isNull.as("churned"))
  }

  /** First-order Markov transition counts over each key's ordered event
    * sequence — the product-analytics "what happens next" matrix and the
    * sanity screen for synthetic event streams (a transition matrix far
    * from the marginals exposes generator bugs). One lag window per key
    * (single exchange + sort, the [[sessionize]] bounded-partition
    * discipline) feeding one map-side-combined pair count; probabilities
    * are integer-exact ppm of the FROM-state's outgoing mass
    * (`n·10⁶ DIV n_from`), so nothing floats across the oracle boundary.
    */
  def eventTransitions(events: DataFrame, keyCol: String = "user_id",
      typeCol: String = "event_type", tsUsCol: String = "ts_us",
      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsUsCol), col(tieCol))
    val pairs = events
      .select(col(keyCol), col(typeCol), col(tsUsCol), col(tieCol))
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val counts = pairs.groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    // from-state mass via a window over the AGGREGATED counts (bounded:
    // ≤ |types|² rows, ≤ |types| per partition) — a groupBy+self-join
    // would recompute the whole lag-window chain a second time (the plan
    // audit showed two full parquet scans + two Window passes)
    val wf = Window.partitionBy(col("prev_type"))
    counts.withColumn("n_from", sum(col("n")).over(wf))
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("CAST((n * 1000000) DIV n_from AS BIGINT)").as("p_ppm"))
  }

  /** Cohort retention — the (cohort, age) activity triangle: users
    * bucketed by their FIRST-activity epoch week, counted distinct in
    * every later week they return, keyed by weeks-since-cohort. Two
    * user-keyed aggregations and one user-keyed join; integer epoch-week
    * arithmetic only.
    */
  def retentionCohorts(events: DataFrame,
      userCol: String = "user_id", tsCol: String = "ts_us"): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val e = events.select(col(userCol),
      expr(s"$tsCol DIV $weekUs").as("week"))
    val cohort = e.groupBy(col(userCol)).agg(min(col("week")).as("cohort_week"))
    e.join(cohort, Seq(userCol))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("age_weeks"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Per-key linear usage trend — least-squares slope of DAILY totals
    * over the day index: the capacity-planning forecast on top of the
    * reference's usage aggregate (which address grows how fast, before
    * it pages someone). Output per key: (n_days, first_day, last_day,
    * total, slope_e6) with slope in micro-units of `valCol` per day.
    *
    * Scale shape: two map-side-combined aggregations — (key, day) daily
    * totals, then the five regression moments per key; the second
    * exchange moves only key × active-days rows. No window, no driver
    * state, no per-key buffering.
    *
    * Determinism: every moment is an exact integer; the slope closed
    * form num = n·Σxy − Σx·Σy, den = n·Σx² − (Σx)² stays integral, and
    * the ppm form is sign·(10⁶·|num| div den) — truncation toward zero
    * in both engines (never a bare signed floor-div). NULL slope on a
    * single active day (den = 0). `rebaseDay` (days since epoch of the
    * observation window's start) keeps x small so 10⁶·|num| stays far
    * from 2⁶³ — slope is shift-invariant, so any in-window constant is
    * correct; pick the window start.
    */
  def linearTrend(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts_us", valCol: String = "value",
      rebaseDay: Long = 0L): DataFrame =
    trendFromDaily(dailyTotals(events, keyCol, tsCol, valCol, rebaseDay), keyCol)

  /** [[linearTrend]]'s first half: per-(key, day) totals — ADDITIVE
    * across any batching, which is what lets
    * [[graft.streaming.TrendStream]] fold an unbounded feed into the
    * identical regression input.
    */
  def dailyTotals(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts_us", valCol: String = "value",
      rebaseDay: Long = 0L): DataFrame = {
    val dayUs = 86400L * 1000000L
    events
      .select(col(keyCol),
        (expr(s"$tsCol DIV ${dayUs}L") - rebaseDay).as("x"),
        col(valCol).cast("long").as("v"))
      .groupBy(col(keyCol), col("x"))
      .agg(sum(col("v")).as("y"))
  }

  /** Theil–Sen robust slope + Mann–Kendall trend test (Theil 1950; Sen
    * 1968; Mann 1945) — [[linearTrend]]'s robust twin: least squares
    * chases one outlier day (a single backfill spike owns the slope),
    * while the MEDIAN of pairwise slopes has a 29% breakdown point, and
    * the Mann–Kendall S = Σ sign(y_j − y_i) tests monotone trend with
    * no distributional assumption. Per key over the per-(key, day)
    * totals: `(key, n_days, n_pairs, mk_s, ts_slope_ppm)`; keys with
    * one active day emit NULL trend columns (no pair exists — the
    * honest answer, matching linearTrend's NULL).
    *
    * Integer-exact: each pairwise slope is a sign-safe ppm division
    * (DECIMAL(38,0)-fenced numerator); the median picks order
    * statistics off the sorted slope array (even count → sign-safe
    * halved sum — Spark DIV truncates where the oracle's // floors, so
    * the division runs on the absolute value). Nothing floats.
    *
    * Scale shape: the pair space is per-key QUADRATIC in active days —
    * bounded because the input to the pair join is the daily-totals
    * frame ([[cusumChangepoints]]'s bucketed contract: days-per-window
    * class, ~6.6e4 pairs for a year of dailies), never raw events. One
    * keyed self-join + one keyed agg; the collected slope list is
    * bounded by the same contract.
    */
  def theilSenTrend(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts_us", valCol: String = "value",
      rebaseDay: Long = 0L): DataFrame =
    theilSenFromDaily(dailyTotals(events, keyCol, tsCol, valCol, rebaseDay),
      keyCol)

  /** [[theilSenTrend]]'s second half over an already-built `(key, x, y)`
    * daily frame — shared with [[graft.streaming.TrendStream]]'s robust
    * serve so batch and stream cannot drift.
    */
  def theilSenFromDaily(dailyIn: DataFrame, keyCol: String): DataFrame = {
    // three consumers (both join sides + the n_days agg): cut the
    // lineage or the daily aggregation recomputes per consumer
    val daily = graft.operators.Dedup.cached(dailyIn)
    val a = daily.select(col(keyCol), col("x").as("x1"), col("y").as("y1"))
    val b = daily.select(col(keyCol), col("x").as("x2"), col("y").as("y2"))
    val pairs = a.join(b, Seq(keyCol)).filter(col("x2") > col("x1"))
      .select(col(keyCol),
        signum(col("y2") - col("y1")).cast("long").as("sgn"),
        (signum(col("y2") - col("y1")).cast("long") * expr(
          "(CAST(1000000 AS DECIMAL(38,0)) * abs(CAST(y2 AS DECIMAL(38,0))" +
            " - CAST(y1 AS DECIMAL(38,0)))) div (x2 - x1)")).as("slope_ppm"))
    val pairAgg = pairs.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_pairs"), sum(col("sgn")).as("mk_s"),
        sort_array(collect_list(col("slope_ppm"))).as("slopes"))
    daily.groupBy(col(keyCol)).agg(count(lit(1)).as("n_days"))
      .join(pairAgg, Seq(keyCol), "left")
      .select(col(keyCol), col("n_days"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"), col("mk_s"),
        expr("""CASE
          |  WHEN n_pairs IS NULL THEN NULL
          |  WHEN n_pairs % 2 = 1
          |    THEN element_at(slopes, CAST(n_pairs DIV 2 + 1 AS INT))
          |  ELSE CAST(SIGNUM(element_at(slopes, CAST(n_pairs DIV 2 AS INT))
          |         + element_at(slopes, CAST(n_pairs DIV 2 + 1 AS INT))) AS BIGINT)
          |       * (abs(element_at(slopes, CAST(n_pairs DIV 2 AS INT))
          |         + element_at(slopes, CAST(n_pairs DIV 2 + 1 AS INT))) DIV 2)
          |END""".stripMargin).as("ts_slope_ppm"))
  }

  /** Per-key autocorrelation function (Box & Jenkins 1970) — the
    * seasonality DETECTOR to [[seasonalDecompose]]'s extractor: which
    * lag does a series echo at (r₇ spikes → weekly cycle; slow decay →
    * trend; all ≈ 0 → noise). Per (key, lag ℓ ≤ maxLag):
    * r_ℓ = Σ(x_t−x̄)(x_{t+ℓ}−x̄) / Σ(x_t−x̄)², computed integer-exact by
    * n-scaling (n·x_t − T carries n·(x_t−x̄); the n² factors cancel in
    * the ratio) — sign-safe ppm division, DECIMAL(38,0)-fenced
    * products, nothing floats.
    *
    * Input is the BUCKETED series (key, bucket, v) — gap-filled by
    * contract ([[gapFill]] first; a missing bucket silently drops its
    * pairs from the numerator, which is Box–Jenkins-undefined).
    *
    * Scale shape: lag pairs via ONE equi-join on (key, bucket+ℓ) after
    * an explode(maxLag) of the left side — shuffle bounded by
    * maxLag·|buckets|, per-key partitions bounded by the bucketed-series
    * contract; moments are two keyed map-side-combined aggs sharing the
    * (key) exchange shape. No window at all.
    */
  def acfByKey(series: DataFrame, keyCol: String = "key",
      bucketCol: String = "bucket", valCol: String = "v",
      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1 && maxLag <= 1000, s"maxLag must be in [1,1000]: $maxLag")
    val s = series.select(col(keyCol).as("k"), col(bucketCol).as("b"),
      col(valCol).cast("long").as("x"))
    val tot = s.groupBy(col("k")).agg(count(lit(1)).as("n"),
      sum(col("x")).as("t"))
    // d = n·x − T: the n-scaled centered value. Fence contract:
    // n_buckets·max|x| must stay ≤ ~10¹⁸ so d² fits DECIMAL(38,0)
    // (micro-unit daily totals over year-scale windows sit ≤ 10¹⁵).
    // three consumers (den, the lag explode, the pair join): cut the
    // lineage or the centered join recomputes per consumer
    val cent = graft.operators.Dedup.cached(s.join(tot, Seq("k"))
      .select(col("k"), col("b"),
        (col("n").cast("decimal(38,0)") * col("x") - col("t"))
          .cast("decimal(38,0)").as("d")))
    val den = cent.groupBy(col("k"))
      .agg(count(lit(1)).as("n_buckets"), sum(expr("d * d")).as("den"))
    val lagged = cent
      .withColumn("lag", explode(sequence(lit(1), lit(maxLag))))
      .select(col("k"), col("lag"), (col("b") + col("lag")).as("b"),
        col("d").as("d_prev"))
    cent.join(lagged, Seq("k", "b"))
      .groupBy(col("k"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"), sum(expr("d_prev * d")).as("num"))
      .join(den, Seq("k"))
      .select(col("k").as(keyCol), col("lag").cast("long").as("lag_n"),
        col("n_buckets"), col("n_pairs"),
        when(col("den") > lit(0).cast("decimal(38,0)"),
          signum(col("num")).cast("long") * expr(
            "(CAST(1000000 AS DECIMAL(38,0)) * abs(num)) div den"))
          .as("acf_ppm"))
  }

  /** Ljung–Box portmanteau statistic (Ljung & Box 1978) — the one-number
    * "is this series just noise?" test over [[acfByKey]]'s lags:
    * Q = n(n+2)·Σ_{ℓ≤h} r_ℓ²/(n−ℓ), χ²_h-distributed under white noise
    * (Q_ppm ≫ 10⁶·χ²₀.₉₅(h) ⇒ real temporal structure — autocorrelated
    * residuals, seasonality the sampler must respect). Exact integers
    * over the ppm ACF values (per-lag floor term, DECIMAL(38,0)-fenced
    * product); a key with ANY undefined lag (constant series) reports
    * NULL rather than a partial sum.
    *
    * Gap discipline: the n−ℓ divisor assumes the gap-filled contract
    * (buckets contiguous, so a lag-ℓ pair implies n_buckets > ℓ). On
    * contract-violating input (buckets {0,7} has a lag-7 pair with
    * n_buckets = 2) the divisor is ≤ 0 — Spark truncates toward zero
    * where DuckDB floors, and a zero divisor yields a silent NULL term.
    * Each per-lag term is therefore gated on n_buckets > lag_n and a
    * gated-out lag counts as UNDEFINED, nulling the key's Q loudly
    * instead of diverging silently.
    *
    * Scale shape: [[acfByKey]] + one keyed agg — nothing new exchanges.
    */
  def ljungBoxByKey(series: DataFrame, keyCol: String = "key",
      bucketCol: String = "bucket", valCol: String = "v",
      maxLag: Int = 7): DataFrame =
    acfByKey(series, keyCol, bucketCol, valCol, maxLag)
      .groupBy(col(keyCol))
      .agg(min(col("n_buckets")).as("n_buckets"),
        count(lit(1)).as("h_lags"),
        count(when(col("acf_ppm").isNotNull &&
          col("n_buckets") > col("lag_n"), lit(1))).as("h_def"),
        sum(when(col("n_buckets") > col("lag_n"), expr(
          "(CAST(acf_ppm AS DECIMAL(38,0)) * acf_ppm)" +
            " div (n_buckets - lag_n)"))).as("s"))
      .select(col(keyCol), col("n_buckets"), col("h_lags"),
        when(col("h_def") === col("h_lags"), expr(
          "(CAST(n_buckets AS DECIMAL(38,0)) * (n_buckets + 2) * s)" +
            " div 1000000")).as("lb_q_ppm"))

  /** CUSUM mean-shift changepoint scan (Page 1954; the offline
    * max-|CUSUM| form of Hinkley 1971) over a BUCKETED series — the
    * drift question q_drift_report answers for two named snapshots,
    * asked of a continuous timeline: WHERE did the level shift? The
    * statistic S_i = Σ_{j≤i}(x_j − x̄) peaks at the shift point; to keep
    * it integer-exact across engines it is scaled by n:
    * n·S_i = n·cum_i − i·T (cum/T/n all BIGINT), so the argmax is an
    * exact integer comparison and no float crosses the gate.
    *
    * Input is (bucket, v) — one BIGINT value per time bucket (the
    * caller aggregates raw events first; [[dailyTotals]]' shape).
    * Emits every bucket with its scaled statistic and an
    * `is_changepoint` flag on the max-|n·S_i| row (smallest bucket on
    * ties).
    *
    * Scale shape: the prefix sum is a single GLOBAL ordered window —
    * correct here because the input is the BUCKETED series, bounded by
    * the time range (hours-per-year class, the q_gap_fill contract),
    * never the raw event count; the peak pick is two broadcast 1-row
    * globals. Raw-event inputs must bucket first.
    *
    * `valCol` must be integral or DECIMAL (float/double raise at
    * runtime): cast float series through an explicit DecimalType first
    * — see [[shardedPrefix]].
    */
  /** Range-sharded global ordered prefix fold over a (bucket, v) series:
    * emits `(bucket, v, i, cum)` — the 1-based row index in global bucket
    * order and the inclusive prefix sum of v — WITHOUT a one-task global
    * window: range-shard by bucket (partition id monotone in bucket),
    * index/cum-sum within shard, add the broadcast (count, sum) prefix of
    * lower shards (≤ `shards` offset rows at any series length — the
    * [[graft.operators.Hygiene.cellsCum]] discipline on time). The
    * localCheckpoint pins the sampled range boundaries so the offsets
    * branch and the main branch cannot disagree on a row's shard.
    *
    * Value-type contract (inherited by every public operator that
    * forwards its `valCol` here — [[cusumChangepoints]],
    * [[cusumSegments]], [[seasonalDecompose]], [[forecastBaselines]]):
    * `v` must be integral or DECIMAL. [[ShardedFold.prefix]] rejects
    * float/double at runtime because the shard-stitched sum is only
    * order-free exact over those types; cast a float series through an
    * explicit DecimalType FIRST — the precision choice is the caller's
    * rounding decision, not the engine's.
    */
  private[graft] def shardedPrefix(s: DataFrame, shards: Int): DataFrame =
    ShardedFold.prefix(s.select(col("bucket"), col("v")),
      keyCols = Nil, orderCols = Seq("bucket"),
      sums = Seq("v" -> "cum"), idxCol = Some("i"), shards = shards)

  def cusumChangepoints(series: DataFrame,
      bucketCol: String = "bucket", valCol: String = "v",
      shards: Int = 64): DataFrame = {
    val s = series.select(col(bucketCol).as("bucket"), col(valCol).as("v"))
    val tot = s.agg(count(lit(1)).as("n"), sum(col("v")).as("t"))
    // prefix sum via the range-sharded fold — a 10⁶⁺-bucket series never
    // funnels through a single ordered-window task
    val st = graft.operators.Dedup.cached(
      shardedPrefix(s, shards).crossJoin(broadcast(tot))
        .withColumn("cusum_n",
          col("n") * col("cum") - col("i") * col("t"))
        .select(col("bucket"), col("v"), col("cusum_n")))
    val peak = st.agg(max(abs(col("cusum_n"))).as("mx"))
    val pb = st.crossJoin(broadcast(peak))
      .filter(abs(col("cusum_n")) === col("mx"))
      .agg(min(col("bucket")).as("pb"))
    st.crossJoin(broadcast(pb))
      .withColumn("is_changepoint", col("bucket") === col("pb"))
      .drop("pb")
  }

  /** Per-key CUSUM mean-shift scan — [[cusumChangepoints]] asked the way
    * production asks it: not "where did the GLOBAL level shift" but
    * "which KEY's usage shifted, and when". Identical integer algebra
    * per key (n_k·S_i = n_k·cum_i − i·T_k, argmax |·|, smallest bucket
    * on ties), so each key's flagged row equals what the global operator
    * would flag on that key's series alone.
    *
    * Scale shape: ONE exchange — `partitionBy(key)` carries every stage
    * (per-key totals, the ordered prefix sum, the peak max, and the
    * tie-broken peak bucket are all windows over the same partitioning;
    * the q_rolling bounded-key discipline). Input is the per-key
    * BUCKETED series (time-bounded per key — raw events bucket first,
    * [[dailyTotals]]' shape), so a partition is one key's timeline,
    * never its event count. No join, no second shuffle, no driver
    * collect; skewed key cardinality is irrelevant because the window
    * state is O(1) per row.
    */
  def cusumChangepointsByKey(series: DataFrame, keyCol: String = "key",
      bucketCol: String = "bucket", valCol: String = "v"): DataFrame = {
    val wk = Window.partitionBy(col("key"))
    val w = wk.orderBy(col("bucket"))
    series
      .select(col(keyCol).as("key"), col(bucketCol).as("bucket"),
        col(valCol).as("v"))
      .withColumn("n", count(lit(1)).over(wk))
      .withColumn("t", sum(col("v")).over(wk))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("cusum_n",
        col("n") * sum(col("v")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) -
          col("i") * col("t"))
      .withColumn("mx", max(abs(col("cusum_n"))).over(wk))
      .withColumn("pb",
        min(when(abs(col("cusum_n")) === col("mx"), col("bucket"))).over(wk))
      .select(col("key"), col("bucket"), col("v"), col("cusum_n"),
        (col("bucket") === col("pb")).as("is_changepoint"))
  }

  /** Multi-changepoint binary segmentation (Scott & Knott 1974 /
    * Vostrikova 1981 — the standard next step after a single-peak scan):
    * [[cusumChangepoints]] flags exactly one shift, but real timelines
    * shift more than once. Each of `depth` levels re-runs the SAME
    * integer n·S_i peak pick WITHIN every current segment and splits at
    * the peak (right child starts after the peak bucket), so after d
    * levels the series holds up to 2^d segments. A flat segment
    * (max |n·S_i| = 0) never splits — the deterministic stopping rule.
    *
    * Output: every bucket with its final `segment` label (= the
    * segment's first bucket), the segment's row count and value sum
    * (callers derive means without a float crossing the gate), and
    * `is_boundary` on each segment's first row.
    *
    * Scale shape: the [[Hygiene.median2Pass]] multi-pass discipline —
    * `depth` is a small constant, each level is ONE keyed-window pass
    * over the BUCKETED series (`partitionBy(segment)`; all five stats
    * share the exchange, the [[cusumChangepointsByKey]] shape), plus a
    * final relabel window. No recursion in the plan, no driver
    * collect; lineage grows linearly in `depth` (each level reads only
    * the previous level's columns — no twice-referenced frame, the
    * q_hits 2^n lesson does not bite).
    *
    * `valCol` must be integral or DECIMAL (float/double raise at
    * runtime): cast float series through an explicit DecimalType first
    * — see [[shardedPrefix]].
    */
  def cusumSegments(series: DataFrame, depth: Int,
      bucketCol: String = "bucket", valCol: String = "v",
      shards: Int = 64): DataFrame = {
    require(depth >= 1 && depth <= 5, s"depth must be in [1,5]: $depth")
    // UNKEYED form: level 1's segment is the WHOLE series, so the keyed
    // loop's partitionBy(seg) window would pin a 10⁶⁺-bucket series on
    // one task. Instead: range-shard by bucket ONCE (segments are
    // bucket-contiguous, so the sharding stays valid at every level —
    // a segment always occupies a contiguous shard interval, which is
    // exactly [[ShardedFold.shardOffsets]]' contiguousKeys contract),
    // then per level fold each segment's prefix sums within shards +
    // broadcast per-(shard, seg) offsets, and take the ≤ 2^depth segment
    // totals / peaks through tiny broadcast aggs. One localCheckpoint
    // per level cuts the three-consumer lineage (the q_hits 2^n lesson).
    // ADAPTIVE (the r15 cost knob): below the sharding floor the level
    // machinery (offset joins + per-level checkpoints) costs more than
    // the windows it replaces, so small series run [[cusumSegLoop]]'s
    // window loop unkeyed — bit-identical output (PropertySpec pins
    // keyed ≡ unkeyed ≡ sharded at every depth).
    val base0 = series.select(col(bucketCol).as("bucket"), col(valCol).as("v"))
      .localCheckpoint()
    val eff = ShardedFold.effectiveShards(base0.count(), shards)
    if (eff <= 1)
      return cusumSegLoop(base0.withColumn("seg", lit(0L)), depth, Nil)
    val sh0 = base0
      .repartitionByRange(eff, col("bucket"))
      .withColumn("_shard", spark_partition_id().cast("long"))
      .withColumn("seg", lit(0L))
      .localCheckpoint()
    var cur = sh0
    (1 to depth).foreach { _ =>
      val wLoc = Window.partitionBy(col("_shard"), col("seg"))
        .orderBy(col("bucket"))
      // ≤ (#segs + shards) rows: each shard holds a contiguous run of
      // segments, so (shard, seg) pairs ≤ segs + shards − 1
      val offs = ShardedFold.shardOffsets(cur, Seq("seg"), "_shard",
        Seq((count(lit(1)), "_n_off"), (sum(col("v")), "_v_off")),
        contiguousKeys = true)
      val segTot = cur.groupBy(col("seg"))
        .agg(count(lit(1)).as("_tn"), sum(col("v")).as("_tt"))
      val st = cur.join(broadcast(offs),
          col("_shard") === col("_o__shard") && col("seg") <=> col("_o_seg"),
          "left")
        .select(col("_shard"), col("seg"), col("bucket"), col("v"),
          col("_n_off"), col("_v_off"))
        .join(broadcast(segTot), Seq("seg"))
        .withColumn("cusum_n",
          col("_tn") * (coalesce(col("_v_off"), lit(0L)) +
            sum(col("v")).over(wLoc)) -
            (coalesce(col("_n_off"), lit(0L)) +
              row_number().over(wLoc).cast("long")) * col("_tt"))
        .select(col("_shard"), col("seg"), col("bucket"), col("v"),
          col("cusum_n"))
      val mx = st.groupBy(col("seg")).agg(max(abs(col("cusum_n"))).as("mx"))
      val pb = st.join(broadcast(mx), Seq("seg"))
        .filter(abs(col("cusum_n")) === col("mx"))
        .groupBy(col("seg")).agg(min(col("bucket")).as("pb"))
      cur = st.join(broadcast(mx), Seq("seg")).join(broadcast(pb), Seq("seg"))
        .withColumn("seg",
          when(col("mx") > lit(0L) && col("bucket") > col("pb"),
            col("pb") + 1L).otherwise(col("seg")))
        .select(col("_shard"), col("bucket"), col("v"), col("seg"))
        .localCheckpoint()
    }
    val segStat = cur.groupBy(col("seg")).agg(
      min(col("bucket")).as("segment"), count(lit(1)).as("seg_n"),
      sum(col("v")).as("seg_sum"))
    cur.join(broadcast(segStat), Seq("seg"))
      .select(col("bucket"), col("v"), col("segment"), col("seg_n"),
        col("seg_sum"), (col("bucket") === col("segment")).as("is_boundary"))
  }

  /** Per-key binary segmentation — [[cusumSegments]] composed with the
    * [[cusumChangepointsByKey]] discipline: every window partitions by
    * (key, segment), so each key's timeline segments independently in
    * the same passes (which USERS shifted, how many times, and when).
    * Same algebra, same stopping rule, labels per key.
    */
  def cusumSegmentsByKey(series: DataFrame, depth: Int,
      keyCol: String = "key", bucketCol: String = "bucket",
      valCol: String = "v"): DataFrame = {
    require(depth >= 1 && depth <= 5, s"depth must be in [1,5]: $depth")
    cusumSegLoop(series.select(col(keyCol).as("key"),
      col(bucketCol).as("bucket"), col(valCol).as("v"), lit(0L).as("seg")),
      depth, Seq("key"))
  }

  /** Kaplan–Meier survival curve (Kaplan & Meier 1958) over
    * last-activity churn — the retention read "what fraction of users
    * survive past day t": each user's churn day is their LAST observed
    * activity day (the uncensored event model — a right-censored
    * variant adds an observation-cutoff flag, same algebra), the
    * at-risk count n_t is everyone churning at or after t, and
    * S(t) = Π_{s ≤ t}(1 − d_s/n_s) with the product kept INTEGER: the
    * running survival is e6-scaled and floors at every step,
    * S ← (S·(n−d)) DIV n — deterministic in both engines (the ewma
    * fixed-point fold discipline applied to a product), no float chain.
    *
    * Scale shape: one keyed last-day agg (corpus-sized, map-side
    * combined), then everything runs on the DAY series (time-bounded,
    * the [[cusumChangepoints]] contract): a descending cumulative
    * window for at-risk counts, and the prefix products as bounded
    * O(m²) folds over a broadcast packed-factor array (m = distinct
    * churn days; each factor packs (n, n−d) into one long so the fold's
    * accumulator stays a plain BIGINT both engines share).
    */
  def kaplanMeier(df: DataFrame, keyCol: String, dayCol: String): DataFrame = {
    val last = df.groupBy(col(keyCol)).agg(max(col(dayCol)).as("d"))
    val dt = last.groupBy(col("d")).agg(count(lit(1)).as("di"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val risk = dt
      .withColumn("ni", sum(col("di")).over(w))
      .withColumn("k", row_number().over(Window.orderBy(col("d"))).cast("long"))
    val packed = risk.agg(sort_array(collect_list(
        struct(col("d"), (col("ni") * lit(4294967296L) + (col("ni") - col("di")))
          .as("p")))).as("a"))
      .select(expr("transform(a, s -> s.p)").as("a"))
    risk.crossJoin(broadcast(packed))
      .select(col("d").as("day"), col("ni").as("n_risk"),
        col("di").as("n_events"),
        expr("aggregate(slice(a, 1, CAST(k AS INT)), 1000000L, " +
          "(acc, x) -> (acc * pmod(x, 4294967296L)) DIV (x DIV 4294967296L))")
          .as("surv_ppm"))
  }

  /** Season-aware anomaly flags — [[seasonalDecompose]] composed with
    * the Hampel identifier ([[Hygiene.madOutliers]]' doubled-median
    * integer algebra): anomalies are judged on the RESIDUAL (what
    * neither trend nor season explains), so a nightly dip or a weekly
    * peak never false-alarms, and a genuinely odd bucket inside a
    * normal-looking level does. Flags `2·|2r − med2| > 3·dmed2` —
    * |r − median| > 3·MAD in exact integers (med2 = 2·median stays
    * integral when an even-count median interpolates).
    *
    * Edge buckets (no full trend window) have no residual and are NOT
    * judged — they are absent from the output, not silently normal.
    * The exact `percentile` buffers the residual series: bounded by the
    * bucketed-series contract (the [[cusumChangepoints]] shape).
    */
  def seasonalAnomalies(series: DataFrame, season: Int,
      bucketCol: String = "bucket", valCol: String = "v"): DataFrame = {
    val resid = graft.operators.Dedup.cached(
      seasonalDecompose(series, season, bucketCol, valCol)
        .filter(col("residual_e6").isNotNull)
        .select(col("bucket"), col("v"), col("residual_e6")))
    val med = resid.agg(
      (expr("percentile(residual_e6, 0.5)") * 2).cast("long").as("med2"))
    val d = resid.crossJoin(broadcast(med))
      .withColumn("dev", abs(col("residual_e6") * 2 - col("med2")))
    val dmed = d.agg((expr("percentile(dev, 0.5)") * 2).cast("long").as("dmed2"))
    d.crossJoin(broadcast(dmed))
      .select(col("bucket"), col("v"), col("residual_e6"), col("med2"),
        col("dmed2"), (col("dev") * 2 > col("dmed2") * 3).as("is_anomaly"))
  }

  /** The shared level loop: `depth` passes of per-(keys, seg) n·S_i peak
    * split, then the relabel/stat windows. One keyed-window exchange per
    * level (all five stats share it), linear lineage.
    */
  private def cusumSegLoop(start: DataFrame, depth: Int,
      keys: Seq[String]): DataFrame = {
    var cur = start
    (1 to depth).foreach { _ =>
      val wk = Window.partitionBy((keys :+ "seg").map(col): _*)
      val w = wk.orderBy(col("bucket"))
      cur = cur
        .withColumn("cusum_n",
          count(lit(1)).over(wk) * sum(col("v")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) -
            row_number().over(w).cast("long") * sum(col("v")).over(wk))
        .withColumn("mx", max(abs(col("cusum_n"))).over(wk))
        .withColumn("pb",
          min(when(abs(col("cusum_n")) === col("mx"), col("bucket"))).over(wk))
        // right child's label pb+1 is unique (strictly inside the parent
        // range) and engine-portable even over sparse buckets
        .withColumn("seg",
          when(col("mx") > lit(0L) && col("bucket") > col("pb"),
            col("pb") + 1L).otherwise(col("seg")))
        .select(keys.map(col) ++ Seq(col("bucket"), col("v"), col("seg")): _*)
    }
    val ws = Window.partitionBy((keys :+ "seg").map(col): _*)
    cur
      .withColumn("segment", min(col("bucket")).over(ws))
      .withColumn("seg_n", count(lit(1)).over(ws))
      .withColumn("seg_sum", sum(col("v")).over(ws))
      .select(keys.map(col) ++ Seq(col("bucket"), col("v"), col("segment"),
        col("seg_n"), col("seg_sum"),
        (col("bucket") === col("segment")).as("is_boundary")): _*)
  }

  /** Additive seasonal decomposition over a bucketed series — the
    * classical decomposition (Macaulay 1931; the "decompose first, then
    * judge anomalies" step [[cusumChangepoints]] and [[forecastBaselines]]
    * assume has happened when a series has a known period): per bucket,
    * `trend_e6` = the centered `season`-bucket moving average (defined
    * only where the full window exists — honest NULL edges, no padding),
    * `seasonal_e6` = the per-phase mean of the detrended series
    * (phase = bucket mod season), `residual_e6` = what neither explains
    * — the column anomaly detection should actually scan.
    *
    * Integer-exact: everything scaled to e6 with the house sign·abs
    * division (Spark DIV truncates, DuckDB // floors — they agree only
    * on non-negative operands, and detrended values are signed).
    * Seasonal indexes are deliberately UNCENTERED (their mean rides the
    * trend estimate; centering would re-divide and double the
    * truncation surface — documented, mirrored in the oracle).
    *
    * Scale shape: the centered moving sum is the PREFIX-SUM DIFFERENCE
    * `cum(i+h2) − cum(i−h1−1)` over the [[shardedPrefix]] range-sharded
    * fold (never a one-task global window), realized as two row-index
    * equi-joins of the series against itself — series-bounded exchanges
    * that AQE broadcasts when small — plus one season-bounded phase agg
    * broadcast back. The full-window guard `h1 < i ≤ n − h2` is exactly
    * the old count-over-window === season test (honest NULL edges).
    * Even seasons use the deterministic asymmetric window
    * [−⌈m/2⌉, +(m−1−⌈m/2⌉)].
    *
    * `valCol` must be integral or DECIMAL (float/double raise at
    * runtime): cast float series through an explicit DecimalType first
    * — see [[shardedPrefix]].
    */
  def seasonalDecompose(series: DataFrame, season: Int,
      bucketCol: String = "bucket", valCol: String = "v",
      shards: Int = 64): DataFrame = {
    require(season >= 2 && season <= 100000, s"season must be in [2,100000]: $season")
    val h1 = season / 2
    val h2 = season - 1 - h1
    val p = graft.operators.Dedup.cached(shardedPrefix(
      series.select(col(bucketCol).as("bucket"), col(valCol).as("v")), shards))
    val tot = p.agg(coalesce(max(col("i")), lit(0L)).as("_nn"))
    // cum at the window's upper edge (row i+h2) keyed to row i; cum at
    // the row BELOW its lower edge (row i−h1−1) keyed to row i — absent
    // only when that row is 0, where the prefix is 0 by definition
    val cumHi = p.select((col("i") - lit(h2.toLong)).as("i"),
      col("cum").as("_cum_hi"))
    val cumLo = p.select((col("i") + lit(h1.toLong + 1L)).as("i"),
      col("cum").as("_cum_lo"))
    val base = p
      .join(cumHi, Seq("i"), "left")
      .join(cumLo, Seq("i"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("phase", pmod(col("bucket"), lit(season.toLong)))
      .withColumn("wsum",
        when(col("i") > lit(h1.toLong) &&
            col("i") + lit(h2.toLong) <= col("_nn"),
          col("_cum_hi") - coalesce(col("_cum_lo"), lit(0L))))
      .withColumn("trend_e6",
        when(col("wsum").isNotNull,
          signum(col("wsum")).cast("long") *
            expr(s"(1000000 * abs(wsum)) DIV $season")))
      .withColumn("det_e6", col("v") * 1000000L - col("trend_e6"))
    val seas = base.filter(col("det_e6").isNotNull)
      .groupBy(col("phase"))
      .agg(sum(col("det_e6")).as("ds"), count(lit(1)).as("dn"))
      .select(col("phase"),
        (signum(col("ds")).cast("long") * expr("abs(ds) DIV dn"))
          .as("seasonal_e6"))
    base.join(broadcast(seas), Seq("phase"), "left")
      .select(col("bucket"), col("v"), col("phase"), col("trend_e6"),
        col("seasonal_e6"),
        (col("det_e6") - col("seasonal_e6")).as("residual_e6"))
  }

  /** Forecast-baseline audit over a bucketed series — persistence
    * (ŷ_t = y_{t−1}) vs seasonal-naïve (ŷ_t = y_{t−season}), with their
    * MAE ratio: the MASE denominator discipline (Hyndman & Koehler
    * 2006) says any forecasting investment must beat these, so this row
    * is the go/no-go read BEFORE building anything fancier; mase-like
    * ratio < 10⁶ ppm means persistence already beats the seasonal
    * pattern (or vice versa). Evaluation restricted to buckets where
    * BOTH baselines exist (t > season), so the two MAEs average the
    * same support.
    *
    * Integer-exact: input values are exact longs; MAEs emit as
    * `Σ|d| DIV n` in the value's own scale and the ratio as
    * `10⁶·Σ|d₁| DIV Σ|d_s|` — all non-negative, no float. Lags are
    * ROW lags over the ordered buckets: gap-fill a holey series first
    * (q_gap_fill's operator) or the season offset slips. Scale shape:
    * lags are row-index equi-joins over the [[shardedPrefix]]
    * range-sharded fold (never a one-task global window — the r14
    * bucketed-series discipline) + one 1-row agg.
    *
    * `valCol` must be integral or DECIMAL (float/double raise at
    * runtime): cast float series through an explicit DecimalType first
    * — see [[shardedPrefix]].
    */
  def forecastBaselines(series: DataFrame, season: Int,
      bucketCol: String = "bucket", valCol: String = "v",
      shards: Int = 64): DataFrame = {
    require(season >= 2, s"season must be >= 2: $season")
    val p = graft.operators.Dedup.cached(shardedPrefix(
      series.select(col(bucketCol).as("bucket"), col(valCol).as("v")), shards))
    p
      .join(p.select((col("i") + 1L).as("i"), col("v").as("p")), Seq("i"), "left")
      .join(p.select((col("i") + season.toLong).as("i"), col("v").as("sn")),
        Seq("i"), "left")
      .filter(col("sn").isNotNull)
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("v") - col("p"))).as("sae_persist"),
        sum(abs(col("v") - col("sn"))).as("sae_seasonal"))
      .select(col("n_eval"),
        expr("sae_persist DIV n_eval").as("mae_persist"),
        expr("sae_seasonal DIV n_eval").as("mae_seasonal"),
        when(col("sae_seasonal") =!= 0L,
          expr("(1000000 * sae_persist) DIV sae_seasonal")).as("mase_ppm"))
  }

  /** [[linearTrend]]'s second half: the five integer regression moments
    * and the slope over a (key, x, y) daily-totals frame — shared by the
    * batch operator and the streaming twin's read path so the algebra
    * cannot drift.
    */
  def trendFromDaily(daily: DataFrame, keyCol: String): DataFrame = {
    daily
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_days"),
        min(col("x")).as("first_day"), max(col("x")).as("last_day"),
        sum(col("y")).as("total"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("num", col("n_days") * col("sxy") - col("sx") * col("total"))
      .withColumn("den", col("n_days") * col("sxx") - col("sx") * col("sx"))
      .withColumn("slope_e6",
        when(col("den") === 0L, lit(null).cast("long"))
          .otherwise(signum(col("num")).cast("long") *
            expr("(1000000L * abs(num)) div den")))
      .select(col(keyCol), col("n_days"), col("first_day"), col("last_day"),
        col("total"), col("slope_e6"))
  }
}
