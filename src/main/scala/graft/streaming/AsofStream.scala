package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming AS-OF join via `flatMapGroupsWithState` — the streaming twin
  * of [[graft.operators.Temporal.asofJoin]] (batch union-and-sweep): for
  * each left event, the right stream's most recent row at-or-before it
  * (per key), with the batch operator's exact semantics — "at-or-before"
  * inclusive, LARGEST right id wins among equal-time rights, unmatched
  * lefts emit NULL match columns (left-join semantics).
  *
  * Structured Streaming has no native as-of join (its stream-stream joins
  * are interval equi-joins), so this is custom state over the UNION of
  * both streams keyed by the join key — the same union-and-sweep idea,
  * with the watermark standing in for the sort:
  *
  *  - a left event is emitted exactly when the watermark passes its event
  *    time: from that point no right row at-or-before it can still arrive
  *    (late rows are older than the watermark and dropped), so the match
  *    is FINAL — append mode, downstream never sees a correction;
  *  - state per key is bounded: pending lefts and buffered rights only
  *    within the watermark in-flight window, plus exactly ONE right row
  *    at-or-below the watermark (the only old right any future left can
  *    match — everything older is evicted, [[step]] is unit-tested for
  *    this). An unconstrained as-of buffer would hold the whole right
  *    history; this holds O(rate × lateness) + 1 per key;
  *  - out-of-order arrival within the lateness bound is handled by the
  *    same rule, not a special case: matching happens only below the
  *    watermark, where the event-time order is already settled.
  *
  * EngineSpec asserts the streamed output equals `Temporal.asofJoin` on
  * the same frames (shuffled arrival order), and drives [[step]] directly
  * for the eviction contract.
  */
object AsofStream {

  final case class LeftEvent(key: Long, ts: Timestamp, l_id: Long)
  final case class RightEvent(key: Long, ts: Timestamp, r_id: Long)

  /** Internal union row: side 0 = right, 1 = left (the batch sweep's sort
    * tag, here used only to split the union back apart).
    */
  final case class Ev(key: Long, ts: Timestamp, side: Int, id: Long)

  /** Per-key state: pending lefts (ts at-or-above the watermark) and the
    * retained rights (in-flight ones plus the single best settled one).
    * Times in epoch micros.
    */
  final case class AsofState(lefts: List[(Long, Long)], rights: List[(Long, Long)])

  /** One final match. Times in epoch micros (the long-typed convention of
    * the batch operator); `asof_rid`/`asof_rt_us` None = no right row
    * at-or-before the left event.
    */
  final case class AsofMatch(
      key: Long,
      l_id: Long,
      ts_us: Long,
      asof_rid: Option[Long],
      asof_rt_us: Option[Long])

  private def us(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** As-of join two (possibly streaming) event Datasets. */
  def joined(
      left: Dataset[LeftEvent],
      right: Dataset[RightEvent],
      watermarkDelay: String): Dataset[AsofMatch] = {
    import left.sparkSession.implicits._
    left.map(e => Ev(e.key, e.ts, 1, e.l_id))
      .union(right.map(e => Ev(e.key, e.ts, 0, e.r_id)))
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsofState, AsofMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(process)
  }

  /** The pure state transition: fold the batch's events into the buffers,
    * emit every left settled by the watermark with its final match, evict
    * every right the watermark has made unreachable. Returns (emitted
    * matches, new state, event-time timeout in millis if lefts remain
    * pending). Package-visible for direct unit testing of the eviction
    * contract.
    */
  private[graft] def step(
      st: AsofState, events: Seq[Ev], wmUs: Long): (Seq[AsofMatch], AsofState, Option[Long]) = {
    val lefts = st.lefts ++
      events.collect { case e if e.side == 1 => (us(e.ts), e.id) }
    val rights = st.rights ++
      events.collect { case e if e.side == 0 => (us(e.ts), e.id) }
    val (ready, pending) = lefts.partition(_._1 < wmUs)
    val out = ready.sortBy(identity).map { case (ts, lid) =>
      // the final match: max (rt, rid) among rights at-or-before ts —
      // complete because any still-unseen right is at-or-above the
      // watermark, hence strictly after this left
      val m = rights.filter(_._1 <= ts) match {
        case Nil => None
        case rs  => Some(rs.max)
      }
      // key is stamped by the caller (process copies it in); step itself
      // is key-agnostic so the eviction unit test needs no group plumbing
      AsofMatch(0L, lid, ts, m.map(_._2), m.map(_._1))
    }
    // eviction: rights below the watermark can only ever match a FUTURE
    // left (ts at-or-above the watermark) as "the most recent settled
    // right" — only the max (rt, rid) among them can win; drop the rest
    val (inFlight, settled) = rights.partition(_._1 >= wmUs)
    val kept = (if (settled.nonEmpty) List(settled.max) else Nil) ++ inFlight
    val timeout = pending.map(_._1).minOption
      .map(tsUs => math.max(tsUs / 1000L + 1L, wmUs / 1000L + 1L))
    (out, AsofState(pending, kept), timeout)
  }

  private def process(
      key: Long,
      rows: Iterator[Ev],
      state: GroupState[AsofState]): Iterator[AsofMatch] = {
    val st = state.getOption.getOrElse(AsofState(Nil, Nil))
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val (out, newSt, timeout) = step(st, rows.toSeq, wmUs)
    if (newSt.lefts.isEmpty && newSt.rights.isEmpty) state.remove()
    else {
      state.update(newSt)
      timeout.foreach(state.setTimeoutTimestamp)
    }
    out.iterator.map(_.copy(key = key))
  }
}
