package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization via `flatMapGroupsWithState` —
  * the arbitrary-state streaming capability layer beyond the reference's
  * processing-time cron (the reference has no event-time or state concept
  * at all, SURVEY.md §2.9; reference trigger surface:
  * `/root/reference/handler.go:48-66`).
  *
  * Why custom state and not the built-in `session_window`: the built-in
  * expresses exactly one policy (merge events closer than a gap). This
  * operator adds a session-size cap — a session also closes after
  * `maxEvents` rows, opening a fresh one for the next event — which no
  * built-in window expresses, and which is the shape real clickstream /
  * training-telemetry pipelines need (bot storms produce single "sessions"
  * of millions of events that must be split, or the per-session state and
  * any downstream per-session array agg blows up). The gap-only form of
  * this operator is oracle-checked transitively: with `maxEvents = ∞` its
  * batch semantics coincide with `Temporal.sessionize` (`q_sessionize`,
  * DuckDB-verified) and the built-in `session_window` (`q_session_window`),
  * and EngineSpec asserts the streaming output equals the batch result on
  * the same events.
  *
  * Scale properties (the reasons this survives an unbounded stream):
  *  - state per key is ONE fixed-size [[SessionizeStream.OpenSession]]
  *    (24 bytes of fields) — not the event list; sessions are closed and
  *    emitted as soon as either the in-batch data proves a gap or the
  *    watermark passes `last + gap` (event-time timeout), so the state
  *    store holds only keys with a currently-open session;
  *  - emitted rows are final (append mode): downstream sinks never see a
  *    session twice;
  *  - events older than the watermark are dropped by the engine before
  *    reaching the state function — bounded lateness is the contract that
  *    bounds state.
  */
object SessionizeStream {

  /** Input event. `ts` is event time (the watermark column). */
  final case class Event(user_id: Long, ts: Timestamp)

  /** Per-key state: the one currently-open session. Times in epoch micros. */
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long)

  /** One closed session. `closed_by` ∈ {"gap", "cap", "timeout"} — how the
    * session ended (in-batch gap proof, size cap, or watermark timeout).
    */
  final case class Session(
      user_id: Long,
      session_start_us: Long,
      session_end_us: Long,
      n_events: Long,
      closed_by: String)

  private def us(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** Gap-and-cap sessionize a (possibly streaming) Dataset of events.
    *
    * @param gapUs     session gap in event-time micros: an event more than
    *                  this after the previous one starts a new session
    *                  (same `> gap` convention as `Temporal.sessionize`)
    * @param maxEvents close ("cap") a session after this many events
    * @param watermarkDelay bounded-lateness contract, e.g. "10 minutes"
    */
  def sessions(
      events: Dataset[Event],
      gapUs: Long,
      watermarkDelay: String,
      maxEvents: Long = Long.MaxValue): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        process(gapUs, maxEvents))
  }

  /** The state-transition function. Package-visible so the batch-equivalence
    * test can drive it directly against `Temporal.sessionize`.
    */
  private[streaming] def process(gapUs: Long, maxEvents: Long)(
      userId: Long,
      rows: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[Session] = {
    def close(o: OpenSession, why: String) =
      Session(userId, o.startUs, o.lastUs, o.n, why)
    if (state.hasTimedOut) {
      // watermark passed last + gap with no new events: the open session is
      // final by the lateness contract
      val out = state.getOption.map(close(_, "timeout"))
      state.remove()
      out.iterator
    } else {
      // Micro-batch arrival order is arbitrary; session semantics are
      // event-time order. Sorting WITHIN the group is bounded by the
      // per-key batch volume, not history — state never holds events.
      //
      // Out-of-order-but-within-watermark handling: the open session from
      // state is folded into the SAME sorted sweep as the batch's events
      // (as a proto-session interval), ordered by start time. An event
      // earlier than the open session therefore either extends it backwards
      // (start moves to the min — within gap on either side) or forms its
      // own earlier session, closed by "gap" — it is never silently
      // absorbed with a stale session_start_us. With in-order input the
      // sweep degenerates to the classic per-event fold (the open session
      // sorts first), so the batch-equivalence contract with
      // `Temporal.sessionize` is unchanged.
      val protos = (state.getOption.toSeq ++
        rows.map { e => val t = us(e.ts); OpenSession(t, t, 1) })
        .sortBy(p => (p.startUs, p.lastUs))
      val out = Vector.newBuilder[Session]
      var open: Option[OpenSession] = None
      protos.foreach { p =>
        open match {
          // mergeable: within gap of the open interval on either side
          // (p.startUs >= o.startUs by sort, so only the trailing gap and
          // the cap can reject). The cap guard is on the MERGED count
          // o.n + p.n — p can be the carried state interval (p.n events,
          // not 1), and `o.n < maxEvents` alone would admit a merge whose
          // result breaches the cap (e.g. cap 2, state n=2, one earlier
          // within-gap late event → n=3). With in-order input p.n == 1 and
          // the guard degenerates to o.n < maxEvents, so the
          // batch-equivalence contract is untouched; under late data the
          // emitted SPLIT BOUNDARIES may differ from the batch re-chop
          // (state cannot be retracted), but no emitted session ever
          // exceeds maxEvents — the hard invariant.
          case Some(o) if p.startUs - o.lastUs <= gapUs && o.n + p.n <= maxEvents =>
            open = Some(OpenSession(
              o.startUs, math.max(o.lastUs, p.lastUs), o.n + p.n))
          case Some(o) =>
            out += close(o, if (p.startUs - o.lastUs > gapUs) "gap" else "cap")
            open = Some(p)
          case None =>
            open = Some(p)
        }
      }
      open match {
        case Some(o) =>
          state.update(o)
          // fire once the watermark proves no in-gap event can still arrive;
          // ceiling division (micros → millis) so the timeout never fires in
          // the sliver up to 2 ms BEFORE last + gap, and the max() guard
          // keeps the timestamp legal (> current watermark) when the
          // watermark has already advanced past last + gap
          state.setTimeoutTimestamp(
            math.max((o.lastUs + gapUs + 999L) / 1000L,
              state.getCurrentWatermarkMs() + 1L))
        case None => // no events and no timeout: nothing to do
      }
      out.result().iterator
    }
  }
}
