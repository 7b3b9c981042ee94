package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via `flatMapGroupsWithState` — the
  * arbitrary-stateful-processing tier below the declarative
  * [[EventMetrics.sessions]] (`session_window`). Use this shape when
  * session logic stops being expressible as a gap window (e.g. cart
  * abandonment rules, capped session lengths).
  *
  * Two entry points with honest mode contracts:
  *  - [[sessions]] — BATCH ONLY: one function call per key sees the key's
  *    complete history, so no cross-call state is needed (Spark runs the
  *    batch path with empty state and no timeouts — buffering there would
  *    be dead code).
  *  - [[sessionsStreaming]] — streaming: the open session per key is
  *    buffered in `GroupState` and only emitted once the event-time
  *    watermark passes its close instant, so sessions spanning
  *    micro-batch/trigger boundaries are stitched, not fragmented.
  */
object StatefulSessionizer {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, value_sum: Double)

  /** The one open (not yet watermark-closed) session of a key. `cents`
    * accumulates the value sum as integral 1e-4 units (the [[graft.gold]]
    * exact-money discipline): integer sums are order-independent, so the
    * emitted `value_sum` is bit-identical whether events arrived in one
    * batch or were stitched across many — and matches a SQL oracle's
    * `sum(round(value * 10000)) / 10000.0` exactly. */
  /** `start`/`last` are event-time MICROseconds — `Timestamp.getTime`
    * would truncate Spark's microsecond timestamps to millis and shift
    * every session boundary. */
  case class OpenSession(start: Long, last: Long, n: Long, cents: Long)

  /** Spark's `round(x)` semantics (HALF_UP over the decimal rendering). */
  private def toCents(v: Double): Long =
    java.math.BigDecimal.valueOf(v * 10000)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** Full-microsecond extraction (getTime alone drops sub-milli). */
  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def tsFromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def toSession(userId: Long, s: OpenSession, gapMs: Long): Session =
    Session(userId, tsFromMicros(s.start), tsFromMicros(s.last + gapMs * 1000L),
      s.n, s.cents / 10000.0)

  /** Fold time-ordered events into closed sessions + the trailing open
    * one. `open` carries state from a previous micro-batch, if any.
    *
    * Cross-batch out-of-order contract: events are sorted WITHIN a
    * batch, but under a nonzero watermark delay an admitted event can
    * precede the open session carried from the previous batch. Such an
    * event MERGES (start/last extend by min/max — a bare `last = us`
    * would move the session end backwards and could emit end < start).
    * An admitted event more than a gap before the open session's start
    * is absorbed into it rather than emitted as its own session —
    * one-open-session state cannot retroactively split; sessionization
    * is exact when input is in-order per user (the replay gates, or
    * any delay ≤ gap), which is the operating point the scaladoc
    * documents. */
  private def fold(
      userId: Long, open: Option[OpenSession], events: Seq[Event], gapMs: Long)
      : (Vector[Session], Option[OpenSession]) = {
    val gapUs = gapMs * 1000L
    var cur = open
    val closed = Vector.newBuilder[Session]
    events.foreach { e =>
      val us = micros(e.ts)
      cur match {
        case Some(s) if us - s.last >= gapUs =>
          closed += toSession(userId, s, gapMs)
          cur = Some(OpenSession(us, us, 1L, toCents(e.value)))
        case Some(s) =>
          cur = Some(OpenSession(math.min(s.start, us), math.max(s.last, us),
            s.n + 1, s.cents + toCents(e.value)))
        case None =>
          cur = Some(OpenSession(us, us, 1L, toCents(e.value)))
      }
    }
    (closed.result(), cur)
  }

  /** Gap-based sessions over a BATCH Dataset, semantics matching
    * `session_window(ts, gap)`: a session ends `gapMs` after its last
    * event. Events are sorted per group here — iterator order is not
    * guaranteed — which bounds per-key memory by the group size; at
    * 100 TB keep keys fine-grained (user, day) if single users can have
    * unbounded histories. For streaming input use [[sessionsStreaming]]:
    * this variant keeps no cross-trigger state, so on a stream it would
    * fragment sessions at micro-batch boundaries. */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    require(!events.isStreaming,
      "sessions() is batch-only; use sessionsStreaming() on streams")
    implicit val sessionEnc = Encoders.product[Session]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroups { (userId, it) =>
        val sorted = it.toVector.sortBy(e => micros(e.ts))
        val (closed, open) = fold(userId, None, sorted, gapMs)
        (closed ++ open.map(toSession(userId, _, gapMs))).iterator
      }
  }

  /** Gap-based sessions over a STREAMING Dataset. The input must carry an
    * event-time watermark on `ts` (`df.withWatermark("ts", delay)`) —
    * that watermark both bounds state and decides when an open session is
    * final: a session closes `gapMs` after its last event, and is emitted
    * once the watermark passes that instant (event-time timeout), so a
    * session spanning any number of micro-batches is emitted exactly
    * once, whole. Events later than the watermark follow the standard
    * watermark contract (dropped by the upstream filter).
    *
    * State per key is O(1) — one [[OpenSession]] — not the event buffer,
    * so long-lived keys cannot grow executor state without bound. */
  def sessionsStreaming(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val longEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[OpenSession]
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, it, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed the open session's close instant — final
            val s = state.get
            state.remove()
            Iterator.single(toSession(userId, s, gapMs))
          } else {
            val sorted = it.toVector.sortBy(e => micros(e.ts))
            val (closed, open) = fold(userId, state.getOption, sorted, gapMs)
            state.remove()
            val flushedEarly = open.flatMap { s =>
              val closeAtUs = s.last + gapMs * 1000L
              if (state.getCurrentWatermarkMs() * 1000L >= closeAtUs) {
                // already final (watermark advanced past it this batch)
                Some(toSession(userId, s, gapMs))
              } else {
                state.update(s)
                // timeout API is millisecond-grained: round UP so the
                // timeout can never fire before the close instant
                state.setTimeoutTimestamp(Math.floorDiv(closeAtUs + 999L, 1000L))
                None
              }
            }
            (closed ++ flushedEarly).iterator
          }
      }
  }
}
