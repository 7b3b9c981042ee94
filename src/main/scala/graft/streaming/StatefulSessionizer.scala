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

  /** The one open (not yet watermark-closed) session of a key. */
  case class OpenSession(start: Long, last: Long, n: Long, sum: Double)

  private def toSession(userId: Long, s: OpenSession, gapMs: Long): Session =
    Session(userId, new Timestamp(s.start), new Timestamp(s.last + gapMs), s.n, s.sum)

  /** Fold time-ordered events into closed sessions + the trailing open
    * one. `open` carries state from a previous micro-batch, if any. */
  private def fold(
      userId: Long, open: Option[OpenSession], events: Seq[Event], gapMs: Long)
      : (Vector[Session], Option[OpenSession]) = {
    var cur = open
    val closed = Vector.newBuilder[Session]
    events.foreach { e =>
      cur match {
        case Some(s) if e.ts.getTime - s.last >= gapMs =>
          closed += toSession(userId, s, gapMs)
          cur = Some(OpenSession(e.ts.getTime, e.ts.getTime, 1L, e.value))
        case Some(s) =>
          cur = Some(OpenSession(s.start, e.ts.getTime, s.n + 1, s.sum + e.value))
        case None =>
          cur = Some(OpenSession(e.ts.getTime, e.ts.getTime, 1L, e.value))
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
        val sorted = it.toVector.sortBy(_.ts.getTime)
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
            val sorted = it.toVector.sortBy(_.ts.getTime)
            val (closed, open) = fold(userId, state.getOption, sorted, gapMs)
            state.remove()
            val flushedEarly = open.flatMap { s =>
              val closeAt = s.last + gapMs
              if (state.getCurrentWatermarkMs() >= closeAt) {
                // already final (watermark advanced past it this batch)
                Some(toSession(userId, s, gapMs))
              } else {
                state.update(s)
                state.setTimeoutTimestamp(closeAt)
                None
              }
            }
            (closed ++ flushedEarly).iterator
          }
      }
  }
}
