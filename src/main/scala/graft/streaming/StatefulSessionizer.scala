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
  * Works on both batch and streaming Datasets (Spark runs the function
  * once per key in batch mode). Events are sorted per group here —
  * iterator order is not guaranteed — which bounds per-key memory by the
  * group size; at 100 TB keep keys fine-grained (user, day) if single
  * users can have unbounded histories.
  */
object StatefulSessionizer {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, value_sum: Double)

  /** Gap-based sessions, semantics matching `session_window(ts, gap)`:
    * a session ends `gapMs` after its last event. */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val longEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.kryo[List[Event]]
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Event], Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, it, _: GroupState[List[Event]]) =>
          val sorted = it.toVector.sortBy(_.ts.getTime)
          if (sorted.isEmpty) Iterator.empty
          else {
            val sessions = Vector.newBuilder[Session]
            var start = sorted.head
            var last = sorted.head
            var n = 0L
            var sum = 0.0
            def flush(): Unit = sessions += Session(
              userId, start.ts, new Timestamp(last.ts.getTime + gapMs), n, sum)
            sorted.foreach { e =>
              if (e.ts.getTime - last.ts.getTime >= gapMs) {
                flush(); start = e; n = 0L; sum = 0.0
              }
              last = e; n += 1; sum += e.value
            }
            flush()
            sessions.result().iterator
          }
      }
  }
}
