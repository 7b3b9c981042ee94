package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream metrics — the Structured Streaming extension
  * (SURVEY §2.9: the reference is batch-incremental; this is the additive
  * streaming path over the `events` table).
  *
  * Every transform here is defined once and runs under BOTH batch and
  * streaming plans — that is the Spark-native design: the same
  * `groupBy(window(...))` logical plan is executed incrementally with
  * state when the source is a stream. [[withStreamingWatermark]] bounds
  * that state for the streaming case.
  *
  * Exactness: event values are arbitrary doubles, so sums quantize to
  * 1e-4 units first (same formula in the DuckDB oracle).
  */
object EventMetrics {

  /** Tumbling-window counts/sums per event type. Window starts align to
    * the epoch, so `date_trunc('hour', ts)` mirrors them in SQL. */
  def tumbling(events: DataFrame, windowLength: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        (sum(round(col("value") * 10000)) / 10000.0).as("value_sum"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("value_sum"))

  /** Session windows per user (gap-based). Spark semantics: a session
    * ends gap after its last event; an event at exactly start+gap opens a
    * new session. */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (sum(round(col("value") * 10000)) / 10000.0).as("value_sum"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("value_sum"))

  /** Bound streaming state: drop events later than `delay` behind the
    * max seen ts. Apply before [[tumbling]]/[[sessions]] on a stream. */
  def withStreamingWatermark(events: DataFrame, delay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", delay)
}
