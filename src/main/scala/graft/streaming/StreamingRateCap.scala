package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming extension of the q340 ingest contract
  * ([[graft.ext.Curation.eventRateCap]]): keep each entity's NEWEST
  * `maxPerDay` events per UTC day on a LIVE stream, with state bounded
  * by the cap itself — the enforcement point a 100 TB streaming ingest
  * needs, since the q98-class state hazard the batch cap tames arrives
  * as a stream in production.
  *
  * Semantics are IDENTICAL to the batch cap (the gate proves it): the
  * kept set per (entity, day) is the top-`maxPerDay` under
  * (ts desc, event_id asc) — the same deterministic total order — so
  * replaying a day's events through the stream emits exactly the rows
  * the batch window keeps.
  *
  * Shape: `flatMapGroupsWithState` keyed on (entity, UTC day) — the
  * q338/q340 grain that splits a hot entity's history across its
  * active days instead of funneling one hash key. State per open
  * entity-day is ONE bounded vector of at most `maxPerDay` entries — a
  * hot entity at 10⁶ events/day still holds `maxPerDay` rows of state,
  * which is the whole point: admission control whose memory is the
  * CONTRACT bound, not the input rate. A day's kept set is emitted
  * exactly once, when the event-time watermark passes the day's end
  * (event-time timeout); days already closed by the watermark flush
  * inline. Late events follow the standard watermark contract.
  *
  * Streaming-only (the [[StatefulSessionizer.sessionsStreaming]]
  * stance): the batch path is [[graft.ext.Curation.eventRateCap]]
  * itself — running this shape on a batch frame would just re-derive
  * that window, worse. */
object StreamingRateCap {

  case class Ev(
      user_id: Long, event_id: Long, event_type: String, ts: Timestamp,
      value: Double)
  case class DayKey(user_id: Long, day: Long)
  case class KeptEv(tsu: Long, event_id: Long, event_type: String, value: Double)
  case class DayState(kept: Vector[KeptEv])
  case class CappedEv(
      user_id: Long, event_id: Long, event_type: String, tsu: Long,
      value: Double)

  private val DayMicros = 86400L * 1000000L

  /** Full-microsecond extraction (the [[StatefulSessionizer]] rule:
    * getTime alone drops sub-milli). */
  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** The bounded merge: top-`maxPerDay` under (tsu desc, event_id asc)
    * — the restriction of the batch cap's total order, so incremental
    * merging across any arrival split equals the one-shot selection
    * (selection under a total order is associative; law-tested). */
  private[streaming] def keepNewest(
      entries: Vector[KeptEv], maxPerDay: Int): Vector[KeptEv] =
    entries.sortBy(e => (-e.tsu, e.event_id)).take(maxPerDay)

  /** The streaming cap over an event-time-watermarked stream of [[Ev]].
    * Emits each (entity, day)'s kept rows once the watermark passes the
    * day's end. */
  def cappedStreaming(
      events: Dataset[Ev], maxPerDay: Int): Dataset[CappedEv] = {
    require(maxPerDay >= 1, "maxPerDay must be positive")
    implicit val keyEnc = Encoders.product[DayKey]
    implicit val stateEnc = Encoders.product[DayState]
    implicit val outEnc = Encoders.product[CappedEv]
    events
      .groupByKey(e => DayKey(e.user_id, Math.floorDiv(micros(e.ts), DayMicros)))
      .flatMapGroupsWithState[DayState, CappedEv](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key, it, state: GroupState[DayState]) =>
          def emit(kept: Vector[KeptEv]): Iterator[CappedEv] =
            kept.iterator.map(e =>
              CappedEv(key.user_id, e.event_id, e.event_type, e.tsu, e.value))
          if (state.hasTimedOut) {
            // watermark passed the day's end — the kept set is final
            val kept = state.get.kept
            state.remove()
            emit(kept)
          } else {
            // BOUNDED incremental merge — never `it.toVector`: a hot
            // entity-day's whole batch arrives through this one iterator,
            // so buffering it before capping holds rate×day rows in one
            // task (the q98-class pile-up this operator exists to bound).
            // keepNewest is split-invariant under the total order
            // (law-tested), so chunked folding equals the one-shot
            // selection while in-flight memory stays ≤ maxPerDay + chunk.
            val chunk = math.max(maxPerDay, 256)
            val merged = it.map(e =>
                KeptEv(micros(e.ts), e.event_id, e.event_type, e.value))
              .grouped(chunk)
              .foldLeft(state.getOption.map(_.kept).getOrElse(Vector.empty)) {
                (acc, c) => keepNewest(acc ++ c, maxPerDay)
              }
            state.remove()
            val closeAtUs = (key.day + 1L) * DayMicros
            if (state.getCurrentWatermarkMs() * 1000L >= closeAtUs) {
              // already final (watermark advanced past the day end
              // before this batch) — flush inline, keep no state
              emit(merged)
            } else {
              state.update(DayState(merged))
              // ms-grained timeout API: round UP so the timeout can
              // never fire before the day actually closes
              state.setTimeoutTimestamp(Math.floorDiv(closeAtUs + 999L, 1000L))
              Iterator.empty
            }
          }
      }
  }

  /** Per-run state observability (the q340 manifest discipline on the
    * stream): max state rows held across batches, watermark-dropped
    * rows, batch count — the readout that makes a cap/state regression
    * visible as DATA in the soak log, not just wall time. Sourced from
    * the streaming query's own progress telemetry
    * (`StreamingQueryProgress.stateOperators`). */
  case class StreamCapMetrics(
      batches: Int, maxStateRows: Long, rowsDroppedByWatermark: Long,
      inputRows: Long, maxStateBytes: Long)

  /** Data-driven bound on CONCURRENT state keys for a
    * [[cappedViaStreamWithMetrics]] replay — the falsifiable assertion
    * the naive `entityDays × cap` bound is not: state rows for
    * `flatMapGroupsWithState` are one per OPEN (entity, day) key (the
    * kept vector lives inside that row), so `maxStateRows ≤ entityDays`
    * holds vacuously and only a bound tied to the watermark's eviction
    * schedule can catch broken key cleanup.
    *
    * Model (mirrors [[FileReplay.writeHistory]]'s slice construction
    * and the 0-second watermark): an (entity, day) key can be in state
    * at the end of batch k only if it has events in slices ≤ k and its
    * day-end timeout exceeds the watermark Spark applies in batch k.
    * The watermark for batch k derives from data seen through batch
    * k−1; we allow one EXTRA batch of lag (wm through k−2) so a
    * late-propagating watermark never fails a healthy run, and add 2
    * for the far-future sentinel keys. Flush-inline keys (day already
    * closed at first arrival) are counted as open — an overcount, so
    * the result is a sound upper bound. Broken eviction accumulates
    * every seen key and crosses this bound by construction (it sits at
    * roughly `(lag+1)/slices` of entityDays, far below entityDays for
    * any real slicing). */
  def openEntityDayBound(
      events: DataFrame, entityCol: String, tsCol: String,
      slices: Int): Long = {
    val msc = unix_millis(col(tsCol))
    val mm = events.agg(min(msc).as("mn"), max(msc).as("mx")).head()
    require(!mm.isNullAt(0), "openEntityDayBound: empty events")
    val (minMs, maxMs) = (mm.getLong(0), mm.getLong(1))
    val span = maxMs - minMs + 1
    val bounds = (0 to slices).map(k => minMs + span * k / slices)
    // slice index exactly as writeHistory assigns it: monotone bounds,
    // slice = #{k in 1..slices-1 : ms >= bounds(k)}
    val sliceIdx = (1 until slices)
      .map(k => when(msc >= lit(bounds(k)), lit(1)).otherwise(lit(0)))
      .reduceOption(_ + _).getOrElse(lit(0))
    // per-key first arrival slice + ms-grained day-end timeout (the
    // round-up the operator itself applies via setTimeoutTimestamp)
    val dayCol = (unix_micros(col(tsCol)) / lit(DayMicros)).cast("long")
    val keys = events
      .select(col(entityCol).as("e"), dayCol.as("d"), sliceIdx.as("s"), msc.as("ms"))
      .groupBy(col("e"), col("d"))
      .agg(min(col("s")).as("first_slice"))
      .withColumn("timeout_ms",
        expr(s"((d + 1) * $DayMicros + 999) div 1000"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-slice max ts (driver-side: `slices` rows)
    val sliceMax = events.select(sliceIdx.as("s"), msc.as("ms"))
      .groupBy(col("s")).agg(max(col("ms")).as("mx"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    def wmThrough(k: Int): Long =
      (0 to k).flatMap(sliceMax.get).foldLeft(Long.MinValue)(math.max)
    val bound = (0 until slices).map { k =>
      val wm = wmThrough(k - 2) // one extra batch of watermark lag
      keys.filter(col("first_slice") <= lit(k) && col("timeout_ms") > lit(wm))
        .count()
    }.max
    keys.unpersist()
    bound + 2L // the two sentinel keys
  }

  /** Replays the batch `events` table through a REAL file-source stream
    * (the [[FileReplay]] construction: time-ordered slices, 0-second
    * watermark kept exact, two far-future sentinels to close every real
    * day) and the streaming cap — the final frame must equal the batch
    * [[graft.ext.Curation.eventRateCap]], which is the SQL oracle the
    * driver gate checks. */
  def cappedViaStream(
      spark: SparkSession, dir: String, maxPerDay: Int = 3,
      slices: Int = 4): DataFrame =
    cappedViaStreamWithMetrics(spark, dir, maxPerDay, slices)._1

  /** [[cappedViaStream]] plus the run's [[StreamCapMetrics]]. */
  def cappedViaStreamWithMetrics(
      spark: SparkSession, dir: String, maxPerDay: Int = 3,
      slices: Int = 4): (DataFrame, StreamCapMetrics) = {
    import spark.implicits._
    val events = graft.core.Tables.events(spark, dir)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("event_type").cast("string").as("event_type"),
        col("ts").cast("timestamp").as("ts"),
        col("value").cast("double").as("value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nEvents = events.count()
    require(nEvents > 0, "events table is empty")

    val replay = new FileReplay("graft-ratecap")
    val (_, maxMs) = replay.writeHistory(events, "ts", slices)
    // two far-future sentinels (filtered from the result): the first
    // advances the watermark past every real day's end, the second
    // triggers a batch in which every real (entity, day) has timed out
    val s1 = maxMs + 2L * 86400000L
    Seq((-1L, -1L, "sentinel", new Timestamp(s1), 0.0),
        (-2L, -2L, "sentinel", new Timestamp(s1 + 2L * 86400000L), 0.0))
      .foreach { row =>
        replay.writeSlice(
          Seq(row).toDF("user_id", "event_id", "event_type", "ts", "value"))
      }
    events.unpersist()

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(replay.inDir)
      .withWatermark("ts", "0 seconds")
      .as[Ev]
    val out = cappedStreaming(stream, maxPerDay)
    val qn = "graft_ratecap_replay_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    // state instances sized to state VOLUME (the SessionReplay rule)
    val stateParts = FileReplay.stateParts(nEvents)
    val metrics = FileReplay.withReplayConfs(spark, stateParts) {
      val q = out.writeStream.format("memory").queryName(qn)
        .outputMode("append")
        .option("checkpointLocation", replay.checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // recentProgress retains the last 100 updates; this replay runs
      // slices+2 sentinel batches (single digits), so the window holds
      // the whole run
      val progs = q.recentProgress.toSeq
      val stateRows = progs.flatMap(_.stateOperators.map(_.numRowsTotal))
      val stateBytes = progs.flatMap(_.stateOperators.map(_.memoryUsedBytes))
      StreamCapMetrics(
        batches = progs.size,
        maxStateRows = if (stateRows.isEmpty) 0L else stateRows.max,
        rowsDroppedByWatermark =
          progs.flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum,
        inputRows = progs.map(_.numInputRows).sum,
        maxStateBytes = if (stateBytes.isEmpty) 0L else stateBytes.max)
    }
    val res = FileReplay.drain(spark, qn)(
      _.filter(col("user_id") >= 0)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("tsu"), col("value")))
    (res, metrics)
  }
}
