package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Replays the batch `events` table through a REAL file-source stream and
  * the GroupState sessionizer, producing the same rows the batch
  * sessionization produces — the execution proof that
  * [[StatefulSessionizer.sessionsStreaming]]'s cross-batch stitching and
  * event-time-timeout emission are correct, gated by the same SQL oracle
  * as the batch query (q27's sessions SQL).
  *
  * Replay construction:
  *  - History is split into `slices` disjoint, increasing time ranges;
  *    each slice is ONE parquet file whose mtime increases with its
  *    range, and the stream runs `maxFilesPerTrigger=1` — so the file
  *    source replays history in time order, one slice per micro-batch,
  *    and every session spanning a slice boundary MUST be stitched
  *    through `GroupState` (a fragmenting implementation emits extra
  *    rows and hash-mismatches the oracle).
  *  - Time-ordered slices keep a `0 seconds` watermark exact: the
  *    watermark after slice k is slice k's max event time, and every
  *    later event is in a later range, so nothing is ever late-dropped.
  *  - Two far-future sentinel events (filtered from the result) close
  *    the stream: the first advances the watermark past every real
  *    session's close instant, the second triggers a batch in which all
  *    real keys have timed out — so the final flush does not depend on
  *    the engine scheduling a trailing no-data batch.
  */
object SessionReplay {

  def sessionsViaStream(
      spark: SparkSession, dir: String,
      gapMs: Long = 30L * 60 * 1000, slices: Int = 4): DataFrame = {
    import spark.implicits._
    // persisted for the slicing loop: min/max + one filter-write per
    // slice would otherwise rescan the source `slices`+1 times
    val events = graft.core.Tables.events(spark, dir)
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        col("value").cast("double").as("value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nEvents = events.count() // on the persisted frame, pre-unpersist

    // the shared replay construction (time-ordered slices, strictly
    // increasing mtimes, 0-second watermark kept exact)
    val replay = new FileReplay("graft-replay")
    val (_, maxMs) = replay.writeHistory(events, "ts", slices)
    val s1 = maxMs + gapMs + 86400000L
    Seq((-1L, new Timestamp(s1), 0.0), (-2L, new Timestamp(s1 + 86400000L), 0.0))
      .foreach { row =>
        replay.writeSlice(Seq(row).toDF("user_id", "ts", "value"))
      }
    events.unpersist()

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(replay.inDir)
      .withWatermark("ts", "0 seconds")
      .as[StatefulSessionizer.Event]
    val out = StatefulSessionizer.sessionsStreaming(stream, gapMs)
    val qn = "graft_session_replay_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    // state-store instance count = shuffle partitions, each committed
    // per micro-batch: at replay scale those commits dominate the wall
    // (the q98 StreamJoin sizing rationale) — size the state
    // partitioning TO THE STATE VOLUME, restore after. Adaptive, not
    // fixed: at the gate SF (100k events) 8 instances halve the wall
    // (6.7 → 4.0 s), but the 10× soak measured a fixed 8 WORSE than 32
    // (17.7 vs 13.5 s) — the commit overhead amortizes once each
    // instance carries real state, so instances scale with rows.
    // Grouping-key results are partition-count-independent, so the
    // gate hash is untouched either way.
    val stateParts = FileReplay.stateParts(nEvents)
    FileReplay.withReplayConfs(spark, stateParts) {
      val q = out.writeStream.format("memory").queryName(qn)
        .outputMode("append")
        .option("checkpointLocation", replay.checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    FileReplay.drain(spark, qn)(
      _.filter(col("user_id") >= 0)
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), col("value_sum")))
  }
}
