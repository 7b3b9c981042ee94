package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming exact deduplication: emit the FIRST occurrence of each key
  * and suppress every later duplicate — the streaming contract equal to
  * batch `DISTINCT` over the key columns, for ingest paths where the
  * same record can arrive again hours or days later (CDC replays,
  * at-least-once sources) and a bounded-window dedup would let the
  * re-arrival through.
  *
  * State is one row per DISTINCT key — the same envelope a batch
  * distinct's hash table needs, and the honest minimum for the exact
  * contract (suppressing a duplicate that can arrive arbitrarily late
  * requires remembering every key seen). Project to the key columns
  * BEFORE deduplicating: the state store then holds keys, not full
  * rows, and — because all rows with equal keys are identical after the
  * projection — the emitted row set is deterministic regardless of
  * which arrival a micro-batch happens to keep. When duplicates are
  * known to cluster in time, Spark's `dropDuplicatesWithinWatermark`
  * trades the exact contract for bounded state; this operator is the
  * exact-contract variant.
  */
object StreamingDedup {

  /** Distinct key emission over a (possibly streaming) frame. */
  def distinctKeys(stream: DataFrame, keys: Seq[String]): DataFrame =
    stream.select(keys.map(col): _*).dropDuplicates(keys)

  /** Replays the batch `events` table through a REAL file-source stream
    * split into time slices (one per micro-batch, oldest first — the
    * same replay construction as [[SessionReplay]]), so keys recurring
    * across slices MUST be suppressed by cross-batch state, and the
    * result equals batch `SELECT DISTINCT user_id, event_type` — the
    * oracle the driver gate checks. */
  def distinctKeysViaStream(
      spark: SparkSession, dir: String, slices: Int = 4): DataFrame = {
    import spark.implicits._
    // persisted for the slicing loop (the SessionReplay rationale)
    val events = graft.core.Tables.events(spark, dir)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_type").cast("string").as("event_type"),
        col("ts").cast("timestamp").as("ts"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nEvents = events.count() // on the persisted frame, pre-unpersist

    // the shared replay construction (time-ordered slices, strictly
    // increasing mtimes)
    val replay = new FileReplay("graft-dedup")
    replay.writeHistory(events, "ts", slices)
    events.unpersist()

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(replay.inDir)
    val out = distinctKeys(stream, Seq("user_id", "event_type"))
    val qn = "graft_dedup_replay_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    // size the state partitioning to the state VOLUME (the
    // SessionReplay rationale — adaptive: 8 instances win at the gate
    // SF, more amortize once each carries real state); dedup output is
    // partition-count-independent
    val stateParts = FileReplay.stateParts(nEvents)
    FileReplay.withReplayConfs(spark, stateParts) {
      val q = out.writeStream.format("memory").queryName(qn)
        .outputMode("append")
        .option("checkpointLocation", replay.checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    FileReplay.drain(spark, qn)(identity)
  }
}
