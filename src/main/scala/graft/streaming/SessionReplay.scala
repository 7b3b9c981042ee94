package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

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
    val (minTs, maxTs) = events.agg(min(col("ts")), max(col("ts")))
      .as[(Timestamp, Timestamp)].head()
    require(minTs != null && maxTs != null, "events table is empty")
    val nEvents = events.count() // on the persisted frame, pre-unpersist

    val inDir = Files.createTempDirectory("graft-replay-in").toString
    val ckpt = Files.createTempDirectory("graft-replay-ckpt").toString
    val stamped = scala.collection.mutable.Set[String]()
    def writeSlice(df: DataFrame, idx: Int): Unit = {
      df.coalesce(1).write.mode("append").parquet(inDir)
      // deterministic, strictly increasing mtimes drive the file
      // source's oldest-first ordering
      Files.list(Paths.get(inDir)).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("part-"))
        .filterNot(p => stamped.contains(p.toString))
        .foreach { p =>
          p.toFile.setLastModified(1700000000000L + idx * 60000L)
          stamped += p.toString
        }
    }
    val span = maxTs.getTime - minTs.getTime + 1
    val bounds = (0 to slices).map(k => minTs.getTime + span * k / slices)
    (0 until slices).foreach { k =>
      writeSlice(
        events.filter(unix_millis(col("ts")) >= bounds(k) &&
          unix_millis(col("ts")) < bounds(k + 1)), k)
    }
    val s1 = maxTs.getTime + gapMs + 86400000L
    Seq((-1L, new Timestamp(s1), 0.0), (-2L, new Timestamp(s1 + 86400000L), 0.0))
      .zipWithIndex.foreach { case (row, i) =>
        writeSlice(Seq(row).toDF("user_id", "ts", "value"), slices + i)
      }
    events.unpersist()

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
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
    val stateParts =
      math.max(8L, math.min(32L, nEvents / 25000L)).toString
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", stateParts)
      val q = out.writeStream.format("memory").queryName(qn)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    spark.table(qn).filter(col("user_id") >= 0)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("value_sum"))
  }
}
