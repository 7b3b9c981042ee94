package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watermarked stream-stream inner join — the attribution join (each
  * purchase paired with the same user's views in the preceding hour)
  * run as a REAL two-sided streaming join, gated against the batch
  * range-join oracle.
  *
  * Semantics that make the replay equal the batch join exactly:
  *  - inner stream-stream joins emit a match as soon as both sides have
  *    arrived — output never waits on the watermark, so `AvailableNow`
  *    termination cannot truncate results;
  *  - the watermark + the time-range condition bound STATE: a buffered
  *    view is dropped once the watermark guarantees no future purchase
  *    can reach back to it (`view_ts < wm − range`). With time-ordered
  *    slices ([[FileReplay]]) and a 0-second delay, every purchase
  *    arrives while its candidate views are still retained — eviction
  *    is always safe, never lossy;
  *  - the state that remains per micro-batch is one join range of
  *    views/purchases per user — the bounded-state contract that lets
  *    this run forever at 100 TB/day, vs the batch join's full-history
  *    shuffle.
  */
object StreamJoin {

  /** Hot-key-safe variant of [[purchaseViewJoinViaStream]] — the
    * shipped mitigation for the 10×-soak finding that a user carrying
    * 20% of the stream makes the per-user symmetric join enumerate
    * ~10⁹ stored candidates through ONE state partition: the join key
    * becomes (user, time-bucket of width `rangeSeconds`), with each
    * purchase exploded to the two buckets its lookback can reach
    * (`b(tp)` and `b(tp)−1`; a qualifying view's own bucket is always
    * exactly one of them, so the cover is LOSSLESS and duplicate-free
    * — gated against the SAME batch range-join oracle as q98). A hot
    * entity's stored views then split across its active buckets, and
    * each probe enumerates one bucket's views instead of the user's
    * whole retained history — candidate work per probe drops from
    * O(views in state) to O(views per bucket), and the state rows
    * hash across partitions by (user, bucket).
    *
    * Same watermark/eviction contract: the bucket equality only keys
    * the state store; cleanup still derives from the watermark + the
    * event-time range condition. */
  def purchaseViewJoinBucketedViaStream(
      spark: SparkSession, dir: String,
      rangeSeconds: Long = 3600, slices: Int = 4): DataFrame = {
    val bucketMicros = rangeSeconds * 1000000L
    // no persist (r16): the one-pass writeHistory (r15) reads the
    // source twice — a ts-only column-pruned scan for the bounds and
    // the slicing write — which is cheaper than materializing the full
    // 4-column frame into the storage pool first (this harness never
    // needs a row count, unlike SessionReplay's stateParts sizing)
    val events = graft.core.Tables.events(spark, dir)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("event_type").cast("string").as("event_type"),
        col("ts").cast("timestamp").as("ts"))

    val replay = new FileReplay("graft-sjoin-bkt")
    replay.writeHistory(events, "ts", slices)

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(replay.inDir)
    val views = stream.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "0 seconds")
      .withColumn("v_bucket",
        expr(s"unix_micros(view_ts) div $bucketMicros"))
    val purchases = stream.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "0 seconds")
      .withColumn("p_bucket", explode(array(
        expr(s"unix_micros(purchase_ts) div $bucketMicros") - 1L,
        expr(s"unix_micros(purchase_ts) div $bucketMicros"))))

    val joined = purchases.join(views,
      expr(s"""user_id = v_user_id AND p_bucket = v_bucket AND
               view_ts >= purchase_ts - INTERVAL $rangeSeconds SECONDS AND
               view_ts <= purchase_ts"""))
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("view_id"), col("view_ts"))

    val qn = "graft_sjoin_bkt_replay_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    FileReplay.withReplayConfs(spark, "8") {
      val q = joined.writeStream.format("memory").queryName(qn)
        .outputMode("append")
        .option("checkpointLocation", replay.checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    FileReplay.drain(spark, qn)(identity)
  }

  /** Purchases ⨝ views within `rangeSeconds` before each purchase, per
    * user, replayed through a sliced file stream.
    *
    * EXECUTABLE SPEC — at scale run
    * [[purchaseViewJoinBucketedViaStream]] (q339): Spark's symmetric
    * stream-join state is hashed on the bare user key, so a hot key
    * funnels every probe through one state partition (398 s
    * single-threaded on the 10× soak's 20%-hot user, vs 14 s for the
    * bucketed sibling with IDENTICAL rows; see [[graft.ScaleRouting]]).
    * This form stays as the exact per-user specification the sibling
    * gates against (same batch-range-join oracle). */
  def purchaseViewJoinViaStream(
      spark: SparkSession, dir: String,
      rangeSeconds: Long = 3600, slices: Int = 4): DataFrame = {
    graft.ScaleRouting.advise(
      "q98_stream_stream_join", "q339_stream_join_bucketed")
    val events = graft.core.Tables.events(spark, dir)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("event_type").cast("string").as("event_type"),
        col("ts").cast("timestamp").as("ts"))
      // no persist — the bucketed sibling's r16 rationale

    val replay = new FileReplay("graft-sjoin")
    replay.writeHistory(events, "ts", slices)

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(replay.inDir)
    val views = stream.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "0 seconds")
    val purchases = stream.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "0 seconds")

    val joined = purchases.join(views,
      expr(s"""user_id = v_user_id AND
               view_ts >= purchase_ts - INTERVAL $rangeSeconds SECONDS AND
               view_ts <= purchase_ts"""))
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("view_id"), col("view_ts"))

    val qn = "graft_sjoin_replay_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    // a stream-stream join keeps FOUR state stores per shuffle
    // partition (keyWithIndex + keyToNumValues per side), each
    // checkpointed every micro-batch — at replay scale the store
    // commits dominate, so size the state partitioning to the state
    // volume (tiny here), not the batch-compute default. The setting is
    // baked into the new checkpoint; restored after the run.
    FileReplay.withReplayConfs(spark, "8") {
      val q = joined.writeStream.format("memory").queryName(qn)
        .outputMode("append")
        .option("checkpointLocation", replay.checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    FileReplay.drain(spark, qn)(identity)
  }
}
