package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming→lakehouse bridge for the incremental gold maintainers: the
  * withheld CDC day arrives as a REAL file-source stream, and every
  * micro-batch runs the production landing sequence inside
  * `foreachBatch` —
  *
  *   1. append the batch to the silver zone (the ingest write),
  *   2. maintain the gold mart against updated silver, writing a NEW
  *      mart version (never overwriting the version being read — the
  *      swap-write discipline of `CdcPipeline.refreshGold`).
  *
  * After the stream drains, the final mart version must hash-match the
  * plain full recompute over all of silver — the same oracle as the
  * batch replay (q79-q82), now proven THROUGH the streaming engine's
  * batch boundaries: the delta's users arrive split across
  * micro-batches, so a maintainer that mishandles repeated maintenance
  * of the same day (double-counting appends, stale-mart reads,
  * cross-batch key overlap) cannot match.
  *
  * All three maintenance algebras ride the SAME harness:
  *   - [[ltvViaStream]]: unconditional key-scoped recompute
  *     ([[graft.gold.IncrementalLtv]] — no global anchor);
  *   - [[rfmViaStream]]: GUARDED key-scoped recompute
  *     ([[graft.gold.IncrementalRfm]]) — the anchored guard re-evaluates
  *     per micro-batch against the evolving mart, proving the
  *     hold-the-anchor branch composes across batch boundaries;
  *   - [[trendsViaStream]]: additive merge
  *     ([[graft.gold.IncrementalTrends]]) — per-batch partial aggregates
  *     merge-add into the mart, exact because money rides integral
  *     1e-4 cents on both sides, so batch slicing and arrival order
  *     cannot perturb the sum.
  *
  * `Trigger.AvailableNow` + `maxFilesPerTrigger=1` drains the sliced
  * input one file per micro-batch and stops — no sentinels or
  * watermarks needed because `foreachBatch` sees every batch exactly
  * once through the checkpoint. Batch order is irrelevant by design:
  * the landing sequence is order-insensitive (appends commute; the
  * key-scoped maintainers recompute affected keys from silver, not from
  * the batch payload; the additive maintainer's merge is commutative),
  * which is itself a property worth proving — real CDC landings arrive
  * in whatever order the bus delivers.
  */
object IncrementalGoldStream {

  def ltvViaStream(spark: SparkSession, dir: String, slices: Int = 3): DataFrame =
    spark.read.parquet(maintainedMarts(spark, dir, slices).ltv)

  /** RFM through the stream: the anchored guard
    * ([[graft.gold.IncrementalAnchored]]) runs once PER micro-batch —
    * the replayed day is mid-range, so every batch must take the
    * held-anchor key-scoped branch against the mart version its
    * predecessor wrote. Shares q05's full-recompute oracle. */
  def rfmViaStream(spark: SparkSession, dir: String, slices: Int = 3): DataFrame =
    spark.read.parquet(maintainedMarts(spark, dir, slices).rfm)

  /** Daily trends through the stream: the ADDITIVE path — each batch's
    * partial aggregate merge-adds into the prior mart version; silver
    * still lands (the ingest write) but maintenance never re-reads it.
    * Shares q07's full-recompute oracle. */
  def trendsViaStream(spark: SparkSession, dir: String, slices: Int = 3): DataFrame =
    spark.read.parquet(maintainedMarts(spark, dir, slices).trends)

  /** The shared replay harness: withhold the replay day from silver,
    * build mart v0 from the base, stream the day's rows back user-hash-
    * sliced one file per micro-batch, and land each batch with
    * `maintain(prevMart, updatedSilver, batch)` under the swap-write
    * discipline. Returns the final mart version. */
  /** The base-silver parquet + sliced input files are identical for all
    * three maintainers at a given (session, dir, slices) — prepare them
    * once per session (the [[graft.bindings.Conformed]] memoization
    * pattern): each query still gets its OWN checkpoint, silver copy,
    * and mart-version chain (those are the mutable state under test),
    * but the immutable inputs stop being re-conformed and re-written
    * three times. */
  private val prepCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, Int), (String, String)]

  private def preparedInputs(
      spark: SparkSession, dir: String, slices: Int): (String, String) =
    prepCache.getOrElseUpdate((spark, dir, slices), {
      val revenue = graft.bindings.Conformed.orderRevenueCached(spark, dir)
      val d = to_date(lit(graft.gold.IncrementalReplay.replayDate))
      val root = Files.createTempDirectory("graft-incr-stream-base").toString
      val basePath = s"$root/base"
      val inDir = s"$root/in"
      revenue.filter(col("creation_date") =!= d)
        .write.mode("overwrite").parquet(basePath)
      val delta = revenue.filter(col("creation_date") === d)
      // slice the delta by user hash — users split ACROSS micro-batches
      (0 until slices).foreach { k =>
        delta.filter(
            pmod(graft.functions.Portable.h60(col("user_id").cast("string")),
              lit(slices.toLong)) === k)
          .coalesce(1).write.mode("append").parquet(inDir)
      }
      (basePath, inDir)
    })

  /** Final mart paths for the three maintainers after the drain. */
  final case class Marts(ltv: String, rfm: String, trends: String)

  private val martsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, Int), Marts]

  /** ONE stream session maintains all three marts: the replay day
    * drains once (one checkpoint, one set of micro-batch triggers), and
    * each `foreachBatch` lands the batch then runs the three
    * maintenance algebras side by side — each against ITS OWN previous
    * mart version, exactly as a production landing job maintains every
    * downstream mart off one ingest. The per-maintainer gate is
    * unchanged (same slices, same per-batch maintenance chain, same
    * full-recompute oracle); what's shared is only the stream scaffold
    * — r7 ran three separate drains and paid the micro-batch trigger +
    * checkpoint floor three times (~13 s combined for ~4 s of
    * maintenance work). */
  private def maintainedMarts(
      spark: SparkSession, dir: String, slices: Int): Marts =
    martsCache.getOrElseUpdate((spark, dir, slices), {
      val (basePath, inDir) = preparedInputs(spark, dir, slices)
      val delta = spark.read.parquet(inDir)

      val root = Files.createTempDirectory("graft-incr-stream").toString
      // silver = immutable shared base ∪ this run's append zone — the
      // ingest write lands ONLY in the per-run zone, so runs stay
      // isolated without copying the 600k-row base per query
      val appendPath = s"$root/silver_append"
      val maintainers: Seq[(String, DataFrame => DataFrame,
          (DataFrame, DataFrame, DataFrame) => DataFrame)] = Seq(
        ("ltv", graft.gold.Ltv.daily,
          (prev, silver, batch) => graft.gold.IncrementalLtv(prev, silver, batch)),
        ("rfm", df => graft.gold.Rfm(df),
          (prev, silver, batch) => graft.gold.IncrementalRfm(prev, silver, batch)),
        ("trends", graft.gold.SalesTrends.daily,
          (prev, _, batch) => graft.gold.IncrementalTrends.daily(prev, batch)))
      val base = spark.read.parquet(basePath)
      maintainers.foreach { case (tag, buildMart, _) =>
        buildMart(base).write.mode("overwrite").parquet(s"$root/${tag}_v0")
      }

      // driver-side mart-version cursor; foreachBatch bodies run on the
      // driver sequentially, one per micro-batch
      var version = 0
      val q = spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inDir)
        .writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[Row], _: Long) =>
          val s = batch.sparkSession
          val b = batch.toDF().persist()
          b.write.mode("append").parquet(appendPath)
          val silver = s.read.parquet(basePath, appendPath)
          maintainers.foreach { case (tag, _, maintain) =>
            val prev = s.read.parquet(s"$root/${tag}_v$version")
            maintain(prev, silver, b)
              .write.mode("overwrite").parquet(s"$root/${tag}_v${version + 1}")
          }
          version += 1
          b.unpersist()
          ()
        }
        .start()
      q.awaitTermination()
      Marts(s"$root/ltv_v$version", s"$root/rfm_v$version",
        s"$root/trends_v$version")
    })
}
