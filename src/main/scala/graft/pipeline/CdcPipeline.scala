package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.{AppendOnlyCdc, ControlStore, SnapshotDiff, WatermarkIncrementalLoad}
import graft.gold._
import graft.io.{Lakehouse, ParquetSink, ParquetSource}
import graft.silver.{CleanConform, RevenueConform}

/** End-to-end bronze → silver → gold pipeline runner — the reference's
  * three Glue jobs (`scripts/cdc_metrics_job_bronze.py` /
  * `_silver.py` / `_gold.py`) as one configurable, testable unit over
  * the operator library.
  *
  * Differences from the reference, all deliberate and test-pinned:
  *  - the clock is injected (`runDate` + `cdcTs`), never `datetime.now()`;
  *  - watermarked + diff-based CDC both come from the cdc module
  *    ([[AppendOnlyCdc]], [[SnapshotDiff]]);
  *  - multi-action frames are persisted before double writes (the
  *    reference recomputes the whole DAG at
  *    `cdc_metrics_job_bronze.py:111-112`);
  *  - the gold CLV segmentation is distributed (no pandas round-trip).
  */
final class CdcPipeline(
    spark: SparkSession, lake: Lakehouse, defaultWatermark: String = "1900-01-01") {

  val store = new ControlStore(spark.sparkContext.hadoopConfiguration, lake.control)

  /** Bronze ingest of the watermarked fact table (reference
    * `cdc_metrics_job_bronze.py:57-90`): incremental extract, dedup, tag
    * metadata, land bronze + append-only cdc, advance the watermark.
    *
    * The watermark advances to `now` (the injected run clock, mirroring
    * the reference's `datetime.now()` at `:90`) — NOT to max(processed).
    * The `>=` filter re-reads the boundary instant, so advancing only to
    * the max data timestamp would re-ingest (and re-append!) the
    * boundary rows on every subsequent run; advancing to the run clock
    * pairs correctly with the inclusive filter.
    *
    * @return the new watermark (always Some(now); None only if nothing
    *         was extracted AND nothing had ever been) */
  def bronzeFact(
      source: DataFrame, table: String, watermarkCol: String,
      runDate: String, cdcTs: Column, now: String): Option[String] = {
    val lastRun = store.get(s"cdc/$table/last_run.txt", defaultWatermark)
    val fresh = WatermarkIncrementalLoad.sinceInclusive(source, watermarkCol, lastRun)
      .dropDuplicates()
      .withColumn("ingestion_timestamp", cdcTs)
    val tagged = AppendOnlyCdc(fresh, cdcTs).persist()
    try {
      ParquetSink.flat(tagged, lake.bronze(table, runDate))
      ParquetSink.partitioned(
        tagged, lake.cdc(table, runDate), Seq("cdc_action"), SaveMode.Append)
      store.put(s"cdc/$table/last_run.txt", now)
      Some(now)
    } finally { tagged.unpersist() }
  }

  /** Bronze ingest of a snapshot-diffed table (reference
    * `cdc_metrics_job_bronze.py:91-112`): full extract vs previous
    * snapshot → insert/update/delete change log + new snapshot. */
  def bronzeSnapshot(
      source: DataFrame, table: String, pk: Seq[String],
      runDate: String, cdcTs: Column): Unit = {
    // metadata tagged before the raw landing, like the reference
    // (`cdc_metrics_job_bronze.py:78-81`). The diff below compares these
    // constant columns too — with an injected fixed clock they are equal
    // across runs; the reference's wall clock made every row differ every
    // run (SURVEY §2.4 note), which callers can reproduce by passing
    // current_timestamp().
    val current = source.dropDuplicates()
      .withColumn("ingestion_timestamp", cdcTs)
      .withColumn("cdc_action", lit("insert"))
      .withColumn("cdc_timestamp", cdcTs)
      .persist()
    try {
      ParquetSink.flat(current, lake.bronze(table, runDate))
      val previous = ParquetSource.readOrEmpty(spark, lake.snapshot(table), current)
      val changes = SnapshotDiff(current, previous, pk, cdcTs)
      ParquetSink.partitioned(changes, lake.cdc(table, runDate), Seq("cdc_action"))
      // swap, never overwrite in place: an in-place Overwrite that dies
      // midway leaves a READABLE partial part-file set with no marker,
      // and the next run would diff against it as if it were the full
      // previous snapshot — emitting every missing row as a spurious
      // insert (readOrEmpty can only guard genuine absence). The swap
      // keeps the old snapshot intact until the new one is complete.
      swapWrite(current, lake.snapshot(table), Nil)
    } finally { current.unpersist() }
  }

  /** Silver incremental conform (reference `cdc_metrics_job_silver.py:
    * 53-99`): since-watermark filter on the derived date, cast + keyed
    * dedup, append date-partitioned, advance watermark to max processed. */
  def silverConform(
      table: String, bronzePath: String, dateSourceCol: String,
      casts: Map[String, String], dedupKeys: Seq[String],
      orderCols: Seq[Column]): Option[String] = {
    val key = s"silver_${table}_last_run.txt"
    val raw = spark.read.parquet(bronzePath)
      .withColumn("creation_date", to_date(col(dateSourceCol)))
    WatermarkIncrementalLoad.run(store, key, raw, "creation_date", defaultWatermark) { fresh =>
      CleanConform(fresh, casts, dedupKeys, orderCols)
    } { cleaned =>
      ParquetSink.partitioned(
        cleaned, lake.silver(table), Seq("creation_date"), SaveMode.Append)
    }
  }

  /** Silver revenue build (reference `cdc_metrics_job_silver.py:101-117`). */
  def silverRevenue(): Unit = {
    val items = spark.read.parquet(lake.silver("order_items"))
    val options = spark.read.parquet(lake.silver("order_item_options"))
      .drop("creation_date", "cdc_action", "cdc_timestamp", "ingestion_timestamp")
    val revenue = RevenueConform(items, options, Seq("order_id", "lineitem_id"))
    ParquetSink.partitioned(revenue, lake.silver("order_revenue"), Seq("creation_date"))
  }

  /** Silver revenue over BUCKETED silver tables — the 100 TB layout
    * (SURVEY §1.2 / BASELINE round-2 candidate): items and options are
    * both fact-sized and co-keyed on the line key, so writing both
    * bucketed by it makes [[RevenueConform]]'s join (and every
    * order-grain pre-aggregation downstream) shuffle-free. Same rows as
    * [[silverRevenue]] — only the physical plan differs (asserted in
    * `CdcPipelineSpec`/`PlanSpec`). */
  def silverRevenueBucketed(buckets: Int = 8): Unit = {
    val keys = Seq("order_id", "lineitem_id")
    ParquetSink.bucketed(
      spark.read.parquet(lake.silver("order_items")),
      lake.silver("order_items_bucketed"), "graft_order_items_bucketed",
      keys, buckets)
    ParquetSink.bucketed(
      spark.read.parquet(lake.silver("order_item_options"))
        .drop("creation_date", "cdc_action", "cdc_timestamp", "ingestion_timestamp"),
      lake.silver("order_item_options_bucketed"), "graft_order_item_options_bucketed",
      keys, buckets)
    val revenue = RevenueConform(
      spark.table("graft_order_items_bucketed"),
      spark.table("graft_order_item_options_bucketed"), keys)
    ParquetSink.partitioned(revenue, lake.silver("order_revenue"), Seq("creation_date"))
  }

  /** Incremental gold (the CDF-style delta path — SURVEY §4 "caching"
    * row and BASELINE round-2 candidate): maintain `fact_ltv_daily`
    * from the run's cdc change log instead of recomputing every user.
    * First run (no prior mart) falls back to the full [[Ltv.daily]]
    * build. The mart is rewritten via a temp-dir swap because the next
    * mart is derived FROM the current one — overwriting a path still
    * being lazily read would race the delete (at 100 TB, swap per
    * affected `creation_date=` partition instead of the whole mart). */
  def goldLtvIncremental(runDate: String): Unit = {
    val revenue = spark.read.parquet(lake.silver("order_revenue"))
    val martPath = lake.gold("fact_ltv_daily")
    if (!martExists(martPath)) {
      ParquetSink.partitioned(Ltv.daily(revenue), martPath, Seq("creation_date"))
    } else {
      val changes = spark.read.parquet(lake.cdc("order_items", runDate))
      swapWrite(
        IncrementalLtv(spark.read.parquet(martPath), revenue, changes),
        martPath, Seq("creation_date"))
    }
  }

  private def martExists(path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Swap-rewrite a mart whose next version derives FROM its current
    * one: write to a temp dir, delete, rename — overwriting a path still
    * being lazily read would race the delete (at 100 TB, swap per
    * affected partition instead of the whole mart). */
  private def swapWrite(
      df: DataFrame, martPath: String, partitionCols: Seq[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(martPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(martPath + "__tmp")
    if (partitionCols.nonEmpty) ParquetSink.partitioned(df, tmp.toString, partitionCols)
    else ParquetSink.flat(df, tmp.toString)
    fs.delete(p, true)
    require(fs.rename(tmp, p), s"swap of $martPath failed")
  }

  /** One incremental gold refresh from the run's cdc change log — each
    * mart maintained by its algebra (SURVEY §4 caching note; the
    * reference recomputes every mart from full silver every run):
    *
    *  - `fact_ltv_daily` — key-scoped ([[IncrementalLtv]]);
    *  - `mart_customer_rfm` / `mart_customer_churn_profile` — guarded
    *    key-scoped ([[IncrementalRfm]]/[[IncrementalChurn]]): full
    *    rebuild iff the delta advances the recency anchor;
    *  - `mart_sales_trends/daily` — additive merge when the change log
    *    is INSERT-only (the watermarked append path): aggregate only the
    *    conformed revenue of the appended line keys and merge-add;
    *    any update/delete in the log forces the full recompute (sums
    *    are not subtractable without the old images).
    *
    * The change log must carry `user_id`, `creation_date`, and the line
    * key (`order_id`, `lineitem_id`); first run (no prior mart) builds
    * everything full. */
  def refreshGold(runDate: String): Unit = {
    val revenue = spark.read.parquet(lake.silver("order_revenue")).persist()
    try {
      goldLtvIncremental(runDate)
      val changes = spark.read.parquet(lake.cdc("order_items", runDate))

      val rfmPath = lake.gold("mart_customer_rfm")
      if (!martExists(rfmPath)) ParquetSink.flat(Rfm(revenue), rfmPath)
      else swapWrite(
        IncrementalRfm(spark.read.parquet(rfmPath), revenue, changes), rfmPath, Nil)

      val churnPath = lake.gold("mart_customer_churn_profile")
      if (!martExists(churnPath)) ParquetSink.flat(Churn(revenue), churnPath)
      else swapWrite(
        IncrementalChurn(spark.read.parquet(churnPath), revenue, changes),
        churnPath, Nil)

      val dailyPath = lake.gold("mart_sales_trends/daily")
      // null-SAFE: a NULL cdc_action is NOT an insert — `=!= "insert"`
      // would drop NULL rows from the check and let them ride the
      // additive path as phantom inserts
      val insertOnly = changes.columns.contains("cdc_action") &&
        changes.filter(!(col("cdc_action") <=> "insert")).isEmpty
      // RERUN SAFETY: the key-scoped maintainers above are idempotent
      // (they recompute affected keys from silver), but merge-ADD applied
      // twice double-counts — so the additive path records a TWO-PHASE
      // applied-marker per runDate: "pending" before the swap, "done"
      // after. done → rerun is a no-op; pending → the swap may or may
      // not have landed (crash between swap and marker), so the rerun
      // falls back to the full recompute, which is correct from either
      // state; absent → normal additive apply.
      val applied = s"gold/mart_sales_trends_daily/applied/$runDate"
      val marker = store.get(applied, "")
      if (!martExists(dailyPath))
        ParquetSink.flat(SalesTrends.daily(revenue), dailyPath)
      else if (marker == "pending") {
        swapWrite(SalesTrends.daily(revenue), dailyPath, Nil)
        store.put(applied, "done")
      } else if (insertOnly) {
        if (marker != "done") {
          val fresh = revenue.join(
            changes.select(col("order_id"), col("lineitem_id")).distinct(),
            Seq("order_id", "lineitem_id"), "left_semi")
          store.put(applied, "pending")
          swapWrite(
            IncrementalTrends.daily(spark.read.parquet(dailyPath), fresh),
            dailyPath, Nil)
          store.put(applied, "done")
        }
      } else swapWrite(SalesTrends.daily(revenue), dailyPath, Nil)
    } finally { revenue.unpersist() }
  }

  /** Gold mart fan-out (reference `cdc_metrics_job_gold.py`, all 8
    * marts). Reads silver once, persists the conformed fact, writes
    * every mart. */
  def runGold(): Unit = {
    val revenue = spark.read.parquet(lake.silver("order_revenue")).persist()
    val items = spark.read.parquet(lake.silver("order_items"))
    try {
      val daily = Ltv.daily(revenue)
      ParquetSink.partitioned(daily, lake.gold("fact_ltv_daily"), Seq("creation_date"))
      val latest = Ltv.latest(spark.read.parquet(lake.gold("fact_ltv_daily")))
      ParquetSink.flat(latest, lake.gold("mart_customer_ltv_snapshot"))
      ParquetSink.flat(Ltv.segments(latest), lake.gold("mart_customer_clv_segment"))
      ParquetSink.flat(Rfm(revenue), lake.gold("mart_customer_rfm"))
      ParquetSink.flat(Churn(revenue), lake.gold("mart_customer_churn_profile"))
      ParquetSink.flat(SalesTrends.daily(revenue), lake.gold("mart_sales_trends/daily"))
      ParquetSink.flat(SalesTrends.weekly(revenue), lake.gold("mart_sales_trends/weekly"))
      ParquetSink.flat(SalesTrends.monthly(revenue), lake.gold("mart_sales_trends/monthly"))
      ParquetSink.flat(SalesTrends.hourly(revenue), lake.gold("mart_sales_trends/hourly"))
      ParquetSink.flat(Loyalty(items, revenue), lake.gold("mart_loyalty_program_impact"))
      ParquetSink.flat(Location(items, revenue), lake.gold("mart_location_performance"))
      ParquetSink.flat(
        Discount(items, spark.read.parquet(lake.silver("order_item_options")), revenue),
        lake.gold("mart_discount_effectiveness"))
    } finally { revenue.unpersist() }
  }
}
