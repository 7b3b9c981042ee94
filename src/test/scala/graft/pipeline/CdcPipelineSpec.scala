package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.bindings.Conformed
import graft.io.Lakehouse

class CdcPipelineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val ts = lit("2024-06-01 00:00:00").cast("timestamp")

  /** SnapshotDiff requires PK-unique input (the testdata plants dup
    * keys); keep-first conform is the pipeline's contract for that. */
  private def optionsSource = graft.silver.CleanConform(
    graft.bindings.Conformed.optionsRaw(spark, sf),
    casts = Map.empty,
    dedupKeys = Seq("order_id", "lineitem_id", "option_name"),
    orderCols = Seq(col("option_price")))

  test("bronze -> silver -> gold end-to-end on sf0.001, incremental no-op on rerun") {
    val root = Files.createTempDirectory("graft-lake").toString
    val lake = Lakehouse(s"file://$root")
    val pipe = new CdcPipeline(spark, lake)

    // bronze: watermarked fact + snapshot-diffed options
    val wm = pipe.bronzeFact(
      Conformed.items(spark, sf), "order_items", "creation_ts", "2024-06-01", ts,
      now = "2024-06-01 00:00:00")
    assert(wm.contains("2024-06-01 00:00:00"))
    assert(pipe.store.get("cdc/order_items/last_run.txt", "unset") == wm.get)
    // rerun against the advanced watermark: nothing re-ingested (the
    // inclusive >= filter pairs with advancing to the run clock, so
    // boundary rows do NOT accumulate run over run)
    pipe.bronzeFact(
      Conformed.items(spark, sf), "order_items", "creation_ts", "2024-06-02", ts,
      now = "2024-06-02 00:00:00")
    val rerunCdc = new java.io.File(s"$root/cdc/order_items/date=2024-06-02")
    assert(!rerunCdc.exists() ||
      !rerunCdc.listFiles().exists(_.getName.startsWith("cdc_action=")))
    pipe.bronzeSnapshot(
      optionsSource, "order_item_options",
      Seq("order_id", "lineitem_id", "option_name"), "2024-06-01", ts)

    // first snapshot-diff run: everything is an insert
    val cdcActions = spark.read
      .parquet(lake.cdc("order_item_options", "2024-06-01"))
      .select("cdc_action").distinct().collect().map(_.getString(0)).toSet
    assert(cdcActions == Set("insert"))

    // silver: conform both tables incrementally, then the revenue join
    val wmItems = pipe.silverConform(
      "order_items", lake.bronze("order_items", "2024-06-01"), "creation_ts",
      Map("item_price" -> "double"), Seq("order_id", "lineitem_id"),
      Seq(col("item_price")))
    assert(wmItems.nonEmpty)
    val wmOpts = pipe.silverConform(
      "order_item_options", lake.bronze("order_item_options", "2024-06-01"),
      "cdc_timestamp", Map("option_price" -> "double"),
      Seq("order_id", "lineitem_id"), Seq(col("option_name"), col("option_price")))
    assert(wmOpts.contains("2024-06-01"))
    // date_dim: the reference maintains it bronze->silver like any dim
    pipe.bronzeSnapshot(
      graft.ext.DateDim.generate(spark, "1995-01-01", "1995-03-31"),
      "date_dim", Seq("date_key"), "2024-06-01", ts)
    val wmDim = pipe.silverConform(
      "date_dim", lake.bronze("date_dim", "2024-06-01"), "date_key",
      Map.empty, Seq("date_key"), Seq(col("date_key")))
    assert(wmDim.nonEmpty)
    assert(spark.read.parquet(lake.silver("date_dim")).count() == 90)
    pipe.silverRevenue()

    val revenue = spark.read.parquet(lake.silver("order_revenue"))
    assert(revenue.count() > 0)
    assert(revenue.columns.contains("total_revenue"))

    // bucketed silver layout: identical rows, shuffle-free revenue join
    val plainRevenue = revenue
      .select(col("order_id"), col("lineitem_id"), col("option_name"),
        col("total_revenue"))
      .collect().map(_.toSeq).toSet
    pipe.silverRevenueBucketed(buckets = 4)
    val bucketedRevenue = spark.read.parquet(lake.silver("order_revenue"))
      .select(col("order_id"), col("lineitem_id"), col("option_name"),
        col("total_revenue"))
      .collect().map(_.toSeq).toSet
    assert(bucketedRevenue == plainRevenue)
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = graft.silver.RevenueConform(
        spark.table("graft_order_items_bucketed"),
        spark.table("graft_order_item_options_bucketed"),
        Seq("order_id", "lineitem_id"))
      val txt = joined.asInstanceOf[org.apache.spark.sql.classic.Dataset[
        org.apache.spark.sql.Row]].queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(txt.contains("SortMergeJoin") && !txt.contains("Exchange"),
        s"bucketed revenue join should be shuffle-free:\n$txt")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
    // silver is date-partitioned on disk (partition pruning surface)
    assert(new java.io.File(s"$root/silver/order_revenue")
      .listFiles().exists(_.getName.startsWith("creation_date=")))
    // ...and a watermark-style filter actually prunes at the dir level
    val pruned = revenue.filter(col("creation_date") > lit("1998-01-01"))
    val planTxt = pruned.asInstanceOf[org.apache.spark.sql.classic.Dataset[
      org.apache.spark.sql.Row]].queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(planTxt.contains("PartitionFilters") &&
      planTxt.contains("creation_date"), s"no partition pruning in:\n$planTxt")

    // gold: all marts written and non-empty
    pipe.runGold()
    val marts = Seq(
      "fact_ltv_daily", "mart_customer_ltv_snapshot", "mart_customer_clv_segment",
      "mart_customer_rfm", "mart_customer_churn_profile",
      "mart_sales_trends/daily", "mart_sales_trends/weekly",
      "mart_sales_trends/monthly", "mart_sales_trends/hourly",
      "mart_loyalty_program_impact", "mart_location_performance",
      "mart_discount_effectiveness")
    marts.foreach { m =>
      assert(spark.read.parquet(lake.gold(m)).count() > 0, s"mart $m is empty")
    }

    // rerun: silver watermark makes reprocessing a no-op
    val rerun = pipe.silverConform(
      "order_items", lake.bronze("order_items", "2024-06-01"), "creation_ts",
      Map("item_price" -> "double"), Seq("order_id", "lineitem_id"),
      Seq(col("item_price")))
    assert(rerun.isEmpty)

    // rerun snapshot diff with identical source: no inserts/updates/deletes
    pipe.bronzeSnapshot(
      optionsSource, "order_item_options",
      Seq("order_id", "lineitem_id", "option_name"), "2024-06-02", ts)
    // an empty change set writes no partition dirs at all
    val cdcDir = new java.io.File(s"$root/cdc/order_item_options/date=2024-06-02")
    assert(!cdcDir.exists() ||
      !cdcDir.listFiles().exists(_.getName.startsWith("cdc_action=")))

    // incremental gold second run: some users' revenue changes land in
    // silver + the cdc log; the delta-maintained mart must equal a full
    // recompute over the new silver
    val updatedRows = spark.read.parquet(lake.silver("order_revenue"))
      .withColumn("total_revenue",
        when(col("user_id") % 5 === 0, col("total_revenue") * 2)
          .otherwise(col("total_revenue")))
      .collect().toSeq
    val silverSchema = spark.read.parquet(lake.silver("order_revenue")).schema
    val updated = spark.createDataFrame(
      spark.sparkContext.parallelize(updatedRows), silverSchema)
    graft.io.ParquetSink.partitioned(
      updated, lake.silver("order_revenue"), Seq("creation_date"))
    updated.filter(col("user_id") % 5 === 0).select("user_id").distinct()
      .write.parquet(lake.cdc("order_items", "2024-06-03"))
    pipe.goldLtvIncremental("2024-06-03")
    val martRows = spark.read.parquet(lake.gold("fact_ltv_daily"))
      .select(col("user_id"), col("creation_date").cast("string"),
        col("daily_revenue"), col("cumulative_ltv"))
      .collect().map(_.toSeq).toSet
    val fullRows = graft.gold.Ltv.daily(
        spark.read.parquet(lake.silver("order_revenue")))
      .select(col("user_id"), col("creation_date").cast("string"),
        col("daily_revenue"), col("cumulative_ltv"))
      .collect().map(_.toSeq).toSet
    assert(martRows == fullRows,
      "incrementally maintained fact_ltv_daily diverged from full recompute")

    // composed refreshGold over an UPDATE delta: ltv/rfm/churn take the
    // key-scoped path, daily trends falls back to the full recompute
    // (sums are not subtractable without old images)
    val newSilver = spark.read.parquet(lake.silver("order_revenue"))
    newSilver.filter(col("user_id") % 5 === 0)
      .select("order_id", "lineitem_id", "user_id", "creation_date")
      .withColumn("cdc_action", lit("update"))
      .write.mode("overwrite").parquet(lake.cdc("order_items", "2024-06-04"))
    pipe.refreshGold("2024-06-04")
    def martSet(path: String) =
      spark.read.parquet(path).collect().map(_.toSeq).toSet
    def dateStr(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq.map {
      case d: java.sql.Date => d.toString
      case x => x
    }).toSet
    assert(martSet(lake.gold("mart_customer_rfm")) ==
      graft.gold.Rfm(newSilver).collect().map(_.toSeq).toSet,
      "refreshGold rfm diverged from full recompute")
    assert(martSet(lake.gold("mart_customer_churn_profile")) ==
      graft.gold.Churn(newSilver).collect().map(_.toSeq).toSet,
      "refreshGold churn diverged from full recompute")
    assert(dateStr(spark.read.parquet(lake.gold("mart_sales_trends/daily"))) ==
      dateStr(graft.gold.SalesTrends.daily(newSilver)),
      "refreshGold daily trends diverged from full recompute")

    // additive path: prior daily mart = history minus the newest day,
    // change log = that day's line keys tagged insert -> merge-add
    val maxDate = newSilver.agg(max(col("creation_date"))).head.getDate(0)
    graft.io.ParquetSink.flat(
      graft.gold.SalesTrends.daily(
        newSilver.filter(col("creation_date") =!= lit(maxDate))),
      lake.gold("mart_sales_trends/daily"))
    newSilver.filter(col("creation_date") === lit(maxDate))
      .select("order_id", "lineitem_id", "user_id", "creation_date")
      .withColumn("cdc_action", lit("insert"))
      .write.mode("overwrite").parquet(lake.cdc("order_items", "2024-06-05"))
    pipe.refreshGold("2024-06-05")
    assert(dateStr(spark.read.parquet(lake.gold("mart_sales_trends/daily"))) ==
      dateStr(graft.gold.SalesTrends.daily(newSilver)),
      "additive trends merge diverged from full recompute")

    // rerun safety: replaying the SAME insert-only run must not
    // double-add (applied-marker short-circuit), and the key-scoped
    // maintainers are idempotent by construction
    pipe.refreshGold("2024-06-05")
    assert(dateStr(spark.read.parquet(lake.gold("mart_sales_trends/daily"))) ==
      dateStr(graft.gold.SalesTrends.daily(newSilver)),
      "rerunning the additive refresh double-counted the delta")
    assert(martSet(lake.gold("mart_customer_rfm")) ==
      graft.gold.Rfm(newSilver).collect().map(_.toSeq).toSet,
      "rerunning the key-scoped refresh changed the rfm mart")

    // crash ambiguity: a "pending" marker means the swap may or may not
    // have landed — the rerun must fall back to the full recompute (and
    // settle the marker), never merge-add again from either state
    pipe.store.put("gold/mart_sales_trends_daily/applied/2024-06-05", "pending")
    pipe.refreshGold("2024-06-05")
    assert(dateStr(spark.read.parquet(lake.gold("mart_sales_trends/daily"))) ==
      dateStr(graft.gold.SalesTrends.daily(newSilver)),
      "pending-marker rerun did not settle to the full recompute")
    assert(pipe.store.get(
      "gold/mart_sales_trends_daily/applied/2024-06-05", "") == "done")

    // a NULL cdc_action is NOT an insert: a change log of already-counted
    // line keys with NULL actions must take the full-recompute path —
    // the additive path would double-add their revenue
    newSilver.filter(col("user_id") % 7 === 0)
      .select("order_id", "lineitem_id", "user_id", "creation_date")
      .withColumn("cdc_action", lit(null).cast("string"))
      .write.mode("overwrite").parquet(lake.cdc("order_items", "2024-06-06"))
    pipe.refreshGold("2024-06-06")
    assert(dateStr(spark.read.parquet(lake.gold("mart_sales_trends/daily"))) ==
      dateStr(graft.gold.SalesTrends.daily(newSilver)),
      "NULL cdc_action rode the additive path and double-counted")
  }
}
