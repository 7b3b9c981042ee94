package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sales-trend rollup marts (daily / weekly / monthly / hourly).
  *
  * Reference capability: `mart_sales_trends`
  * (`scripts/cdc_metrics_job_gold.py:193-250`): revenue joined back to
  * item dims (J6, a 1:1 join on the line key — our conformed fact already
  * carries the dims, so the join is elided with identical results), then
  * four independent `groupBy().agg(sum)` passes over
  * (grain × restaurant_id × item_category).
  *
  * Semantics preserved exactly:
  *  - `year_week` / `year_month` are `concat_ws("-", …)` with NO zero-pad
  *    ("2024-3"), calendar year + ISO-8601 `weekofyear`
  *    (`cdc_metrics_job_gold.py:215,218` — including the year-boundary
  *    quirk where 1998-01-01 lands in "1998-53");
  *  - four independent marts, not one grouping-sets pass (the reference
  *    writes four separate outputs; callers wanting one pass can cube).
  *
  * Scale: each rollup is one partial+final hash agg; output cardinality
  * is tiny relative to input, so map-side combine does nearly all work.
  */
object SalesTrends {

  private def rollup(df: DataFrame, grain: Seq[String], alias: String): DataFrame =
    df.groupBy(grain.map(col): _*)
      .agg(Money.sumMoney(col("total_revenue")).as(alias))

  def daily(orderRevenue: DataFrame): DataFrame =
    rollup(orderRevenue, Seq("creation_date", "restaurant_id", "item_category"), "daily_revenue")

  def weekly(orderRevenue: DataFrame): DataFrame =
    rollup(
      orderRevenue.withColumn(
        "year_week",
        concat_ws("-", year(col("creation_date")), weekofyear(col("creation_date")))),
      Seq("year_week", "restaurant_id", "item_category"), "weekly_revenue")

  def monthly(orderRevenue: DataFrame): DataFrame =
    rollup(
      orderRevenue.withColumn(
        "year_month",
        concat_ws("-", year(col("creation_date")), month(col("creation_date")))),
      Seq("year_month", "restaurant_id", "item_category"), "monthly_revenue")

  def hourly(orderRevenue: DataFrame): DataFrame =
    rollup(
      orderRevenue.withColumn("hour_of_day", hour(col("creation_ts"))),
      Seq("hour_of_day", "restaurant_id", "item_category"), "hourly_revenue")

  /** Revenue pivoted restaurant × calendar month (m1…m12) — the PIVOT
    * relational operator over a FIXED value list (pivoting on an
    * unlisted open domain would need a driver-side distinct pass;
    * always pin the columns at 100 TB). Missing cells stay NULL, sums
    * are exact money. One hash aggregate wide-form; the DuckDB mirror
    * is the equivalent sum(CASE …) spread. */
  def monthlyPivot(orderRevenue: DataFrame): DataFrame = {
    val pivoted = orderRevenue
      .withColumn("month", month(col("creation_date")))
      .groupBy(col("restaurant_id"))
      .pivot("month", (1 to 12).map(Integer.valueOf))
      .agg(Money.sumMoney(col("total_revenue")))
    (1 to 12).foldLeft(pivoted)((d, m) => d.withColumnRenamed(m.toString, s"m$m"))
  }

  /** Month-over-month revenue growth per restaurant — the
    * period-over-period KPI every trends dashboard derives from the
    * monthly mart. `lag` compares against the previous EXISTING month
    * (hollow months are a gap-fill concern — compose with
    * [[graft.ext.Timeseries.gapFillDaily]] upstream when calendar
    * adjacency matters). The growth ratio divides two exact
    * integer-unit revenues and is 6-decimal-rounded — the shared
    * cross-engine float contract; the first month's growth is NULL, not
    * a fake zero. One hash aggregate + one mart-grain window. */
  def monthlyGrowth(orderRevenue: DataFrame): DataFrame = {
    val monthly = orderRevenue
      .groupBy(col("restaurant_id"),
        year(col("creation_date")).as("y"), month(col("creation_date")).as("m"))
      .agg(Money.sumMoney(col("total_revenue")).as("revenue"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("restaurant_id")).orderBy(col("y"), col("m"))
    monthly
      .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
      // zero-prev guard (the Churn.pct_spend_change rule): a refund
      // month netting to exactly 0 would otherwise be an ANSI
      // DIVIDE_BY_ZERO abort; growth from a zero base is undefined
      .withColumn("mom_pct",
        when(col("prev_revenue") === 0, lit(null).cast("double"))
          .otherwise(round((col("revenue") - col("prev_revenue"))
            / col("prev_revenue") * 100, 6)))
  }

  /** Inverse of [[monthlyPivot]]: melt the wide m1..m12 report back to
    * long (restaurant_id, month, revenue), dropping absent months — the
    * UNPIVOT relational operator. Pivot∘unpivot must equal the direct
    * monthly aggregate (the oracle recomputes that side), which pins
    * both operators' semantics, not just the round-trip's.
    *
    * Narrow per-row explode (12 fixed columns → ≤ 12 rows), no shuffle:
    * unpivot is Expand under the hood, the same scale-free shape as
    * GROUPING SETS' — output cardinality is bounded by 12× the pivoted
    * (already mart-sized) input. */
  def unpivotMonths(pivoted: DataFrame): DataFrame =
    pivoted
      .unpivot(
        Array(col("restaurant_id")),
        (1 to 12).map(m => col(s"m$m")).toArray,
        "month_label", "revenue")
      .filter(col("revenue").isNotNull)
      .select(
        col("restaurant_id"),
        substring(col("month_label"), 2, 2).cast("long").as("month"),
        col("revenue"))

  /** The three calendar grains in ONE pass via GROUPING SETS — the
    * scale-preferred alternative to [[daily]]/[[weekly]]/[[monthly]]
    * (A9 note in SURVEY §2.5): the fact is scanned and partially
    * aggregated once, with one exchange carrying all three grains'
    * partials, instead of three full scan+shuffle passes. Output is the
    * union shape: non-grain key columns are NULL, `grain` labels the
    * set via `grouping()`. */
  def multiGrain(orderRevenue: DataFrame): DataFrame = {
    val base = orderRevenue
      .withColumn(
        "year_week",
        concat_ws("-", year(col("creation_date")), weekofyear(col("creation_date"))))
      .withColumn(
        "year_month",
        concat_ws("-", year(col("creation_date")), month(col("creation_date"))))
    val dims = Seq(col("restaurant_id"), col("item_category"))
    base
      .groupingSets(
        Seq(
          col("creation_date") +: dims,
          col("year_week") +: dims,
          col("year_month") +: dims),
        col("creation_date"), col("year_week"), col("year_month"),
        col("restaurant_id"), col("item_category"))
      .agg(
        Money.sumMoney(col("total_revenue")).as("revenue"),
        when(grouping(col("creation_date")) === 0, "daily")
          .when(grouping(col("year_week")) === 0, "weekly")
          .otherwise("monthly").as("grain"))
  }

  /** Same result as [[multiGrain]] without the 3× Expand: the fact is
    * partially aggregated ONCE at the finest grain (daily), and the
    * weekly/monthly grains re-aggregate those daily partials — valid
    * because week and month are functions of the date and the measure
    * is a pure sum. The daily-agg subplan is identical in all three
    * branches, so Catalyst's ReuseExchange ships the fact's
    * scan+partial-agg+shuffle once; the two extra exchanges move only
    * the tiny daily rollup (days × restaurants × categories), not fact
    * rows. Exactness: hierarchical sums run in integral 1e-4 units end
    * to end and convert to dollars once, so values are bit-identical to
    * the one-level sum (equivalence spec-pinned against [[multiGrain]]).
    * At 100 TB this is the shape to prefer: Expand triples the rows
    * entering partial aggregation, all CPU. */
  def multiGrainFromDaily(orderRevenue: DataFrame): DataFrame = {
    val nullStr = lit(null).cast("string")
    val daily = orderRevenue
      .groupBy(col("creation_date"), col("restaurant_id"), col("item_category"))
      .agg(sum(Money.cents(col("total_revenue"))).as("units"))
    def grainOut(d: DataFrame, keys: Seq[String]): DataFrame =
      d.groupBy(keys.map(col): _*).agg((sum(col("units")) / 10000.0).as("revenue"))
    val dailyOut = daily // keys already unique at this grain — no re-agg
      .select(col("creation_date"), nullStr.as("year_week"), nullStr.as("year_month"),
        col("restaurant_id"), col("item_category"),
        (col("units") / 10000.0).as("revenue"), lit("daily").as("grain"))
    val weeklyOut = grainOut(
      daily.withColumn(
        "year_week",
        concat_ws("-", year(col("creation_date")), weekofyear(col("creation_date")))),
      Seq("year_week", "restaurant_id", "item_category"))
      .select(lit(null).cast("date").as("creation_date"), col("year_week"),
        nullStr.as("year_month"), col("restaurant_id"), col("item_category"),
        col("revenue"), lit("weekly").as("grain"))
    val monthlyOut = grainOut(
      daily.withColumn(
        "year_month",
        concat_ws("-", year(col("creation_date")), month(col("creation_date")))),
      Seq("year_month", "restaurant_id", "item_category"))
      .select(lit(null).cast("date").as("creation_date"), nullStr.as("year_week"),
        col("year_month"), col("restaurant_id"), col("item_category"),
        col("revenue"), lit("monthly").as("grain"))
    dailyOut.unionByName(weeklyOut).unionByName(monthlyOut)
  }
}
