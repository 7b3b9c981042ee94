package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Customer lifetime-value marts.
  *
  * Reference capability: daily revenue per user + running cumulative LTV
  * (`scripts/cdc_metrics_job_gold.py:42-56`), latest-LTV-per-user snapshot
  * (`:61-71`), and quantile CLV segmentation (`:73-83`).
  *
  * Spark-first shape: one hash aggregate (map-side partial + final on a
  * (user_id, creation_date) shuffle) feeding a running-frame window that
  * reuses the same user_id hash partitioning — AQE coalesces, no extra
  * exchange beyond the agg's. The reference's driver-side pandas `qcut`
  * (its only non-scalable operator) is replaced by distributed exact
  * percentiles; swap `percentile` → `percentile_approx` at the 100 TB tier.
  */
object Ltv {

  /** A1 + W1: daily revenue per user with running cumulative LTV.
    *
    * Money is aggregated as exact integer 1e-4 units (source prices carry
    * exactly 4 decimals, so `round(x*10000)` recovers an exact integer;
    * integer sums are order-independent and bit-exact across engines up to
    * 2^53 — switch to DecimalType at the 100 TB tier). The running sum then
    * adds identical doubles in identical (unique-date) order. */
  def daily(orderRevenue: DataFrame): DataFrame = {
    val dailyAgg = orderRevenue
      .groupBy(col("user_id"), col("creation_date"))
      .agg(sum(Money.cents(col("total_revenue"))).as("__cents"))
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("creation_date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dailyAgg
      .withColumn("daily_revenue", col("__cents") / 10000.0)
      .withColumn("cumulative_ltv", sum(col("__cents")).over(w) / 10000.0)
      .drop("__cents")
      .select(col("user_id"), col("creation_date"), col("daily_revenue"), col("cumulative_ltv"))
  }

  /** W2 + P8: latest cumulative LTV per user (row_number desc, keep rank 1).
    * (user_id, creation_date) is unique after `daily`, so the ordering is
    * deterministic without extra tie-breakers. */
  def latest(ltvDaily: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("creation_date").desc)
    ltvDaily
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .select(
        col("user_id"),
        col("creation_date").as("last_date"),
        col("cumulative_ltv").as("lifetime_value"))
  }

  /** A8: Low/Medium/High segmentation at the 20th/80th percentile of
    * lifetime value. Distributed — no driver round-trip (the reference
    * `toPandas()` + `pd.qcut` here, its only non-scalable operator).
    *
    * Exact mode (default) uses linear-interpolated percentiles — the same
    * definition as pandas qcut / DuckDB quantile_cont — and gates the
    * oracle. `approxAt` switches to `approx_percentile` (a fixed-memory
    * sketch) for the 100 TB tier, where exact percentiles would need a
    * full sort. */
  def segments(ltvLatest: DataFrame, approxAt: Option[Int] = None): DataFrame = {
    val cuts = approxAt match {
      case Some(accuracy) => ltvLatest.agg(
        approx_percentile(col("lifetime_value"), lit(0.2), lit(accuracy)).as("p20"),
        approx_percentile(col("lifetime_value"), lit(0.8), lit(accuracy)).as("p80"))
      case None => ltvLatest.agg(
        percentile(col("lifetime_value"), lit(0.2)).as("p20"),
        percentile(col("lifetime_value"), lit(0.8)).as("p80"))
    }
    ltvLatest
      .crossJoin(broadcast(cuts))
      .select(
        col("user_id"),
        col("lifetime_value"),
        when(col("lifetime_value") <= col("p20"), "Low")
          .when(col("lifetime_value") <= col("p80"), "Medium")
          .otherwise("High")
          .as("clv_segment"))
  }

  /** Oracle-gatable form of the approx-percentile tier: each user's
    * exact segment (which a SQL oracle recomputes) plus a boolean
    * asserting the `approx_percentile`-cut assignment is rank-consistent
    * — either it agrees with the exact segment, or the user's exact
    * percentile rank sits within `rankEps` of a cut boundary (the only
    * place a sketch with relative-rank error 1/accuracy may legitimately
    * flip a label). The sketch cuts are deterministic for fixed data, so
    * the boolean is stable and the oracle pins it TRUE — turning the
    * round-2 `no_oracle` rows-only check into a real rank-bound gate.
    * The unpartitioned `percent_rank` window is mart-cardinality (one
    * row per user), same envelope as [[deciles]]. */
  def segmentsGated(
      ltvLatest: DataFrame, accuracy: Int = 10000,
      rankEps: Double = 0.01): DataFrame = {
    val cuts = ltvLatest.agg(
      percentile(col("lifetime_value"), lit(0.2)).as("p20e"),
      percentile(col("lifetime_value"), lit(0.8)).as("p80e"),
      approx_percentile(col("lifetime_value"), lit(0.2), lit(accuracy)).as("p20a"),
      approx_percentile(col("lifetime_value"), lit(0.8), lit(accuracy)).as("p80a"))
    def seg(p20: org.apache.spark.sql.Column, p80: org.apache.spark.sql.Column) =
      when(col("lifetime_value") <= p20, "Low")
        .when(col("lifetime_value") <= p80, "Medium")
        .otherwise("High")
    ltvLatest
      .crossJoin(broadcast(cuts))
      .withColumn("__pr", percent_rank().over(Window.orderBy(col("lifetime_value"))))
      .select(
        col("user_id"),
        col("lifetime_value"),
        seg(col("p20e"), col("p80e")).as("clv_segment"),
        (seg(col("p20a"), col("p80a")) === seg(col("p20e"), col("p80e")) ||
          abs(col("__pr") - 0.2) <= rankEps ||
          abs(col("__pr") - 0.8) <= rankEps).as("approx_segment_ok"))
  }

  /** Trailing-N-day revenue per (user, active day) via a RANGE window
    * frame over the integer day number — the value-range frame
    * (`rangeBetween`) the reference never uses (SURVEY §2.6 gap): a
    * ROWS frame would count the last N ROWS regardless of calendar
    * gaps; RANGE bounds by day distance. Sums run over exact integer
    * cents inside the frame. Same user_id shuffle as [[daily]] — the
    * window reuses the aggregate's partitioning. */
  def trailingRevenue(orderRevenue: DataFrame, days: Int = 7): DataFrame = {
    val dailyAgg = orderRevenue
      .groupBy(col("user_id"), col("creation_date"))
      .agg(sum(Money.cents(col("total_revenue"))).as("__cents"))
      .withColumn("__day", datediff(col("creation_date"), lit("1970-01-01").cast("date")))
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("__day"))
      .rangeBetween(-(days - 1), Window.currentRow)
    dailyAgg
      .withColumn("daily_revenue", col("__cents") / 10000.0)
      .withColumn("trailing_revenue", sum(col("__cents")).over(w) / 10000.0)
      .select(col("user_id"), col("creation_date"), col("daily_revenue"),
        col("trailing_revenue"))
  }

  /** NTILE decile of each user's lifetime value — the rank-bucket
    * alternative to percentile-cut segmentation (A8 note in SURVEY
    * §2.5). The ORDER BY carries a user_id tie-break so the row-ordered
    * bucket assignment is total; unpartitioned window is fine at mart
    * cardinality (one row per user). */
  def deciles(ltvLatest: DataFrame): DataFrame =
    ltvLatest.select(
      col("user_id"),
      col("lifetime_value"),
      ntile(10).over(
        Window.orderBy(col("lifetime_value"), col("user_id"))).as("decile"))
}
