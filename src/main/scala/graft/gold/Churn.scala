package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Customer churn-profile mart.
  *
  * Reference capability: `mart_customer_churn_profile`
  * (`scripts/cdc_metrics_job_gold.py:138-190`): days since last order
  * (`:147-149`), average order gap via `lag` (`:152-156`), 30/60-day
  * spend comparison with outer joins + fillna + guarded pct change
  * (`:159-171`), and the At Risk / Monitor / Active tag (`:178-183`).
  *
  * Spark-first shape (results identical): the reference builds four
  * per-user frames and chains full-outer joins (J4/J5). Every indicator
  * is keyed on the same user_id over the same base, so we compute the lag
  * window then ONE hash aggregate with conditional sums — the groupBy
  * reuses the window's hash partitioning, so the whole mart is a single
  * shuffle instead of four aggregates + three joins.
  *
  * Determinism notes: the lag ordering key equals the lagged value, so
  * tie order among same-date rows cannot change any gap; averages are
  * written as explicit sum/count (same formula as the oracle); "today" is
  * the deterministic max-date anchor.
  */
object Churn {
  def apply(orderRevenue: DataFrame): DataFrame =
    build(orderRevenue, anchorDate = None)

  /** Fixed-anchor variant: `today` supplied by the caller instead of
    * derived as `max(creation_date)` of the input — required for
    * key-scoped incremental maintenance (a user-pruned rebuild would
    * re-derive the anchor from the subset and shift every recency). */
  def anchoredAt(orderRevenue: DataFrame, today: java.sql.Date): DataFrame =
    build(orderRevenue, anchorDate = Some(today))

  private def build(
      orderRevenue: DataFrame, anchorDate: Option[java.sql.Date]): DataFrame = {
    val withAnchor = anchorDate match {
      case Some(d) => orderRevenue.withColumn("today", lit(d))
      case None => orderRevenue.crossJoin(broadcast(
        orderRevenue.agg(max(col("creation_date")).as("today"))))
    }
    val w = Window.partitionBy(col("user_id")).orderBy(col("creation_date"))
    val withGap = withAnchor
      .withColumn("prev_order_date", lag(col("creation_date"), 1).over(w))
      .withColumn("order_gap", datediff(col("creation_date"), col("prev_order_date")))
      .withColumn("cents", Money.cents(col("total_revenue")))
      .withColumn("cutoff_30", date_sub(col("today"), 30))
      .withColumn("cutoff_60", date_sub(col("today"), 60))
    withGap
      .groupBy(col("user_id"))
      .agg(
        max(col("creation_date")).as("last_order_date"),
        datediff(max(col("today")), max(col("creation_date"))).as("days_since_last_order"),
        (sum(col("order_gap")) / count(col("order_gap"))).as("avg_order_gap_days"),
        (coalesce(sum(when(col("creation_date") > col("cutoff_30"), col("cents"))), lit(0.0)) / 10000.0)
          .as("spend_last_30"),
        (coalesce(sum(when(col("creation_date") > col("cutoff_60") &&
                           col("creation_date") <= col("cutoff_30"), col("cents"))), lit(0.0)) / 10000.0)
          .as("spend_prev_30"))
      .withColumn(
        "pct_spend_change",
        when(col("spend_prev_30") === 0, lit(null))
          .otherwise((col("spend_last_30") - col("spend_prev_30")) / col("spend_prev_30") * 100))
      .withColumn(
        "churn_risk_tag",
        when(col("days_since_last_order") > 45, "At Risk")
          .when(col("days_since_last_order") > 30, "Monitor")
          .otherwise("Active"))
      .select(
        col("user_id"), col("last_order_date"), col("days_since_last_order"),
        col("avg_order_gap_days"), col("spend_last_30"), col("spend_prev_30"),
        col("pct_spend_change"), col("churn_risk_tag"))
  }
}
