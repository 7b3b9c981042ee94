package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Discount-effectiveness mart.
  *
  * Reference capability: `mart_discount_effectiveness`
  * (`scripts/cdc_metrics_job_gold.py:340-388`): items ⟕ options on the
  * line key, ⟕ revenue on ORDER_ID (J10 — the second join fans out
  * lines × lines per order; preserved exactly), `IS_DISCOUNTED` when the
  * option price is negative (`:364`), per-order rollup (A11), then the
  * Yes/No cohort summary (A12).
  *
  * Exactness: order revenue is rolled up in integer cents and the cohort
  * summary sums/averages those integral values, so both engines agree
  * bit-for-bit; `avg_order_value` is the explicit sum/count formula.
  */
object Discount {
  /** @param items   line-grain frame with order_id, lineitem_id, user_id
    * @param options silver (deduped) options with option_price
    * @param orderRevenue conformed revenue fact */
  def apply(items: DataFrame, options: DataFrame, orderRevenue: DataFrame): DataFrame = {
    val perOrder = items
      .select(col("order_id"), col("lineitem_id"), col("user_id"))
      .join(
        options.select(col("order_id"), col("lineitem_id"), col("option_price")),
        Seq("order_id", "lineitem_id"), "left")
      .join(
        orderRevenue.select(col("order_id"), Money.cents(col("total_revenue")).as("cents")),
        Seq("order_id"), "left")
      .withColumn("is_discounted", when(col("option_price") < 0, 1).otherwise(0))
      .groupBy(col("order_id"))
      .agg(
        sum(col("is_discounted")).as("discounted_lines"),
        sum(col("cents")).as("order_cents"))
      .withColumn(
        "is_discounted_order",
        when(col("discounted_lines") > 0, "Yes").otherwise("No"))
    perOrder
      .groupBy(col("is_discounted_order"))
      .agg(
        countDistinct(col("order_id")).as("num_orders"),
        (sum(col("order_cents")) / 10000.0).as("total_revenue"))
      .withColumn("avg_order_value", col("total_revenue") / col("num_orders"))
      .select(
        col("is_discounted_order"), col("num_orders"),
        col("total_revenue"), col("avg_order_value"))
  }
}
