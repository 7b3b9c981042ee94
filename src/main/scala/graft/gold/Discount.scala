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

  /** Fused single-input form: `order_revenue` IS items ⟕ options row for
    * row (same left join, option_price null-filled to 0 — `< 0` tests
    * identically), so when the conformed fact is already in hand the
    * item and revenue sides collapse into ONE order-grain aggregate over
    * one scan: flags, line count, and revenue cents in the same pass,
    * then `discounted_lines = flags·n_lines`, `order_cents =
    * cents·n_lines` reproduce the reference's lines² fan-out arithmetic
    * bit-for-bit. Use [[apply(items:*]] when the sources are separate
    * materialized silver tables (the reference's shape). */
  def apply(orderRevenue: DataFrame): DataFrame = {
    val perOrder = orderRevenue
      .groupBy(col("order_id"))
      .agg(
        sum(when(col("option_price") < 0, 1).otherwise(0)).as("flags_sum"),
        count(lit(1)).as("n_lines"),
        sum(Money.cents(col("total_revenue"))).as("rev_cents"))
      .select(
        col("order_id"),
        (col("flags_sum") * col("n_lines")).as("discounted_lines"),
        (col("rev_cents") * col("n_lines")).as("order_cents"))
      .withColumn(
        "is_discounted_order",
        when(col("discounted_lines") > 0, "Yes").otherwise("No"))
    summarize(perOrder)
  }

  private def summarize(perOrder: DataFrame): DataFrame =
    perOrder
      .groupBy(col("is_discounted_order"))
      .agg(
        // perOrder is one row per order_id by construction (both call
        // paths groupBy it) — a countDistinct here would plan a
        // redundant dedup Expand through the shuffle for free
        count(lit(1)).as("num_orders"),
        (sum(col("order_cents")) / 10000.0).as("total_revenue"))
      .withColumn("avg_order_value", col("total_revenue") / col("num_orders"))
      .select(
        col("is_discounted_order"), col("num_orders"),
        col("total_revenue"), col("avg_order_value"))

  /** @param items   line-grain frame with order_id, lineitem_id, user_id
    * @param options silver (deduped) options with option_price
    * @param orderRevenue conformed revenue fact */
  def apply(items: DataFrame, options: DataFrame, orderRevenue: DataFrame): DataFrame = {
    // The reference's second join (revenue on ORDER_ID) fans every item
    // line out by the order's revenue-line count (J10). Distributing the
    // per-order sums over that fan-out:
    //   discounted_lines = Σ_item flags × n_revenue_lines
    //   order_cents      = Σ_revenue cents × n_item_lines
    // so both sides pre-aggregate per order and join 1:1 — bit-identical
    // integers, and the shuffle carries one row per order instead of
    // lines² rows (the 100 TB-safe shape).
    val itemSide = items
      .select(col("order_id"), col("lineitem_id"), col("user_id"))
      .join(
        options.select(col("order_id"), col("lineitem_id"), col("option_price")),
        Seq("order_id", "lineitem_id"), "left")
      .withColumn("is_discounted", when(col("option_price") < 0, 1).otherwise(0))
      .groupBy(col("order_id"))
      .agg(
        sum(col("is_discounted")).as("flags_sum"),
        count(lit(1)).as("n_item_lines"))
    val revSide = orderRevenue
      .groupBy(col("order_id"))
      .agg(
        sum(Money.cents(col("total_revenue"))).as("rev_cents"),
        count(lit(1)).as("n_rev_lines"))
    val perOrder = itemSide
      .join(revSide, Seq("order_id"), "left")
      .select(
        col("order_id"),
        (col("flags_sum") * coalesce(col("n_rev_lines"), lit(1L))).as("discounted_lines"),
        (col("rev_cents") * col("n_item_lines")).as("order_cents"))
      .withColumn(
        "is_discounted_order",
        when(col("discounted_lines") > 0, "Yes").otherwise("No"))
    summarize(perOrder)
  }
}
