package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Loyalty-program impact mart.
  *
  * Reference capability: `mart_loyalty_program_impact`
  * (`scripts/cdc_metrics_job_gold.py:257-295`): revenue lines joined to a
  * per-order loyalty flag (J7 — dedup-before-join avoids fan-out), LTV per
  * (user, loyalty) cohort, repeat flag from `countDistinct(ORDER_ID)`,
  * inner join (J8), then the cohort summary (A10) with repeat-order rate.
  *
  * The reference's `dropDuplicates(["ORDER_ID"])` keep-any is safe here
  * because user_id / is_loyalty are constant per order (order-header
  * attributes) — results are deterministic either way.
  *
  * Exactness: per-cohort avg spend is written as
  * `sum(ltv_cents) / 10000 / num_customers` — an exact integer sum and two
  * divisions — never a float `avg` (the oracle mirrors the formula).
  */
object Loyalty {

  /** Fused single-input form: the conformed fact carries order_id /
    * user_id / is_loyalty on every line (left-join-preserved from the
    * same items frame), so the flag dedup, the LTV rollup, and the
    * order counts all derive from ONE scan of `order_revenue`. Use the
    * two-frame form when items and revenue are separate materialized
    * silver tables. */
  def apply(orderRevenue: DataFrame): DataFrame =
    apply(
      orderRevenue.select(col("order_id"), col("user_id"), col("is_loyalty")),
      orderRevenue)

  /** @param items  line-grain frame with order_id, user_id, is_loyalty
    * @param orderRevenue conformed revenue fact */
  def apply(items: DataFrame, orderRevenue: DataFrame): DataFrame = {
    val orderFlags = items
      .select(col("order_id"), col("user_id"), col("is_loyalty"))
      .dropDuplicates("order_id")
    val ltv = orderRevenue
      .select(col("order_id"), col("total_revenue"))
      .join(orderFlags, Seq("order_id"), "left")
      .groupBy(col("user_id"), col("is_loyalty"))
      .agg(sum(Money.cents(col("total_revenue"))).as("ltv_cents"))
    val orderCounts = items
      .groupBy(col("user_id"), col("is_loyalty"))
      .agg(countDistinct(col("order_id")).as("num_orders"))
      .withColumn("is_repeat", when(col("num_orders") > 1, 1).otherwise(0))
    ltv
      .join(orderCounts, Seq("user_id", "is_loyalty"), "inner")
      .groupBy(col("is_loyalty"))
      .agg(
        countDistinct(col("user_id")).as("num_customers"),
        (sum(col("ltv_cents")) / 10000.0).as("spend_dollars"),
        sum(col("is_repeat")).as("num_repeat_customers"))
      .withColumn("avg_spend_per_customer", col("spend_dollars") / col("num_customers"))
      .withColumn("repeat_order_rate", col("num_repeat_customers") / col("num_customers"))
      .select(
        col("is_loyalty"), col("num_customers"), col("avg_spend_per_customer"),
        col("num_repeat_customers"), col("repeat_order_rate"))
  }
}
