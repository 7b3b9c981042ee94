package graft.bindings

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.silver.RevenueConform

/** Binds the driver's TPC-H-ish testdata onto the engine's conformed
  * business schema (the reference's order_items / order_item_options /
  * order_revenue model — `scripts/cdc_metrics_job_silver.py:101-117`):
  *
  *  - lineitem → order line grain: `order_id`=l_orderkey, `lineitem_id`=l_linenumber
  *  - orders   → order header:     `user_id`=o_custkey, `creation_date`=date(o_orderdate)
  *  - part     → item dimension:   `item_category`=p_type (broadcast join)
  *  - l_suppkey → location:        `restaurant_id`
  *  - o_orderpriority ∈ {1-URGENT, 2-HIGH} → `is_loyalty`
  *  - "options" analog: lines with l_tax > 0.04 carry a surcharge row
  *    `option_price = l_tax * l_extendedprice` (genuinely missing rows so the
  *    left-join null-fill path is exercised).
  *
  * Scale notes (100 TB): lineitem⨝orders is the one unavoidable fact-fact
  * shuffle (both sides hashed on the order key; bucketing both by order key
  * makes it shuffle-free). The part join is `broadcast()` — the part dim is
  * orders-of-magnitude smaller than the fact. All money arithmetic is
  * per-row and deterministic (bit-exact across engines); rounding happens
  * only at aggregate outputs.
  */
object Conformed {

  /** Line-grain items enriched with order header + item dim. */
  def items(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey"),
      col("o_custkey").as("user_id"),
      to_date(col("o_orderdate")).as("creation_date"),
      col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("is_loyalty"))
    val p = Tables.part(spark, dir).select(
      col("p_partkey"), col("p_type").as("item_category"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .select(
        col("l_orderkey").as("order_id"),
        col("l_linenumber").as("lineitem_id"),
        col("user_id"),
        col("l_suppkey").as("restaurant_id"),
        col("item_category"),
        col("is_loyalty"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("item_price"),
        col("creation_date"))
  }

  /** Line-grain "options" (surcharges); deliberately sparse. */
  def options(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_tax") > 0.04)
      .select(
        col("l_orderkey").as("order_id"),
        col("l_linenumber").as("lineitem_id"),
        (col("l_tax") * col("l_extendedprice")).as("option_price"))

  /** The conformed silver fact most gold marts consume. */
  def orderRevenue(spark: SparkSession, dir: String): DataFrame =
    RevenueConform(
      items(spark, dir),
      options(spark, dir),
      Seq("order_id", "lineitem_id"))
}
