package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Geographic league tables over the supplier→nation→region dimension
  * chain — the only part of the TPC-H-ish dim hierarchy the reference's
  * marts never touch (its LOCATION mart stops at the restaurant id,
  * `scripts/cdc_metrics_job_gold.py:239-270`); a regional rollup is the
  * natural next report over the same conformed fact.
  *
  * Scale shape: the three dimension tables pre-join into ONE
  * restaurant→(nation, region) lookup (each step broadcast —
  * dimensions are orders of magnitude smaller than the fact), the fact
  * aggregates once at (region, nation) grain, and the rank/share
  * windows run over the nation-count-sized mart partitioned by region.
  * Money rides integral 1e-4 units end to end.
  */
object Geography {

  def regionalLeague(
      orderRevenue: DataFrame, supplier: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame = {
    val dims = supplier.select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(nation.select(
        col("n_nationkey"), col("n_name"), col("n_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey").as("restaurant_id"),
        col("n_name").as("nation"), col("r_name").as("region"))
    val byNation = orderRevenue
      .join(broadcast(dims), Seq("restaurant_id"))
      .groupBy(col("region"), col("nation"))
      .agg(
        sum(Money.cents(col("total_revenue")).cast("long")).as("cents"),
        countDistinct(col("order_id")).as("n_orders"))
    val rank = Window.partitionBy(col("region"))
      .orderBy(col("cents").desc, col("nation"))
    val regionTot = Window.partitionBy(col("region"))
    byNation
      .withColumn("rank_in_region", row_number().over(rank))
      .withColumn("region_cents", sum(col("cents")).over(regionTot))
      .select(
        col("region"), col("rank_in_region"), col("nation"),
        col("n_orders"),
        (col("cents") / 10000.0).as("revenue"),
        round(col("cents").cast("double") / col("region_cents"), 6)
          .as("region_share"))
  }

  /** Revealed-comparative-advantage index per (supplier nation,
    * category): the nation's within-category revenue share relative to
    * the category's global share — RCA > 1 means the nation is
    * SPECIALIZED in the category (the Balassa index, the classic trade
    * readout over [[tradeMatrix]]'s cells). The index is one fixed
    * double ratio-of-ratios over four exact long sums; the
    * `specialized` flag reads the 6dp-rounded value so it cannot
    * straddle engines. Mart-grain windows only. */
  def rcaIndex(
      orderRevenue: DataFrame, supplier: DataFrame,
      nation: DataFrame): DataFrame = {
    val dims = supplier.select(col("s_suppkey").as("restaurant_id"),
      col("s_nationkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("restaurant_id"), col("n_name").as("nation"))
    val cells = orderRevenue
      .join(broadcast(dims), Seq("restaurant_id"))
      .groupBy(col("nation"), col("item_category"))
      .agg(sum(Money.cents(col("total_revenue")).cast("long")).as("a"))
    val natW = Window.partitionBy(col("nation"))
    val catW = Window.partitionBy(col("item_category"))
    val all = Window.partitionBy()
    cells
      .withColumn("b", sum(col("a")).over(natW))
      .withColumn("c", sum(col("a")).over(catW))
      .withColumn("d", sum(col("a")).over(all))
      .filter(col("a") > 0 && col("b") > 0 && col("c") > 0)
      .withColumn("rca",
        round((col("a").cast("double") / col("b"))
          / (col("c").cast("double") / col("d")), 6))
      .select(col("nation"), col("item_category"),
        round(col("a") / 10000.0, 6).as("revenue"),
        col("rca"), (col("rca") >= 1.25).as("specialized"))
  }

  /** Single-pass share-of-parent hierarchy: each restaurant's revenue
    * with its share of its nation, the nation's share of its region,
    * and the region's share of the market — the drill-down tree a BI
    * layer renders, materialized at leaf grain from ONE fact aggregate
    * plus three mart-grain window sums. */
  def shareOfParent(
      orderRevenue: DataFrame, supplier: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame = {
    val dims = supplier.select(col("s_suppkey").as("restaurant_id"),
      col("s_nationkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"),
        col("n_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("restaurant_id"), col("n_name").as("nation"),
        col("r_name").as("region"))
    val leaf = orderRevenue
      .join(broadcast(dims), Seq("restaurant_id"))
      .groupBy(col("region"), col("nation"), col("restaurant_id"))
      .agg(sum(Money.cents(col("total_revenue")).cast("long")).as("cents"))
    // market total via the scalar-broadcast crossJoin idiom, NOT an
    // empty-partition window: Window.partitionBy() funnels the whole
    // restaurant-grain mart into one partition, while the one-row
    // aggregate broadcasts (leaf's exchange is reused for both readers)
    val market = leaf.agg(sum(col("cents")).as("all_cents"))
    leaf
      .withColumn("nat_cents",
        sum(col("cents")).over(Window.partitionBy(col("region"), col("nation"))))
      .withColumn("reg_cents",
        sum(col("cents")).over(Window.partitionBy(col("region"))))
      .crossJoin(broadcast(market))
      .filter(col("cents") > 0)
      .select(col("region"), col("nation"), col("restaurant_id"),
        round(col("cents") / 10000.0, 6).as("revenue"),
        round(col("cents").cast("double") / col("nat_cents"), 6)
          .as("share_of_nation"),
        round(col("nat_cents").cast("double") / col("reg_cents"), 6)
          .as("nation_share_of_region"),
        round(col("reg_cents").cast("double") / col("all_cents"), 6)
          .as("region_share_of_market"))
  }

  /** The shared trade fact spine: lineitem ⨝ orders ⨝ customer-dims ⨝
    * supplier-dims, reduced to exactly the columns the trade reports
    * consume — (yr, net_cents, cust_nation, cust_regionkey,
    * supp_nation). [[tradeMatrix]] (Q7) and [[supplierMarketShare]]
    * (Q8) both aggregate THIS subtree; r7 built it twice, once per
    * query. Callers that run more than one trade report should persist
    * the spine once (the [[graft.bindings.Conformed.orderRevenueCached]]
    * pattern) and feed the `OnSpine` variants.
    *
    * Shape: ONE fact-fact shuffle (lineitem⨝orders on the order key);
    * the customer-nation lookup is hinted `broadcast` — at gate scale
    * AQE would usually pick it anyway, but the hint pins the plan (the
    * r7 bench showed it sometimes shuffled on the driver box). At
    * 100 TB the customer dim may outgrow broadcast range: drop to the
    * un-hinted equi join there (it stays a hash join on the customer
    * key); the spine columns and semantics don't change. */
  def tradeSpine(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      supplier: DataFrame, nation: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_orderkey"), col("l_suppkey"),
      Money.lineNetCents.as("net_cents"))
    val o = orders.select(col("o_orderkey"), col("o_custkey"),
      year(col("o_orderdate")).as("yr"))
    val cn = customer.select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(nation.select(col("n_nationkey"),
        col("n_name").as("cust_nation"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("cust_nation"),
        col("n_regionkey").as("cust_regionkey"))
    val sn = supplier.select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("snk"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .select(col("s_suppkey"), col("supp_nation"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .select(col("yr"), col("net_cents"), col("cust_nation"),
        col("cust_regionkey"), col("supp_nation"))
  }

  /** Bilateral trade matrix (the TPC-H Q7 shape): net revenue by
    * (customer nation, supplier nation, order year) — who buys from
    * whom, over time. One hash aggregate over [[tradeSpine]]. */
  def tradeMatrixOnSpine(spine: DataFrame): DataFrame =
    spine
      .groupBy(col("cust_nation"), col("supp_nation"), col("yr"))
      .agg(count(lit(1)).as("n_lines"), sum(col("net_cents")).as("cents"))
      .select(col("cust_nation"), col("supp_nation"), col("yr"),
        col("n_lines"), round(col("cents") / 100.0, 6).as("revenue"))

  def tradeMatrix(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      supplier: DataFrame, nation: DataFrame): DataFrame =
    tradeMatrixOnSpine(
      tradeSpine(lineitem, orders, customer, supplier, nation))

  /** Supplier-nation market share (the TPC-H Q8 shape): within each
    * customer REGION and order year, the share of net revenue delivered
    * by suppliers of `targetNation`. The 5-row region-name lookup
    * broadcasts onto [[tradeSpine]]'s region key; the share is one
    * conditional-sum ratio of exact longs. */
  def supplierMarketShareOnSpine(
      spine: DataFrame, region: DataFrame,
      targetNation: String): DataFrame =
    spine
      .join(broadcast(region.select(col("r_regionkey"),
        col("r_name").as("cust_region"))),
        col("cust_regionkey") === col("r_regionkey"))
      .groupBy(col("cust_region"), col("yr"))
      .agg(
        sum(col("net_cents")).as("total_cents"),
        sum(when(col("supp_nation") === targetNation, col("net_cents"))
          .otherwise(0L)).as("target_cents"))
      .filter(col("total_cents") > 0)
      .select(col("cust_region"), col("yr"),
        round(col("total_cents") / 100.0, 6).as("total_revenue"),
        round(col("target_cents") / 100.0, 6).as("target_revenue"),
        round(col("target_cents").cast("double") / col("total_cents"), 6)
          .as("market_share"))

  def supplierMarketShare(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame,
      targetNation: String): DataFrame =
    supplierMarketShareOnSpine(
      tradeSpine(lineitem, orders, customer, supplier, nation),
      region, targetNation)
}
