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
}
