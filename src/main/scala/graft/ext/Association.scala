package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association mining over order baskets: pairwise category
  * co-occurrence with lift — the market-basket signal behind
  * cross-sell/bundling analytics (the reference's marts stop at
  * per-category rollups).
  *
  * Scale shape: reduce to DISTINCT (order, category) FIRST (hash
  * aggregate — basket width bounds everything downstream), pair within
  * an order by a self-equi-join on order_id (fan-out = basket_width²,
  * a small constant per order, never corpus²), hash-aggregate the pair
  * counts, and broadcast the category totals + grand total back onto
  * the mart-sized pair table. Lift = n_ab·N / (n_a·n_b) computed from
  * exact integer counts; the single division is the only float and is
  * 6-decimal-rounded under the shared cross-engine contract.
  */
object Association {

  def categoryLift(orderRevenue: DataFrame, minSupport: Long = 10): DataFrame = {
    val oc = orderRevenue
      .select(col("order_id"), col("item_category").as("cat"))
      .filter(col("cat").isNotNull)
      .distinct()
    val totals = oc.groupBy(col("cat")).agg(count(lit(1)).as("n_cat"))
    val grand = oc.agg(countDistinct(col("order_id")).as("n_orders"))
    val pairs = oc.toDF("order_id", "cat_a")
      .join(oc.toDF("order_id", "cat_b"), Seq("order_id"))
      .filter(col("cat_a") < col("cat_b"))
      .groupBy(col("cat_a"), col("cat_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minSupport)
    pairs
      .join(broadcast(totals.toDF("cat_a", "n_a")), Seq("cat_a"))
      .join(broadcast(totals.toDF("cat_b", "n_b")), Seq("cat_b"))
      .crossJoin(broadcast(grand))
      .select(col("cat_a"), col("cat_b"), col("n_both"),
        col("n_a"), col("n_b"),
        round(col("n_both") * col("n_orders") / (col("n_a") * col("n_b")), 6)
          .as("lift"))
  }
}
