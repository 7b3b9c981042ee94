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

  /** Frequent item-pair mining — the first two passes of A-Priori
    * (Agrawal/Srikant, VLDB '94) at the ITEM grain, where support
    * pruning is load-bearing: categories number ~150
    * ([[categoryLift]]) but items number in the millions at scale, so
    * the naive within-basket self-join is quadratic in basket width
    * over an enormous sparse pair space. Pass 1 counts per-item basket
    * support (one hash aggregate); only items ≥ `minItemSupport`
    * survive (the A-Priori monotonicity bound: a pair can't be frequent
    * if either member isn't). Pass 2 self-joins the PRUNED baskets on
    * the basket key and counts pairs ≥ `minPairSupport`. The frequent
    * item set is corpus-shrunk (a broadcast semi-join probe); pair
    * fan-out is bounded by the PRUNED basket width squared. Confidence
    * = n_both/n_a is the only float, 6dp-rounded under the shared
    * cross-engine contract. */
  def frequentItemPairs(
      baskets: DataFrame, basketCol: String, itemCol: String,
      minItemSupport: Long = 20, minPairSupport: Long = 3): DataFrame = {
    val b = baskets
      .select(col(basketCol).as("basket_id"), col(itemCol).as("item"))
      .distinct()
    val freq = b.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
      .filter(col("n_item") >= minItemSupport)
    val pruned = b.join(broadcast(freq.select(col("item"))), Seq("item"), "left_semi")
      .select(col("basket_id"), col("item"))
    val pairs = pruned.withColumnRenamed("item", "item_a")
      .join(pruned.withColumnRenamed("item", "item_b"), Seq("basket_id"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minPairSupport)
    pairs
      .join(broadcast(freq.toDF("item_a", "n_a")), Seq("item_a"))
      .join(broadcast(freq.toDF("item_b", "n_b")), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("n_both"),
        col("n_a"), col("n_b"),
        round(col("n_both").cast("double") / col("n_a"), 6).as("confidence"))
  }

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
