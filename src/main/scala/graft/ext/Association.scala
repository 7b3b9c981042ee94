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
    // persist the distinct (basket, item) table (r16, guide §5): it
    // feeds the item-support aggregate AND both self-join sides, and
    // Catalyst shares no subplans across join arms — the r15 plan
    // computed the scan+distinct up to four times per call. Freed
    // after the consuming action (the Dedup lifecycle discipline).
    val b = baskets
      .select(col(basketCol).as("basket_id"), col(itemCol).as("item"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.CacheLifecycle.unpersistAfterNextAction(b)
    val freq = b.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
      .filter(col("n_item") >= minItemSupport)
    val pruned = b.join(broadcast(freq.select(col("item"))), Seq("item"), "left_semi")
      .select(col("basket_id"), col("item"))
    // pinned basket-key repartition (r15): the within-basket pair
    // fan-out is the cost, and it is invisible to AQE's byte stats —
    // the pruned table's shuffle is small, so coalescing would land
    // the whole fan-out + pair count on a few tasks (the q168/q171
    // class). The pin sets both self-join sides' partition count.
    val nPart = baskets.sparkSession.sparkContext.defaultParallelism
    val pairs = pruned.withColumnRenamed("item", "item_a")
      .repartition(nPart, col("basket_id"))
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

  /** Association rules over the frequent pairs: both directed rules
    * (a→b AND b→a) per surviving pair, with the three standard rule
    * metrics — confidence P(cons|ant), lift
    * P(ant,cons)/(P(ant)·P(cons)), and leverage
    * P(ant,cons) − P(ant)·P(cons) — the step after
    * [[frequentItemPairs]] that an analyst actually reads (confidence
    * is directional; a pair is one rule in each direction with very
    * different confidences when supports are asymmetric).
    *
    * Exactness: all supports are exact longs; each metric is one shared
    * IEEE chain over double-cast counts, 6dp-rounded; n_ant·n_cons
    * stays in int64 for basket counts to ~3e9.
    *
    * Scale shape: identical to [[frequentItemPairs]] (distinct-reduce,
    * A-Priori prune via broadcast semi-join, bounded within-basket
    * fan-out) — the mirror union and metric joins run on the PRUNED
    * mart-sized pair table; the grand basket count rides in as a
    * broadcast scalar. */
  def associationRules(
      baskets: DataFrame, basketCol: String, itemCol: String,
      minItemSupport: Long = 20, minPairSupport: Long = 3): DataFrame = {
    // NO persist here, deliberately (r16, guide §1): the
    // frequentItemPairs persist was A/B'd on this function too and
    // measured consistently SLOWER (q187 2.20 -> 2.55 s twice) — its
    // duplicate distinct subtrees already dedupe via AQE exchange
    // reuse, so the cache write is pure cost. Measured, not assumed.
    val b = baskets
      .select(col(basketCol).as("basket_id"), col(itemCol).as("item"))
      .distinct()
    val grand = b.agg(countDistinct(col("basket_id")).as("n_baskets"))
    val freq = b.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
      .filter(col("n_item") >= minItemSupport)
    val pruned = b.join(broadcast(freq.select(col("item"))), Seq("item"), "left_semi")
      .select(col("basket_id"), col("item"))
    // pinned basket-key repartition: the [[frequentItemPairs]] rationale
    val half = pruned.withColumnRenamed("item", "item_a")
      .repartition(baskets.sparkSession.sparkContext.defaultParallelism,
        col("basket_id"))
      .join(pruned.withColumnRenamed("item", "item_b"), Seq("basket_id"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minPairSupport)
    val sym = half
      .select(col("item_a").as("antecedent"), col("item_b").as("consequent"),
        col("n_both"))
      .unionByName(half.select(col("item_b").as("antecedent"),
        col("item_a").as("consequent"), col("n_both")))
    sym
      .join(broadcast(freq.toDF("antecedent", "n_ant")), Seq("antecedent"))
      .join(broadcast(freq.toDF("consequent", "n_cons")), Seq("consequent"))
      .crossJoin(broadcast(grand))
      .select(
        col("antecedent"), col("consequent"), col("n_both"),
        col("n_ant"), col("n_cons"),
        round(col("n_both").cast("double") / col("n_ant"), 6)
          .as("confidence"),
        round((col("n_both").cast("double") * col("n_baskets"))
          / (col("n_ant") * col("n_cons")), 6).as("lift"),
        round(col("n_both").cast("double") / col("n_baskets")
          - (col("n_ant").cast("double") / col("n_baskets"))
            * (col("n_cons").cast("double") / col("n_baskets")), 6)
          .as("leverage"))
  }

  /** Item-item collaborative filtering: top-k most-similar items per
    * item by co-occurrence cosine — sim(a,b) = n_ab / √(n_a·n_b), the
    * classic Amazon-style item-to-item recommender primitive
    * (Linden/Smith/York, IEEE Internet Computing '03) computed purely
    * from basket co-occurrence (no ratings, no model state).
    *
    * Exactness: n_ab, n_a, n_b are exact longs; the cosine is ONE
    * shared IEEE chain — CAST(n_a·n_b) to double (exact below 2^53),
    * correctly-rounded sqrt, one division — so both engines produce the
    * identical double, and the per-item ranking orders on that raw
    * double (tie-break item_b asc) before the 6dp display rounding.
    *
    * Scale shape: distinct (basket, item) reduction first; support
    * pruning via a broadcast semi-join (A-Priori monotonicity — a pair
    * below `minCooc` can't outrank one above it at equal counts only if
    * it survives, so pruning the pair table by count is safe for the
    * ranking); the within-basket self-join fans out by pruned basket
    * width squared, never corpus²; item counts ride back in by
    * broadcast; the top-k window partitions by item_a over the pruned
    * pair table (mart-sized). */
  def itemSimilarityTopK(
      baskets: DataFrame, basketCol: String, itemCol: String,
      minCooc: Long = 3, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NO persist (the associationRules negative-result rationale:
    // A/B'd q178 1.68 -> 1.96 s twice — AQE exchange reuse already
    // covers the duplicate distinct subtrees here)
    val b = baskets
      .select(col(basketCol).as("basket_id"), col(itemCol).as("item"))
      .distinct()
    val counts = b.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    // pinned basket-key repartition: the [[frequentItemPairs]] rationale
    val half = b.toDF("basket_id", "item_a")
      .repartition(baskets.sparkSession.sparkContext.defaultParallelism,
        col("basket_id"))
      .join(b.toDF("basket_id", "item_b"), Seq("basket_id"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("cooc"))
      .filter(col("cooc") >= minCooc)
    // mirror so "top-k neighbors of item X" ranks over BOTH directions
    val sym = half.unionByName(
      half.select(col("item_b").as("item_a"), col("item_a").as("item_b"),
        col("cooc")))
    val byCos = Window.partitionBy(col("item_a"))
      .orderBy(col("cosine_raw").desc, col("item_b"))
    sym
      .join(broadcast(counts.toDF("item_a", "n_a")), Seq("item_a"))
      .join(broadcast(counts.toDF("item_b", "n_b")), Seq("item_b"))
      .withColumn("cosine_raw",
        col("cooc") / sqrt((col("n_a") * col("n_b")).cast("double")))
      .withColumn("rank", row_number().over(byCos))
      .filter(col("rank") <= k)
      .select(col("item_a"), col("rank"), col("item_b"),
        col("cooc"), col("n_a"), col("n_b"),
        round(col("cosine_raw"), 6).as("cosine"))
  }

  def categoryLift(orderRevenue: DataFrame, minSupport: Long = 10): DataFrame = {
    // the frequentItemPairs persist rationale (totals + grand + sides)
    val oc = orderRevenue
      .select(col("order_id"), col("item_category").as("cat"))
      .filter(col("cat").isNotNull)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.CacheLifecycle.unpersistAfterNextAction(oc)
    val totals = oc.groupBy(col("cat")).agg(count(lit(1)).as("n_cat"))
    val grand = oc.agg(countDistinct(col("order_id")).as("n_orders"))
    // pinned order-key repartition: the [[frequentItemPairs]] rationale
    val pairs = oc.toDF("order_id", "cat_a")
      .repartition(orderRevenue.sparkSession.sparkContext.defaultParallelism,
        col("order_id"))
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

  /** Temporal recommender backtest: hold out each user's LAST order,
    * train [[itemSimilarityTopK]]-style category co-occurrence on the
    * rest, recommend each user's top-`k` unseen categories by summed
    * neighbor similarity, and score hit-rate@k against the held-out
    * order's categories — bucketed by profile breadth (does CF only
    * work for broad users?). The honest eval loop q178's similarity
    * table feeds.
    *
    * Determinism: similarities quantize to 1e-6 integer units BEFORE
    * the per-candidate sum (double Σ is order-dependent), ranking
    * tie-breaks on category; the split is by (date, order id) max —
    * total order, no randomness. Shapes: baskets dedupe first; the
    * candidate scoring is profile ⨝ similarity at (user, category)
    * grain. */
  def cfBacktest(orderRevenue: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val orders = orderRevenue
      .select(col("user_id"), col("order_id"), col("creation_date"),
        col("item_category").as("cat"))
    val lastOrder = orders.groupBy(col("user_id"))
      .agg(max(struct(col("creation_date"), col("order_id")))
        .getField("order_id").as("ho"))
    val tagged = orders.join(lastOrder, Seq("user_id"))
    val train = tagged.filter(col("order_id") =!= col("ho"))
    val holdout = tagged.filter(col("order_id") === col("ho"))
      .select(col("user_id"), col("cat")).distinct()
    // co-occurrence similarity on TRAIN baskets only
    val b = train.select(col("order_id").as("basket_id"), col("cat").as("item"))
      .distinct()
    val counts = b.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    // pinned basket-key repartition: the [[frequentItemPairs]] rationale
    val half = b.toDF("basket_id", "item_a")
      .repartition(orderRevenue.sparkSession.sparkContext.defaultParallelism,
        col("basket_id"))
      .join(b.toDF("basket_id", "item_b"), Seq("basket_id"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("cooc"))
      .filter(col("cooc") >= 2)
    val sym = half.unionByName(half.select(col("item_b").as("item_a"),
      col("item_a").as("item_b"), col("cooc")))
      .join(broadcast(counts.toDF("item_a", "n_a")), Seq("item_a"))
      .join(broadcast(counts.toDF("item_b", "n_b")), Seq("item_b"))
      .select(col("item_a"), col("item_b"),
        round(col("cooc") / sqrt((col("n_a") * col("n_b")).cast("double"))
          * 1e6).cast("long").as("simq"))
    val profile = train.select(col("user_id"), col("cat")).distinct()
    val scored = profile
      .join(sym, profile("cat") === sym("item_a"))
      .groupBy(col("user_id"), col("item_b").as("cand"))
      .agg(sum(col("simq")).as("score"))
      .join(profile.select(col("user_id"), col("cat").as("cand")),
        Seq("user_id", "cand"), "left_anti")
    val recs = scored
      .withColumn("rk", row_number().over(Window.partitionBy(col("user_id"))
        .orderBy(col("score").desc, col("cand").asc)))
      .filter(col("rk") <= k)
      .select(col("user_id"), col("cand"))
    val hitUsers = recs
      .join(holdout, recs("user_id") === holdout("user_id") &&
        recs("cand") === holdout("cat"), "left_semi")
      .select(col("user_id")).distinct()
      .withColumn("hit", lit(1L))
    val breadth = profile.groupBy(col("user_id"))
      .agg(least(count(lit(1)), lit(12L)).as("n_train_cats"))
    // eligible users: a holdout order AND a non-empty training profile
    holdout.select(col("user_id")).distinct()
      .join(breadth, Seq("user_id"))
      .join(hitUsers, Seq("user_id"), "left_outer")
      .groupBy(col("n_train_cats"))
      .agg(count(lit(1)).as("n_users"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .select(col("n_train_cats"), col("n_users"), col("n_hits"),
        expr("((n_hits * 1000000 * 2 + n_users) div (n_users * 2)) " +
          "/ cast(1000000 as double)").as("hit_rate"))
  }
}
