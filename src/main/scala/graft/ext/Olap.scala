package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-dimensional OLAP rollups: CUBE over (year, priority) with the
  * standard `grouping_id` bit vector labeling each grouping set — the
  * all-subtotals report a metrics warehouse serves from one pass.
  *
  * Scale shape: `cube` over d dimensions Expands each input row into
  * 2^d grouping-set rows BEFORE the exchange, but partial aggregation
  * runs on the expanded rows map-side, so the shuffle carries only
  * (group, partial) pairs — cardinality bounded by the result size, not
  * 2^d × input. With low-cardinality dims (years × priorities here) the
  * exchange is mart-sized however big the fact is. Money stays on the
  * integral 1e-4-unit rule ([[graft.gold.Money]]) so sums are exact and
  * order-independent in both engines.
  */
object Olap {

  /** Revenue/volume cube over order year × priority. `gid` is the
    * standard grouping bit vector (year bit 2, priority bit 1): 0 =
    * cell, 1 = per-year subtotal, 2 = per-priority subtotal, 3 = grand
    * total. NULL dimension values mark the rolled-up axes, exactly as
    * SQL CUBE emits them. */
  def ordersCube(orders: DataFrame): DataFrame =
    orders
      .withColumn("order_year", year(col("o_orderdate")))
      .cube(col("order_year"), col("o_orderpriority"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_orders"),
        (sum(round(col("o_totalprice") * 10000)) / 10000.0).as("revenue"))

  /** Pareto (80/20) contribution analysis over a grouping dimension:
    * rank groups by exact integer-unit revenue, cumulative share of the
    * grand total, and the head set that reaches `threshold` of revenue
    * (a group is `in_head` if the share BEFORE it is still under the
    * threshold — so the head is the minimal prefix crossing it, and is
    * non-empty even when one group alone exceeds it).
    *
    * Scale shape: one hash aggregate reduces the fact to group grain
    * first; the rank/cumsum window is unpartitioned BUT runs at group
    * cardinality (~150 categories here), mart-sized by construction —
    * the same single-partition-window-at-mart-grain judgment as the
    * reference's dense_rank ([[graft.gold.Location]] W4). Shares are
    * single divisions of exact longs, 6dp-rounded; ties rank
    * deterministically (revenue desc, group asc). */
  def paretoCut(
      orderRevenue: DataFrame, dimCol: String,
      threshold: Double = 0.8): DataFrame = {
    val grouped = orderRevenue
      .groupBy(col(dimCol).as("dim"))
      .agg(sum(round(col("total_revenue") * 10000).cast("long")).as("cents"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cents").desc, col("dim"))
    grouped
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_cents",
        sum(col("cents")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(grouped.agg(sum(col("cents")).as("total_cents"))))
      .select(
        col("dim").as(dimCol),
        col("rank"),
        (col("cents") / 10000.0).as("revenue"),
        round(col("cum_cents").cast("double") / col("total_cents"), 6)
          .as("cum_share"),
        ((col("cum_cents") - col("cents")).cast("double") / col("total_cents")
          < threshold).as("in_head"))
  }

  /** Per-restaurant peak-hour profile: the hour of day carrying the
    * most revenue, its share, and the hour-concentration HHI — the
    * staffing/capacity readout on top of the hourly trend mart (q10
    * reports the full hourly grid; operators read this summary). The
    * argmax is an order-free `min` over (−cents, hour) structs — no
    * window, the q174 pattern.
    *
    * Two stacked hash aggregates (fact → (restaurant, hour) →
    * restaurant); exact cents; shares are single divisions. Dollar
    * units in the HHI keep Σd² inside int64 (the q176 rule). */
  def peakHourProfile(orderRevenue: DataFrame): DataFrame =
    orderRevenue
      .groupBy(col("restaurant_id"),
        hour(col("creation_ts")).cast("long").as("hr"))
      .agg(expr("sum(cast(round(total_revenue * 10000) as long)) div 10000")
        .as("d"))
      .groupBy(col("restaurant_id"))
      .agg(
        count(lit(1)).as("n_active_hours"),
        min(struct((-col("d")).as("nd"), col("hr"))).getField("hr")
          .as("peak_hour"),
        max(col("d")).as("peak_dollars"),
        sum(col("d")).as("sd"),
        sum(col("d") * col("d")).as("sd2"))
      .filter(col("sd") > 0)
      .select(
        col("restaurant_id"), col("n_active_hours"), col("peak_hour"),
        round(col("peak_dollars").cast("double") / col("sd"), 6)
          .as("peak_share"),
        round(col("sd2").cast("double") / (col("sd") * col("sd")).cast("double"), 6)
          .as("hour_hhi"))

  /** Hour-of-week revenue heatmap: the (ISO weekday × hour) grid with
    * revenue, order-line volume, and each cell's share of the week —
    * the load-curve interaction [[peakHourProfile]] (hour only) and the
    * weekday seasonality mart (day only) each project away. One hash
    * aggregate at 7×24 grain + a broadcast grand total; exact cents. */
  def hourOfWeekGrid(orderRevenue: DataFrame): DataFrame = {
    val cells = orderRevenue
      .groupBy(weekday(col("creation_date")).cast("long").as("iso_weekday"),
        hour(col("creation_ts")).cast("long").as("hr"))
      .agg(count(lit(1)).as("n_lines"),
        sum(round(col("total_revenue") * 10000).cast("long")).as("cents"))
    val tot = cells.agg(sum(col("cents")).as("tot"))
    cells.crossJoin(broadcast(tot))
      .select(col("iso_weekday"), col("hr"), col("n_lines"),
        round(col("cents") / 10000.0, 6).as("revenue"),
        round(col("cents").cast("double") / col("tot"), 6).as("week_share"))
  }

  /** Customer multi-homing: how many distinct restaurants each user
    * orders from, rolled into a histogram (capped) with user share and
    * mean per-user revenue per bucket — single-restaurant loyalists vs
    * marketplace browsers. Fact → user grain → bucket rollup. */
  def multiHoming(orderRevenue: DataFrame, cap: Int = 8): DataFrame = {
    val users = orderRevenue
      .groupBy(col("user_id"))
      .agg(countDistinct(col("restaurant_id")).as("n_rest"),
        sum(round(col("total_revenue") * 10000).cast("long")).as("cents"))
    val total = users.agg(count(lit(1)).as("n_total"))
    users
      .withColumn("n_restaurants", least(col("n_rest"), lit(cap.toLong)))
      .groupBy(col("n_restaurants"))
      .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("scents"))
      .crossJoin(broadcast(total))
      .select(
        col("n_restaurants"), col("n_users"),
        round(col("n_users").cast("double") / col("n_total"), 6)
          .as("user_share"),
        round(col("scents") / 10000.0 / col("n_users"), 6)
          .as("avg_user_revenue"))
  }

  /** Discount-band effectiveness over the RAW fact: lines bucketed by
    * integer discount percent, with volume, gross/net revenue, the
    * realized margin give-up, and average quantity per band — does
    * deeper discounting actually move units
    * ([[graft.gold.Discount]] reads the conformed option stream; this
    * reads the pricing columns directly). One hash aggregate at band
    * grain; exact 1e-4-unit money; single-division ratios. */
  def discountBands(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(round(col("l_discount") * 100).cast("long").as("discount_pct"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(round(col("l_extendedprice") * 10000).cast("long")).as("gross"),
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
          .cast("long")).as("net"),
        sum(col("l_quantity").cast("long")).as("qty"))
      .select(
        col("discount_pct"), col("n_lines"),
        round(col("gross") / 10000.0, 6).as("gross_revenue"),
        round(col("net") / 10000.0, 6).as("net_revenue"),
        round((col("gross") - col("net")) / 10000.0, 6).as("margin_give_up"),
        round(col("qty").cast("double") / col("n_lines"), 6)
          .as("avg_quantity"))

  /** Return-flag exposure per category: how much volume and revenue
    * each category has in RETURNED lines (`l_returnflag = 'R'`) — the
    * merchandising-risk audit next to [[discountBands]]. Broadcast dim
    * join + one conditional hash aggregate. */
  def returnRates(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part.select(col("p_partkey"),
        col("p_type").as("item_category"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("item_category"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("n_returned"),
        sum(when(col("l_returnflag") === "R",
          round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
            .cast("long")).otherwise(0L)).as("ret_cents"))
      .select(
        col("item_category"), col("n_lines"), col("n_returned"),
        round(col("n_returned").cast("double") / col("n_lines"), 6)
          .as("return_share"),
        round(col("ret_cents") / 10000.0, 6).as("returned_revenue"))

  /** Dead-stock audit per brand: catalog parts that NO order line ever
    * touched — pure anti-join accounting (the assortment hygiene
    * readout; at 100 TB the fact side collapses to a distinct-key set
    * before the anti join). */
  def deadStock(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val ordered = lineitem.select(col("l_partkey").as("p_partkey")).distinct()
    part.select(col("p_partkey"), col("p_brand"))
      .join(ordered.withColumn("m", lit(1)), Seq("p_partkey"), "left_outer")
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_parts"),
        sum(when(col("m").isNull, 1L).otherwise(0L)).as("n_dead"))
      .select(col("p_brand"), col("n_parts"), col("n_dead"),
        round(col("n_dead").cast("double") / col("n_parts"), 6)
          .as("dead_share"))
  }

  /** Market-mix concentration TREND: [[revenueConcentration]]'s HHI
    * computed per month over the whole market's category mix, with the
    * month-over-month delta — is the business diversifying or
    * collapsing onto fewer categories. Same exact integer-dollar
    * machinery (truncating `div`, matching DuckDB integer `//`); the lag
    * window runs at MONTH grain (mart-sized, the q165 judgment). */
  def monthlyConcentration(orderRevenue: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byMonth = orderRevenue
      .groupBy(to_date(date_trunc("month", col("creation_date"))).as("month"),
        col("item_category"))
      .agg(expr("sum(cast(round(total_revenue * 10000) as long)) div 10000")
        .as("d"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_categories"),
        sum(col("d")).as("sd"),
        sum(col("d") * col("d")).as("sd2"))
      .filter(col("sd") > 0)
      .select(col("month"), col("n_categories"),
        round(col("sd2").cast("double") / (col("sd") * col("sd")).cast("double"), 6)
          .as("hhi"))
    byMonth
      .withColumn("hhi_delta",
        round(col("hhi") - lag(col("hhi"), 1).over(Window.orderBy(col("month"))), 6))
  }

  /** Basket-size economics: orders bucketed by line count (capped),
    * with order share and average order value per bucket — the
    * "do bigger baskets pay" readout next to [[graft.ext.Association]]'s
    * cross-sell signals. Fact → order-grain hash aggregate → bucket
    * rollup; exact cents, single divisions. */
  def basketSizeEconomics(
      orderRevenue: DataFrame, cap: Int = 10): DataFrame = {
    val orders = orderRevenue
      .groupBy(col("order_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(round(col("total_revenue") * 10000).cast("long")).as("cents"))
    val total = orders.agg(count(lit(1)).as("n_total"))
    orders
      .withColumn("basket_size", least(col("n_lines"), lit(cap.toLong)))
      .groupBy(col("basket_size"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("scents"))
      .crossJoin(broadcast(total))
      .select(
        col("basket_size"), col("n_orders"),
        round(col("n_orders").cast("double") / col("n_total"), 6)
          .as("order_share"),
        round(col("scents") / 10000.0 / col("n_orders"), 6)
          .as("avg_order_value"))
  }

  /** Gini coefficient of per-customer revenue within each restaurant —
    * the inequality audit next to [[revenueConcentration]]'s HHI: HHI
    * asks "how concentrated are my CATEGORIES", Gini asks "how unequal
    * are my CUSTOMERS" (0 = everyone spends the same, →1 = one whale).
    *
    * Formula (sorted-rank form): G = (2·Σᵢ i·xᵢ)/(n·Σxᵢ) − (n+1)/n over
    * xᵢ sorted ascending, i = 1..n. Both Σ terms are exact integer-cent
    * longs (ties don't matter: equal xᵢ contribute the same Σ i·xᵢ under
    * any permutation of their ranks), so the only floats are the two
    * final divisions — one shared IEEE chain, 6dp-rounded.
    *
    * Scale shape: fact → (restaurant, user) hash aggregate first, then
    * ONE restaurant-partitioned ranking window at customer grain, then a
    * restaurant-grain rollup. No unpartitioned window, no self-join;
    * Σ i·x stays far inside int64 (rank ≤ customers-per-restaurant,
    * cents ≤ 1e12). Restaurants with non-positive total (discount-heavy
    * edge) are excluded — Gini is undefined there. */
  /** Exponentially time-decayed customer value (the CRM "recency-
    * weighted spend"): each line's cents contribute shifted right by
    * one bit per elapsed `halfLifeDays` — i.e. a half-life decay whose
    * factors are EXACT negative powers of two (`pow(0.5, d/h)` through
    * libm differs across engines in the last ulp; `2^-floor(d/h)` is
    * exact integer math everywhere). Contributions older than
    * `maxBuckets` half-lives are exactly zero. The anchor "today" is
    * the dataset's last order date (one tiny broadcast scalar).
    *
    * Shape: fact rows map to integer micro-cent contributions
    * row-locally, then ONE user hash aggregate (order-free long sums,
    * map-side combine). */
  def decayedCustomerValue(
      orderRevenue: DataFrame, halfLifeDays: Int = 30,
      maxBuckets: Int = 40): DataFrame = {
    val anchor = orderRevenue.agg(max(col("creation_date")).as("today"))
    orderRevenue
      .join(broadcast(anchor))
      .select(col("user_id"),
        round(col("total_revenue") * 10000).cast("long").as("cents"),
        expr(s"least(datediff(today, creation_date) div $halfLifeDays, " +
          s"$maxBuckets)").as("k"))
      // plain truncating division on BOTH sides: Spark `div` and
      // DuckDB integer `//` both truncate toward zero (DuckDB floors
      // only float `//`) — a pmod floor identity here would DIVERGE on
      // discount-negative lines
      .select(col("user_id"), col("cents"),
        expr("(cents * 1000000) div cast(power(2, k) as long)").as("dq"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("cents")).as("c"), sum(col("dq")).as("s"))
      .select(col("user_id"), col("n_lines"),
        round(col("c") / 10000.0, 6).as("revenue"),
        round(col("s") / lit(1.0e10), 6).as("decayed_value"))
  }

  /** Share-of-wallet concentration deciles: per user, the fraction of
    * their spend at their single top restaurant; users histogram into
    * buckets floor(10·share) (capped at 9), with a pooled bucket-level
    * share ratio. The loyalty-concentration readout [[multiHoming]]'s
    * venue COUNT can't give (10 restaurants at 91% one venue is
    * loyalty; 10 at 10% each is promiscuity).
    *
    * Exactness: the bucket is the integer floor division
    * (top·10) div total; the pooled share divides two order-free long
    * sums. Two stacked hash aggregates, fact → (user, restaurant) →
    * user → bucket. */
  def walletShareDeciles(orderRevenue: DataFrame): DataFrame =
    orderRevenue
      .groupBy(col("user_id"), col("restaurant_id"))
      .agg(sum(round(col("total_revenue") * 10000).cast("long")).as("cents"))
      .groupBy(col("user_id"))
      .agg(sum(col("cents")).as("total"), max(col("cents")).as("top"),
        count(lit(1)).as("n_venues"))
      .filter(col("total") > 0)
      .select(col("user_id"), col("total"), col("top"), col("n_venues"),
        expr("least((top * 10) div total, 9L)").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("top")).as("st"), sum(col("total")).as("stt"),
        sum(col("n_venues")).as("sv"))
      .select(col("bucket"), col("n_users"),
        round(col("st").cast("double") / col("stt"), 6).as("pooled_share"),
        round(col("sv").cast("double") / col("n_users"), 6)
          .as("avg_venues"))

  /** Monthly growth accounting over the user base: each active
    * user-month classifies as NEW (first month ever), RETAINED (also
    * active the previous calendar month), or RESURRECTED (active
    * before, but not last month); CHURNED counts users active last
    * month who went quiet this month. The full user-count ledger
    * behind [[graft.ext.Timeseries.newVsReturning]]'s revenue split —
    * month-over-month, new + retained + resurrected − churned
    * reconciles the active-user delta.
    *
    * Shape: fact → (user, month-index) grain, one user-partitioned
    * lag/lead window, then a month hash aggregate (states) merged with
    * the shifted churn aggregate. Month indices are exact integers. */
  def growthAccounting(orderRevenue: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val um = orderRevenue
      .select(col("user_id"),
        (year(col("creation_date")) * 12 + month(col("creation_date")) - 1)
          .as("mi"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("mi"))
    val flagged = um
      .withColumn("prev", lag(col("mi"), 1).over(w))
      .withColumn("nxt", lead(col("mi"), 1).over(w))
    val states = flagged.groupBy(col("mi"))
      .agg(
        count(lit(1)).as("n_active"),
        sum(when(col("prev").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("prev") === col("mi") - 1, 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("prev").isNotNull && col("prev") < col("mi") - 1, 1L)
          .otherwise(0L)).as("n_resurrected"))
    // a user active in month m churns in m+1 when the next active month
    // isn't m+1 (or never comes); clip at the dataset's last month
    val maxMi = um.agg(max(col("mi")).as("max_mi"))
    val churned = flagged
      .filter(col("nxt").isNull || col("nxt") > col("mi") + 1)
      .join(broadcast(maxMi))
      .filter(col("mi") + 1 <= col("max_mi"))
      .groupBy((col("mi") + 1).as("mi"))
      .agg(count(lit(1)).as("n_churned"))
    // FULL outer: a month can have zero actives but nonzero churn (the
    // ledger must still show it)
    states.join(churned, Seq("mi"), "full_outer")
      .select(
        expr("make_date(mi div 12, pmod(mi, 12) + 1, 1)").as("month"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  /** Price-ladder percentiles per category: exact interpolated
    * p25/p50/p75/p90 of the observed unit price, with the premium
    * index p90/p50 — the price-architecture readout merchandisers read
    * next to [[discountBands]]. Unit prices quantize to integer cents
    * row-locally; one category hash aggregate. */
  def priceLadder(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part.select(col("p_partkey"),
        col("p_type").as("item_category"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("item_category"),
        round(col("l_extendedprice") / col("l_quantity") * 100)
          .cast("long").as("uc"))
      // pinned category repartition (r15): `percentile` partials buffer
      // EVERY value, so the pre-agg exchange carries the full value set
      // either way — but without the pin the buffer build runs inside
      // the one-row-group scan task (cpu_share 1.5 measured). The
      // groupBy below reuses this distribution, so no exchange is added.
      .repartition(lineitem.sparkSession.sparkContext.defaultParallelism,
        col("item_category"))
      .groupBy(col("item_category"))
      .agg(count(lit(1)).as("n_lines"),
        expr("percentile(uc, 0.25)").as("c25"),
        expr("percentile(uc, 0.5)").as("c50"),
        expr("percentile(uc, 0.75)").as("c75"),
        expr("percentile(uc, 0.9)").as("c90"))
      .filter(col("c50") > 0)
      .select(col("item_category"), col("n_lines"),
        round(col("c25") / lit(100.0), 6).as("p25"),
        round(col("c50") / lit(100.0), 6).as("p50"),
        round(col("c75") / lit(100.0), 6).as("p75"),
        round(col("c90") / lit(100.0), 6).as("p90"),
        round(col("c90") / col("c50"), 6).as("premium_index"))

  /** Market Lorenz curve: users ranked by lifetime revenue into
    * deciles (NTILE with user-id tie-break), each decile's user count,
    * revenue share, and cumulative share — the curve whose area gap is
    * [[revenueGini]]'s coefficient, at market level. The unpartitioned
    * NTILE window runs at user-mart cardinality (the q42 judgment);
    * cumulative sums ride exact longs. */
  /** Hill tail-index estimate of the order-revenue distribution — the
    * heavy-tail diagnostic behind every "whales dominate" claim the
    * concentration tier (Gini∕HHI∕Lorenz) makes descriptively: over
    * the top k order totals, α̂ = k ∕ Σᵢ ln(xᵢ∕x₍ₖ₊₁₎); α < 2 means
    * infinite variance (sample means never stabilize), α < 1 infinite
    * MEAN — the difference decides whether per-user spend aggregates
    * can be trusted at all. Reported at a k-SWEEP (the Hill plot's
    * standard stability check): a stable α̂ across k is credible, a
    * drifting one says the tail is not yet power-law.
    *
    * Exactness: order totals are exact cents; the top-(kmax+1) cut is
    * a distributed TakeOrdered with id tie-break; each ln ratio
    * quantizes 1e-9 before the exact sum; α̂ is a half-up micro ratio
    * in decimal. The rank window runs on ≤ kmax+1 rows AFTER the
    * TakeOrdered (the q96 bounded-input pattern).
    *
    * Scale shape: one order-grain hash aggregate, one TakeOrdered,
    * then constant-size arms. */
  def hillTailIndex(
      orderRevenue: DataFrame, ks: Seq[Int] = Seq(100, 250, 500)): DataFrame = {
    val dec = "decimal(38,0)"
    val kmax = ks.max
    val top = orderRevenue.groupBy(col("order_id"))
      .agg(sum(round(col("total_revenue") * 10000).cast("long")).as("cents"))
      .orderBy(col("cents").desc, col("order_id")).limit(kmax + 1)
      .withColumn("rk", row_number().over(org.apache.spark.sql.expressions
        .Window.orderBy(col("cents").desc, col("order_id"))))
      // every k arm reads the same bounded mart
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.CacheLifecycle.unpersistAfterNextAction(top)
    ks.map { k =>
      val thr = top.filter(col("rk") === k + 1).select(col("cents").as("xk"))
      val arm = top.filter(col("rk") <= k).crossJoin(broadcast(thr))
        .select(col("xk"),
          round(log(col("cents").cast("double") / col("xk")) * 1e9)
            .cast("long").as("t"))
        .groupBy(col("xk")).agg(sum(col("t")).as("s"))
        .select(lit(k.toLong).as("k"), (col("xk") / 1e4).as("x_threshold"),
          when(col("s") > 0,
            expr(s"""((cast($k as $dec) * 1000000000 * 1000000 * 2 + s)
                     div (s * 2))""").cast("double") / 1e6)
            .as("hill_alpha"))
      // With fewer than k+1 distinct orders thr is empty and the arm
      // vanishes; a sweep consumer then can't tell "not computable" from
      // "not requested". Left-join against a literal one-row k spine so
      // every requested k emits a row (NULL alpha = not computable).
      val spine = orderRevenue.sparkSession.range(1)
        .select(lit(k.toLong).as("k"))
      spine.join(arm, Seq("k"), "left")
        .select(col("k"), col("x_threshold"), col("hill_alpha"))
    }.reduce(_ unionByName _).orderBy(col("k"))
  }

  /** Monthly Laspeyres ∕ Paasche ∕ Fisher price indices over the part
    * basket — the economics readout the revenue trend tiers cannot
    * give: is revenue moving because PRICES moved or because the
    * BASKET moved? Matched-sample form (parts sold in both the base
    * month and month t — the standard practical choice, documented):
    * L_t = Σpₜq₀∕Σp₀q₀ holds the base basket fixed, P_t = Σpₜqₜ∕Σp₀qₜ
    * holds the current one, Fisher is their geometric mean (the
    * superlative index between the two substitution biases).
    *
    * Exactness: per (part, month) the unit price is the rational
    * cents∕qty of exact sums; each basket term pₜ·q₀ rounds at the
    * 1e-4-unit grain (round(centsₜ·q₀∕qtyₜ)) BEFORE the order-free
    * long sums; Σpₜqₜ and Σp₀q₀ are exactly the matched cents sums —
    * no rounding at all; L and P are half-up micro ratios, Fisher one
    * quantized sqrt.
    *
    * Scale shape: one fact-grain hash aggregate to (part, month); the
    * base-month slice is part-dimension-sized and broadcasts onto the
    * month series; per-month rollup. No window. */
  def priceIndex(lineitem: DataFrame): DataFrame = {
    val pm = lineitem
      .groupBy(col("l_partkey"),
        date_trunc("month", col("l_shipdate")).cast("date").as("m"))
      .agg(sum(round(col("l_extendedprice") * 10000).cast("long"))
          .as("cents"),
        sum(round(col("l_quantity")).cast("long")).as("qty"))
      .filter(col("qty") > 0)
      // base slice + month series both read it
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.CacheLifecycle.unpersistAfterNextAction(pm)
    val b = pm.agg(min(col("m")).as("m0"))
    val base = pm.join(broadcast(b), col("m") === col("m0"))
      .select(col("l_partkey"), col("cents").as("cents0"),
        col("qty").as("qty0"))
    pm.join(broadcast(base), Seq("l_partkey"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_matched"),
        // Laspeyres numerator: p_t * q_0 per part, 1e-4-unit rounding
        sum(round(col("cents").cast("double") * col("qty0") / col("qty"))
          .cast("long")).as("ln"),
        sum(col("cents0")).as("ld"), // p_0 q_0 = cents0 exactly
        sum(col("cents")).as("pn"), // p_t q_t = cents_t exactly
        sum(round(col("cents0").cast("double") * col("qty") / col("qty0"))
          .cast("long")).as("pd"))
      .withColumn("lq", expr(
        "((cast(ln as decimal(38,0)) * 1000000 * 2) + ld) div (ld * 2)"))
      .withColumn("pq", expr(
        "((cast(pn as decimal(38,0)) * 1000000 * 2) + pd) div (pd * 2)"))
      .select(col("m").as("month"), col("n_matched"),
        (col("lq") / 1e6).as("laspeyres"), (col("pq") / 1e6).as("paasche"),
        (round(sqrt((col("lq") / 1e6) * (col("pq") / 1e6)) * 1e6)
          .cast("long") / 1e6).as("fisher"))
      .orderBy(col("month"))
  }

  /** Theil-T inequality of restaurant revenue, DECOMPOSED by supplier
    * nation — the property [[revenueGini]] cannot offer: Theil's index
    * splits EXACTLY into between-group + within-group components
    * (T = T_b + Σ_g s_g·T_g), so the readout says how much revenue
    * inequality is "nations differ" vs "restaurants within a nation
    * differ" — the market-structure question behind the q257
    * share-of-parent tier. Per-nation rows carry the group share,
    * group Theil, and between-contribution; the three corpus totals
    * ride every row as constant columns (the q319 idiom).
    *
    * Exactness: cents exact; each (share · ln share-ratio) term is one
    * fixed double chain over exact integers quantized 1e-9 BEFORE its
    * order-free rollup (the entropy idiom); the decomposition identity
    * then holds to the quantization floor (unit-asserted ≤ 1e-6).
    *
    * Scale shape: fact → restaurant hash aggregate → broadcast
    * supplier-nation dims → nation mart; the global scalar returns
    * via broadcast. No window. */
  def theilDecomposition(
      orderRevenue: DataFrame, supplier: DataFrame,
      nation: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val rest = orderRevenue
      .groupBy(col("restaurant_id"))
      .agg(sum(round(col("total_revenue") * 10000).cast("long")).as("x"))
      .filter(col("x") > 0)
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("restaurant_id") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("x"))
    val nat = rest.groupBy(col("nation"))
      .agg(sum(col("x").cast(dec)).as("xg"), count(lit(1)).as("ng"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.CacheLifecycle.unpersistAfterNextAction(nat)
    val glob = nat.agg(sum(col("xg")).as("xx"), sum(col("ng")).as("nn"))
    val terms = rest.join(nat, Seq("nation")).crossJoin(broadcast(glob))
      .select(col("nation"),
        round(col("x").cast("double") / col("xg").cast("double")
          * log(col("x").cast("double") * col("ng")
            / col("xg").cast("double")) * 1e9).cast("long").as("tgv"),
        round(col("x").cast("double") / col("xx").cast("double")
          * log(col("x").cast("double") * col("nn")
            / col("xx").cast("double")) * 1e9).cast("long").as("ttv"))
      .groupBy(col("nation"))
      .agg(sum(col("tgv")).as("tgq"), sum(col("ttv")).as("ttq"))
    val perNat = nat.join(terms, Seq("nation")).crossJoin(broadcast(glob))
      .withColumn("tbv", round(col("xg").cast("double")
        / col("xx").cast("double")
        * log(col("xg").cast("double") * col("nn")
          / col("xx").cast("double") / col("ng")) * 1e9).cast("long"))
      .withColumn("twv", round(col("xg").cast("double")
        / col("xx").cast("double") * (col("tgq") / 1e9) * 1e9).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.CacheLifecycle.unpersistAfterNextAction(perNat)
    val tots = perNat.agg(sum(col("ttq")).as("t_tot"),
      sum(col("tbv")).as("t_bet"), sum(col("twv")).as("t_wit"))
    perNat.crossJoin(broadcast(tots))
      .select(col("nation"), col("ng").as("n_restaurants"),
        expr("((xg * 1000000 * 2 + xx) div (xx * 2))").cast("double")
          ./(1e6).as("rev_share"),
        (col("tgq") / 1e9).as("theil_in_group"),
        (col("tbv") / 1e9).as("between_term"),
        (col("t_tot") / 1e9).as("t_total"),
        (col("t_bet") / 1e9).as("t_between"),
        (col("t_wit") / 1e9).as("t_within"))
      .orderBy(col("nation"))
  }

  def lorenzCurve(orderRevenue: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val users = orderRevenue
      .groupBy(col("user_id"))
      .agg(sum(round(col("total_revenue") * 10000).cast("long")).as("cents"))
    val deciled = users
      .withColumn("decile",
        ntile(10).over(Window.orderBy(col("cents").asc, col("user_id").asc)))
    val tot = users.agg(sum(col("cents")).as("total_cents"))
    deciled
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("dc"))
      .withColumn("cum_dc",
        sum(col("dc")).over(Window.orderBy(col("decile"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n_users"),
        round(col("dc").cast("double") / col("total_cents"), 6)
          .as("revenue_share"),
        round(col("cum_dc").cast("double") / col("total_cents"), 6)
          .as("cum_share"))
  }

  /** Promotional revenue share per ship month (the TPC-H Q14 shape):
    * what fraction of each month's net revenue came from parts of the
    * `promoType` type. Broadcast part dim + one month hash aggregate;
    * the share is a conditional-sum ratio of exact longs. */
  def promoShare(
      lineitem: DataFrame, part: DataFrame,
      promoType: String = "PROMO"): DataFrame =
    lineitem
      .join(broadcast(part.select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(to_date(date_trunc("month", col("l_shipdate"))).as("ship_month"))
      .agg(
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("total_cents"),
        sum(when(col("p_type") === promoType,
          round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
            .cast("long")).otherwise(0L)).as("promo_cents"))
      .filter(col("total_cents") > 0)
      .select(col("ship_month"),
        round(col("total_cents") / 100.0, 6).as("total_revenue"),
        round(col("promo_cents") / 100.0, 6).as("promo_revenue"),
        round(col("promo_cents").cast("double") / col("total_cents"), 6)
          .as("promo_share"))

  /** Category rank trajectories: each category's monthly revenue rank
    * (dense, revenue-desc with category-asc tie-break) and its
    * month-over-month rank delta (positive = climbed) — the
    * "rising star / fading line" leaderboard movement readout on top of
    * [[monthlyConcentration]]'s mix view. Integer cents throughout;
    * two partitioned windows (month for the rank, category for the
    * lag), both at month×category mart grain. */
  def categoryRankTrajectory(orderRevenue: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = orderRevenue
      .groupBy(to_date(date_trunc("month", col("creation_date"))).as("month"),
        col("item_category"))
      .agg(sum(round(col("total_revenue") * 10000).cast("long")).as("cents"))
    val rnk = Window.partitionBy(col("month"))
      .orderBy(col("cents").desc, col("item_category").asc)
    val traj = Window.partitionBy(col("item_category")).orderBy(col("month"))
    monthly
      .withColumn("rank", dense_rank().over(rnk))
      .withColumn("rank_delta",
        lag(col("rank"), 1).over(traj) - col("rank"))
      .select(col("month"), col("item_category"),
        round(col("cents") / 10000.0, 6).as("revenue"),
        col("rank"), col("rank_delta"))
  }

  def revenueGini(orderRevenue: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUser = orderRevenue
      .groupBy(col("restaurant_id"), col("user_id"))
      .agg(sum(round(col("total_revenue") * 10000).cast("long")).as("cents"))
    val asc = Window.partitionBy(col("restaurant_id"))
      .orderBy(col("cents"), col("user_id"))
    perUser
      .withColumn("i", row_number().over(asc))
      .groupBy(col("restaurant_id"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("cents")).as("sx"),
        sum(col("i") * col("cents")).as("sw"))
      .filter(col("sx") > 0)
      .select(
        col("restaurant_id"), col("n_users"),
        round(col("sx") / 10000.0, 6).as("revenue"),
        round(
          (lit(2.0) * col("sw")) / (col("n_users").cast("double") * col("sx"))
            - (col("n_users") + lit(1.0)) / col("n_users"), 6).as("gini"))
  }

  /** Herfindahl-Hirschman revenue concentration per restaurant across
    * categories, with the effective-category count 1/HHI — the
    * diversity audit (a restaurant at HHI 1.0 sells one thing; the same
    * metric over training SOURCES is the mix-balance check a data plan
    * publishes next to its [[graft.ext.Curation.temperatureMixPlan]]).
    *
    * Exactness without float-order risk: HHI = Σ sᵢ² = Σ dᵢ² / (Σ dᵢ)²
    * where dᵢ are exact integer dollars per (restaurant, category) —
    * BOTH sums are order-free longs, and the division is one double op.
    * Dollar units keep Σ d² inside int64 (cents² would overflow by 1e8).
    *
    * Shape: two stacked hash aggregates, fact → (restaurant, category)
    * → restaurant grain; nothing else. */
  def revenueConcentration(orderRevenue: DataFrame): DataFrame =
    orderRevenue
      .groupBy(col("restaurant_id"), col("item_category"))
      // plain `div`: Spark `div` and DuckDB integer `//` both truncate
      // toward zero (DuckDB floors only float `//`)
      .agg(expr("sum(cast(round(total_revenue * 10000) as long)) div 10000")
        .as("d"))
      .groupBy(col("restaurant_id"))
      .agg(count(lit(1)).as("n_categories"),
        sum(col("d")).as("sd"),
        sum(col("d") * col("d")).as("sd2"))
      .filter(col("sd") > 0)
      .select(col("restaurant_id"), col("n_categories"),
        round(col("sd2").cast("double") / (col("sd") * col("sd")).cast("double"), 6)
          .as("hhi"),
        round((col("sd") * col("sd")).cast("double") / col("sd2"), 6)
          .as("effective_categories"))
}
