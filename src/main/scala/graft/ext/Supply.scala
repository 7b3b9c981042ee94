package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supply-chain / procurement analytics over the raw star schema —
  * the classic decision-support join shapes (min-cost sourcing,
  * late-shipment audits, inventory-importance screens, dormant-account
  * sweeps) the conformed marts don't cover. Engine extension beyond the
  * reference surface (the reference's gold tier stops at order-side
  * marts, `scripts/cdc_metrics_job_gold.py`); these add the
  * supplier/part side of the same star.
  *
  * Scale notes (100 TB): every function below does exactly one
  * fact-side shuffle — a hash aggregate keyed by (part, supplier) or
  * order key — followed by dimension joins that are always
  * `broadcast()` (part/supplier/nation/region are orders of magnitude
  * smaller than lineitem). Money is integer cents end-to-end; doubles
  * appear only in final per-row ratios of already-exact integers, so
  * results are bit-reproducible across engines and partitionings.
  */
object Supply {

  /** Min-cost supplier per part (the TPC-H Q2 shape without partsupp:
    * the effective unit price is observed from order lines). Per
    * (part, supplier) the unit price is Σ net cents / Σ quantity; the
    * winner per part is the lowest rounded unit price, ties broken by
    * supplier key. One (part,supplier) hash aggregate, one window over
    * part, then broadcast dim joins — no fact-fact shuffle. */
  def minCostSupplier(
      lineitem: DataFrame,
      supplier: DataFrame,
      nation: DataFrame,
      region: DataFrame): DataFrame = {
    val perPair = lineitem
      .groupBy(col("l_partkey").as("p_partkey"), col("l_suppkey").as("best_suppkey"))
      .agg(
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("net_cents"),
        sum(col("l_quantity").cast("long")).as("qty"),
        count(lit(1)).as("n_lines"))
      // exact half-up 6-dp dollars via integer micro-units — a plain
      // round() on the double ratio diverges from the oracle when the
      // rational lands exactly on a .5e-6 boundary (seen at sf0.1)
      .withColumn("unit_price",
        expr("((net_cents * 10000 * 2 + qty) div (qty * 2)) / cast(1000000 as double)"))
    val win = Window.partitionBy(col("p_partkey"))
      .orderBy(col("unit_price").asc, col("best_suppkey").asc)
    val dims = supplier
      .join(nation, supplier("s_nationkey") === nation("n_nationkey"))
      .join(region, nation("n_regionkey") === region("r_regionkey"))
      .select(col("s_suppkey"), col("s_name").as("supplier_name"),
        col("n_name").as("nation"), col("r_name").as("region"))
    perPair
      .withColumn("rn", row_number().over(win))
      .filter(col("rn") === 1)
      .join(broadcast(dims), col("best_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("best_suppkey"), col("supplier_name"),
        col("nation"), col("region"), col("unit_price"), col("n_lines"))
  }

  /** Late-shipment audit per order priority (the TPC-H Q4 EXISTS
    * shape): an order is late-shipped when ANY of its lines shipped
    * more than `graceDays` after the order date. The EXISTS collapses
    * to a per-order max(flag) aggregate on the join, then a left join
    * back to the full order population so zero-line orders count in
    * the denominator. */
  def latePriorityAudit(
      orders: DataFrame, lineitem: DataFrame, graceDays: Int): DataFrame = {
    val flags = lineitem.select(col("l_orderkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey").as("k"))
      .agg(max((col("l_shipdate") >
          col("o_orderdate") + expr(s"INTERVAL $graceDays DAYS")).cast("int"))
        .as("late"))
    orders.select(col("o_orderkey"), col("o_orderpriority"))
      .join(flags, col("o_orderkey") === col("k"), "left_outer")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(coalesce(col("late"), lit(0)).cast("long")).as("n_late_ship"))
      .withColumn("late_share",
        expr("((n_late_ship * 1000000 * 2 + n_orders) div (n_orders * 2)) / cast(1000000 as double)"))
  }

  /** Important-stock screen per brand (the TPC-H Q11 HAVING-share
    * shape): parts whose net revenue share WITHIN their brand is at
    * least `multipleTenths`/10 × the brand's average part share — a
    * self-scaling cutoff (a fixed percent empties as parts-per-brand
    * grows with SF). The filter is the exact integer
    * cross-multiplication part_cents · n_parts · 10 ≥
    * multipleTenths · brand_cents; no floating threshold. One part hash
    * aggregate + a brand window (mart-sized: one row per part). */
  def importantStock(
      lineitem: DataFrame, part: DataFrame, multipleTenths: Int): DataFrame = {
    val perPart = lineitem
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")).as("part_cents"))
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
    val brandWin = Window.partitionBy(col("p_brand"))
    perPart
      .withColumn("brand_cents", sum(col("part_cents")).over(brandWin))
      .withColumn("n_parts", count(lit(1)).over(brandWin))
      .filter(col("part_cents") * col("n_parts") * 10 >=
        col("brand_cents") * multipleTenths)
      .select(col("p_brand"), col("p_partkey"),
        round(col("part_cents") / lit(100.0), 6).as("revenue"),
        round(col("part_cents").cast("double") / col("brand_cents"), 6)
          .as("share"))
  }

  /** Small-quantity revenue per brand (the TPC-H Q17 correlated-scalar
    * shape, decorrelated to a window): lines whose quantity is below
    * half the part's average quantity, aggregated to brand with the
    * brand's total for context. The per-part average is an exact
    * integer ratio (quantities are integral), so the `< 0.5·avg`
    * comparison is bit-stable across engines. */
  def smallQuantityRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val partWin = Window.partitionBy(col("l_partkey"))
    val flagged = lineitem
      .select(col("l_partkey"),
        col("l_quantity").cast("long").as("qty"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long").as("net_cents"))
      .withColumn("sum_qty", sum(col("qty")).over(partWin))
      .withColumn("n_qty", count(lit(1)).over(partWin))
      .withColumn("is_small",
        (col("qty").cast("double") <
          col("sum_qty").cast("double") / col("n_qty") * 0.5).cast("int"))
    flagged
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("is_small").cast("long")).as("n_small"),
        sum(when(col("is_small") === 1, col("net_cents")).otherwise(0L))
          .as("small_cents"),
        sum(col("net_cents")).as("brand_cents"))
      .select(col("p_brand"), col("n_lines"), col("n_small"),
        round(col("small_cents") / lit(100.0), 6).as("small_revenue"),
        round(col("small_cents").cast("double") / col("brand_cents"), 6)
          .as("small_share"))
  }

  /** Dormant high-balance sweep per market segment (the TPC-H Q22
    * shape): customers whose account balance exceeds the population's
    * average positive balance AND who placed no order within
    * `dormantDays` of the dataset's last order date. Both scalars
    * (average balance, max date) are tiny aggregates broadcast via
    * cross join; the balance compare is exact integer
    * cross-multiplication (bal·n > Σbal), no floating threshold. */
  def dormantHighValue(
      customer: DataFrame, orders: DataFrame, dormantDays: Int): DataFrame = {
    val bal = customer.select(round(col("c_acctbal") * 100).cast("long").as("b"))
      .filter(col("b") > 0)
      .agg(sum(col("b")).as("sum_b"), count(lit(1)).as("n_b"))
    val horizon = orders.agg(max(col("o_orderdate")).as("max_date"))
    val recent = orders
      .join(broadcast(horizon))
      .filter(col("o_orderdate") >
        col("max_date") - expr(s"INTERVAL $dormantDays DAYS"))
      .select(col("o_custkey")).distinct()
    customer
      .join(broadcast(bal))
      .filter(round(col("c_acctbal") * 100).cast("long") * col("n_b") > col("sum_b"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_dormant"),
        sum(round(col("c_acctbal") * 100).cast("long")).as("bal_cents"))
      .select(col("c_mktsegment"), col("n_dormant"),
        round(col("bal_cents") / lit(100.0), 6).as("total_balance"),
        expr("((bal_cents * 10000 * 2 + n_dormant) div (n_dormant * 2)) / cast(1000000 as double)")
          .as("avg_balance"))
  }

  /** Order-to-ship latency distribution per order month: exact
    * interpolated p50/p90/p99 of the ship delay in days, plus the mean
    * as an exact micro-unit ratio — the fulfillment SLA readout. One
    * fact-fact join on the order key, one month hash aggregate; the
    * percentiles interpolate over integer day counts (exact halves /
    * tenths, engine-stable). */
  def shipLatency(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        to_date(date_trunc("month", col("o_orderdate"))).as("order_month"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("lat"))
      .groupBy(col("order_month"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("lat")).as("sl"),
        expr("percentile(lat, 0.5)").as("p50"),
        expr("percentile(lat, 0.9)").as("p90"),
        expr("percentile(lat, 0.99)").as("p99"))
      .select(col("order_month"), col("n_lines"),
        expr("((sl * 1000000 * 2 + n_lines) div (n_lines * 2)) " +
          "/ cast(1000000 as double)").as("mean_days"),
        round(col("p50"), 6).as("p50"),
        round(col("p90"), 6).as("p90"),
        round(col("p99"), 6).as("p99"))

  /** Supplier reliability league: per-supplier late-line rate with a
    * Wilson score lower bound (z = 1.96) so low-volume suppliers don't
    * top the offender list on one bad line (the TPC-H Q21 intent with
    * defensible statistics). Late = shipped more than `graceDays` after
    * the order date. One fact-fact join on the order key (both sides
    * hashed on it), one supplier hash aggregate, broadcast name join.
    * The bound is computed from exact integer (n, late) pairs with a
    * fixed expression shape, mirrored verbatim in the SQL oracle. */
  def supplierReliability(
      lineitem: DataFrame, orders: DataFrame, supplier: DataFrame,
      graceDays: Int): DataFrame = {
    val perSupp = lineitem.select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_suppkey"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum((col("l_shipdate") >
            col("o_orderdate") + expr(s"INTERVAL $graceDays DAYS")).cast("long"))
          .as("n_late"))
    val z = lit(1.96)
    val n = col("n_lines").cast("double")
    val p = col("n_late").cast("double") / n
    val wilson =
      (p + z * z / (n * 2) -
        z * sqrt(p * (lit(1) - p) / n + z * z / (n * n * 4))) /
        (lit(1) + z * z / n)
    perSupp
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_lines"), col("n_late"),
        expr("((n_late * 1000000 * 2 + n_lines) div (n_lines * 2)) / cast(1000000 as double)")
          .as("late_rate"),
        round(wilson, 6).as("wilson_lb"))
  }

  /** ABC/XYZ inventory classification — the planner's 3×3 screen:
    * ABC = cumulative-revenue-share class (A ≤ 80%, B ≤ 95%, C rest,
    * sorted by part revenue descending), XYZ = demand-variability
    * class from the coefficient of variation of monthly shipped
    * quantity (X < 0.5, Y < 1.0, Z otherwise). Emitted at class grain
    * (≤ 9 rows): part count and the class's revenue share.
    *
    * Exactness: the ABC boundaries are INTEGER inequalities on exact
    * cent sums — cum ≤ 0.80·tot is 5·cum ≤ 4·tot, cum ≤ 0.95·tot is
    * 20·cum ≤ 19·tot — no float threshold anywhere near the boundary;
    * the cumulative order is total (revenue desc, part key asc) so tie
    * runs are deterministic. CV is one double chain from exact
    * (months, Σq, Σq²) integers against 0.5/1.0 literals; a
    * single-month part has no sample variance and classes Z.
    *
    * Shape: one fact-side hash aggregate to (part, month), rolled up
    * to part grain; the cumulative window is UNPARTITIONED but runs at
    * part grain — dimension-sized by construction (parts ≪ lines;
    * at 100 TB the part dimension is still single-digit millions).
    * Parts never shipped have no demand signal and are out of scope
    * (left-join them as class (C, Z) downstream if needed). */
  def abcXyz(lineitem: DataFrame, part: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = lineitem
      .groupBy(col("l_partkey"),
        trunc(col("l_shipdate"), "month").as("mth"))
      .agg(
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100).cast("long")).as("cents"),
        sum(round(col("l_quantity")).cast("long")).as("qty"))
    val perPart = monthly.groupBy(col("l_partkey"))
      .agg(sum(col("cents")).as("cents"), count(lit(1)).as("m"),
        sum(col("qty")).as("sq"), sum(col("qty") * col("qty")).as("sqq"))
    val w = Window.orderBy(col("cents").desc, col("l_partkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = perPart.agg(sum(col("cents")).as("tot"))
    val md = col("m").cast("double")
    val mean = col("sq").cast("double") / md
    val varS = (md * col("sqq").cast("double")
      - col("sq").cast("double") * col("sq").cast("double")) /
      (md * (md - lit(1.0)))
    val cv = sqrt(varS) / mean
    val classed = perPart
      .withColumn("cum", sum(col("cents")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("abc_class",
        when(col("cum").cast("decimal(38,0)") * 5
          <= col("tot").cast("decimal(38,0)") * 4, "A")
          .when(col("cum").cast("decimal(38,0)") * 20
            <= col("tot").cast("decimal(38,0)") * 19, "B")
          .otherwise("C"))
      .withColumn("xyz_class",
        when(col("m") <= 1 || col("sq") === 0, "Z")
          .when(cv < 0.5, "X").when(cv < 1.0, "Y").otherwise("Z"))
    classed.groupBy(col("abc_class"), col("xyz_class"))
      .agg(count(lit(1)).as("n_parts"), sum(col("cents")).as("class_cents"))
      .crossJoin(broadcast(tot))
      .select(col("abc_class"), col("xyz_class"), col("n_parts"),
        round(col("class_cents").cast("double") / col("tot"), 6)
          .as("revenue_share"))
  }

  /** Order aging buckets per priority — the receivables-style aging
    * report: each order's age is days from its order date to the
    * data-derived anchor (max order date — never the wall clock),
    * bucketed 0–30 / 31–90 / 91–365 / 365+. Emits (priority, bucket)
    * rows with order count and exact total value.
    *
    * Shape: a 1-row anchor aggregate broadcast back, then one hash
    * aggregate of the orders table; bucket labels carry a numeric
    * sort key so consumers keep chronological order without parsing
    * labels. All integer arithmetic — nothing to drift. */
  def orderAging(orders: DataFrame): DataFrame = {
    val anchor = orders.agg(max(col("o_orderdate")).as("today"))
    orders.crossJoin(broadcast(anchor))
      .withColumn("age", datediff(col("today"), col("o_orderdate")))
      .withColumn("bucket_id",
        when(col("age") <= 30, 0).when(col("age") <= 90, 1)
          .when(col("age") <= 365, 2).otherwise(3))
      .groupBy(col("o_orderpriority"), col("bucket_id"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .select(col("o_orderpriority"), col("bucket_id"),
        when(col("bucket_id") === 0, "0-30").when(col("bucket_id") === 1, "31-90")
          .when(col("bucket_id") === 2, "91-365").otherwise("365+")
          .as("age_bucket"),
        col("n_orders"), (col("cents") / lit(100.0)).as("total_value"))
  }

  /** Safety stock and reorder point per brand under the classic
    * normal-demand model: SS = z·σ_daily·√L, ROP = μ_daily·L + SS,
    * with σ/μ estimated from OBSERVED shipping days (zero-demand days
    * carry no row in the fact — document the convention; the
    * alternative needs a calendar spine). z defaults to the 95%
    * service level; the 17-significant-digit literal is shared with
    * the SQL mirror so both engines parse the identical double.
    *
    * Exactness: daily quantities are exact longs; mean and sample
    * variance come from (days, Σq, Σq²) integer moments; the √ and
    * the two-term ROP are fixed IEEE chains, 6dp. Shape: two hash
    * aggregates (fact → (brand, day) → brand) and a broadcast dim
    * join — no window, no fact-fact shuffle. */
  def safetyStock(
      lineitem: DataFrame, part: DataFrame,
      z: Double = 1.6448536269514722, leadDays: Int = 7): DataFrame = {
    val p = part.select(col("p_partkey"), col("p_brand"))
    val daily = lineitem
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("l_shipdate").cast("date").as("ship_day"))
      .agg(sum(round(col("l_quantity")).cast("long")).as("q"))
    val m = daily.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_days"), sum(col("q")).as("sq"),
        sum(col("q") * col("q")).as("sqq"))
    val nd = col("n_days").cast("double")
    val mean = col("sq").cast("double") / nd
    val varS = (nd * col("sqq").cast("double")
      - col("sq").cast("double") * col("sq").cast("double")) /
      (nd * (nd - lit(1.0)))
    val ss = lit(z) * sqrt(varS) * sqrt(lit(leadDays.toDouble))
    m.filter(col("n_days") > 1)
      .select(col("p_brand"), col("n_days"),
        round(mean, 6).as("mean_daily_qty"),
        round(sqrt(varS), 6).as("sigma_daily"),
        round(ss, 6).as("safety_stock"),
        round(mean * lit(leadDays.toDouble) + ss, 6).as("reorder_point"))
  }

  /** Syntetos–Boylan demand-pattern classification: each part lands in
    * the smooth / intermittent / erratic / lumpy quadrant from its
    * average inter-demand interval (ADI = active-span days ∕ demand
    * days) and its demand-size CV² — the screen that decides WHICH
    * forecasting model applies before [[safetyStock]]'s normal model
    * is trusted (intermittent/lumpy demand wants Croston-family
    * methods, not a mean±σ). Reported compactly per (brand, class).
    *
    * Exactness — the defining property here: BOTH boundary tests are
    * integer cross-multiplies of exact counts, so classification never
    * touches a double: ADI ≥ 1.32 ⇔ span·100 ≥ 132·n_d, and
    * CV² ≥ 0.49 ⇔ 100·n·(n·Σq²−(Σq)²) ≥ 49·(n−1)·(Σq)² with the
    * products in decimal(38,0) (Σq² passes int64 at ~3e9 demand
    * days·qty²). Literature thresholds 1.32∕0.49 ride as the integer
    * pairs (132,100)∕(49,100). Single-demand-day parts (CV²
    * undefined) emit their own `one-shot` class rather than a NULL
    * or an arbitrary quadrant.
    *
    * Shape: one fact aggregate to (part, day) grain, one to part
    * grain, one to the (brand, class) mart — all hash aggregates,
    * dims broadcast. */
  def demandClasses(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val p = part.select(col("p_partkey"), col("p_brand"))
    val daily = lineitem
      .groupBy(col("l_partkey"), col("l_shipdate").cast("date").as("d"))
      .agg(sum(round(col("l_quantity")).cast("long")).as("q"))
    val per = daily.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("nd"),
        (datediff(max(col("d")), min(col("d"))) + 1).cast("long").as("span"),
        sum(col("q")).as("sq"),
        sum(col("q").cast(dec) * col("q")).as("sqq"))
    val adiHigh = col("span") * 100L >= col("nd") * 132L
    val cvHigh = (lit(100).cast(dec) * col("nd")
      * (col("nd").cast(dec) * col("sqq")
         - col("sq").cast(dec) * col("sq"))) >=
      (lit(49).cast(dec) * (col("nd") - 1)
        * (col("sq").cast(dec) * col("sq")))
    per
      .withColumn("demand_class",
        when(col("nd") === 1, "one-shot")
          .when(!adiHigh && !cvHigh, "smooth")
          .when(adiHigh && !cvHigh, "intermittent")
          .when(!adiHigh && cvHigh, "erratic")
          .otherwise("lumpy"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("demand_class"))
      .agg(count(lit(1)).as("n_parts"), sum(col("sq")).as("total_qty"))
      .orderBy(col("p_brand"), col("demand_class"))
  }

  /** Croston's method per part — the forecaster [[demandClasses]]
    * prescribes for its intermittent/lumpy quadrants, where a plain
    * EWMA of the zero-filled series systematically lags: smooth the
    * demand SIZES (z) and the inter-demand INTERVALS (p) as two
    * separate exponential averages over demand EVENTS only, and
    * forecast demand-per-day as z∕p. Initialization is the standard
    * one (z₁ = first size; p seeds on the SECOND event with the first
    * observed interval — one event gives no interval and a NULL
    * forecast).
    *
    * Exactness: the recurrence is a sequential fixed IEEE chain per
    * part (α = ⅛, binary-exact), run in-partition after a partkey
    * repartition + in-partition sort, and mirrored event-for-event by
    * the oracle's recursive CTE — the [[Timeseries.ewmaForecast]]
    * device. The final per-part state is the max-by-event struct
    * aggregate (event index is unique per part, so the max is total).
    * Shape: one fact aggregate to (part, day) grain, ONE shuffle to
    * co-locate each part's events, a linear in-partition pass, one
    * final per-part aggregate. */
  def crostonForecast(lineitem: DataFrame, alpha: Double = 0.125)
      : DataFrame = {
    val spark = lineitem.sparkSession
    import spark.implicits._
    val daily = lineitem
      .groupBy(col("l_partkey"), col("l_shipdate").cast("date").as("d"))
      .agg(sum(round(col("l_quantity")).cast("long")).as("q"))
      .select(col("l_partkey").cast("long").as("pid"), col("d"), col("q"))
      .repartition(col("pid"))
      .sortWithinPartitions(col("pid"), col("d"))
      .as[(Long, java.sql.Date, Long)]
    val states = daily.mapPartitions { it =>
      var cur = Long.MinValue
      var rn = 0L
      var z = 0.0
      var p: java.lang.Double = null
      var prev: java.sql.Date = null
      it.map { case (pid, d, q) =>
        if (pid != cur) { cur = pid; rn = 0L; p = null; prev = null }
        rn += 1
        if (rn == 1L) z = q.toDouble
        else {
          val gap = java.time.temporal.ChronoUnit.DAYS.between(
            prev.toLocalDate, d.toLocalDate).toDouble
          z = z + alpha * (q.toDouble - z)
          p = if (p == null) java.lang.Double.valueOf(gap)
              else java.lang.Double.valueOf(p + alpha * (gap - p))
        }
        prev = d
        (pid, rn, z, Option(p).map(_.doubleValue))
      }
    }.toDF("pid", "rn", "z", "p")
    states
      .groupBy(col("pid"))
      .agg(max(struct(col("rn"), col("z"), col("p"))).as("fin"))
      .select(col("pid").as("part_id"),
        col("fin.rn").as("n_demand_days"),
        round(col("fin.z"), 6).as("size_level"),
        round(col("fin.p"), 6).as("interval_level"),
        when(col("fin.p").isNotNull && col("fin.p") > 0,
          round(col("fin.z") / col("fin.p"), 6)).as("demand_per_day"))
      .orderBy(col("part_id"))
  }
}
