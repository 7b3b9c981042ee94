package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-book, returns, and pricing reports — the remaining classic
  * decision-support query shapes (TPC-H Q3/Q5/Q6/Q9/Q10/Q13/Q15/Q16/
  * Q18/Q19), re-expressed as the business reports a marketplace
  * operator runs over the same conformed star the reference's marts
  * read. The reference itself never leaves its restaurant marts
  * (`scripts/cdc_metrics_job_gold.py`); these extend the engine's
  * query surface the way [[Geography]] extended it with Q7/Q8.
  *
  * Shared discipline: ONE fact-side shuffle per report (lineitem⨝orders
  * where both sides are facts), every dimension lookup broadcast, money
  * as exact integer cents until the output edge, every top-k carrying a
  * total order (sort keys + key tiebreak) so engines can't disagree on
  * ties. Date windows are caller parameters — never the wall clock.
  */
object Fulfillment {

  private def netCents: Column = Money.lineNetCents

  /** Shipping backlog (Q3 shape): for one customer segment, the top
    * `k` orders by revenue still unshipped as of `asOf` — placed
    * before the date, with lines shipping after it. The segment
    * filter reduces customers BEFORE the join (a semi-join-shaped
    * projection); the top-k is a `TakeOrderedAndProject` — per-partition
    * partial top-k, never a global sort. */
  def shippingBacklog(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      segment: String, asOf: String, k: Int = 10): DataFrame = {
    val cust = customer.filter(col("c_mktsegment") === segment)
      .select(col("c_custkey"))
    val o = orders.filter(col("o_orderdate") < lit(asOf))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
    lineitem.filter(col("l_shipdate") > lit(asOf))
      .select(col("l_orderkey"), netCents.as("cents"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("cents")).as("cents"))
      .orderBy(col("cents").desc, col("o_orderkey"))
      .limit(k)
      .select(col("o_orderkey"), (col("cents") / 100.0).as("revenue"),
        col("o_orderdate"), col("o_orderpriority"))
  }

  /** Local-supplier volume (Q5 shape): for one region and one order
    * year, revenue shipped where the CUSTOMER's nation equals the
    * SUPPLIER's nation — how much commerce stays domestic. Customer
    * and supplier each resolve to a nation key via broadcast dims; the
    * equality filter runs after the fact join, at line grain. */
  def localSupplierVolume(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame,
      regionName: String, orderYear: Int): DataFrame = {
    val nat = nation.join(
        broadcast(region.filter(col("r_name") === regionName)
          .select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cn = customer.select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"))
    val sn = supplier.select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(nat.select(col("n_nationkey").as("snk"))),
        col("s_nationkey") === col("snk"))
      .select(col("s_suppkey"), col("s_nationkey"))
    // range form, not year(col) === orderYear: a function of the column
    // cannot push into the parquet scan; the half-open range prunes
    // row groups (same predicate the Logistics siblings PlanSpec-assert)
    val o = orders.filter(
        col("o_orderdate") >= lit(s"$orderYear-01-01") &&
        col("o_orderdate") < lit(s"${orderYear + 1}-01-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    lineitem.select(col("l_orderkey"), col("l_suppkey"), netCents.as("cents"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_lines"), sum(col("cents")).as("cents"))
      .select(col("nation"), col("n_lines"),
        (col("cents") / 100.0).as("revenue"))
  }

  /** Repricing what-if (Q6 shape): revenue that would be recovered by
    * eliminating discounts in [discLo, discHi] on small-quantity lines
    * over one year — `sum(extendedprice · discount)` under a
    * scan-tight conjunctive filter. All predicates push into the
    * parquet scan; the aggregate is one row. Exactness: price rides
    * integer cents and the 2dp discount integer percent, so each term
    * is an exact integer 1e-4-cent unit. */
  def repricingWhatIf(
      lineitem: DataFrame, yearStart: String, discLo: Double,
      discHi: Double, maxQty: Int): DataFrame =
    lineitem.filter(
        col("l_shipdate") >= lit(yearStart) &&
        col("l_shipdate") < add_months(lit(yearStart).cast("date"), 12) &&
        col("l_discount").between(discLo, discHi) &&
        col("l_quantity") < maxQty)
      .select((round(col("l_extendedprice") * 100).cast("long")
        * round(col("l_discount") * 100).cast("long")).as("u"))
      .agg(count(lit(1)).as("n_lines"), sum(col("u")).as("u"))
      .select(col("n_lines"), (col("u") / 10000.0).as("forgone_revenue"))

  /** Catalog margin by supplier nation × order year (Q9 shape, retail
    * cost basis): net revenue minus `p_retailprice · quantity` for one
    * part type — which nations profit from carrying the line. The
    * testdata has no supply-cost table, so the catalog retail price is
    * the cost basis; the join/aggregate shape is Q9's (fact⨝fact
    * shuffle, all dims broadcast, group on derived columns). */
  def catalogMarginByNation(
      lineitem: DataFrame, orders: DataFrame, part: DataFrame,
      supplier: DataFrame, nation: DataFrame, partType: String): DataFrame = {
    val p = part.filter(col("p_type") === partType)
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("retail_cents"))
    val sn = supplier.select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val o = orders.select(col("o_orderkey"),
      year(col("o_orderdate")).as("yr"))
    lineitem
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (netCents - col("retail_cents")
          * round(col("l_quantity")).cast("long")).as("margin_cents"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"), col("yr"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("margin_cents")).as("mc"))
      .select(col("nation"), col("yr"), col("n_lines"),
        (col("mc") / 100.0).as("catalog_margin"))
  }

  /** Returned-revenue triage (Q10 shape): the top `k` customers by
    * revenue on returned lines (`l_returnflag = 'R'`) for orders
    * placed in the quarter starting `quarterStart` — who to call
    * first. Total order on (revenue desc, custkey). */
  def returnsTriage(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      nation: DataFrame, quarterStart: String, k: Int = 20): DataFrame = {
    val o = orders.filter(
        col("o_orderdate") >= lit(quarterStart) &&
        col("o_orderdate") < add_months(lit(quarterStart).cast("date"), 3))
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = customer.select(col("c_custkey"), col("c_name"),
        col("c_acctbal"), col("c_nationkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
    lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), netCents.as("cents"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("cents")).as("cents"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .orderBy(col("cents").desc, col("c_custkey"))
      .limit(k)
      .select(col("c_custkey"), col("c_name"),
        (col("cents") / 100.0).as("returned_revenue"),
        col("c_acctbal"), col("n_name").as("nation"))
  }

  /** Customer order-count distribution (Q13 shape): how many customers
    * placed exactly N orders, INCLUDING the zero-order customers a
    * fact-side group-by silently drops (the left join from the
    * customer dim is the point of the shape). One priority class is
    * excluded — the "special orders" filter. */
  def orderCountHistogram(
      orders: DataFrame, customer: DataFrame,
      excludePriority: String): DataFrame = {
    val perCust = customer.select(col("c_custkey"))
      .join(orders.filter(col("o_orderpriority") =!= excludePriority)
          .select(col("o_orderkey"), col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Top supplier of a quarter (Q15 shape): supplier(s) whose revenue
    * over the 3 months from `quarterStart` equals the maximum — ties
    * KEPT, the defining subtlety of the shape. The max is a 1-row
    * aggregate broadcast back onto the supplier-grain mart (the
    * scalar-broadcast idiom), never a window over one partition. */
  def topQuarterSupplier(
      lineitem: DataFrame, supplier: DataFrame,
      quarterStart: String): DataFrame = {
    val rev = lineitem.filter(
        col("l_shipdate") >= lit(quarterStart) &&
        col("l_shipdate") < add_months(lit(quarterStart).cast("date"), 3))
      .groupBy(col("l_suppkey"))
      .agg(sum(netCents).as("cents"))
    val mx = rev.agg(max(col("cents")).as("max_cents"))
    rev.crossJoin(broadcast(mx))
      .filter(col("cents") === col("max_cents"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("cents") / 100.0).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Supplier variety (Q16 shape): how many DISTINCT suppliers have
    * shipped each (brand, type, size band), excluding one brand —
    * the assortment-breadth screen a category manager reads. The
    * distinct-supplier count is a two-level hash aggregate (dedup to
    * the (brand, type, band, supplier) grain first — never a
    * count-distinct expand over line grain). */
  def supplierVariety(
      lineitem: DataFrame, part: DataFrame,
      excludeBrand: String): DataFrame = {
    val p = part.filter(col("p_brand") =!= excludeBrand)
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        (floor(col("p_size") / 10) * 10).cast("int").as("size_band"))
    lineitem.select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("p_type"), col("size_band"),
        col("l_suppkey"))
      .distinct()
      .groupBy(col("p_brand"), col("p_type"), col("size_band"))
      .agg(count(lit(1)).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("size_band"))
  }

  /** Bulk orders (Q18 shape): orders whose total quantity exceeds
    * `minQty` — the oversized-order review queue. The HAVING filter
    * runs on the grouped fact BEFORE the customer lookup joins, so
    * only qualifying orders (rare by construction) reach the dim
    * join. Quantities are integral by data contract; they ride longs. */
  def bulkOrders(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      minQty: Long): DataFrame = {
    val big = lineitem.groupBy(col("l_orderkey"))
      .agg(sum(round(col("l_quantity")).cast("long")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    big.join(orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"), col("o_totalprice")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
  }

  /** Pricing summary report (TPC-H Q1, the canonical scan-aggregate):
    * per (returnflag, linestatus), total quantity, base price,
    * discounted price, charge (disc × (1+tax)), the three averages,
    * and the line count, over lines shipped on or before `cutoff`.
    * The shape every engine benchmarks first: ONE scan-tight filter
    * into ONE hash aggregate over a 4–6 row group domain — map-side
    * partials reduce virtually everything before the exchange.
    *
    * Exactness: quantity/money/discount ride exact integer units
    * (cents for money, 1e-2 points for the discount rate; the charge
    * rounds once per line at 1e-4 — both engines round the identical
    * double product) and the money/point sums accumulate as
    * decimal(38,0) (HUGEINT mirror) — a full-fact charge sum passes
    * int64 well inside the 100 TB tier, and the ·10000·2 average
    * products even earlier; sum_qty re-emits as long (Σqty ~ 50·rows
    * stays inside int64 at any real scale). Averages are half-up
    * micro ratios. */
  def pricingSummary(lineitem: DataFrame, cutoff: String): DataFrame = {
    val dec = "decimal(38,0)"
    lineitem.filter(col("l_shipdate") <= lit(cutoff))
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_quantity")).cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("base"),
        netCents.as("disc"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax")) * 10000).cast("long").as("charge"),
        round(col("l_discount") * 100).cast("long").as("dpts"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("count_order"),
        sum(col("qty").cast(dec)).as("sum_qty_d"),
        sum(col("base").cast(dec)).as("sb"),
        sum(col("disc").cast(dec)).as("sd"),
        sum(col("charge").cast(dec)).as("sc"),
        sum(col("dpts").cast(dec)).as("sp"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sum_qty_d").cast("long").as("sum_qty"),
        (col("sb").cast("double") / 100.0).as("sum_base_price"),
        (col("sd").cast("double") / 100.0).as("sum_disc_price"),
        (col("sc").cast("double") / 10000.0).as("sum_charge"),
        expr("(((sum_qty_d * 1000000 * 2) + count_order) " +
          "div (count_order * 2)) / cast(1000000 as double)").as("avg_qty"),
        expr("(((sb * 10000 * 2) + count_order) div (count_order * 2)) " +
          "/ cast(1000000 as double)").as("avg_price"),
        expr("(((sp * 10000 * 2) + count_order) div (count_order * 2)) " +
          "/ cast(1000000 as double)").as("avg_disc"),
        col("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** One arm of [[disjunctivePricing]]'s OR: brand + inclusive
    * quantity band + inclusive size band. */
  final case class PricingArm(
      brand: String, qtyLo: Int, qtyHi: Int, sizeLo: Int, sizeHi: Int)

  /** Disjunctive promo pricing (Q19 shape): net revenue on lines
    * matching ANY of the (brand × quantity-band × size-band) arms —
    * the OR-of-conjunctions predicate class that breaks naive
    * pushdown. The part-side disjunction (brand × size) prunes the
    * broadcast dim BEFORE the join, then the FULL per-arm conjunction
    * (including the line-side quantity band) evaluates post-join — a
    * part matching several arms' part conjuncts qualifies through
    * whichever arm its line's quantity satisfies, exactly the SQL OR
    * (a single best-arm tag would silently drop lines when two arms
    * share a brand with overlapping size bands). One row out: line
    * count + revenue. */
  def disjunctivePricing(
      lineitem: DataFrame, part: DataFrame,
      arms: Seq[PricingArm]): DataFrame = {
    def partArm(a: PricingArm) =
      col("p_brand") === a.brand && col("p_size").between(a.sizeLo, a.sizeHi)
    val partAny = arms.map(partArm).reduce(_ || _)
    val fullArm = arms.map(a => partArm(a) &&
      col("l_quantity") >= a.qtyLo && col("l_quantity") <= a.qtyHi)
      .reduce(_ || _)
    val armed = part.select(col("p_partkey"), col("p_brand"), col("p_size"))
      .filter(partAny)
    lineitem.select(col("l_partkey"), col("l_quantity"), netCents.as("cents"))
      .join(broadcast(armed), col("l_partkey") === col("p_partkey"))
      .filter(fullArm)
      .agg(count(lit(1)).as("n_lines"), sum(col("cents")).as("cents"))
      .select(col("n_lines"),
        coalesce(col("cents") / 100.0, lit(0.0)).as("revenue"))
  }
}
