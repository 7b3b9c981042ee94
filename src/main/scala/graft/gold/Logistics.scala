package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Supplier-accountability and customer-outreach reports — the last
  * four classic decision-support shapes (TPC-H Q12/Q20/Q21/Q22),
  * adapted to the columns this star actually carries (no shipmode /
  * commitdate / partsupp / phone in the testdata): the JOIN and
  * SUBQUERY structure is the point of each shape, so each report keeps
  * it exactly while substituting an available attribute for the
  * missing one. Extends [[Fulfillment]]'s tier; same discipline — one
  * fact-side shuffle per report, dims broadcast, integer cents, total
  * orders on every output.
  *
  * Reference scope note: the reference never runs these
  * (`scripts/cdc_metrics_job_gold.py` stops at its restaurant marts);
  * they widen the engine's query surface like [[Geography]] (Q7/Q8)
  * and [[Fulfillment]] (Q3–Q19) did.
  */
object Logistics {

  private def netCents: Column = Money.lineNetCents

  /** Service-level matrix (Q12 shape): per shipping-delay band, how
    * many lines belonged to critical-priority orders vs the rest —
    * Q12's CASE-conditional count over a fact⨝fact join, with the
    * order-to-ship delay band standing in for the missing `l_shipmode`
    * as the low-cardinality group. Lines restricted to one ship year
    * (scan-tight, pushed to the parquet scan).
    *
    * Shape: lineitem⨝orders on orderkey is the ONE shuffle; the band
    * derives post-join from both sides' dates; one hash aggregate with
    * two conditional sums — no second pass per priority class. */
  def serviceLevelMatrix(
      lineitem: DataFrame, orders: DataFrame, shipYear: Int,
      criticalPriorities: Seq[String] = Seq("1-URGENT", "2-HIGH"))
      : DataFrame = {
    // range form, not year(col) === shipYear: a function of the column
    // cannot push into the parquet scan; the half-open range prunes
    // row groups (same predicate the PlanSpec-asserted siblings use)
    val li = lineitem.filter(
        col("l_shipdate") >= lit(s"$shipYear-01-01") &&
        col("l_shipdate") < lit(s"${shipYear + 1}-01-01"))
      .select(col("l_orderkey"), col("l_shipdate"))
    val o = orders.select(col("o_orderkey"), col("o_orderdate"),
      col("o_orderpriority"))
    val delay = datediff(col("l_shipdate"), col("o_orderdate"))
    // the synthetic generator emits ship dates BEFORE the order date;
    // they get their own band instead of silently riding "00-30d"
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(
        when(delay < 0, "pre-order")
          .when(delay <= 30, "00-30d").when(delay <= 60, "31-60d")
          .when(delay <= 90, "61-90d").otherwise("90d+").as("delay_band"),
        col("o_orderpriority"))
      .groupBy(col("delay_band"))
      .agg(
        sum(when(col("o_orderpriority").isin(criticalPriorities: _*), 1L)
          .otherwise(0L)).as("critical_lines"),
        sum(when(col("o_orderpriority").isin(criticalPriorities: _*), 0L)
          .otherwise(1L)).as("routine_lines"))
      .orderBy(col("delay_band"))
  }

  /** Dominant suppliers (Q20 shape): suppliers who shipped a MAJORITY
    * share (> num/den) of some part's total shipped quantity within a
    * year, for parts of one catalog type — Q20's aggregate-subquery
    * semi-join ("suppliers having more than half the stock"), with
    * shipped quantity standing in for the missing partsupp
    * availability. Output one row per qualifying supplier: how many
    * parts they dominate, their name and nation.
    *
    * Shape: the fact aggregates once to (part, supplier) grain WITH
    * map-side combine (the full-volume shuffle moves partial sums, not
    * lines); the per-part total is a window over that grain — its
    * re-exchange moves only the already-aggregated rows, asymptotically
    * cheaper than pre-partitioning the raw fact by part would be. The
    * share test is an exact integer cross-multiply (qty·den > tot·num —
    * never a double division); the supplier dim joins broadcast AFTER
    * the rare-by-construction filter. */
  def dominantSuppliers(
      lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
      nation: DataFrame, partType: String, shipYear: Int,
      shareNum: Int = 1, shareDen: Int = 2): DataFrame = {
    val pk = part.filter(col("p_type") === partType).select(col("p_partkey"))
    val grain = lineitem.filter(
        col("l_shipdate") >= lit(s"$shipYear-01-01") &&
        col("l_shipdate") < lit(s"${shipYear + 1}-01-01"))
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_quantity")).cast("long").as("qty"))
      .join(broadcast(pk), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("qty")).as("qty"))
    val perPart = Window.partitionBy(col("l_partkey"))
    val sn = supplier.select(col("s_suppkey"), col("s_name"),
        col("s_nationkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name").as("nation"))
    grain
      .withColumn("tot", sum(col("qty")).over(perPart))
      .filter(col("qty") * shareDen > col("tot") * shareNum)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_parts_dominated"),
        sum(col("qty")).as("dominated_qty"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("nation"),
        col("n_parts_dominated"), col("dominated_qty"))
      .orderBy(col("n_parts_dominated").desc, col("s_suppkey"))
  }

  /** Sole-blame late suppliers (Q21 shape): suppliers who were the
    * ONLY late shipper on a multi-supplier order — Q21's
    * EXISTS(another supplier) AND NOT EXISTS(another LATE supplier)
    * pair, re-expressed as counts on one grouped pass instead of two
    * correlated subqueries (each EXISTS is a predicate on the order's
    * supplier-grain counts: n_suppliers ≥ 2 ∧ n_late_suppliers = 1).
    * "Late" = shipped more than `lateDays` after the order date,
    * standing in for the missing receipt/commit dates. Top `k` by
    * blame count, ties broken by supplier key.
    *
    * Shape: lineitem⨝orders on orderkey (the one full-volume fact
    * shuffle), then an aggregate to (order, supplier) grain with a
    * late flag — map-side combined — and the two EXISTS counts as a
    * window over that grain (its re-exchange moves only the
    * aggregated rows); the blame rows filter BEFORE the broadcast
    * supplier lookup. */
  def soleBlameLateSuppliers(
      lineitem: DataFrame, orders: DataFrame, supplier: DataFrame,
      lateDays: Int = 60, k: Int = 20): DataFrame = {
    val o = orders.select(col("o_orderkey"), col("o_orderdate"))
    val osGrain = lineitem
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(
        (datediff(col("l_shipdate"), col("o_orderdate")) > lateDays)
          .cast("long")).as("late"))
    val perOrder = Window.partitionBy(col("l_orderkey"))
    osGrain
      .withColumn("n_suppliers", count(lit(1)).over(perOrder))
      .withColumn("n_late", sum(col("late")).over(perOrder))
      .filter(col("late") === 1L && col("n_suppliers") >= 2 &&
        col("n_late") === 1L)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(k)
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
  }

  /** Idle high-value customers (Q22 shape): customers whose account
    * balance exceeds the average POSITIVE balance yet who have placed
    * no order since `sinceDate` — Q22's scalar-subquery threshold +
    * NOT EXISTS anti-join, grouped by nation (standing in for the
    * missing phone country code) and windowed on recency because this
    * star's every customer has SOME lifetime order (a never-ordered
    * filter would be vacuously empty — the window keeps the anti-join
    * load-bearing). Output per nation: customer count and their total
    * balance — the dormant-capital outreach list.
    *
    * Shape: the threshold is a one-row aggregate broadcast back onto
    * the dim (the scalar-broadcast idiom); the NOT EXISTS is a
    * LEFT ANTI join against the date-filtered orders key projection
    * (filter pushed to the scan); balances ride exact integer cents
    * (the threshold compare cross-multiplies cents·count — no double
    * until the output edge). */
  def idleHighValueCustomers(
      customer: DataFrame, orders: DataFrame, nation: DataFrame,
      sinceDate: String): DataFrame = {
    val cents = round(col("c_acctbal") * 100).cast("long")
    val cust = customer.select(col("c_custkey"), col("c_nationkey"),
      cents.as("bal_cents"))
    val thr = cust.filter(col("bal_cents") > 0L)
      .agg(sum(col("bal_cents")).as("pos_cents"),
        count(lit(1)).as("n_pos"))
    cust
      .crossJoin(broadcast(thr))
      .filter(col("bal_cents") * col("n_pos") > col("pos_cents"))
      .join(orders.filter(col("o_orderdate") >= lit(sinceDate))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("bal_cents")).as("bc"))
      .select(col("nation"), col("numcust"),
        (col("bc") / 100.0).as("total_acctbal"))
      .orderBy(col("nation"))
  }
}
