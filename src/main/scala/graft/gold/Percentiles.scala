package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed percentile aggregates (the family behind the
  * reference's driver-side `pd.qcut` — SURVEY §2.5 A8 — kept fully
  * distributed here).
  *
  * Cross-engine exactness: only the MEDIAN of integral values is safely
  * bit-exact — its interpolation collapses to `(a+b)/2` over exact
  * integers. Arbitrary quantiles interpolate with a non-representable
  * fraction (`0.9·(n−1)`), where engines' formula shapes can differ in
  * the last bits; use [[Ltv.segments]]' percentile cuts (compared via
  * thresholds, not emitted) or the approx sketch tier for those. */
object Percentiles {

  /** Per-group exact median line revenue (plus line count), in exact
    * 1e-4 units. One hash-aggregate shuffle; Spark's `median` holds the
    * group's values in memory per group — at 100 TB prefer
    * `approx_percentile`, which is fixed-memory. */
  def medianLineRevenue(orderRevenue: DataFrame, groupCol: String): DataFrame =
    orderRevenue
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_lines"),
        (median(round(col("total_revenue") * 10000)) / 10000.0)
          .as("median_line_revenue"))

  /** The full analytic-ranking family over per-restaurant revenue in
    * one window pass: rank / dense_rank / percent_rank / cume_dist /
    * ntile(4). percent_rank and cume_dist are emitted rounded: their
    * defining ratios ((rank−1)/(n−1), peers/n) are identical FORMULAS
    * across engines but not exactly representable, so the 6-decimal
    * round is the same cross-engine contract the cosine operators use.
    *
    * Two orderings by necessity: the rank functions run over the VALUE
    * ordering (ties must share ranks — that is their semantics, and
    * their outputs are tie-order-invariant, hence deterministic), while
    * ntile needs a TOTAL order (tile assignment within a tie group is
    * positional, so without the id tiebreaker it would be
    * engine-arbitrary).
    *
    * The window is unpartitioned BY DESIGN — ranking is over the
    * restaurant dimension (mart-sized after the aggregate), the same
    * single-task envelope as q12's dense_rank; never run an
    * unpartitioned window at fact grain. */
  def rankReport(orderRevenue: DataFrame): DataFrame = {
    val byRest = orderRevenue
      .groupBy(col("restaurant_id"))
      .agg((sum(round(col("total_revenue") * 10000)) / 10000.0)
        .as("total_revenue"))
    val wTies = org.apache.spark.sql.expressions.Window
      .orderBy(col("total_revenue").desc)
    val wTotal = org.apache.spark.sql.expressions.Window
      .orderBy(col("total_revenue").desc, col("restaurant_id"))
    byRest.select(
      col("restaurant_id"), col("total_revenue"),
      rank().over(wTies).as("rnk"),
      dense_rank().over(wTies).as("drnk"),
      round(percent_rank().over(wTies), 6).as("pct_rank"),
      round(cume_dist().over(wTies), 6).as("cume"),
      ntile(4).over(wTotal).as("quartile"))
  }
}
