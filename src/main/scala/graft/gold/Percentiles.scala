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
}
