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
        (median(Money.cents(col("total_revenue"))) / 10000.0)
          .as("median_line_revenue"))

  /** z at 97.5% — shared 17-digit literal (the dcgDiscounts device). */
  val MedianCiZ = 1.9599639845400545

  /** Per-group median with a DISTRIBUTION-FREE 95% confidence
    * interval: the CI endpoints are the order statistics at the
    * binomial ranks ⌊(n − z√n)∕2⌋ and ⌈1 + (n + z√n)∕2⌉ (normal
    * approximation, clamped to [1, n]) — no normality assumption, no
    * resampling, valid for any revenue distribution. The uncertainty
    * readout [[medianLineRevenue]]'s point estimate lacks, from pure
    * order statistics (the [[graft.ext.Experiment.jackknifeMeanCI]]
    * sibling for the median, where the jackknife is known to be
    * inconsistent).
    *
    * Exactness: the three selections are exact order statistics via
    * the value-grain cumulative histogram (min value whose cumulative
    * count reaches the rank — an integer comparison); ranks come from
    * one double chain (identical both engines) floored/ceiled to
    * integers; the median rank ⌈n∕2⌉ is pure integer arithmetic.
    * Shape: one (group, value) hash aggregate, a value-grain
    * key-partitioned cumsum window, and a 3-way conditional-min
    * aggregate — no per-group memory beyond the value histogram. */
  def medianWithCI(
      orderRevenue: DataFrame, groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = orderRevenue
      .select(col(groupCol).as("g"),
        Money.cents(col("total_revenue")).cast("long").as("u"))
      .groupBy(col("g"), col("u")).agg(count(lit(1)).as("c"))
    val cum = Window.partitionBy(col("g")).orderBy(col("u"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = hist.groupBy(col("g")).agg(sum(col("c")).as("n"))
    val half = sqrt(col("n").cast("double")) * MedianCiZ
    val ranks = tot
      .withColumn("r_med", expr("(n + 1) div 2"))
      .withColumn("r_lo",
        greatest(floor((col("n").cast("double") - half) / 2).cast("long"),
          lit(1L)))
      .withColumn("r_hi",
        least(ceil(lit(1.0) + (col("n").cast("double") + half) / 2)
          .cast("long"), col("n")))
    hist
      .withColumn("cum", sum(col("c")).over(cum))
      .join(ranks, Seq("g"))
      .groupBy(col("g"), col("n"), col("r_lo"), col("r_med"), col("r_hi"))
      .agg(
        min(when(col("cum") >= col("r_med"), col("u"))).as("u_med"),
        min(when(col("cum") >= col("r_lo"), col("u"))).as("u_lo"),
        min(when(col("cum") >= col("r_hi"), col("u"))).as("u_hi"))
      .select(col("g").as(groupCol), col("n").as("n_lines"),
        (col("u_med") / 10000.0).as("median_revenue"),
        (col("u_lo") / 10000.0).as("ci_lo"),
        (col("u_hi") / 10000.0).as("ci_hi"))
      .orderBy(col(groupCol))
  }

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
      .agg((sum(Money.cents(col("total_revenue"))) / 10000.0)
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
