package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.gold.Money

/** Statistical anomaly detection over metric marts: z-score outliers of
  * daily revenue per restaurant — the monitoring layer a metrics
  * pipeline runs over its own gold outputs.
  *
  * Cross-engine exactness: daily revenue accumulates as exact LONG 1e-4
  * units (the money rule); the variance moments then use whole-dollar
  * integers derived deterministically from those cents — Σd and Σd²
  * stay below 2^63 at any realistic magnitude (cents² would overflow:
  * TPC-H-scale line prices are ~1e9 in 1e-4 units, squaring past 2^63),
  * and a dollar-grain z-score is statistically identical. Mean /
  * variance / z derive from the integers with one fixed double formula —
  * integer→double casts and IEEE ops (even sqrt) are deterministic, so
  * both engines agree bit-for-bit.
  *
  * Two shuffles end-to-end: the (restaurant, day) rollup, then the
  * per-restaurant moment aggregate; the z-scoring join broadcasts the
  * restaurant-grain moments back onto the daily rows.
  */
object Anomaly {

  /** Daily-revenue z-score outliers per restaurant: rows with
    * |z| ≥ `minZ` among restaurants with at least `minDays` active days
    * (small-n groups have meaningless variance). */
  def revenueOutliers(
      orderRevenue: DataFrame, minZ: Double = 2.0, minDays: Int = 5): DataFrame = {
    val daily = orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      .agg(sum(Money.cents(col("total_revenue")).cast("long")).as("cents"))
      .withColumn("dd", round(col("cents") / 10000.0).cast("long"))
    val moments = daily
      .groupBy(col("restaurant_id"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("dd")).as("sx"),
        sum(col("dd") * col("dd")).as("sxx"))
      .filter(col("n_days") >= minDays)
    daily.join(broadcast(moments), Seq("restaurant_id"))
      .withColumn("mean_d", col("sx").cast("double") / col("n_days"))
      .withColumn("var_d",
        (col("sxx").cast("double")
          - col("sx").cast("double") * col("sx") / col("n_days")) / col("n_days"))
      .withColumn("z",
        when(col("var_d") > 0,
          (col("dd") - col("mean_d")) / sqrt(col("var_d"))))
      .filter(abs(col("z")) >= minZ)
      .select(
        col("restaurant_id"), col("creation_date"),
        (col("cents") / 10000.0).as("daily_revenue"),
        col("mean_d").as("mean_revenue"),
        round(col("z"), 6).as("z_score"))
  }

  /** Robust (median/MAD) outliers — the heavy-tail-safe sibling of
    * [[revenueOutliers]]: a single extreme day inflates the variance
    * enough to hide real anomalies, while the median absolute deviation
    * barely moves. Flagged when |x − median| > k·1.4826·MAD (1.4826
    * normalizes MAD to σ under normality).
    *
    * Exactness: daily revenue is integral 1e-4 units; medians of
    * integers interpolate to exact halves, so median, MAD, and every
    * deviation are exactly representable doubles, and the flag compares
    * `dev·10000 > MAD·⌈k·1.4826·10000⌉` — pure integer-valued
    * arithmetic, no float boundary for engines to disagree on. Same
    * two-shuffle + broadcast shape as the z-score path. */
  def madOutliers(
      orderRevenue: DataFrame, k: Double = 3.0, minDays: Int = 5): DataFrame = {
    val scaledK = math.ceil(k * 1.4826 * 10000).toLong
    // the daily mart feeds three consumers (median, deviations, final
    // join); persist it so the fact aggregates once — Catalyst does not
    // share the subtree across the two median passes otherwise
    val daily = orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      .agg(sum(Money.cents(col("total_revenue")).cast("long")).as("cents"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val med = daily.groupBy(col("restaurant_id"))
      .agg(count(lit(1)).as("n_days"), median(col("cents")).as("med"))
      .filter(col("n_days") >= minDays)
    val dev = daily.join(broadcast(med), Seq("restaurant_id"))
      .withColumn("abs_dev", abs(col("cents") - col("med")))
    val mad = dev.groupBy(col("restaurant_id"))
      .agg(median(col("abs_dev")).as("mad"))
    dev.join(broadcast(mad), Seq("restaurant_id"))
      .filter(col("abs_dev") * 10000 > col("mad") * scaledK)
      .select(
        col("restaurant_id"), col("creation_date"),
        (col("cents") / 10000.0).as("daily_revenue"),
        (col("med") / 10000.0).as("median_revenue"),
        (col("mad") / 10000.0).as("mad_revenue"))
  }
}
