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
}
