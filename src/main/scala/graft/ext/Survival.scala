package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis over customer lifetimes: the Kaplan–Meier
  * estimator, per restaurant — the censoring-aware upgrade of the
  * reference's churn mart (`scripts/cdc_metrics_job_gold.py:147-183`
  * labels a user churned by a hard inactivity cutoff; KM instead treats
  * still-active users as CENSORED, so the curve is unbiased by the
  * observation window).
  */
object Survival {

  /** Kaplan–Meier survival curve of customer lifetime (days between a
    * user's first and last order at a restaurant), per restaurant.
    * A user whose last order is within `censorDays` of the global
    * anchor (max fact date — never the wall clock) is censored: they
    * contribute to the at-risk counts up to their observed duration
    * but not to the death counts. One row per (restaurant, event
    * duration): at-risk n, deaths d, and S(t) = Π_{u≤t} (1 − d_u/n_u).
    *
    * Exactness: n and d are integers; each factor is ONE double
    * division of integer-lifted values and the product is a sequential
    * IEEE chain in duration order, mirrored parenthesis-for-
    * parenthesis by a recursive CTE on the oracle side (the q124/q155
    * recurrence pattern); emitted UNROUNDED.
    *
    * Scale shape: the fact reduces to (restaurant, user) first/last
    * dates (hash aggregate, map-side combine), then to a (restaurant,
    * duration) histogram; the at-risk counts are a cumulative window
    * over DISTINCT durations partitioned by restaurant (grain bounded
    * by the day span, not row count), and the product recurrence runs
    * in `mapPartitions` after repartition-by-key + sort — all keys in
    * parallel, state is one double. */
  def kaplanMeier(orderRevenue: DataFrame, censorDays: Int = 30): DataFrame = {
    val spark = orderRevenue.sparkSession
    import spark.implicits._
    val lifetimes = orderRevenue
      .groupBy(col("restaurant_id"), col("user_id"))
      .agg(min(col("creation_date")).as("first_date"),
        max(col("creation_date")).as("last_date"))
    val anchor = orderRevenue.agg(max(col("creation_date")).as("anchor"))
    val hist = lifetimes.crossJoin(broadcast(anchor))
      .select(
        col("restaurant_id"),
        datediff(col("last_date"), col("first_date")).cast("long").as("dur"),
        when(datediff(col("anchor"), col("last_date")) >= censorDays, 1L)
          .otherwise(0L).as("ev"))
      .groupBy(col("restaurant_id"), col("dur"))
      .agg(sum(col("ev")).as("d"), count(lit(1)).as("m"))
    val atRisk = hist
      .withColumn("n", sum(col("m")).over(
        Window.partitionBy(col("restaurant_id")).orderBy(col("dur").desc)))
      .filter(col("d") > 0)
      .select(col("restaurant_id").cast("long").as("rid"),
        col("dur"), col("d"), col("n"))
      .repartition(col("rid"))
      .sortWithinPartitions(col("rid"), col("dur"))
      .as[(Long, Long, Long, Long)]
    atRisk.mapPartitions { it =>
      var curR = Long.MinValue
      var s = 1.0
      it.map { case (rid, dur, d, n) =>
        if (rid != curR) { curR = rid; s = 1.0 }
        s = s * ((n - d).toDouble / n.toDouble)
        (rid, dur, n, d, s)
      }
    }.toDF("restaurant_id", "duration_days", "n_risk", "n_events", "survival")
  }
}
