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

  /** Nelson–Aalen cumulative-hazard estimator per loyalty arm — the
    * hazard-scale member completing the survival family
    * ([[kaplanMeier]] estimates S(t); [[logRankTest]] compares arms;
    * this reads WHERE the churn hazard accumulates):
    * H(t) = Σ_{t_j ≤ t} d_j∕n_j with variance Σ d_j∕n_j² (Klein's
    * formula). Where KM's survival product forces a sequential
    * recurrence (mapPartitions), H is a SUM — so it runs as an
    * ordinary cumulative window per arm, no recurrence machinery.
    *
    * Exactness: lifetimes, event and at-risk counts are exact longs
    * (the [[kaplanMeier]] censoring rule: data-derived anchor); each
    * d∕n and d∕n² term is one fixed double chain over those longs,
    * quantized to integer 1e-9 units BEFORE the cumulative sums (the
    * entropy-term discipline) so both engines add identical integers
    * in the total (arm, duration) order.
    *
    * Scale shape: user-grain aggregate → (arm, duration) histogram →
    * one descending cumsum (at-risk) + one ascending cumsum (H, V),
    * every window partitioned by arm over the day-span-bounded
    * duration grain — never row-count-sized. */
  def nelsonAalen(
      orderRevenue: DataFrame, censorDays: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val users = orderRevenue
      .groupBy(col("user_id"))
      .agg(min(col("creation_date")).as("first_date"),
        max(col("creation_date")).as("last_date"),
        max(when(col("is_loyalty"), 1L).otherwise(0L)).as("g"))
    val anchor = orderRevenue.agg(max(col("creation_date")).as("anchor"))
    val hist = users.crossJoin(broadcast(anchor))
      .select(col("g"),
        datediff(col("last_date"), col("first_date")).cast("long").as("dur"),
        when(datediff(col("anchor"), col("last_date")) >= censorDays, 1L)
          .otherwise(0L).as("ev"))
      .groupBy(col("g"), col("dur"))
      .agg(sum(col("ev")).as("d"), count(lit(1)).as("m"))
    val desc = Window.partitionBy(col("g")).orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val asc = Window.partitionBy(col("g")).orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val nd = col("n").cast("double")
    hist
      .withColumn("n", sum(col("m")).over(desc))
      .filter(col("d") > 0)
      .withColumn("hu",
        round(col("d").cast("double") / nd * 1e9).cast("long"))
      .withColumn("vu",
        round(col("d").cast("double") / (nd * nd) * 1e9).cast("long"))
      .select(col("g").as("arm"), col("dur").as("duration_days"),
        col("n").as("n_risk"), col("d").as("n_events"),
        round(sum(col("hu")).over(asc) / 1e9, 6).as("cum_hazard"),
        round(sum(col("vu")).over(asc) / 1e9, 6).as("cum_hazard_var"))
      .orderBy(col("arm"), col("duration_days"))
  }

  /** Log-rank test between two survival curves — the standard
    * companion to [[kaplanMeier]]: does the LOYALTY cohort churn on a
    * different clock than the rest, accounting for censoring (a naive
    * mean-lifetime comparison is biased by whoever is still alive)?
    * Observed-vs-expected events accumulate over the distinct event
    * times: E₁ⱼ = dⱼ·n₁ⱼ∕nⱼ and the hypergeometric variance
    * Vⱼ = dⱼ·(n₁ⱼ∕nⱼ)·(1−n₁ⱼ∕nⱼ)·(nⱼ−dⱼ)∕(nⱼ−1);
    * χ² = (O₁−ΣE₁)²∕ΣV is ~χ²₁ under no-difference.
    *
    * Exactness: lifetimes, events and at-risk counts are exact longs
    * (the [[kaplanMeier]] censoring rule: data-derived anchor, never
    * the wall clock); each Eⱼ∕Vⱼ term is one fixed double chain over
    * those longs, quantized to integer 1e-9 units BEFORE the per-time
    * sums so they stay order-free (the entropy-term discipline).
    * Single-time guard nⱼ > 1; zero total variance emits NULL χ².
    *
    * Shape: a user-grain aggregate, a duration-grain histogram, two
    * descending cumulative sums over the DURATION-grain window
    * (duration domain-bounded — the q296 value-grain judgment), one
    * constant-size aggregate. */
  def logRankTest(
      orderRevenue: DataFrame, censorDays: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val users = orderRevenue
      .groupBy(col("user_id"))
      .agg(min(col("creation_date")).as("first_date"),
        max(col("creation_date")).as("last_date"),
        max(when(col("is_loyalty"), 1L).otherwise(0L)).as("g"))
    val anchor = orderRevenue.agg(max(col("creation_date")).as("anchor"))
    val hist = users.crossJoin(broadcast(anchor))
      .select(
        datediff(col("last_date"), col("first_date")).cast("long").as("dur"),
        when(datediff(col("anchor"), col("last_date")) >= censorDays, 1L)
          .otherwise(0L).as("ev"),
        col("g"))
      .groupBy(col("dur"))
      .agg(sum(col("ev")).as("d"), count(lit(1)).as("m"),
        sum(col("ev") * col("g")).as("d1"), sum(col("g")).as("m1"))
    val desc = Window.orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val nd = col("n").cast("double")
    val p1 = col("n1").cast("double") / nd
    val e1 = col("d").cast("double") * p1
    val v = col("d").cast("double") * p1 * (lit(1.0) - p1) *
      ((col("n") - col("d")).cast("double") / (col("n") - 1).cast("double"))
    // ALL event times contribute to O and E (at n==1 the term's O−E is
    // exactly 0, so χ² is unchanged — but dropping the time would
    // understate the reported observed-event counts); only the
    // variance term needs the n>1 guard for its (n−1) division.
    val terms = hist
      .withColumn("n", sum(col("m")).over(desc))
      .withColumn("n1", sum(col("m1")).over(desc))
      .filter(col("d") > 0)
      .select(col("d"), col("d1"),
        round(e1 * 1e9).cast("long").as("e1u"),
        when(col("n") > 1, round(v * 1e9).cast("long"))
          .otherwise(0L).as("vu"))
    val tot = users.agg(
      sum(col("g")).as("n_treat"),
      sum(lit(1L) - col("g")).as("n_ctrl"))
    terms.agg(
      sum(col("d1")).as("o1"), sum(col("d") - col("d1")).as("o0"),
      sum(col("e1u")).as("se1"), sum(col("vu")).as("sv"))
      .crossJoin(broadcast(tot))
      .select(col("n_treat"), col("n_ctrl"),
        col("o1").as("events_treat"), col("o0").as("events_ctrl"),
        round(col("se1") / 1e9, 6).as("expected_treat"),
        when(col("sv") > 0,
          round((col("o1").cast("double") - col("se1") / 1e9)
            * (col("o1").cast("double") - col("se1") / 1e9)
            / (col("sv") / 1e9), 6)).as("chi2"))
  }
}
