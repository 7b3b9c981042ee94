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
    // per-call cache: freed after the consuming action (guide §5)
    graft.core.CacheLifecycle.unpersistAfterNextAction(daily)
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

  /** Rolling-baseline z-score per restaurant day — the ONLINE sibling
    * of [[revenueOutliers]]: each day scores against the trailing
    * `days`-day window EXCLUDING itself (`RANGE BETWEEN days PRECEDING
    * AND 1 PRECEDING` over the integer day number), so the baseline is
    * what a live monitor would have known the moment the day closed,
    * a seasonal drift re-baselines itself, and an extreme day cannot
    * dilute its own score (the self-inclusion bug of naive rolling z).
    * RANGE (not ROWS) bounds by CALENDAR distance — sparse restaurants
    * don't smear months-old days into the window.
    *
    * Days with fewer than `minN` baseline days or zero variance score
    * NULL (insufficient evidence ≠ score 0). One shuffle on
    * restaurant_id; the frame reuses the daily rollup's partitioning.
    * Same integer-moment exactness as [[revenueOutliers]]: whole-dollar
    * Σd/Σd² inside the frame, one fixed double formula, round 6. */
  def rollingZ(
      orderRevenue: DataFrame, days: Int = 28, minN: Int = 5): DataFrame = {
    val daily = orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      .agg(sum(Money.cents(col("total_revenue")).cast("long")).as("cents"))
      .withColumn("dd", round(col("cents") / 10000.0).cast("long"))
      .withColumn("__day",
        datediff(col("creation_date"), lit("1970-01-01").cast("date")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("restaurant_id"))
      .orderBy(col("__day"))
      .rangeBetween(-days, -1)
    val scored = daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("dd")).over(w))
      .withColumn("sxx", sum(col("dd") * col("dd")).over(w))
    val mean = col("sx").cast("double") / col("n")
    val variance = (col("sxx").cast("double")
      - col("sx").cast("double") * col("sx") / col("n")) / col("n")
    scored.select(
      col("restaurant_id"), col("creation_date"),
      (col("cents") / 10000.0).as("daily_revenue"),
      coalesce(col("n"), lit(0L)).as("baseline_n"),
      when(col("n") >= minN && variance > 0,
        round((col("dd") - mean) / sqrt(variance), 6)).as("rolling_z"))
  }

  /** Two-sided CUSUM level-shift detector per restaurant — the
    * change-point tier of the anomaly suite. Point detectors
    * ([[revenueOutliers]], [[madOutliers]]) only see single extreme
    * days; a SUSTAINED small shift (price change, lost traffic) never
    * trips them. CUSUM accumulates deviations from a robust target:
    *
    *   sp_i = max(0, sp_{i-1} + (x_i − median) − slack)
    *   sn_i = max(0, sn_{i-1} + (median − x_i) − slack)
    *
    * with slack = MAD/2 (drift allowance) and alarm at 5·MAD — the
    * classic k=σ/2, h=5σ tuning with robust estimators substituted.
    *
    * The recurrence is sequential by construction (each day folds into
    * a clipped running state — no window function computes a
    * data-dependent max(0, ·) chain), so it runs as the [[graft.ext
    * .Behavior.debounce]] shape: repartition by restaurant, sort within
    * partitions, one `mapPartitions` pass holding O(1) state. Scale =
    * one shuffle of the DAILY mart (already reduced), then a linear
    * scan; the per-group medians ride in via broadcast join.
    *
    * Exactness: all state is integral HALF-1e-4 units (2·cents, so the
    * `.5`-interpolated medians of [[madOutliers]] stay integers); both
    * engines fold identical integer sequences. */
  def cusumShift(orderRevenue: DataFrame, minDays: Int = 5): DataFrame = {
    val spark = orderRevenue.sparkSession
    import spark.implicits._
    val daily = orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      .agg(sum(Money.cents(col("total_revenue")).cast("long")).as("cents"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-call cache: freed after the consuming action (guide §5)
    graft.core.CacheLifecycle.unpersistAfterNextAction(daily)
    val med = daily.groupBy(col("restaurant_id"))
      .agg(count(lit(1)).as("n_days"), median(col("cents")).as("med"))
      .filter(col("n_days") >= minDays)
    val mad = daily.join(broadcast(med), Seq("restaurant_id"))
      .groupBy(col("restaurant_id"))
      .agg(median(abs(col("cents") - col("med"))).as("mad"))
    val scaled = daily
      .join(broadcast(med), Seq("restaurant_id"))
      .join(broadcast(mad), Seq("restaurant_id"))
      .select(
        col("restaurant_id").cast("long").as("rid"),
        col("creation_date").cast("date").as("d"),
        col("cents"),
        (col("med") * 2).cast("long").as("m2"),
        (col("mad") * 2).cast("long").as("mad2"))
      .repartition(col("rid"))
      .sortWithinPartitions(col("rid"), col("d"))
      .as[(Long, java.sql.Date, Long, Long, Long)]
    scaled.mapPartitions { it =>
      var curR = Long.MinValue
      var sp = 0L
      var sn = 0L
      it.map { case (rid, d, cents, m2, mad2) =>
        if (rid != curR) { curR = rid; sp = 0L; sn = 0L }
        val slack = mad2 / 2
        sp = math.max(0L, sp + (2 * cents - m2) - slack)
        sn = math.max(0L, sn + (m2 - 2 * cents) - slack)
        (rid, d, cents, sp, sn, sp > 5 * mad2 || sn > 5 * mad2)
      }
    }.toDF("restaurant_id", "creation_date", "cents", "sp", "sn", "alarm")
      .select(
        col("restaurant_id"), col("creation_date"),
        (col("cents") / 10000.0).as("daily_revenue"),
        (col("sp") / 20000.0).as("cusum_pos"),
        (col("sn") / 20000.0).as("cusum_neg"),
        col("alarm"))
  }
}
