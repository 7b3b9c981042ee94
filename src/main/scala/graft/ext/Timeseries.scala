package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series repair: gap filling over a per-key calendar spine — the
  * resample step a forecasting/feature pipeline needs because "no rows
  * that day" must become an explicit zero (a model reading the mart
  * cannot tell absence from a missing scan otherwise).
  *
  * Scale shape: the fact reduces to (key, day) partials FIRST (hash
  * aggregate, map-side combine), so the spine explode and join run at
  * mart grain — days × keys — never at fact grain. The spine is built
  * per key from its own [min, max] span (`sequence` + `explode`), and
  * the left join back is key+day equi — AQE-broadcastable when the
  * daily mart is small.
  */
object Timeseries {

  /** Weekday seasonal profile per restaurant: each ISO weekday's mean
    * daily revenue and its effect (weekday mean − overall mean) — the
    * additive seasonal component a forecast or anomaly baseline
    * subtracts first (a Saturday spike is not an anomaly if Saturdays
    * always spike; [[graft.ext.Anomaly.rollingZ]]'s window absorbs
    * slow drift but not weekly periodicity).
    *
    * Two mart-grain hash aggregates (daily rollup → weekday rollup) +
    * a broadcast of the restaurant-grain totals. Exactness: integer
    * cent sums; means and the effect are single fixed double formulas
    * emitted UNROUNDED — the identical IEEE division chain is
    * bit-identical on both engines, whereas a 6dp round would diverge
    * exactly on the half-ulp boundaries money-per-day values often
    * land on (Spark rounds the decimal expansion HALF_UP, DuckDB
    * multiplies-then-rounds; sf0.1 exhibits real collisions). Weekday
    * is ISO (0 = Monday … 6 = Sunday): Spark `weekday()`, DuckDB
    * `isodow − 1`. */
  def weekdaySeasonality(orderRevenue: DataFrame): DataFrame = {
    val daily = orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      .agg(sum(graft.gold.Money.cents(col("total_revenue")).cast("long"))
        .as("cents"))
    val byWd = daily
      .withColumn("weekday", weekday(col("creation_date")))
      .groupBy(col("restaurant_id"), col("weekday"))
      .agg(count(lit(1)).as("n_days"), sum(col("cents")).as("sw"))
    val overall = daily.groupBy(col("restaurant_id"))
      .agg(count(lit(1)).as("na"), sum(col("cents")).as("sa"))
    byWd.join(broadcast(overall), Seq("restaurant_id"))
      .select(
        col("restaurant_id"), col("weekday"), col("n_days"),
        (col("sw").cast("double") / col("n_days") / 10000.0)
          .as("weekday_avg"),
        ((col("sw").cast("double") / col("n_days")
          - col("sa").cast("double") / col("na")) / 10000.0)
          .as("seasonal_effect"))
  }

  /** Seasonally-adjusted daily anomaly flags: subtract each
    * restaurant's weekday mean (the [[weekdaySeasonality]] baseline)
    * from its daily revenue, then z-score the RESIDUALS against the
    * restaurant's own residual distribution — the detector that stops
    * crying wolf every Saturday: a spike is only anomalous relative to
    * what that weekday usually does ([[graft.ext.Anomaly]]'s plain z
    * treats weekly periodicity itself as signal).
    *
    * Exactness: daily revenue rides integral 1e-4-unit cents; the
    * residual is one fixed double subtraction then re-quantized to
    * integer CENT (1e-2) units (`round` of identical doubles is
    * identical), so the moment sums (Σr, Σr²) are order-free integers
    * and z is a fixed IEEE chain over them, emitted unrounded. Cent
    * grain keeps Σr² inside int64 for daily-revenue magnitudes up to
    * ~10⁷ cents across ~10⁴ days per key (finer 1e-4 units overflow
    * exactly there); a deployment with larger marts drops to whole
    * units the same way. Zero residual variance pins z = 0 on both
    * engines.
    *
    * Shape: two mart-grain hash aggregates (daily rollup, weekday
    * baseline), a restaurant-grain moment aggregate, and joins at
    * restaurant(×weekday) grain — AQE-broadcastable, no windows, fact
    * touched once. */
  def seasonalResidualOutliers(
      orderRevenue: DataFrame, zThresh: Double = 3.0): DataFrame = {
    val daily = orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      .agg(sum(graft.gold.Money.cents(col("total_revenue")).cast("long"))
        .as("cents"))
    val byWd = daily
      .withColumn("weekday", weekday(col("creation_date")))
      .groupBy(col("restaurant_id"), col("weekday"))
      .agg(count(lit(1)).as("n_days"), sum(col("cents")).as("sw"))
    val res = daily
      .withColumn("weekday", weekday(col("creation_date")))
      .join(byWd, Seq("restaurant_id", "weekday"))
      .withColumn("runits",
        round((col("cents").cast("double")
          - col("sw").cast("double") / col("n_days")) / 100.0).cast("long"))
    val moments = res.groupBy(col("restaurant_id"))
      .agg(count(lit(1)).as("n"), sum(col("runits")).as("sr"),
        sum(col("runits") * col("runits")).as("srr"))
    val mean = col("sr").cast("double") / col("n").cast("double")
    val variance = col("srr").cast("double") / col("n").cast("double") - mean * mean
    res.join(moments, Seq("restaurant_id"))
      .withColumn("z",
        when(variance <= 0.0, 0.0)
          .otherwise((col("runits").cast("double") - mean) / sqrt(variance)))
      .select(
        col("restaurant_id"), col("creation_date"),
        (col("runits").cast("double") / 100.0).as("residual"),
        col("z"),
        (abs(col("z")) >= zThresh).as("is_outlier"))
  }

  /** Per-restaurant linear revenue trend: OLS slope of daily revenue
    * over the day index, with R² — the per-key trend feature a
    * forecasting or ranking model consumes, and the "is this account
    * growing" KPI in one aggregate. Days are indexed from a fixed epoch
    * (slope is translation-invariant). The emitted columns are n_days,
    * slope_per_day, and r2 — no intercept (it would have to be pinned
    * to an arbitrary origin; reconstruct fitted values from the daily
    * mart if needed).
    *
    * Exactness: y rides integral CENT units (Σy² at 1e-4 grain
    * overflows int64 exactly where [[seasonalResidualOutliers]]
    * documents), x is an integral day offset, so all five moment sums
    * are order-free integers; slope/R² are fixed IEEE chains over
    * them, unrounded. Single-day keys (zero x-variance) emit NULL
    * slope/R²; zero y-variance keys emit NULL R² (flat is not "fit").
    *
    * Shape: daily rollup, then ONE moment aggregate at key grain —
    * map-side partials, no window, no second scan. The textbook
    * sufficient-statistics trade: 100 TB of facts reduce to five longs
    * per key. */
  def revenueTrendFit(
      orderRevenue: DataFrame, epoch: String = "1992-01-01"): DataFrame = {
    val daily = orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      .agg(sum(graft.gold.Money.cents(col("total_revenue")).cast("long"))
        .as("cents"))
      .select(col("restaurant_id"),
        datediff(col("creation_date"), lit(epoch).cast("date"))
          .cast("long").as("x"),
        round(col("cents").cast("double") / 100.0).cast("long").as("y"))
    val m = daily.groupBy(col("restaurant_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val nD = col("n").cast("double")
    val num = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val denX = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val denY = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    m.select(
      col("restaurant_id"), col("n").as("n_days"),
      when(denX === 0.0, lit(null).cast("double"))
        .otherwise((num / denX) / 100.0).as("slope_per_day"),
      when(denX === 0.0 || denY === 0.0, lit(null).cast("double"))
        .otherwise((num * num) / (denX * denY)).as("r2"))
  }

  /** Log-log price elasticity of demand per category: the OLS slope of
    * ln(quantity) on ln(unit price) across a category's order lines —
    * the classic constant-elasticity estimate (slope ≈ −1.3 means a 1%
    * price increase loses 1.3% of volume), the pricing-analytics
    * reading of [[revenueTrendFit]]'s machinery.
    *
    * Exactness: each line's two logs are computed once on identical
    * doubles (ln is correctly rounded on both engines) and quantized to
    * integer 1e-6 units, so the five OLS moment sums are order-free
    * longs; slope and R² are the q154 fixed IEEE chain over
    * double-cast sums (the unit scale cancels in the slope).
    * Zero-variance categories emit NULLs.
    *
    * Shape: one broadcast dim join + per-line projection + a single
    * category-grain hash aggregate — no window, no self-join. */
  def priceElasticity(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val p = part.select(col("p_partkey"), col("p_type").as("item_category"))
    val base = lineitem
      .filter(col("l_quantity") > 0 && col("l_extendedprice") > 0)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("item_category"),
        round(log(col("l_extendedprice").cast("double")
          / col("l_quantity").cast("double")) * 1e6).cast("long").as("x"),
        round(log(col("l_quantity").cast("double")) * 1e6).cast("long")
          .as("y"))
    val m = base.groupBy(col("item_category"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val nD = col("n").cast("double")
    val num = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val denX = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val denY = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    m.select(
      col("item_category"), col("n").as("n_lines"),
      when(denX === 0.0, lit(null).cast("double"))
        .otherwise(num / denX).as("elasticity"),
      when(denX === 0.0 || denY === 0.0, lit(null).cast("double"))
        .otherwise((num * num) / (denX * denY)).as("r2"))
  }

  /** EWMA smoothing + one-step-ahead forecast of daily revenue per
    * restaurant: `ewma_t = ewma_{t-1} + α·(y_t − ewma_{t-1})` with
    * α = 1/8, seeded at the key's first observed day; the forecast for
    * day t is the smoothed level after day t−1 (NULL on the first day).
    * The simplest forecasting baseline a revenue-anomaly or capacity
    * model compares against — and the sequential-recurrence sibling of
    * [[graft.ext.Anomaly.cusumShift]].
    *
    * Exactness: y rides exact integer cents lifted into doubles; the
    * recurrence is ONE fixed IEEE chain (`prev + 0.125 * (y − prev)`,
    * α = 1/8 exactly representable) evaluated in date order on both
    * engines — multiply/add/subtract are exactly rounded, so identical
    * input sequences give bit-identical levels; emitted UNROUNDED.
    * DuckDB mirrors the same chain via a recursive CTE over the
    * per-key row_number (the q124 CUSUM pattern).
    *
    * Scale shape: the fact reduces to (key, day) partials first; the
    * recurrence runs inside `mapPartitions` after repartition-by-key +
    * `sortWithinPartitions` — per-key sequential state, all keys in
    * parallel, no window over more than one key's days and no driver
    * collection. State is two doubles per task. */
  def ewmaForecast(orderRevenue: DataFrame): DataFrame = {
    val spark = orderRevenue.sparkSession
    import spark.implicits._
    val daily = orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      .agg(sum(graft.gold.Money.cents(col("total_revenue")).cast("long"))
        .as("cents"))
      .select(
        col("restaurant_id").cast("long").as("rid"),
        col("creation_date").cast("date").as("d"),
        col("cents"))
      .repartition(col("rid"))
      .sortWithinPartitions(col("rid"), col("d"))
      .as[(Long, java.sql.Date, Long)]
    daily.mapPartitions { it =>
      var curR = Long.MinValue
      var ew = 0.0
      it.map { case (rid, d, cents) =>
        val y = cents.toDouble
        val prev: Option[Double] = if (rid != curR) None else Some(ew)
        ew = prev match {
          case None    => curR = rid; y
          case Some(p) => p + 0.125 * (y - p)
        }
        (rid, d, cents, ew, prev)
      }
    }.toDF("restaurant_id", "creation_date", "cents", "ew", "prev")
      .select(
        col("restaurant_id"), col("creation_date"),
        (col("cents") / 10000.0).as("daily_revenue"),
        (col("ew") / 10000.0).as("smoothed_revenue"),
        (col("prev") / 10000.0).as("forecast_revenue"))
  }

  /** Daily revenue per restaurant with missing days zero-filled across
    * each restaurant's own active span; `is_gap` marks filled rows. */
  def gapFillDaily(orderRevenue: DataFrame): DataFrame = {
    val daily = orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      // integer-long cent sums (the rollingMarketCorr form): a double
      // sum stays exact only below 2^53 1e-4-units per group
      .agg(sum(round(col("total_revenue") * 10000).cast("long")).as("cents"))
    val spine = daily
      .groupBy(col("restaurant_id"))
      .agg(min(col("creation_date")).as("d0"), max(col("creation_date")).as("d1"))
      .select(col("restaurant_id"),
        explode(sequence(col("d0"), col("d1"))).as("creation_date"))
    spine.join(daily, Seq("restaurant_id", "creation_date"), "left")
      .select(
        col("restaurant_id"), col("creation_date"),
        (coalesce(col("cents"), lit(0.0)) / 10000.0).as("revenue"),
        when(col("cents").isNull, lit(1L)).otherwise(lit(0L)).as("is_gap"))
  }

  /** Last-observation-carried-forward over the daily spine: gap days
    * inherit the most recent observed day's revenue (the standard
    * forward-fill for downstream models that can't see NULL/0 gaps),
    * plus the staleness in days. Distinct from [[gapFillDaily]]'s
    * zero-fill: LOCF is the imputation, zero-fill is the truth.
    *
    * Shape: the same mart-grain spine join, then ONE partitioned window
    * pass — `last(_, ignoreNulls)` for the carried value and a second
    * frame-identical `max` for the anchor date the staleness derives
    * from (both ride the same sort, one window exchange). The window is
    * per restaurant ordered by day — partition-local, never global. */
  def gapFillLocf(orderRevenue: DataFrame): DataFrame = {
    val daily = orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      // the gapFillDaily long-cents discipline
      .agg(sum(round(col("total_revenue") * 10000).cast("long")).as("cents"))
    val spine = daily
      .groupBy(col("restaurant_id"))
      .agg(min(col("creation_date")).as("d0"), max(col("creation_date")).as("d1"))
      .select(col("restaurant_id"),
        explode(sequence(col("d0"), col("d1"))).as("creation_date"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("restaurant_id")).orderBy(col("creation_date"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    spine.join(daily, Seq("restaurant_id", "creation_date"), "left")
      .withColumn("filled_cents", last(col("cents"), ignoreNulls = true).over(w))
      .withColumn("obs_date",
        max(when(col("cents").isNotNull, col("creation_date"))).over(w))
      .select(
        col("restaurant_id"), col("creation_date"),
        (col("filled_cents") / 10000.0).as("revenue_locf"),
        when(col("cents").isNull, lit(1L)).otherwise(lit(0L)).as("is_imputed"),
        datediff(col("creation_date"), col("obs_date")).as("staleness_days"))
  }

  /** Rolling `windowDays` Pearson correlation between each restaurant's
    * daily revenue and the whole-market daily total — the co-movement
    * screen that separates "rides the market" locations from
    * idiosyncratic ones. Evaluated on the zero-filled continuous spine
    * (same day-grid as [[gapFillDaily]]) so the row-frame window IS a
    * day window; only full windows emit.
    *
    * Exactness: x (restaurant cents) and y (market cents) are exact
    * longs; the five frame sums (Σx, Σy, Σxy, Σx², Σy²) accumulate as
    * longs — order-free, so engines agree bit-for-bit — and the Pearson
    * formula is evaluated once per row on doubles cast from those longs
    * with a fixed parenthesization mirrored in the oracle. Zero-variance
    * windows yield NULL (guarded, not NaN/Inf). Units: the correlation
    * inputs are WHOLE DOLLARS (cents div 10000, identical floor on both
    * engines) — Pearson is per-variable scale-invariant, and cents
    * overflow int64 in Σy²: market-day cents ≈ 7.5e8 at sf0.01 squares
    * to 5.6e17, ×28 ≈ 1.6e19 > 2^63 (ANSI Spark threw exactly this).
    * Dollar units give ~1e8 headroom on top of sf0.1.
    *
    * Shape: fact → (restaurant, day) hash aggregate; the market series
    * is day-grain (broadcast back onto the spine); one partitioned
    * window pass computes all five frame sums on a single sort. */
  def rollingMarketCorr(
      orderRevenue: DataFrame, windowDays: Int = 28): DataFrame = {
    val daily = orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      .agg(sum(round(col("total_revenue") * 10000).cast("long")).as("cents"))
    val market = daily
      .groupBy(col("creation_date"))
      .agg(sum(col("cents")).as("mcents"))
    val spine = daily
      .groupBy(col("restaurant_id"))
      .agg(min(col("creation_date")).as("d0"), max(col("creation_date")).as("d1"))
      .select(col("restaurant_id"),
        explode(sequence(col("d0"), col("d1"))).as("creation_date"))
    val grid = spine
      .join(daily, Seq("restaurant_id", "creation_date"), "left")
      .join(broadcast(market), Seq("creation_date"), "left")
      .select(col("restaurant_id"), col("creation_date"),
        expr("coalesce(cents, 0L) div 10000").as("x"),
        expr("coalesce(mcents, 0L) div 10000").as("y"))
    // NO pinned repartition before this window, deliberately (r16,
    // guide §1): the hampelOutliers pin was A/B'd here and measured
    // SLOWER (0.99 -> 1.26 s paired, quiet box) — plain frame sums are
    // cheap per row, unlike hampel's array sorts, and the in-sweep low
    // cpu_share that suggested starvation was the bench's own load.
    // (The pins that DO pay were re-proven quiet the same day: hampel
    // 3.26 unpinned -> 1.29 pinned, revenueAcf 1.95 -> 1.46.)
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col("restaurant_id")).orderBy(col("creation_date"))
    val w = ord.rowsBetween(-(windowDays - 1), 0)
    val n = lit(windowDays.toDouble)
    // all five frame sums + the completeness rank share ONE window sort;
    // the full-window filter comes after, so frames see complete history
    grid
      .withColumn("sx", sum(col("x")).over(w).cast("double"))
      .withColumn("sy", sum(col("y")).over(w).cast("double"))
      .withColumn("sxy", sum(col("x") * col("y")).over(w).cast("double"))
      .withColumn("sxx", sum(col("x") * col("x")).over(w).cast("double"))
      .withColumn("syy", sum(col("y") * col("y")).over(w).cast("double"))
      .withColumn("__rn", row_number().over(ord))
      .filter(col("__rn") >= windowDays)
      .withColumn("num", n * col("sxy") - col("sx") * col("sy"))
      .withColumn("varx", n * col("sxx") - col("sx") * col("sx"))
      .withColumn("vary", n * col("syy") - col("sy") * col("sy"))
      .select(col("restaurant_id"), col("creation_date"),
        when(col("varx") > 0 && col("vary") > 0,
          round(col("num") / sqrt(col("varx") * col("vary")), 6))
          .as("market_corr"))
  }

  /** Sample autocorrelation of daily revenue at lags 1..`maxLag` per
    * restaurant — the periodicity screen (a weekly business shows a
    * spike at lag 7) that picks seasonality parameters for the
    * [[weekdaySeasonality]]/[[seasonalResidualOutliers]] tier.
    *
    * acf(ℓ) is the Pearson correlation of (xₜ, xₜ₋ℓ) over the
    * zero-filled spine: all `maxLag` lag columns ride ONE window sort,
    * stack to (lag, x, xl) rows, and each (restaurant, lag) reduces to
    * the five exact long sums with the [[rollingMarketCorr]] formula
    * (identical parenthesization, dollar units, NULL-guarded variance).
    * Pairs with no lagged partner (the first ℓ spine days) drop before
    * the sums, so n is per-lag exact. */
  def revenueAcf(orderRevenue: DataFrame, maxLag: Int = 7): DataFrame = {
    val daily = orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      .agg(sum(round(col("total_revenue") * 10000).cast("long")).as("cents"))
    val spine = daily
      .groupBy(col("restaurant_id"))
      .agg(min(col("creation_date")).as("d0"), max(col("creation_date")).as("d1"))
      .select(col("restaurant_id"),
        explode(sequence(col("d0"), col("d1"))).as("creation_date"))
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col("restaurant_id")).orderBy(col("creation_date"))
    val grid = spine.join(daily, Seq("restaurant_id", "creation_date"), "left")
      .select(col("restaurant_id"), col("creation_date"),
        expr("coalesce(cents, 0L) div 10000").as("x"))
      // pinned key repartition before the window (r16): the grid is
      // byte-tiny, so AQE coalesces the window exchange under the
      // per-row work (7 lag frames + a 7-wide map explode per row) —
      // the hampelOutliers rationale
      .repartition(
        orderRevenue.sparkSession.sparkContext.defaultParallelism,
        col("restaurant_id"))
    val lagged = (1 to maxLag).foldLeft(grid) { (df, l) =>
      df.withColumn(s"xl$l", lag(col("x"), l).over(ord))
    }
    val stacked = lagged.select(col("restaurant_id"), col("x"),
      explode(map(
        (1 to maxLag).flatMap(l => Seq(lit(l), col(s"xl$l"))): _*))
        .as(Seq("lag", "xl")))
      .filter(col("xl").isNotNull)
    stacked
      .groupBy(col("restaurant_id"), col("lag"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("xl")).cast("double").as("sy"),
        sum(col("x") * col("xl")).cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("xl") * col("xl")).cast("double").as("syy"))
      .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("varx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vary", col("n") * col("syy") - col("sy") * col("sy"))
      .select(col("restaurant_id"), col("lag"),
        col("n").cast("long").as("n_pairs"),
        when(col("varx") > 0 && col("vary") > 0,
          round(col("num") / sqrt(col("varx") * col("vary")), 6))
          .as("acf"))
  }

  /** Ljung–Box portmanteau test per restaurant — the ONE-NUMBER
    * verdict over [[revenueAcf]]'s per-lag diagram: is the daily
    * revenue series white noise, or is there structure ANY forecast
    * should capture? Q = n(n+2)·Σ_{k≤h} ρ̂ₖ²∕(n−k) with the standard
    * global-mean ACF ρ̂ₖ = cₖ∕c₀ (not revenueAcf's per-lag Pearson —
    * the portmanteau null distribution assumes this estimator), is
    * χ²_h under the null; upper-tail p via the Wilson–Hilferty +
    * shared A&S erfc chain the overdispersion test established.
    *
    * Exactness: cₖ expands to exact integer sums
    * (Σxₜxₜ₋ₖ, Σheads, Σtails in decimal(38,0)); each ρ̂ₖ is a fixed
    * double chain over them quantized 1e-9, the per-lag term
    * ρ̂ₖ²∕(n−k) quantized 1e-12 before the order-free lag rollup, Q
    * quantized 1e-6. Restaurants with spans ≤ maxLag+1 days or zero
    * variance leave the family (no testable series).
    *
    * Scale shape: the revenueAcf discipline — all lags ride ONE
    * partitioned window sort, then hash aggregates; no quadratic
    * anything. */
  def ljungBox(orderRevenue: DataFrame, maxLag: Int = 7): DataFrame = {
    val dec = "decimal(38,0)"
    val daily = orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      .agg(sum(round(col("total_revenue") * 10000).cast("long")).as("cents"))
    val spine = daily
      .groupBy(col("restaurant_id"))
      .agg(min(col("creation_date")).as("d0"),
        max(col("creation_date")).as("d1"))
      .select(col("restaurant_id"),
        explode(sequence(col("d0"), col("d1"))).as("creation_date"))
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col("restaurant_id")).orderBy(col("creation_date"))
    val grid = spine.join(daily, Seq("restaurant_id", "creation_date"), "left")
      .select(col("restaurant_id"), col("creation_date"),
        expr("coalesce(cents, 0L) div 10000").as("x"))
      // totals and the lag stack both read it
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.CacheLifecycle.unpersistAfterNextAction(grid)
    val tot = grid.groupBy(col("restaurant_id"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x").cast(dec) * col("x")).as("sxx"))
      .filter(col("n") > maxLag + 1)
    val lagged = (1 to maxLag).foldLeft(grid) { (df, l) =>
      df.withColumn(s"xl$l", lag(col("x"), l).over(ord))
    }
    val perLag = lagged.select(col("restaurant_id"), col("x"),
        explode(map(
          (1 to maxLag).flatMap(l => Seq(lit(l), col(s"xl$l"))): _*))
          .as(Seq("lag", "xl")))
      .filter(col("xl").isNotNull)
      .groupBy(col("restaurant_id"), col("lag"))
      .agg(count(lit(1)).as("nk"),
        sum(col("x").cast(dec) * col("xl")).as("spk"),
        sum(col("x")).as("s1k"), sum(col("xl")).as("s2k"))
    val rho = perLag.join(tot, Seq("restaurant_id"))
      .withColumn("sxd", col("sx").cast("double") / col("n"))
      .withColumn("rnum", col("spk").cast("double")
        - col("sxd") * (col("s1k").cast("double") + col("s2k").cast("double"))
        + col("nk") * col("sxd") * col("sxd"))
      .withColumn("rden",
        col("sxx").cast("double") - col("sx") * col("sxd"))
      .filter(col("rden") > 0.0)
      .withColumn("ru",
        round(col("rnum") / col("rden") * 1e9).cast("long"))
      .withColumn("tq", round((col("ru") / 1e9) * (col("ru") / 1e9)
        / col("nk") * 1e12).cast("long"))
    rho.groupBy(col("restaurant_id"), col("n"))
      .agg(sum(col("tq")).as("stq"), count(lit(1)).as("h"))
      .withColumn("q6", round(col("n").cast("double") * (col("n") + 2)
        * (col("stq") / 1e12) * 1e6).cast("long"))
      .withColumn("nu", col("h").cast("double"))
      .withColumn("zq", round(
        (cbrt(col("q6") / 1e6 / col("nu"))
          - (lit(1.0) - lit(2.0) / (lit(9.0) * col("nu"))))
          * sqrt(lit(9.0) * col("nu") / lit(2.0)) * 1e6).cast("long"))
      .withColumn("ax", abs(col("zq")) / 1e6 / sqrt(lit(2.0)))
      .withColumn("tt", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("ax")))
      .withColumn("eu",
        round(((((lit(1.061405429) * col("tt") - lit(1.453152027)) * col("tt")
            + lit(1.421413741)) * col("tt") - lit(0.284496736)) * col("tt")
            + lit(0.254829592)) * col("tt")
          * exp(-(col("ax") * col("ax"))) * 1e9).cast("long"))
      .withColumn("pu", when(col("zq") >= 0, expr("(eu + 1) div 2"))
        .otherwise(lit(1000000000L) - expr("eu div 2")))
      .select(col("restaurant_id"), col("n").as("n_days"),
        col("h").as("h_lags"), (col("q6") / 1e6).as("q_stat"),
        (col("pu") / 1e9).as("p_value"))
      .orderBy(col("restaurant_id"))
  }

  /** Wald–Wolfowitz runs test per restaurant — the nonparametric
    * randomness check next to [[ljungBox]]: a revenue series that
    * hugs one side of its mean for long stretches (few runs) or
    * zigzags every day (too many runs) is not random, even when its
    * autocorrelations individually look small. The day sequence maps
    * to above∕below the EXACT mean (the integer cross-compare
    * xₜ·n > Σx — no division; ties count as below, documented), R =
    * 1 + #sign changes, and z = (R − (2n₁n₂∕n + 1))∕√Var with the
    * two-sided p from the shared A&S chain.
    *
    * Exactness: the spine, cents, R, n₁, n₂ are exact integers
    * (decimal cross-products for the mean compare); E[R]∕Var∕z are
    * fixed double chains over them, quantized 1e-6∕1e-9. Restaurants
    * with every day on one side leave the family (no runs to test).
    *
    * Scale shape: one hash aggregate, spine fill, ONE partitioned lag
    * window, one restaurant-grain rollup. */
  def runsTest(orderRevenue: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val daily = orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      .agg(sum(round(col("total_revenue") * 10000).cast("long")).as("cents"))
    val spine = daily
      .groupBy(col("restaurant_id"))
      .agg(min(col("creation_date")).as("d0"),
        max(col("creation_date")).as("d1"))
      .select(col("restaurant_id"),
        explode(sequence(col("d0"), col("d1"))).as("creation_date"))
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col("restaurant_id")).orderBy(col("creation_date"))
    val grid = spine.join(daily, Seq("restaurant_id", "creation_date"), "left")
      .select(col("restaurant_id"), col("creation_date"),
        coalesce(col("cents"), lit(0L)).as("x"))
    // n/Σx as WHOLE-PARTITION window aggregates instead of the r15
    // groupBy+join-back (r16, guide §2.4): the join-back recomputed the
    // ENTIRE spine-fill subtree once per side (tot + probe — Catalyst
    // shares no subplans across join arms) and added an exchange; the
    // windows reuse the lag window's (restaurant_id, creation_date)
    // sort, so the grid is built once and shuffled once. Values are
    // identical: count/sum over the full partition ≡ the grouped
    // count/sum joined back on the group key.
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("restaurant_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val signed = grid
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("sx", sum(col("x")).over(wAll))
      .withColumn("s",
        when(col("x").cast(dec) * col("n") > col("sx").cast(dec), 1L)
          .otherwise(0L))
      .withColumn("chg",
        when(lag(col("s"), 1).over(ord).isNull, 0L)
          .when(col("s") =!= lag(col("s"), 1).over(ord), 1L).otherwise(0L))
    signed.groupBy(col("restaurant_id"), col("n"))
      .agg(sum(col("s")).as("n1"), (lit(1L) + sum(col("chg"))).as("r"))
      .withColumn("n2", col("n") - col("n1"))
      .filter(col("n1") > 0 && col("n2") > 0)
      .withColumn("e",
        lit(2.0) * col("n1") * col("n2") / col("n") + lit(1.0))
      .withColumn("v",
        lit(2.0) * col("n1") * col("n2")
          * (lit(2.0) * col("n1") * col("n2") - col("n"))
          / (col("n").cast("double") * col("n") * (col("n") - 1)))
      .filter(col("v") > 0.0)
      .withColumn("zq",
        round((col("r") - col("e")) / sqrt(col("v")) * 1e6).cast("long"))
      .withColumn("ax", abs(col("zq")) / 1e6 / sqrt(lit(2.0)))
      .withColumn("tt", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("ax")))
      .withColumn("pu",
        round(((((lit(1.061405429) * col("tt") - lit(1.453152027)) * col("tt")
            + lit(1.421413741)) * col("tt") - lit(0.284496736)) * col("tt")
            + lit(0.254829592)) * col("tt")
          * exp(-(col("ax") * col("ax"))) * 1e9).cast("long"))
      .select(col("restaurant_id"), col("n").as("n_days"),
        col("n1").as("n_above"), col("r").as("n_runs"),
        (col("zq") / 1e6).as("z"), (col("pu") / 1e9).as("p_value"))
      .orderBy(col("restaurant_id"))
  }

  /** Poisson overdispersion test of daily demand per restaurant — the
    * model-choice gate BEFORE any count forecast ([[seasonalNaiveBands]]
    * and the Croston tier assume clumpy demand; a Poisson GLM assumes
    * not): under Poisson, the dispersion statistic
    * χ² = Σ(xₜ−x̄)²∕x̄ = (nΣx²−(Σx)²)∕Σx is χ²_{n−1}, so D = χ²∕(n−1)
    * near 1 means Poisson-like days and D ≫ 1 means clumping
    * (promo bursts, weekly cycles). The upper-tail p uses the
    * Wilson–Hilferty cube-root normal approximation
    * z = ((χ²∕ν)^⅓ − (1−2∕9ν))·√(9ν∕2) — cbrt and sqrt are available
    * and deterministic on both engines — then the shared A&S erfc
    * chain with the erfc(−x) = 2−erfc(x) reflection for
    * underdispersed (z < 0) restaurants.
    *
    * Exactness: daily line counts over the zero-filled spine are exact
    * longs; the χ² NUMERATOR nΣx²−(Σx)² is exact decimal(38,0)
    * (HUGEINT) — χ² itself is one exact-integer division quantized
    * 1e-6; z and p are fixed double chains quantized 1e-6∕1e-9.
    *
    * Scale shape: one fact-grain hash aggregate to (restaurant, day),
    * spine fill, one restaurant-grain aggregate — no window, no join
    * beyond the spine. */
  def overdispersion(orderRevenue: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val daily = orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      .agg(count(lit(1)).as("x"))
    val spine = daily
      .groupBy(col("restaurant_id"))
      .agg(min(col("creation_date")).as("d0"),
        max(col("creation_date")).as("d1"))
      .select(col("restaurant_id"),
        explode(sequence(col("d0"), col("d1"))).as("creation_date"))
    val agg = spine
      .join(daily, Seq("restaurant_id", "creation_date"), "left")
      .select(col("restaurant_id"), coalesce(col("x"), lit(0L)).as("x"))
      .groupBy(col("restaurant_id"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x").cast(dec) * col("x")).as("sxx"))
      .filter(col("n") > 1 && col("sx") > 0)
    agg
      .withColumn("num",
        col("n").cast(dec) * col("sxx") - col("sx").cast(dec) * col("sx"))
      .withColumn("chi2q",
        round(col("num").cast("double") / col("sx") * 1e6).cast("long"))
      .withColumn("nu", (col("n") - 1).cast("double"))
      .withColumn("zq", round(
        (cbrt(col("chi2q") / 1e6 / col("nu"))
          - (lit(1.0) - lit(2.0) / (lit(9.0) * col("nu"))))
          * sqrt(lit(9.0) * col("nu") / lit(2.0)) * 1e6).cast("long"))
      .withColumn("ax", abs(col("zq")) / 1e6 / sqrt(lit(2.0)))
      .withColumn("tt", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("ax")))
      .withColumn("eu",
        round(((((lit(1.061405429) * col("tt") - lit(1.453152027)) * col("tt")
            + lit(1.421413741)) * col("tt") - lit(0.284496736)) * col("tt")
            + lit(0.254829592)) * col("tt")
          * exp(-(col("ax") * col("ax"))) * 1e9).cast("long"))
      // one-sided upper tail: Q(z) = erfc(z/sqrt2)/2, reflected below 0;
      // integer halving of the 1e-9 units keeps the compare exact
      .withColumn("pu", when(col("zq") >= 0, expr("(eu + 1) div 2"))
        .otherwise(lit(1000000000L) - expr("eu div 2")))
      .select(col("restaurant_id"), col("n").as("n_days"),
        expr("((sx * 1000000 * 2 + n) div (n * 2)) " +
          "/ cast(1000000 as double)").as("mean_lines"),
        expr(s"""((cast(num as $dec) * 1000000 * 2 + cast(n - 1 as $dec) * sx)
                 div (cast(n - 1 as $dec) * sx * 2))""").cast("double")
          ./(1e6).as("dispersion"),
        (col("chi2q") / 1e6).as("chi2"), (col("zq") / 1e6).as("z"),
        (col("pu") / 1e9).as("p_over"))
      .orderBy(col("restaurant_id"))
  }

  /** Per-restaurant lifecycle profile: first/last active day, span,
    * distinct active days, activity density (active/span), and revenue
    * per active day — the coverage audit that separates "steady daily
    * seller" from "two bursts a year" before any per-day model
    * ([[gapFillDaily]]'s spine assumes the span; this measures how full
    * it is).
    *
    * One hash aggregate at (restaurant, day) grain then one at
    * restaurant grain — no windows, no joins; integer cents and day
    * arithmetic, two final divisions. */
  def lifecycleProfile(orderRevenue: DataFrame): DataFrame =
    orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      .agg(sum(round(col("total_revenue") * 10000).cast("long")).as("cents"))
      .groupBy(col("restaurant_id"))
      .agg(
        min(col("creation_date")).as("first_day"),
        max(col("creation_date")).as("last_day"),
        count(lit(1)).as("active_days"),
        sum(col("cents")).as("cents"))
      .select(
        col("restaurant_id"), col("first_day"), col("last_day"),
        (datediff(col("last_day"), col("first_day")) + 1).cast("long")
          .as("span_days"),
        col("active_days"),
        round(col("active_days").cast("double")
          / (datediff(col("last_day"), col("first_day")) + 1), 6)
          .as("activity_density"),
        round(col("cents") / 10000.0 / col("active_days"), 6)
          .as("revenue_per_active_day"))

  /** Daily new-vs-returning customer decomposition: per day, active
    * purchasers split by whether it is their FIRST purchase day — the
    * acquisition/retention growth-accounting mart
    * ([[cohortLtvCurve]]'s daily margin, [[graft.ext.Behavior.retentionWeekly]]'s
    * order-side sibling).
    *
    * Exactness: pure distinct/first-date integer counting; the share is
    * one division. Shape: (user, day) distinct reduce → user-grain min
    * → user-keyed equi join → day-grain hash aggregate. No windows. */
  def newVsReturning(orderRevenue: DataFrame): DataFrame = {
    val ud = orderRevenue
      .select(col("user_id"), col("creation_date")).distinct()
    val firsts = ud.groupBy(col("user_id"))
      .agg(min(col("creation_date")).as("first_date"))
    ud.join(firsts, Seq("user_id"))
      .groupBy(col("creation_date"))
      .agg(
        count(lit(1)).as("active_users"),
        sum(when(col("creation_date") === col("first_date"), 1L)
          .otherwise(0L)).as("new_users"))
      .select(
        col("creation_date"), col("active_users"), col("new_users"),
        (col("active_users") - col("new_users")).as("returning_users"),
        round(col("new_users").cast("double") / col("active_users"), 6)
          .as("new_share"))
  }

  /** Seasonal-naive forecast backtest with MASE (Hyndman & Koehler '06):
    * forecast each day as the same weekday last week (ŷ(t) = y(t−7) on
    * the zero-filled spine), hold out each restaurant's last `testDays`
    * days, and score MAE on the holdout scaled by the TRAINING period's
    * seasonal-naive MAE — the standard scale-free accuracy gate a
    * forecast (e.g. [[ewmaForecast]]) must beat (MASE < 1) to justify
    * replacing the naive rule.
    *
    * Exactness: absolute errors are exact integer cents summed as longs
    * (order-free); the two MAEs and their ratio are single shared IEEE
    * division chains, 6dp. A zero training MAE (perfectly periodic
    * history) yields NULL MASE, not Inf.
    *
    * Shape: fact → daily hash aggregate → per-key spine explode (mart
    * grain) → ONE restaurant-partitioned lag window (the d1 span bound
    * rides the spine build, no second window) → restaurant-grain
    * rollup. */
  def seasonalNaiveBacktest(
      orderRevenue: DataFrame, season: Int = 7, testDays: Int = 28): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      .agg(sum(round(col("total_revenue") * 10000).cast("long")).as("cents"))
    val spine = daily
      .groupBy(col("restaurant_id"))
      .agg(min(col("creation_date")).as("d0"), max(col("creation_date")).as("d1"))
      .select(col("restaurant_id"), col("d1"),
        explode(sequence(col("d0"), col("d1"))).as("creation_date"))
    val byDay = Window.partitionBy(col("restaurant_id"))
      .orderBy(col("creation_date"))
    spine
      .join(daily, Seq("restaurant_id", "creation_date"), "left")
      .withColumn("y", coalesce(col("cents"), lit(0L)))
      .withColumn("yhat", lag(col("y"), season).over(byDay))
      .filter(col("yhat").isNotNull)
      .withColumn("is_test",
        datediff(col("d1"), col("creation_date")) < testDays)
      .withColumn("ae", abs(col("y") - col("yhat")))
      .groupBy(col("restaurant_id"))
      .agg(
        sum(when(col("is_test"), 1L).otherwise(0L)).as("n_test"),
        sum(when(col("is_test"), col("ae")).otherwise(0L)).as("sae_test"),
        sum(when(!col("is_test"), 1L).otherwise(0L)).as("n_train"),
        sum(when(!col("is_test"), col("ae")).otherwise(0L)).as("sae_train"))
      .filter(col("n_test") > 0 && col("n_train") > 0)
      .select(
        col("restaurant_id"), col("n_test"), col("n_train"),
        round(col("sae_test") / 10000.0 / col("n_test"), 6).as("mae_test"),
        round(col("sae_train") / 10000.0 / col("n_train"), 6).as("mae_train"),
        when(col("sae_train") > 0,
          round((col("sae_test").cast("double") / col("n_test"))
            / (col("sae_train").cast("double") / col("n_train")), 6))
          .as("mase"))
  }

  /** Holt's linear trend (double exponential smoothing): [[ewmaForecast]]
    * plus a TREND state, so the one-step forecast extrapolates slope
    * instead of flat-lining — the standard next rung on the forecasting
    * ladder (level α = 1/4, trend β = 1/8, both exactly representable).
    * Per observed day: `f = l + b` (the forecast made BEFORE seeing y,
    * NULL on each key's first day), then
    * `l' = 0.25·y + 0.75·(l + b)` and `b' = 0.125·(l' − l) + 0.875·b`.
    *
    * Exactness: y is exact integer cents lifted into doubles; both
    * update lines are fixed IEEE chains evaluated in date order, so
    * identical input sequences give bit-identical states on both
    * engines (the q155 discipline, two state doubles instead of one);
    * emitted unrounded. DuckDB mirrors the same chains via a recursive
    * CTE over the per-key row_number.
    *
    * Scale shape: identical to [[ewmaForecast]] — (key, day) reduce,
    * repartition by key + partition-local sort, `mapPartitions`
    * sequential state; all keys run in parallel. */
  def holtForecast(orderRevenue: DataFrame): DataFrame = {
    val spark = orderRevenue.sparkSession
    import spark.implicits._
    val daily = orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      .agg(sum(graft.gold.Money.cents(col("total_revenue")).cast("long"))
        .as("cents"))
      .select(
        col("restaurant_id").cast("long").as("rid"),
        col("creation_date").cast("date").as("d"),
        col("cents"))
      .repartition(col("rid"))
      .sortWithinPartitions(col("rid"), col("d"))
      .as[(Long, java.sql.Date, Long)]
    daily.mapPartitions { it =>
      var curR = Long.MinValue
      var l = 0.0
      var b = 0.0
      it.map { case (rid, d, cents) =>
        val y = cents.toDouble
        val f: Option[Double] =
          if (rid != curR) None else Some(l + b)
        if (rid != curR) {
          curR = rid; l = y; b = 0.0
        } else {
          val lNew = 0.25 * y + 0.75 * (l + b)
          b = 0.125 * (lNew - l) + 0.875 * b
          l = lNew
        }
        (rid, d, cents, l, b, f)
      }
    }.toDF("restaurant_id", "creation_date", "cents", "l", "b", "f")
      .select(
        col("restaurant_id"), col("creation_date"),
        (col("cents") / 10000.0).as("daily_revenue"),
        (col("l") / 10000.0).as("level"),
        (col("b") / 10000.0).as("trend"),
        (col("f") / 10000.0).as("forecast_revenue"))
  }

  /** Holt–Winters additive forecast with weekly seasonality — the
    * seasonal completion of the [[ewmaForecast]] → [[holtForecast]]
    * ladder: level + trend + a 7-slot day-of-week seasonal state, so
    * the one-step forecast stops lagging the weekly cycle the two
    * simpler smoothers flatten ([[weekdaySeasonality]] DETECTS the
    * cycle; this one forecasts THROUGH it). Smoothing constants are
    * binary-exact dyadics (α = ¼, β = ⅛, γ = ¼) so every update is an
    * exact IEEE chain both engines replay bit-for-bit.
    *
    * The seasonal slot is ARITHMETIC day-of-week
    * ((date − 1970-01-01) mod 7) — an integer both engines derive
    * identically, sidestepping the Sunday-0 ∕ Monday-1 disagreement
    * between engine dayofweek functions. Initialization: first
    * observation seeds the level, zero trend, zero seasonals (each
    * slot then learns on its own first hit — deterministic, no
    * lookahead init pass). Forecast is the PRE-update l + b + s[slot],
    * NULL on a restaurant's first row.
    *
    * Shape: the [[holtForecast]] device — one fact aggregate, ONE
    * shuffle to co-locate each restaurant's days, a linear
    * in-partition recurrence carrying a 7-double array; mirrored
    * state-for-state by a recursive CTE whose seasonal state is a
    * 7-element list. */
  def holtWintersForecast(orderRevenue: DataFrame): DataFrame = {
    val spark = orderRevenue.sparkSession
    import spark.implicits._
    val daily = orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      .agg(sum(graft.gold.Money.cents(col("total_revenue")).cast("long"))
        .as("cents"))
      .select(
        col("restaurant_id").cast("long").as("rid"),
        col("creation_date").cast("date").as("d"),
        col("cents"),
        pmod(datediff(col("creation_date"), lit("1970-01-01")), lit(7))
          .cast("int").as("k"))
      .repartition(col("rid"))
      .sortWithinPartitions(col("rid"), col("d"))
      .as[(Long, java.sql.Date, Long, Int)]
    daily.mapPartitions { it =>
      var curR = Long.MinValue
      var l = 0.0
      var b = 0.0
      var s = new Array[Double](7)
      it.map { case (rid, d, cents, k) =>
        val y = cents.toDouble
        val f: Option[Double] =
          if (rid != curR) None else Some(l + b + s(k))
        if (rid != curR) {
          curR = rid; l = y; b = 0.0; s = new Array[Double](7)
        } else {
          val lNew = 0.25 * (y - s(k)) + 0.75 * (l + b)
          b = 0.125 * (lNew - l) + 0.875 * b
          s(k) = 0.25 * (y - lNew) + 0.75 * s(k)
          l = lNew
        }
        (rid, d, cents, l, b, s(k), f)
      }
    }.toDF("restaurant_id", "creation_date", "cents", "l", "b", "sk", "f")
      .select(
        col("restaurant_id"), col("creation_date"),
        (col("cents") / 10000.0).as("daily_revenue"),
        (col("l") / 10000.0).as("level"),
        (col("b") / 10000.0).as("trend"),
        (col("sk") / 10000.0).as("seasonal"),
        (col("f") / 10000.0).as("forecast_revenue"))
  }

  /** Single-changepoint location by binary segmentation: per
    * restaurant, the split day that MINIMIZES the two-segment sum of
    * squared errors — WHERE the level shifted, where [[cusumShift]]
    * only alarms THAT it shifted. One pass of prefix moments turns
    * every candidate split into a closed form (minimizing SSE ⇔
    * maximizing S_l²∕n_l + S_r²∕n_r), so the scan is linear per
    * series, not quadratic — the [[graft.ext.Encoding.giniStump]]
    * argmin device applied to series means.
    *
    * Exactness: prefix sums of cents and cents² ride decimal(38,0)
    * (cents² passes int64 at ~3e9-cent days); each candidate's score
    * is the identical fixed double chain on both engines, and the
    * argmax orders by (score DESC, date ASC) — total, so ties cut at
    * the same day everywhere. The SSE-reduction share is NULL for a
    * constant series (zero total SSE — nothing to explain).
    *
    * Shape: one fact aggregate to (restaurant, day) grain, prefix
    * sums in ONE key-partitioned window pass, a broadcast-joined
    * per-series total, and the per-series argmax window — day grain
    * throughout, nothing unpartitioned. */
  def changepoint(orderRevenue: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val daily = orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      .agg(sum(graft.gold.Money.cents(col("total_revenue")).cast("long"))
        .as("cents"))
    val byDay = Window.partitionBy(col("restaurant_id"))
      .orderBy(col("creation_date"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = daily.groupBy(col("restaurant_id"))
      .agg(count(lit(1)).as("n"), sum(col("cents").cast(dec)).as("st"),
        sum(col("cents").cast(dec) * col("cents")).as("qt"))
    val pre = daily
      .withColumn("t", count(lit(1)).over(byDay))
      .withColumn("sl", sum(col("cents").cast(dec)).over(byDay))
      .join(tot, Seq("restaurant_id"))
      .filter(col("t") < col("n"))
    def sq(c: Column) = c.cast("double") * c.cast("double")
    val score = sq(col("sl")) / col("t").cast("double") +
      sq(col("st") - col("sl")) / (col("n") - col("t")).cast("double")
    val byScore = Window.partitionBy(col("restaurant_id"))
      .orderBy(col("score").desc, col("creation_date"))
    val sseTotal = col("qt").cast("double") -
      sq(col("st")) / col("n").cast("double")
    pre
      .withColumn("score", score)
      .withColumn("rn", row_number().over(byScore))
      .filter(col("rn") === 1)
      .select(col("restaurant_id"),
        col("creation_date").as("change_date"),
        col("t").as("n_before"), (col("n") - col("t")).as("n_after"),
        expr("(((sl * 100 * 2) + t) div (t * 2)) " +
          "/ cast(1000000 as double)").as("mean_before"),
        expr("((((st - sl) * 100 * 2) + (n - t)) div ((n - t) * 2)) " +
          "/ cast(1000000 as double)").as("mean_after"),
        when(sseTotal > 0,
          round((col("qt").cast("double") - col("score")) / sseTotal, 6))
          .as("sse_share_remaining"))
      .orderBy(col("restaurant_id"))
  }

  /** Cohort LTV curves: users grouped by first-purchase month, each
    * cohort's revenue tracked by age-in-months — the (cohort × age)
    * triangle a growth team reads to compare acquisition vintages
    * ([[graft.ext.Behavior.retentionWeekly]] is the event-side sibling;
    * this one is revenue-weighted and cumulative).
    *
    * Per cell: active users, period revenue, cumulative LTV per
    * ORIGINAL cohort member (denominator is cohort size, not active
    * count — the curve must flatten, not jump, as users churn), and the
    * retention share. Exactness: integer-cent sums end-to-end; ages are
    * integer month arithmetic (`year·12+month` deltas — no
    * months_between float); the three ratios are single shared IEEE
    * division chains, 6dp.
    *
    * Shape: fact → (user, month) hash aggregate FIRST, so the cohort
    * min, the (cohort, age) rollup, and the cumulative window all run
    * at user-month grain or coarser; the cumsum window partitions by
    * cohort over ≤ months ages — mart-sized. Cohort sizes ride back by
    * broadcast. */
  def cohortLtvCurve(orderRevenue: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = orderRevenue
      .groupBy(col("user_id"),
        to_date(date_trunc("month", col("creation_date"))).as("om"))
      .agg(sum(graft.gold.Money.cents(col("total_revenue")).cast("long"))
        .as("cents"))
    val cohorts = monthly.groupBy(col("user_id"))
      .agg(min(col("om")).as("cohort_month"))
    val sizes = cohorts.groupBy(col("cohort_month"))
      .agg(count(lit(1)).as("cohort_size"))
    val cells = monthly.join(cohorts, Seq("user_id"))
      .withColumn("age_months",
        (year(col("om")) * 12 + month(col("om")))
          - (year(col("cohort_month")) * 12 + month(col("cohort_month"))))
      .groupBy(col("cohort_month"), col("age_months"))
      .agg(countDistinct(col("user_id")).as("active_users"),
        sum(col("cents")).as("cents"))
    val cum = Window.partitionBy(col("cohort_month"))
      .orderBy(col("age_months"))
      .rowsBetween(Window.unboundedPreceding, 0)
    cells
      .withColumn("cum_cents", sum(col("cents")).over(cum))
      .join(broadcast(sizes), Seq("cohort_month"))
      .select(
        col("cohort_month"), col("age_months"), col("cohort_size"),
        col("active_users"),
        round(col("cents") / 10000.0, 6).as("revenue"),
        round(col("cum_cents") / 10000.0 / col("cohort_size"), 6)
          .as("ltv_per_user"),
        round(col("active_users").cast("double") / col("cohort_size"), 6)
          .as("retention"))
  }

  /** Theil–Sen robust trend of the market's daily revenue: the median
    * of all pairwise day-slopes, plus the matching median intercept —
    * the outlier-immune alternative to [[revenueTrendFit]]'s OLS (one
    * promo-day spike moves an OLS slope; it moves one slope out of
    * N²/2 here).
    *
    * Scale shape: the fact first collapses to ONE market-level daily
    * series (hash aggregate), so the O(N²) pair join is quadratic in
    * CALENDAR DAYS — bounded by the time axis, not data volume; at ten
    * years it is ~6.7M pairs regardless of fact size. Exactness: cents
    * are exact longs; each slope is one fixed double division then
    * quantized to integer micro-cents/day BEFORE the median, so the
    * interpolated median sees the identical integer multiset on both
    * engines (a raw-double median can diverge in the interpolation
    * step). */
  def theilSen(orderRevenue: DataFrame): DataFrame = {
    val daily = orderRevenue
      .groupBy(col("creation_date"))
      .agg(sum(round(col("total_revenue") * 10000).cast("long")).as("cents"))
    val span = daily.agg(
      min(col("creation_date")).as("d0"), max(col("creation_date")).as("d1"))
    val grid = span
      .select(col("d0"),
        explode(sequence(col("d0"), col("d1"))).as("creation_date"))
      .join(daily, Seq("creation_date"), "left")
      .select(datediff(col("creation_date"), col("d0")).cast("long").as("d"),
        coalesce(col("cents"), lit(0L)).as("x"))
    // spread the left side before the broadcast-NL pair join — the grid
    // arrives in one scan partition and would otherwise generate all
    // N²/2 slopes on a single core
    val par = grid.sparkSession.sparkContext.defaultParallelism
    val a = grid.repartition(par).select(col("d").as("da"), col("x").as("xa"))
    val b = grid.select(col("d").as("db"), col("x").as("xb"))
    val slopes = a.crossJoin(broadcast(b)).filter(col("db") > col("da"))
      .select(round((col("xb") - col("xa")).cast("double") /
          (col("db") - col("da")) * 1000000).cast("long").as("sq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exact interpolated median by distributed sort + index selection —
    // a `percentile` aggregate over millions of near-distinct longs
    // builds (and merges) a value-count hashmap of the same size; the
    // sort ships the same rows once and reads back two of them. The
    // two driver-side scalars are the bounded-collect shape the
    // watermark loaders already use.
    val nPairs = slopes.count()
    if (nPairs == 0) {
      // zero slope pairs (empty input, or a single calendar day): no
      // slope is estimable — emit the empty frame with the operator's
      // schema instead of crashing on sel.head
      slopes.unpersist()
      grid
        .select(count(lit(1)).as("n_days"), lit(0L).as("n_pairs"),
          lit(null).cast("double").as("slope_per_day"),
          lit(null).cast("double").as("intercept"))
        .filter(lit(false))
    } else {
      val (k1, k2) = ((nPairs - 1) / 2, nPairs / 2)
      val sel = slopes.orderBy(col("sq")).rdd.map(_.getLong(0)).zipWithIndex()
        .filter { case (_, i) => i == k1 || i == k2 }
        .map(_._1).collect().sorted
      slopes.unpersist()
      // (a+b)/2 == lower + (upper-lower)·0.5 exactly for in-range longs —
      // the same value percentile(sq, 0.5) interpolates to
      val m = (sel.head + sel.last) / 2.0
      grid
        .select(
          round((col("x").cast("double") - lit(m) / lit(1000000.0) * col("d"))
            * 100).cast("long").as("rq"))
        .agg(expr("percentile(rq, 0.5)").as("ic"), count(lit(1)).as("n_days"))
        .select(col("n_days"), lit(nPairs).as("n_pairs"),
          round(lit(m) / lit(1.0e10), 6).as("slope_per_day"),
          round(col("ic") / lit(1000000.0), 6).as("intercept"))
    }
  }

  /** Mann–Kendall trend test per restaurant — the SIGNIFICANCE
    * companion to [[theilSen]]'s slope estimate: S = Σ_{i<j}
    * sgn(x_j − x_i) over the month-ordered revenue sequence, the
    * tie-corrected variance n(n−1)(2n+5)∕18 − Σt(t−1)(2t+5)∕18, the
    * continuity-corrected z = (S∓1)∕√Var, and the two-sided
    * p = erfc(|z|∕√2) via the same Abramowitz–Stegun 7.1.26 chain the
    * BH-FDR tier established (identical double chain both engines,
    * quantized 1e-6∕1e-9 before every compare). Distribution-free: a
    * monotone trend registers regardless of revenue's shape, where an
    * OLS t-test assumes normal residuals.
    *
    * Exactness: monthly cents exact longs; S, n, and the tie term are
    * exact integer aggregates; z and p are fixed double chains over
    * those integers (√ is IEEE-exact; the A&S |ε| < 1.5·10⁻⁷ is far
    * below reporting precision).
    *
    * Scale shape: one fact-grain hash aggregate to (restaurant,
    * month); the pair join is restaurant-co-partitioned and quadratic
    * only in CALENDAR MONTHS (≤ ~n²∕2 ≈ 300 rows per restaurant at a
    * 2-year span) — bounded by the time axis, not data volume. */
  def mannKendall(orderRevenue: DataFrame): DataFrame = {
    val monthly = orderRevenue
      .groupBy(col("restaurant_id"),
        date_trunc("month", col("creation_date")).cast("date").as("m"))
      .agg(sum(round(col("total_revenue") * 10000).cast("long")).as("c"))
      // both pair sides + the tie histogram read it
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.CacheLifecycle.unpersistAfterNextAction(monthly)
    val s = monthly.as("a").join(monthly.as("b"),
        col("a.restaurant_id") === col("b.restaurant_id")
          && col("b.m") > col("a.m"))
      .groupBy(col("a.restaurant_id").as("restaurant_id"))
      .agg(sum(when(col("b.c") > col("a.c"), 1L)
        .when(col("b.c") < col("a.c"), -1L).otherwise(0L)).as("s"))
    val tie = monthly.groupBy(col("restaurant_id"), col("c"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("restaurant_id"))
      .agg(sum(col("t")).as("n"),
        sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5)).as("tie_sum"))
    tie.join(s, Seq("restaurant_id"), "left")
      .select(col("restaurant_id"), col("n"),
        coalesce(col("s"), lit(0L)).as("s"),
        (col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5)
          - col("tie_sum")).as("vn"))
      .withColumn("zq",
        round(when(col("s") > 0,
            (col("s") - 1) / sqrt(col("vn") / lit(18.0)))
          .when(col("s") < 0,
            (col("s") + 1) / sqrt(col("vn") / lit(18.0)))
          .otherwise(lit(0.0)) * 1e6).cast("long"))
      .withColumn("x", abs(col("zq")) / 1e6 / sqrt(lit(2.0)))
      .withColumn("tt", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("x")))
      .withColumn("pu",
        round(((((lit(1.061405429) * col("tt") - lit(1.453152027)) * col("tt")
            + lit(1.421413741)) * col("tt") - lit(0.284496736)) * col("tt")
            + lit(0.254829592)) * col("tt")
          * exp(-(col("x") * col("x"))) * 1e9).cast("long"))
      .select(col("restaurant_id"), col("n").as("n_months"),
        col("s").as("s_stat"), (col("zq") / 1e6).as("z"),
        (col("pu") / 1e9).as("p_value"),
        when(col("s") > 0, "up").when(col("s") < 0, "down")
          .otherwise("flat").as("trend"))
      .orderBy(col("restaurant_id"))
  }

  /** Seasonal-naive forecast with empirical uncertainty bands: for each
    * restaurant, the LAST week of its span is "forecast" by the value
    * seven days earlier, with an interval from the p10/p90 of the
    * historical week-over-week residuals — the honest-baseline interval
    * a fancier model must beat ([[seasonalNaiveBacktest]] scores the
    * point forecast; this adds calibrated bands and a coverage flag).
    *
    * Gap-filled grid (zeros are real observations for demand), lag-7
    * window per restaurant, residual percentiles over exact integer
    * cents — interpolation lands on exact tenths, engine-stable. */
  def seasonalNaiveBands(orderRevenue: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      .agg(sum(round(col("total_revenue") * 10000).cast("long")).as("cents"))
    val spine = daily
      .groupBy(col("restaurant_id"))
      .agg(min(col("creation_date")).as("d0"), max(col("creation_date")).as("d1"))
      .select(col("restaurant_id"), col("d1"),
        explode(sequence(col("d0"), col("d1"))).as("creation_date"))
    val w = Window.partitionBy(col("restaurant_id")).orderBy(col("creation_date"))
    val grid = spine.join(daily, Seq("restaurant_id", "creation_date"), "left")
      .select(col("restaurant_id"), col("creation_date"), col("d1"),
        coalesce(col("cents"), lit(0L)).as("x"))
      .withColumn("f", lag(col("x"), 7).over(w))
      .filter(col("f").isNotNull)
      .withColumn("r", col("x") - col("f"))
    val holdout = col("creation_date") > col("d1") - expr("INTERVAL 7 DAYS")
    // train-side bands as WHOLE-PARTITION window aggregates on the lag
    // window's existing (restaurant) distribution instead of a
    // groupBy + join-back (r16, the q328 idiom): the join-back plan
    // computed the entire grid subtree (daily agg + spine + left join +
    // lag window) TWICE — once under the bands aggregate's broadcast
    // build and once as the probe — plus one aggregate exchange.
    // Equivalence: count/percentile over when(!holdout, r) see exactly
    // the train-row multiset per restaurant (aggregates skip the
    // holdout rows' NULLs), and the old inner join kept a holdout row
    // iff its restaurant had >= 1 train row == n_train > 0 here.
    val wAll = Window.partitionBy(col("restaurant_id"))
    val train = when(!holdout, col("r"))
    grid
      .withColumn("n_train", count(train).over(wAll))
      .withColumn("p10", percentile(train, lit(0.1)).over(wAll))
      .withColumn("p90", percentile(train, lit(0.9)).over(wAll))
      .filter(holdout && col("n_train") > 0)
      .select(col("restaurant_id"), col("creation_date"), col("n_train"),
        (col("x") / lit(10000.0)).as("actual"),
        (col("f") / lit(10000.0)).as("forecast"),
        ((col("f") + col("p10")) / lit(10000.0)).as("lo"),
        ((col("f") + col("p90")) / lit(10000.0)).as("hi"),
        (col("x").cast("double") >= col("f") + col("p10") &&
          col("x").cast("double") <= col("f") + col("p90")).as("within_band"))
  }

  /** Seasonal STRENGTH per restaurant: η² — the share of daily-revenue
    * variance explained by the ISO weekday (SS_between/SS_total), the
    * one-number summary of [[weekdaySeasonality]]'s effect table ("is
    * this venue weekly-periodic at all"). Between-group terms S_g²/n_g
    * quantize to integer milli-units BEFORE their 7-way sum (a raw
    * double Σ over groups is summation-order-dependent); dollar units
    * keep Σx² inside int64 (the q176 rule). */
  def seasonalStrength(orderRevenue: DataFrame): DataFrame = {
    val daily = orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      .agg(expr("sum(cast(round(total_revenue * 10000) as long)) div 10000")
        .as("d"))
    val byDay = daily
      .groupBy(col("restaurant_id"),
        weekday(col("creation_date")).cast("long").as("wd"))
      .agg(count(lit(1)).as("ng"), sum(col("d")).as("sg"),
        sum(col("d") * col("d")).as("sgg"))
      // floor(x+0.5), not round(): Spark's round() re-derives the
      // SHORTEST decimal string of the double (BigDecimal.valueOf)
      // while DuckDB rounds the exact binary value — they disagree on
      // near-tie rationals like sg²·1000/ng
      .withColumn("tg",
        floor(col("sg").cast("double") * col("sg") / col("ng") * 1000
          + lit(0.5)).cast("long"))
    byDay
      .groupBy(col("restaurant_id"))
      .agg(sum(col("ng")).as("n"), sum(col("sg")).as("s"),
        sum(col("sgg")).as("sxx"), sum(col("tg")).as("tb"),
        count(lit(1)).as("n_weekdays"))
      .withColumn("cf", col("s").cast("double") * col("s") / col("n"))
      .withColumn("sst", col("sxx").cast("double") - col("cf"))
      .filter(col("sst") > 0)
      // half-up 6dp via floor(x·1e6 + 0.5) on the IEEE value — round()
      // re-derives the decimal expansion and the two engines disagree
      // exactly when the rational lands on a .5e-6 boundary (seen at
      // sf0.01 here)
      .select(col("restaurant_id"), col("n").as("n_days"), col("n_weekdays"),
        (floor(((col("tb") / lit(1000.0) - col("cf")) / col("sst"))
          * lit(1000000.0) + lit(0.5)) / lit(1000000.0))
          .as("seasonal_strength"))
  }

  /** Hampel filter over each restaurant's ACTIVE-day revenue series:
    * a trading day is an outlier when it sits more than 3 scaled-MADs
    * (3·1.4826 = 4.4478) from the ±3-neighbor rolling MEDIAN — the
    * median-based sibling of [[graft.ext.Anomaly]]'s rolling-z (a
    * single spike inflates a rolling mean+stddev enough to hide
    * itself; it cannot move a 7-day median).
    *
    * Scale shape: fact → (restaurant, day) mart first; the ±window
    * neighborhood is a `rowsBetween(-w, +w)` FRAME, not a join — ONE
    * key-partitioned window collects each day's ≤ 2w+1 neighbor values,
    * and median and MAD both derive from that same collected array
    * (r7 ran two band self-joins + two exact percentile aggregates for
    * the identical multiset — 2 shuffles and a double neighbor fan-out
    * for nothing). Exactness: integer cents in; array medians in
    * DOUBLED integer units (odd count → 2·mid, even → lo+hi — exact
    * longs, the rank-doubling device), deviations doubled again, so
    * med = med2/2 and mad = mad4/4 reconstruct the interpolated-median
    * doubles bit-for-bit; one fixed double score formula, strict
    * compares. */
  def hampelOutliers(orderRevenue: DataFrame, window: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ACTIVE-day series (no gap fill): on sparse restaurants a
    // zero-filled spine drives the rolling median to 0 and flags every
    // trading day; the spike-vs-its-neighbors question is asked over
    // the days that actually traded
    val grid = orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      .agg(sum(round(col("total_revenue") * 10000).cast("long")).as("x"))
    val w = Window.partitionBy(col("restaurant_id"))
      .orderBy(col("creation_date")).rowsBetween(-window, window)
    // pinned key repartition before the window (r16): the grid is
    // byte-tiny after the (restaurant, day) rollup, so AQE coalesces
    // the window's exchange to a few tasks — but the per-row work here
    // (collect_list frame + two array_sorts + a transform per row) is
    // invisible to byte stats, and the bench read cpu_share 4.4 on 32
    // cores. The q168/Association class, applied to a WindowExec.
    val nPart = orderRevenue.sparkSession.sparkContext.defaultParallelism
    // doubled-unit median of a sorted long array: odd n -> 2*middle,
    // even n -> lo+hi — integer-exact where a /2 would truncate
    def med2Of(sorted: org.apache.spark.sql.Column,
        n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(n % 2 === 1,
        element_at(sorted, ((n + 1) / 2).cast("int")) * 2)
        .otherwise(element_at(sorted, (n / 2).cast("int"))
          + element_at(sorted, (n / 2).cast("int") + 1))
    grid
      .repartition(nPart, col("restaurant_id"))
      .withColumn("srt", array_sort(collect_list(col("x")).over(w)))
      .withColumn("n", size(col("srt")))
      .withColumn("med2", med2Of(col("srt"), col("n")))
      // |2x_j − med2| stays an exact long; its doubled median is 4× MAD
      .withColumn("dsrt",
        array_sort(transform(col("srt"),
          e => abs(e * 2 - col("med2")))))
      .withColumn("mad4", med2Of(col("dsrt"), col("n")))
      .withColumn("med", col("med2") / lit(2.0))
      .withColumn("mad", col("mad4") / lit(4.0))
      .withColumn("dev", abs(col("x") - col("med")))
      .filter((col("mad") > 0 && col("dev") > lit(4.4478) * col("mad")) ||
        (col("mad") === 0 && col("dev") > 0))
      .select(col("restaurant_id"), col("creation_date"),
        (col("x") / lit(10000.0)).as("revenue"),
        (col("med") / lit(10000.0)).as("rolling_median"),
        (col("mad") / lit(10000.0)).as("rolling_mad"),
        when(col("mad") > 0, round(col("dev") / (lit(4.4478) * col("mad")), 6))
          .as("severity"))
  }
}
