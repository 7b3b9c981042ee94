package graft.ext

import org.apache.spark.sql.DataFrame
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

  /** Daily revenue per restaurant with missing days zero-filled across
    * each restaurant's own active span; `is_gap` marks filled rows. */
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

  def gapFillDaily(orderRevenue: DataFrame): DataFrame = {
    val daily = orderRevenue
      .groupBy(col("restaurant_id"), col("creation_date"))
      .agg(sum(round(col("total_revenue") * 10000)).as("cents"))
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
}
