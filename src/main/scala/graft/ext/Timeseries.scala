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
