package graft.ext

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeseriesPruneSpec extends SparkSpec {
  import spark.implicits._

  test("gapFillDaily zero-fills each key's own span and flags the fills") {
    val revenue = Seq(
      (1L, Date.valueOf("2024-01-01"), 5.0),
      (1L, Date.valueOf("2024-01-01"), 2.5),   // same day, summed
      (1L, Date.valueOf("2024-01-04"), 1.0),   // 2 missing days between
      (2L, Date.valueOf("2024-02-10"), 9.0)    // single-day span → no fill
    ).toDF("restaurant_id", "creation_date", "total_revenue")
    val got = Timeseries.gapFillDaily(revenue)
      .orderBy($"restaurant_id", $"creation_date")
      .select($"restaurant_id", $"creation_date".cast("string"),
        $"revenue", $"is_gap")
      .as[(Long, String, Double, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "2024-01-01", 7.5, 0L),
      (1L, "2024-01-02", 0.0, 1L),
      (1L, "2024-01-03", 0.0, 1L),
      (1L, "2024-01-04", 1.0, 0L),
      (2L, "2024-02-10", 9.0, 0L)))
  }

  private lazy val dir = "/root/testdata/sf0.001"

  test("bloomPrunedSemiJoin equals the plain semi join") {
    val li = graft.core.Tables.lineitem(spark, dir)
    val urgent = graft.core.Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    val got = Prune.bloomPrunedSemiJoin(li, "l_orderkey", urgent, "o_orderkey")
    val want = li.join(
      urgent.select(col("o_orderkey").as("l_orderkey")).distinct(),
      Seq("l_orderkey"), "left_semi")
    assert(got.count() > 0, "bloom-pruned join returned nothing")
    assert(got.except(want).isEmpty, "bloom path emitted rows the semi join lacks")
    assert(want.except(got).isEmpty, "bloom path lost matching rows")
  }

  test("bloomPrunedSemiJoin with an empty dim returns an empty frame") {
    val li = graft.core.Tables.lineitem(spark, dir)
    val none = graft.core.Tables.orders(spark, dir).filter(lit(false))
    assert(Prune.bloomPrunedSemiJoin(li, "l_orderkey", none, "o_orderkey").isEmpty)
  }
  test("weekdaySeasonality: ISO weekday effects against the overall mean") {
    import java.sql.Date
    // 2024-01-01 is a Monday. Mondays: 10, 10; Tuesday: 40.
    // overall mean 20 -> Monday effect -10, Tuesday effect +20.
    val rows = Seq(
      (1L, Date.valueOf("2024-01-01"), 10.0),
      (1L, Date.valueOf("2024-01-08"), 10.0),
      (1L, Date.valueOf("2024-01-02"), 40.0)
    ).toDF("restaurant_id", "creation_date", "total_revenue")
    val got = graft.ext.Timeseries.weekdaySeasonality(rows)
      .orderBy("weekday")
      .select($"weekday", $"n_days", $"weekday_avg", $"seasonal_effect")
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (0, 2L, 10.0, -10.0),
      (1, 1L, 40.0, 20.0)))
  }

  test("seasonalResidualOutliers: weekday baseline removed, z on residuals, zero-variance guard") {
    import java.sql.Date
    // Mondays always 10 -> residual 0; Tuesdays 40/40 -> residual 0 too:
    // perfectly seasonal weeks are NOT outliers despite the 4x swing
    val seasonal = Seq(
      (1L, Date.valueOf("2024-01-01"), 10.0),
      (1L, Date.valueOf("2024-01-08"), 10.0),
      (1L, Date.valueOf("2024-01-02"), 40.0),
      (1L, Date.valueOf("2024-01-09"), 40.0)
    ).toDF("restaurant_id", "creation_date", "total_revenue")
    val flat = graft.ext.Timeseries.seasonalResidualOutliers(seasonal)
      .select($"residual", $"z", $"is_outlier")
      .as[(Double, Double, Boolean)].collect()
    assert(flat.forall(r => r._1 == 0.0 && r._2 == 0.0 && !r._3))
    // one Monday breaks pattern: residuals are nonzero and z splits signs
    val broken = Seq(
      (1L, Date.valueOf("2024-01-01"), 10.0),
      (1L, Date.valueOf("2024-01-08"), 10.0),
      (1L, Date.valueOf("2024-01-15"), 70.0)
    ).toDF("restaurant_id", "creation_date", "total_revenue")
    val got = graft.ext.Timeseries.seasonalResidualOutliers(broken)
      .orderBy("creation_date")
      .select($"creation_date", $"residual", $"z")
      .as[(Date, Double, Double)].collect().toSeq
    // weekday mean 30 -> residuals -20, -20, +40
    assert(got.map(_._2) == Seq(-20.0, -20.0, 40.0))
    assert(got(0)._3 < 0 && got(2)._3 > 0)
  }

  test("revenueTrendFit: perfect line fits slope and r2=1; degenerate keys emit nulls") {
    import java.sql.Date
    val rows = Seq(
      // key 1: revenue climbs exactly 10/day -> slope 10, r2 = 1
      (1L, Date.valueOf("2024-01-01"), 10.0),
      (1L, Date.valueOf("2024-01-02"), 20.0),
      (1L, Date.valueOf("2024-01-03"), 30.0),
      // key 2: single day -> zero x-variance -> NULL slope and r2
      (2L, Date.valueOf("2024-01-01"), 50.0),
      // key 3: flat revenue -> slope 0, zero y-variance -> NULL r2
      (3L, Date.valueOf("2024-01-01"), 5.0),
      (3L, Date.valueOf("2024-01-02"), 5.0)
    ).toDF("restaurant_id", "creation_date", "total_revenue")
    val got = graft.ext.Timeseries.revenueTrendFit(rows, epoch = "2024-01-01")
      .orderBy("restaurant_id")
      .as[(Long, Long, Option[Double], Option[Double])].collect().toSeq
    assert(got == Seq(
      (1L, 3L, Some(10.0), Some(1.0)),
      (2L, 1L, None, None),
      (3L, 2L, Some(0.0), None)))
  }

  test("ewmaForecast: seeded recurrence per key, forecast is prior level") {
    val rows = Seq(
      (1L, Date.valueOf("2024-01-01"), 1.0),
      (1L, Date.valueOf("2024-01-02"), 2.0),
      (1L, Date.valueOf("2024-01-03"), 2.0),
      // second key must restart the recurrence (no state bleed)
      (2L, Date.valueOf("2024-01-05"), 3.0)
    ).toDF("restaurant_id", "creation_date", "total_revenue")
    val got = graft.ext.Timeseries.ewmaForecast(rows)
      .orderBy("restaurant_id", "creation_date")
      .select($"restaurant_id", $"daily_revenue", $"smoothed_revenue",
        $"forecast_revenue")
      .as[(Long, Double, Double, Option[Double])].collect().toSeq
    // ew1 = y1; ew2 = 1 + 0.125*(2-1) = 1.125; ew3 = 1.125 + 0.125*0.875
    assert(got == Seq(
      (1L, 1.0, 1.0, None),
      (1L, 2.0, 1.125, Some(1.0)),
      (1L, 2.0, 1.125 + 0.125 * 0.875, Some(1.125)),
      (2L, 3.0, 3.0, None)))
  }
}
