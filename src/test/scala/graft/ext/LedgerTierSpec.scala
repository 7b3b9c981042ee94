package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit pins for q246–q250 (forecast bands, seasonal strength, growth
  * accounting, price ladder, Lorenz curve). */
class LedgerTierSpec extends SparkSpec {
  import spark.implicits._

  private def rev(rows: (Long, String, Double)*) =
    rows.toDF("restaurant_id", "day", "total_revenue")
      .withColumn("creation_date", col("day").cast("date"))

  test("seasonalNaiveBands: a perfectly periodic series is fully covered") {
    val rows = (0 until 21).map(d => (1L, f"2024-01-${d + 1}%02d", 10.0))
    val got = Timeseries.seasonalNaiveBands(rev(rows: _*))
      .select("actual", "forecast", "lo", "hi", "within_band")
      .as[(Double, Double, Double, Double, Boolean)].collect()
    assert(got.length == 7)
    assert(got.forall(r => r == ((10.0, 10.0, 10.0, 10.0, true))))
  }

  test("seasonalNaiveBands: window-aggregate bands match the groupBy+join reference") {
    // mixed spans + a gap: r1 has 24 days (17 train rows after the lag
    // filter), r2 has exactly 14 days (ZERO train rows — every f-valid
    // day is holdout, so the old inner join dropped it and the window
    // form's n_train > 0 filter must too), r3 has varied values so the
    // percentiles interpolate
    val rows =
      (0 until 24).map(d => (1L, f"2024-01-${d + 1}%02d", 10.0 + (d % 5))) ++
      (0 until 14).map(d => (2L, f"2024-02-${d + 1}%02d", 50.0)) ++
      (0 until 20).map(d => (3L, f"2024-03-${d + 1}%02d", d * 3.25))
    val got = Timeseries.seasonalNaiveBands(rev(rows: _*))
    // reference: the pre-r16 groupBy + inner-join-back shape
    import org.apache.spark.sql.expressions.Window
    val or = rev(rows: _*)
    val daily = or.groupBy(col("restaurant_id"), col("creation_date"))
      .agg(sum(round(col("total_revenue") * 10000).cast("long")).as("cents"))
    val spine = daily.groupBy(col("restaurant_id"))
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
    val bands = grid.filter(!holdout).groupBy(col("restaurant_id"))
      .agg(count(lit(1)).as("n_train"),
        expr("percentile(r, 0.1)").as("p10"),
        expr("percentile(r, 0.9)").as("p90"))
    val ref = grid.filter(holdout).join(bands, Seq("restaurant_id"))
      .select(col("restaurant_id"), col("creation_date"), col("n_train"),
        (col("x") / lit(10000.0)).as("actual"),
        (col("f") / lit(10000.0)).as("forecast"),
        ((col("f") + col("p10")) / lit(10000.0)).as("lo"),
        ((col("f") + col("p90")) / lit(10000.0)).as("hi"),
        (col("x").cast("double") >= col("f") + col("p10") &&
          col("x").cast("double") <= col("f") + col("p90")).as("within_band"))
    val k = Seq("restaurant_id", "creation_date")
    assert(got.schema == ref.schema)
    assert(got.filter(col("restaurant_id") === 2L).count() == 0)
    assert(got.orderBy(k.map(col): _*).collect().toSeq ==
      ref.orderBy(k.map(col): _*).collect().toSeq)
  }

  test("seasonalStrength: exact weekly periodicity pins eta^2 = 1") {
    // 4 full weeks, value = weekday index * 100 (starts Monday 2024-01-01)
    val rows = (0 until 28).map { d =>
      (1L, f"2024-01-${d + 1}%02d", (d % 7) * 100.0 + 100.0)
    }
    val got = Timeseries.seasonalStrength(rev(rows: _*))
      .select("n_days", "n_weekdays", "seasonal_strength")
      .as[(Long, Long, Double)].collect()
    assert(got.toSeq == Seq((28L, 7L, 1.0)))
  }

  test("growthAccounting: new/retained/resurrected/churned ledger") {
    // u1 active Jan, Feb, Apr; u2 active Feb only
    val df = Seq(
      (1L, "2024-01-05"), (1L, "2024-02-05"), (1L, "2024-04-05"),
      (2L, "2024-02-10"))
      .toDF("user_id", "day")
      .withColumn("creation_date", col("day").cast("date"))
      .withColumn("total_revenue", lit(1.0))
    val got = Olap.growthAccounting(df)
      .orderBy("month")
      .select("month", "n_active", "n_new", "n_retained",
        "n_resurrected", "n_churned")
      .as[(java.sql.Date, Long, Long, Long, Long, Long)].collect()
      .map { case (m, a, n, r, z, c) => (m.toString, a, n, r, z, c) }
    assert(got.toSeq == Seq(
      ("2024-01-01", 1L, 1L, 0L, 0L, 0L),
      ("2024-02-01", 2L, 1L, 1L, 0L, 0L),
      // March: nobody active, both churn (u1 resurfaces later, u2 never)
      ("2024-03-01", 0L, 0L, 0L, 0L, 2L),
      ("2024-04-01", 1L, 0L, 0L, 1L, 0L)))
  }

  test("priceLadder: interpolated quartiles and the premium index") {
    val parts = Seq((1L, "CAT")).toDF("p_partkey", "p_type")
    val lines = Seq(
      (1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
      .map { case (k, p) => (k, 1L, p, 1.0) }
      .toDF("l_orderkey", "l_partkey", "l_extendedprice", "l_quantity")
    val got = Olap.priceLadder(lines, parts)
      .select("n_lines", "p25", "p50", "p90", "premium_index")
      .as[(Long, Double, Double, Double, Double)].collect()
    assert(got.toSeq == Seq((4L, 17.5, 25.0, 37.0, 1.48)))
  }

  test("lorenzCurve: deciles accumulate to the full share") {
    val df = (1 to 10).map(i => (i.toLong, 5L, i * 10.0))
      .toDF("user_id", "restaurant_id", "total_revenue")
    val got = Olap.lorenzCurve(df)
      .orderBy("decile")
      .select("decile", "n_users", "revenue_share", "cum_share")
      .as[(Int, Long, Double, Double)].collect()
    assert(got.length == 10)
    assert(got.forall(_._2 == 1L))
    assert(got.head._3 == math.rint(1.0 / 55 * 1e6) / 1e6)
    assert(got.last._4 == 1.0)
  }
}
