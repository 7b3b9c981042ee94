package graft.ext

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  test("madOutliers flags the extreme day a variance-based score would dilute") {
    val d = (i: Int) => Date.valueOf(f"2024-01-${i}%02d")
    // 9 steady days at 100, one at 10000 — MAD stays 0-ish, z would be ~3
    val rows = ((1 to 9).map(i => (1L, d(i), 100.0)) :+ ((1L, d(10), 10000.0)))
      .toDF("restaurant_id", "creation_date", "total_revenue")
    val got = Anomaly.madOutliers(rows, k = 3.0, minDays = 5)
      .select($"creation_date".cast("string"), $"daily_revenue")
      .as[(String, Double)].collect().toSeq
    assert(got == Seq(("2024-01-10", 10000.0)))
  }

  test("madOutliers: zero MAD with all-equal days flags nothing") {
    val d = (i: Int) => Date.valueOf(f"2024-01-${i}%02d")
    val rows = (1 to 6).map(i => (1L, d(i), 50.0))
      .toDF("restaurant_id", "creation_date", "total_revenue")
    // every deviation is 0 and 0 > 0·k is false
    assert(Anomaly.madOutliers(rows).isEmpty)
  }

  test("groupCorr: exact ±1 on linear data, NULL on zero variance") {
    val rows = Seq(
      ("up", 1L, 10L), ("up", 2L, 20L), ("up", 3L, 30L),      // y = 10x → +1
      ("down", 1L, 30L), ("down", 2L, 20L), ("down", 3L, 10L), // y = -10x+40 → -1
      ("flat", 1L, 5L), ("flat", 2L, 5L), ("flat", 3L, 5L)     // var(y)=0 → NULL
    ).toDF("g", "x", "y")
    val got = Profiling.groupCorr(rows, Seq("g"), col("x"), col("y"))
      .select($"g", $"corr").as[(String, Option[Double])].collect().toMap
    assert(got == Map("up" -> Some(1.0), "down" -> Some(-1.0), "flat" -> None))
  }

  test("slidingDistinctUsers: users leave the window; ends are observed days only") {
    val d = (i: Int) => Date.valueOf(f"2024-01-${i}%02d")
    val rows = Seq(
      (1L, 10L, d(1)),  // u10 active day 1
      (1L, 11L, d(5)),  // u11 active day 5 — day-5 window covers both
      (1L, 11L, d(9))   // day-9 window: u10's day-1 activity has left
    ).toDF("restaurant_id", "user_id", "creation_date")
      .withColumn("total_revenue", lit(1.0))
    val got = graft.gold.Location.slidingDistinctUsers(rows, windowDays = 7)
      .select($"window_end".cast("string"), $"active_users")
      .as[(String, Long)].collect().toMap
    assert(got == Map(
      "2024-01-01" -> 1L,   // u10 only
      "2024-01-05" -> 2L,   // u10 (day 1 within 7) + u11
      "2024-01-09" -> 1L))  // u11 only — u10 aged out
  }
  test("rollingZ: self-excluding baseline, minN gate, hand-computed scores") {
    val d = (i: Int) => Date.valueOf(f"2024-01-$i%02d")
    // days 1-6 alternate 10/20; day 7 spikes to 40.
    // day 6 baseline = days 1-5 (n=5): mean 14, var 24 -> z = 6/sqrt(24)
    // day 7 baseline = days 1-6 (n=6): mean 15, var 25 -> z = 25/5 = 5
    // days 1-5 have n < 5 -> NULL (insufficient evidence, not zero)
    val rows = Seq(10.0, 20.0, 10.0, 20.0, 10.0, 20.0, 40.0).zipWithIndex
      .map { case (r, i) => (1L, d(i + 1), r) }
      .toDF("restaurant_id", "creation_date", "total_revenue")
    val got = Anomaly.rollingZ(rows, days = 28, minN = 5)
      .orderBy("creation_date")
      .select($"baseline_n", $"rolling_z")
      .as[(Long, Option[Double])].collect().toSeq
    assert(got.map(_._1) == Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L))
    assert(got.take(5).forall(_._2.isEmpty))
    assert(got(5)._2 == Some(BigDecimal(6.0 / math.sqrt(24.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(got(6)._2 == Some(5.0))
  }

  test("cusumShift: hand-computed level shift accumulates, slack absorbs noise") {
    val d = (i: Int) => Date.valueOf(f"2024-01-$i%02d")
    // days 1-5 at 10.00, days 6-10 at 20.00: median 15, MAD 5 (half-cent
    // units m2=300000, mad2=100000, slack=50000). Positive side sleeps
    // through the low half, then climbs 50000/day; negative side climbs
    // through the low half and drains after the shift. Alarm at 5*MAD
    // (=500000) never trips.
    val r1 = (1 to 5).map(i => (1L, d(i), 10.0)) ++
      (6 to 10).map(i => (1L, d(i), 20.0))
    // restaurant 2: 5 flat days then a 10x jump with MAD=0 - zero slack,
    // zero threshold, alarm fires on every shifted day
    val r2 = (1 to 5).map(i => (2L, d(i), 10.0)) ++
      (6 to 9).map(i => (2L, d(i), 100.0))
    val got = Anomaly.cusumShift((r1 ++ r2)
        .toDF("restaurant_id", "creation_date", "total_revenue"))
      .select($"restaurant_id", $"creation_date".cast("string"),
        $"cusum_pos", $"cusum_neg", $"alarm")
      .as[(Long, String, Double, Double, Boolean)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    val g1 = got.filter(_._1 == 1L)
    assert(g1.map(_._3) == Seq(0.0, 0.0, 0.0, 0.0, 0.0, 2.5, 5.0, 7.5, 10.0, 12.5))
    assert(g1.map(_._4) == Seq(2.5, 5.0, 7.5, 10.0, 12.5, 5.0, 0.0, 0.0, 0.0, 0.0))
    assert(g1.forall(!_._5))
    val g2 = got.filter(_._1 == 2L)
    assert(g2.take(5).forall(r => !r._5 && r._3 == 0.0 && r._4 == 0.0))
    assert(g2.drop(5).forall(_._5), "every post-shift day alarms at MAD=0")
  }
}
