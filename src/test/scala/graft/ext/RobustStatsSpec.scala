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
}
