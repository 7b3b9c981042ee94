package graft.ext

import java.sql.Date

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier: censored users hold the risk set but add no deaths") {
    // anchor = 2024-03-01 (set by restaurant 2's only row).
    // Restaurant 1: A dies at dur 10, B dies at dur 20, C censored at 50
    // (last order within 30 days of anchor).
    val rows = Seq(
      (1L, 10L, Date.valueOf("2024-01-01"), 1.0),
      (1L, 10L, Date.valueOf("2024-01-11"), 1.0),
      (1L, 11L, Date.valueOf("2024-01-01"), 1.0),
      (1L, 11L, Date.valueOf("2024-01-21"), 1.0),
      (1L, 12L, Date.valueOf("2024-01-01"), 1.0),
      (1L, 12L, Date.valueOf("2024-02-20"), 1.0),
      (2L, 99L, Date.valueOf("2024-03-01"), 1.0)
    ).toDF("restaurant_id", "user_id", "creation_date", "total_revenue")
    val got = Survival.kaplanMeier(rows)
      .orderBy("restaurant_id", "duration_days")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // S(10) = (3-1)/3; S(20) = S(10) * (2-1)/2. The censored user C is
    // at risk at both event times but never a death; restaurant 2's
    // only user is censored -> no curve rows at all.
    assert(got == Seq(
      (1L, 10L, 3L, 1L, 2.0 / 3.0),
      (1L, 20L, 2L, 1L, (2.0 / 3.0) * (1.0 / 2.0))))
  }
}
