package graft.gold

import java.sql.Date

import graft.SparkSpec

class RankReportSpec extends SparkSpec {
  import spark.implicits._

  test("rankReport: rank family over per-restaurant totals, ties share ranks") {
    val d = Date.valueOf("2024-01-01")
    val revenue = Seq(
      (1L, d, 50.0), (1L, d, 50.0),  // r1 total 100 — tied with r2
      (2L, d, 100.0),
      (3L, d, 70.0),
      (4L, d, 10.0)
    ).toDF("restaurant_id", "creation_date", "total_revenue")
    val got = Percentiles.rankReport(revenue)
      .orderBy($"restaurant_id")
      .select($"restaurant_id", $"total_revenue", $"rnk", $"drnk",
        $"pct_rank", $"cume", $"quartile")
      .as[(Long, Double, Int, Int, Double, Double, Int)].collect().toSeq
    // value ordering: r1(100) = r2(100) tie, r3(70), r4(10). Rank
    // functions share the tie (rnk 1,1,3,4; drnk 1,1,2,3); ntile runs
    // over the id-tiebroken total order so tiles stay deterministic
    assert(got == Seq(
      (1L, 100.0, 1, 1, 0.0, 0.5, 1),
      (2L, 100.0, 1, 1, 0.0, 0.5, 2),
      (3L, 70.0, 3, 2, 0.666667, 0.75, 3),
      (4L, 10.0, 4, 3, 1.0, 1.0, 4)))
  }

  test("monthlyGrowth: lag-based MoM percentage, NULL on each key's first month") {
    val revenue = Seq(
      (1L, Date.valueOf("2024-01-05"), 100.0),
      (1L, Date.valueOf("2024-02-10"), 150.0),   // +50%
      (1L, Date.valueOf("2024-04-01"), 75.0),    // vs Feb (gap month): -50%
      (2L, Date.valueOf("2024-03-03"), 10.0)
    ).toDF("restaurant_id", "creation_date", "total_revenue")
    val rows = SalesTrends.monthlyGrowth(revenue)
      .orderBy($"restaurant_id", $"y", $"m")
      .select($"restaurant_id", $"m", $"revenue", $"mom_pct")
      .as[(Long, Int, Double, Option[Double])].collect().toSeq
    assert(rows == Seq(
      (1L, 1, 100.0, None),
      (1L, 2, 150.0, Some(50.0)),
      (1L, 4, 75.0, Some(-50.0)),
      (2L, 3, 10.0, None)))
  }

  test("medianWithCI: 1..9 gives median 5 with CI spanning the order statistics at ranks 1 and 9") {
    val rows = (1 to 9).map(v => (1L, v.toDouble))
      .toDF("restaurant_id", "total_revenue")
    val got = Percentiles.medianWithCI(rows, "restaurant_id")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    // half-width 1.96*sqrt(9)=5.88 -> r_lo = floor(1.56)=1, r_hi = ceil(8.44)=9
    assert(got == Seq((1L, 9L, 5.0, 1.0, 9.0)))
  }

  test("medianWithCI: a single observation clamps both CI ranks onto itself; CI always brackets the median") {
    val rows = Seq((1L, 42.0), (2L, 1.0), (2L, 2.0), (2L, 3.0), (2L, 4.0))
      .toDF("restaurant_id", "total_revenue")
    val got = Percentiles.medianWithCI(rows, "restaurant_id")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(got.head == ((1L, 1L, 42.0, 42.0, 42.0)))
    got.foreach { case (_, _, m, lo, hi) => assert(lo <= m && m <= hi) }
  }
}
