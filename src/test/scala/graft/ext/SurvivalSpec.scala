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

  test("logRankTest: hand-computed O/E/V over two event times; censored users stay out of the event sums") {
    import java.sql.Date
    def row(u: Long, d: String, loyal: Boolean) =
      (u, Date.valueOf(d), loyal, 10.0)
    val rev = Seq(
      // loyal u1: dur 10 (event), u2: dur 20 (event)
      row(1L, "2020-01-01", true), row(1L, "2020-01-11", true),
      row(2L, "2020-01-01", true), row(2L, "2020-01-21", true),
      // non-loyal u3: dur 10 (event); u4: last == anchor -> censored
      row(3L, "2020-01-01", false), row(3L, "2020-01-11", false),
      row(4L, "2020-01-01", false), row(4L, "2020-03-01", false),
    ).toDF("user_id", "creation_date", "is_loyalty", "total_revenue")
    val got = Survival.logRankTest(rev)
      .as[(Long, Long, Long, Long, Double, Double)].collect().head
    // t=10: d=2, d1=1, n=4, n1=2 -> E1=1.0, V=1/3
    // t=20: d=1, d1=1, n=2, n1=1 -> E1=0.5, V=1/4
    // chi2 = (2 - 1.5)^2 / 0.583333333 = 0.428571
    assert(got == ((2L, 2L, 2L, 1L, 1.5, 0.428571)))
  }

  test("nelsonAalen: hand-computed hazard accumulation; censored users hold the risk set only") {
    import java.sql.Date
    def row(u: Long, d: String, loyal: Boolean) =
      (u, Date.valueOf(d), loyal, 10.0)
    val rev = Seq(
      // loyal u1: dur 10 (event), u2: dur 20 (event)
      row(1L, "2020-01-01", true), row(1L, "2020-01-11", true),
      row(2L, "2020-01-01", true), row(2L, "2020-01-21", true),
      // non-loyal u3: dur 10 (event); u4: last == anchor -> censored
      row(3L, "2020-01-01", false), row(3L, "2020-01-11", false),
      row(4L, "2020-01-01", false), row(4L, "2020-03-01", false),
    ).toDF("user_id", "creation_date", "is_loyalty", "total_revenue")
    val got = Survival.nelsonAalen(rev)
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    // loyal: t=10 (d=1,n=2) H=0.5 V=0.25; t=20 (d=1,n=1) H=1.5 V=1.25
    // non-loyal: t=10 (d=1,n=2) H=0.5 V=0.25; u4 censored -> risk only
    assert(got == Seq(
      (0L, 10L, 2L, 1L, 0.5, 0.25),
      (1L, 10L, 2L, 1L, 0.5, 0.25),
      (1L, 20L, 1L, 1L, 1.5, 1.25)))
    // partitioning-invariant (quantized terms sum order-free)
    val re = Survival.nelsonAalen(rev.repartition(5))
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(re == got)
  }

  test("logRankTest: identical groups give chi2 ~ 0") {
    import java.sql.Date
    val rev = (1L to 8L).flatMap { u =>
      val loyal = u % 2 == 0
      // consecutive (odd, even) pairs share a duration, so the two
      // groups have IDENTICAL lifetime distributions
      val off = ((u - 1) / 2) % 4
      Seq((u, Date.valueOf("2020-01-01"), loyal, 1.0),
        (u, Date.valueOf(java.time.LocalDate.of(2020, 1, 1)
          .plusDays(5 + off).toString), loyal, 1.0),
        // shared far-future censored sentinel per group keeps an anchor
        (100L + (u % 2), Date.valueOf("2020-06-01"), loyal, 1.0))
    }.toDF("user_id", "creation_date", "is_loyalty", "total_revenue")
    val got = Survival.logRankTest(rev)
      .select("chi2").as[Option[Double]].collect().head
    assert(got.exists(_ < 1.0),
      s"symmetric groups must not reject: $got")
  }
}
