package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit pins for the robust-statistics batch (q230–q233). */
class RobustTimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private def rev(rows: (Long, String, Double)*) =
    rows.toDF("restaurant_id", "day", "total_revenue")
      .withColumn("creation_date", col("day").cast("date"))

  test("theilSen: one spike day cannot move the median slope") {
    // perfect 5 + 2d line over 7 days, day 3 replaced by a 100 spike:
    // 15 of 21 pairwise slopes are exactly 2 → median slope 2,
    // median residual (intercept) 5
    val rows = (0 to 6).map { d =>
      val v = if (d == 3) 100.0 else 5.0 + 2.0 * d
      (1L, f"2024-01-${d + 1}%02d", v)
    }
    val got = Timeseries.theilSen(rev(rows: _*))
      .select("n_days", "n_pairs", "slope_per_day", "intercept")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.toSeq == Seq((7L, 21L, 2.0, 5.0)))
  }

  test("eventXcorr: an exact 2-hour lead shows up as xcorr 1 at lag 2") {
    // views at hour h with count pattern p(h); purchases at h+2 with the
    // SAME counts → perfect correlation exactly at lag 2
    val pattern = Seq(1, 3, 2, 5, 4, 7, 1, 6)
    val events = pattern.zipWithIndex.flatMap { case (c, h) =>
      Seq.fill(c)(("view", f"2024-01-01 $h%02d:15:00")) ++
        Seq.fill(c)(("purchase", f"2024-01-01 ${h + 2}%02d:45:00"))
    }.zipWithIndex.map { case ((t, ts), i) => (i.toLong, t, ts) }
      .toDF("event_id", "event_type", "tss")
      .withColumn("ts", col("tss").cast("timestamp"))
    val got = Behavior.eventXcorr(events, "view", "purchase", maxLag = 3)
      .orderBy("lag").select("lag", "xcorr")
      .as[(Int, Option[Double])].collect().toMap
    assert(got(2).contains(1.0), s"perfect lead-lag at 2h: ${got(2)}")
    assert(got(0).forall(_ < 1.0))
  }

  test("loyaltyMannWhitney: separated groups pin U = n1*n2 and z > 0") {
    val df = Seq(
      ("cat", true, 40.0), ("cat", true, 50.0), ("cat", true, 60.0),
      ("cat", false, 10.0), ("cat", false, 20.0), ("cat", false, 30.0))
      .toDF("item_category", "is_loyalty", "total_revenue")
    val got = Experiment.loyaltyMannWhitney(df)
      .select("item_category", "n_loyal", "n_other", "u_stat", "z")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.length == 1)
    val r = got.head
    assert((r._2, r._3, r._4) == ((3L, 3L, 9.0)),
      s"complete separation → U = n1·n2 = 9: $r")
    // z = (9 - 4.5) / sqrt(3·3·7/12) = 4.5/2.2913 ≈ 1.9640
    assert(math.abs(r._5 - 1.963961) < 1e-6, s"z: ${r._5}")
  }

  test("hampelOutliers: the spike is flagged, its neighbors are not") {
    val rows = (0 to 8).map { d =>
      val v = if (d == 4) 1000.0 else 10.0
      (1L, f"2024-01-${d + 1}%02d", v)
    }
    val got = Timeseries.hampelOutliers(rev(rows: _*))
      .select("creation_date", "revenue", "rolling_median", "severity")
      .as[(java.sql.Date, Double, Double, Option[Double])].collect()
    assert(got.length == 1, s"only the spike day flags: ${got.toSeq}")
    assert(got.head._1.toString == "2024-01-05")
    assert(got.head._2 == 1000.0 && got.head._3 == 10.0)
    assert(got.head._4.isEmpty, "mad = 0 → severity undefined (null)")
  }

  test("holtWintersForecast: hand-computed level/trend/seasonal chain; forecast is the pre-update state; first row NULL") {
    import java.sql.Date
    val rev = Seq(
      (1L, Date.valueOf("1970-01-05"), 100.0), // slot 4
      (1L, Date.valueOf("1970-01-06"), 200.0), // slot 5
      (1L, Date.valueOf("1970-01-12"), 110.0), // slot 4 again
    ).toDF("restaurant_id", "creation_date", "total_revenue")
    val got = Timeseries.holtWintersForecast(rev)
      .orderBy($"creation_date")
      .select($"level", $"trend", $"seasonal", $"forecast_revenue")
      .as[(Double, Double, Double, Option[Double])].collect().toSeq
    assert(got == Seq(
      (100.0, 0.0, 0.0, None),
      (125.0, 3.125, 18.75, Some(100.0)),
      (123.59375, 2.55859375, -3.3984375, Some(128.125))))
  }

  test("holtWintersForecast: layout-independent and state resets between restaurants") {
    import java.sql.Date
    val rev = Seq(
      (1L, Date.valueOf("1970-01-05"), 100.0),
      (1L, Date.valueOf("1970-01-06"), 200.0),
      (2L, Date.valueOf("1970-01-06"), 50.0),  // new key -> fresh state
    ).toDF("restaurant_id", "creation_date", "total_revenue")
    val a = Timeseries.holtWintersForecast(rev)
      .orderBy($"restaurant_id", $"creation_date")
      .as[(Long, Date, Double, Double, Double, Double, Option[Double])]
      .collect().toSeq
    val b = Timeseries.holtWintersForecast(rev.repartition(7))
      .orderBy($"restaurant_id", $"creation_date")
      .as[(Long, Date, Double, Double, Double, Double, Option[Double])]
      .collect().toSeq
    assert(a == b)
    val r2 = a.last
    assert(r2._1 == 2L && r2._4 == 50.0 && r2._5 == 0.0 && r2._7.isEmpty)
  }

  test("changepoint: a clean level shift is located exactly with zero remaining SSE share; constant series guard NULL") {
    import java.sql.Date
    val rev = (1 to 6).map { i =>
      (1L, Date.valueOf(f"1997-01-0$i"), if (i <= 3) 10.0 else 100.0)
    } ++ Seq(
      (2L, Date.valueOf("1997-01-01"), 5.0),
      (2L, Date.valueOf("1997-01-02"), 5.0),
    )
    val df = rev.toDF("restaurant_id", "creation_date", "total_revenue")
    val got = Timeseries.changepoint(df)
      .as[(Long, Date, Long, Long, Double, Double, Option[Double])]
      .collect().toSeq
    val r1 = got.head
    assert(r1._1 == 1L && r1._2 == Date.valueOf("1997-01-03"))
    assert(r1._3 == 3L && r1._4 == 3L && r1._5 == 10.0 && r1._6 == 100.0)
    assert(r1._7.contains(0.0),
      "a perfect two-level fit must explain all variance")
    val r2 = got(1)
    assert(r2._1 == 2L && r2._7.isEmpty,
      "constant series has no variance to explain -> NULL share")
  }

  test("mannKendall: monotone up/down significant, constant flat at p~1") {
    val rows =
      // r1: strictly rising over 6 months -> S = 15, no ties
      (1 to 6).map(mo => (1L, f"2024-$mo%02d-10", 100.0 * mo)) ++
      // r2: constant over 4 months -> S = 0, all tied, vn = 0
      (1 to 4).map(mo => (2L, f"2024-$mo%02d-10", 50.0)) ++
      // r3: strictly falling over 5 months -> S = -10
      (1 to 5).map(mo => (3L, f"2024-$mo%02d-10", 100.0 * (6 - mo)))
    val got = Timeseries.mannKendall(rev(rows: _*))
      .as[(Long, Long, Long, Double, Double, String)].collect().toSeq
    def zp(s: Long, n: Long): (Double, Double) = {
      val vn = n * (n - 1) * (2 * n + 5)
      val z = if (s > 0) (s - 1) / math.sqrt(vn / 18.0)
        else if (s < 0) (s + 1) / math.sqrt(vn / 18.0) else 0.0
      val zq = math.round(z * 1e6)
      val x = math.abs(zq) / 1e6 / math.sqrt(2.0)
      val tt = 1.0 / (1.0 + 0.3275911 * x)
      val p = ((((1.061405429 * tt - 1.453152027) * tt + 1.421413741) * tt
        - 0.284496736) * tt + 0.254829592) * tt * math.exp(-(x * x))
      (zq / 1e6, math.round(p * 1e9) / 1e9)
    }
    val (z1, p1) = zp(15, 6)
    val (z3, p3) = zp(-10, 5)
    assert(got == Seq(
      (1L, 6L, 15L, z1, p1, "up"),
      (2L, 4L, 0L, 0.0, 0.999999999, "flat"),
      (3L, 5L, -10L, z3, p3, "down")))
    assert(p1 < 0.01 && p3 < 0.05 && z1 > 0 && z3 < 0)
  }

  test("overdispersion: clumped demand flagged, uniform demand underdispersed") {
    val rows =
      // r1: 10 lines on day 1 and day 4, nothing between -> D = 8
      (1 to 10).map(_ => (1L, "2024-01-01", 1.0)) ++
      (1 to 10).map(_ => (1L, "2024-01-04", 1.0)) ++
      // r2: exactly 2 lines every day -> zero variance, D = 0
      (1 to 4).flatMap(d => Seq.fill(2)((2L, f"2024-02-0$d%01d", 1.0)))
    val got = Timeseries.overdispersion(rev(rows: _*))
      .as[(Long, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    def wh(chi2q: Long, n: Long): (Double, Double) = {
      val nu = (n - 1).toDouble
      val z = (math.cbrt(chi2q / 1e6 / nu) - (1.0 - 2.0 / (9.0 * nu))) *
        math.sqrt(9.0 * nu / 2.0)
      val zq = math.round(z * 1e6)
      val ax = math.abs(zq) / 1e6 / math.sqrt(2.0)
      val tt = 1.0 / (1.0 + 0.3275911 * ax)
      val eu = math.round(((((1.061405429 * tt - 1.453152027) * tt
        + 1.421413741) * tt - 0.284496736) * tt + 0.254829592) * tt
        * math.exp(-(ax * ax)) * 1e9)
      val pu = if (zq >= 0) (eu + 1) / 2 else 1000000000L - eu / 2
      (zq / 1e6, pu / 1e9)
    }
    // r1: spine Jan 1-4 -> n=4, x=[10,0,0,10]: sx=20, sxx=200,
    // num = 4*200 - 400 = 400, chi2 = 20 exactly, D = 400/(3*20)
    val (z1, p1) = wh(20000000L, 4)
    // r2: n=4, sx=8, sxx=16 -> num = 0, chi2 = 0, D = 0
    val (z2, p2) = wh(0L, 4)
    assert(got == Seq(
      (1L, 4L, 5.0, 6.666667, 20.0, z1, p1),
      (2L, 4L, 2.0, 0.0, 0.0, z2, p2)))
    assert(p1 < 0.001, "clumped demand must reject Poisson")
    assert(p2 > 0.99, "uniform demand sits in the lower tail")
  }

  test("ljungBox: weekly cycle rejected as white noise, constant series leaves") {
    val rows =
      // r1: 10 dollars on days 1,8,15,22 (span = 22 days), zero between
      (0 until 22).filter(_ % 7 == 0)
        .map(d => (1L, f"2024-01-${d + 1}%02d", 10.0)) ++
      // r2: constant 5 every day -> zero variance, excluded
      (0 until 14).map(d => (2L, f"2024-02-${d + 1}%02d", 5.0))
    val got = Timeseries.ljungBox(rev(rows: _*))
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    // reference: the identical integer-exact chain over the 22-day grid
    val xs = (0 until 22).map(d => if (d % 7 == 0) 10L else 0L)
    val n = xs.length
    val sx = xs.sum
    val sxx = xs.map(x => x * x).sum
    val sxd = sx.toDouble / n
    val rden = sxx.toDouble - sx * sxd
    val stq = (1 to 7).map { k =>
      val pairs = (k until n).map(t => (xs(t), xs(t - k)))
      val nk = pairs.size
      val spk = pairs.map(p => p._1 * p._2).sum
      val rnum = spk.toDouble - sxd * (pairs.map(_._1).sum.toDouble
        + pairs.map(_._2).sum.toDouble) + nk * sxd * sxd
      val ru = math.round(rnum / rden * 1e9)
      math.round((ru / 1e9) * (ru / 1e9) / nk * 1e12)
    }.sum
    val q6 = math.round(n.toDouble * (n + 2) * (stq / 1e12) * 1e6)
    val nu = 7.0
    val zq = math.round((math.cbrt(q6 / 1e6 / nu) - (1.0 - 2.0 / (9.0 * nu)))
      * math.sqrt(9.0 * nu / 2.0) * 1e6)
    val ax = math.abs(zq) / 1e6 / math.sqrt(2.0)
    val tt = 1.0 / (1.0 + 0.3275911 * ax)
    val eu = math.round(((((1.061405429 * tt - 1.453152027) * tt
      + 1.421413741) * tt - 0.284496736) * tt + 0.254829592) * tt
      * math.exp(-(ax * ax)) * 1e9)
    val pu = if (zq >= 0) (eu + 1) / 2 else 1000000000L - eu / 2
    assert(got == Seq((1L, 22L, 7L, q6 / 1e6, pu / 1e9)))
    assert(pu / 1e9 < 0.01, "a weekly cycle is not white noise")
  }

  test("runsTest: zigzag has max runs, clustered has 2, constant leaves") {
    val vals1 = Seq(10.0, 0.0, 10.0, 0.0, 10.0, 0.0) // 6 runs
    val vals2 = Seq(10.0, 10.0, 10.0, 0.0, 0.0, 0.0) // 2 runs
    val rows =
      vals1.zipWithIndex.map { case (v, d) => (1L, f"2024-01-0${d + 1}%01d", v) } ++
      vals2.zipWithIndex.map { case (v, d) => (2L, f"2024-02-0${d + 1}%01d", v) } ++
      (1 to 4).map(d => (3L, f"2024-03-0$d%01d", 5.0)) // never above mean
    val got = Timeseries.runsTest(rev(rows: _*))
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    // both: n=6, n1=3 -> E[R]=4, Var=1.2; zigzag R=6, clustered R=2
    def zp(r: Long): (Double, Double) = {
      val z = (r - 4.0) / math.sqrt(1.2)
      val zq = math.round(z * 1e6)
      val ax = math.abs(zq) / 1e6 / math.sqrt(2.0)
      val tt = 1.0 / (1.0 + 0.3275911 * ax)
      val p = ((((1.061405429 * tt - 1.453152027) * tt + 1.421413741) * tt
        - 0.284496736) * tt + 0.254829592) * tt * math.exp(-(ax * ax))
      (zq / 1e6, math.round(p * 1e9) / 1e9)
    }
    val (z1, p1) = zp(6)
    val (z2, p2) = zp(2)
    assert(got == Seq(
      (1L, 6L, 3L, 6L, z1, p1),
      (2L, 6L, 3L, 2L, z2, p2)))
    assert(z1 > 0 && z2 < 0 && p1 == p2, "symmetric two-sided p")
  }
}
