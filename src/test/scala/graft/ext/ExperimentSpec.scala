package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Portable

class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents(rows: Seq[(Long, String, Double)]) =
    rows.toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))

  test("cupedReadout: hash variants, pooled theta, adjusted means match the exact-sum formula") {
    val events = mkEvents(Seq(
      (1L, "2024-01-10 00:00:00", 10.00), (1L, "2024-01-20 00:00:00", 20.00),
      (2L, "2024-01-11 00:00:00", 20.00), (2L, "2024-01-21 00:00:00", 30.00),
      (3L, "2024-01-12 00:00:00", 30.00), (3L, "2024-01-22 00:00:00", 45.00),
      (4L, "2024-01-23 00:00:00", 5.00) // no pre-period activity -> x = 0
    ))
    val got = Experiment
      .cupedReadout(events, "user_id", "ts", "value", splitTs = "2024-01-16")
      .orderBy("variant")
      .as[(String, Long, Double, Double, Double)].collect().toSeq

    // replicate: per-user exact cents, then the identical double chain
    val xs = Map(1L -> 1000L, 2L -> 2000L, 3L -> 3000L, 4L -> 0L)
    val ys = Map(1L -> 2000L, 2L -> 3000L, 3L -> 4500L, 4L -> 500L)
    val users = Seq(1L, 2L, 3L, 4L)
    val variant = users.map(u =>
      u -> (if (Portable.h60Local(s"cuped:$u") % 2 == 0) "control" else "treatment")).toMap
    val n = users.size.toLong
    val sx = users.map(xs).sum; val sy = users.map(ys).sum
    val sxy = users.map(u => xs(u) * ys(u)).sum
    val sxx = users.map(u => xs(u) * xs(u)).sum
    val theta = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
    val meanXAll = sx.toDouble / n.toDouble
    val expect = variant.values.toSeq.distinct.sorted.map { v =>
      val us = users.filter(variant(_) == v)
      val nv = us.size.toLong
      val meanY = (us.map(ys).sum.toDouble / nv.toDouble) / 100.0
      val adj = meanY -
        theta * ((us.map(xs).sum.toDouble / nv.toDouble - meanXAll) / 100.0)
      (v, nv, meanY, adj, theta)
    }
    assert(got == expect)
    assert(got.map(_._2).sum == 4L)          // every user lands in a variant
    assert(got.map(_._5).distinct.size == 1) // pooled theta is global
  }

  test("cupedReadout: zero pre-period variance pins theta to 0 (unadjusted readout)") {
    // all users identical pre-period -> var(x) = 0
    val events = mkEvents(Seq(
      (1L, "2024-01-10 00:00:00", 10.00), (1L, "2024-01-20 00:00:00", 1.00),
      (2L, "2024-01-10 00:00:00", 10.00), (2L, "2024-01-20 00:00:00", 2.00),
      (3L, "2024-01-10 00:00:00", 10.00), (3L, "2024-01-20 00:00:00", 3.00)
    ))
    val got = Experiment
      .cupedReadout(events, "user_id", "ts", "value", splitTs = "2024-01-16")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.forall(_._5 == 0.0))
    assert(got.forall(r => r._3 == r._4)) // adjusted == raw when theta = 0
  }

  test("ebShrunkLoyaltyShare: MoM prior shrinks small-n extremes toward the global mean") {
    val rows =
      Seq.fill(4)((10L, true)) ++ // A: 4/4 -> raw 1.0
      Seq.fill(4)((20L, false)) ++ // B: 0/4 -> raw 0.0
      Seq((30L, true), (30L, false)) // C: 1/2 -> raw 0.5
    val df = rows.toDF("restaurant_id", "is_loyalty")
      .withColumn("total_revenue", lit(1.0))
    val got = Experiment.ebShrunkLoyaltyShare(df)
      .as[(Long, Long, Double, Double)].collect().toSeq.sortBy(_._1)
    // replicate the exact integer->double chain: pu in micro units
    val pu = Map(10L -> 1000000L, 20L -> 0L, 30L -> 500000L)
    val sp = pu.values.sum; val spp = pu.values.map(p => p * p).sum
    val m = sp.toDouble / 3.0 / 1e6
    val v = spp.toDouble / 3.0 / 1e12 -
      (sp.toDouble / 3.0 / 1e6) * (sp.toDouble / 3.0 / 1e6)
    val k = m * (1.0 - m) / v - 1.0
    def shrunk(x: Long, n: Long) =
      BigDecimal((x.toDouble + m * k) / (n.toDouble + k))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(
      (10L, 4L, 1.0, shrunk(4, 4)),
      (20L, 4L, 0.0, shrunk(0, 4)),
      (30L, 2L, 0.5, shrunk(1, 2))))
    // extremes move inward, the at-mean restaurant stays put
    assert(got(0)._4 < 1.0 && got(1)._4 > 0.0 && got(2)._4 == 0.5)
  }

  test("ebShrunkLoyaltyShare: a degenerate prior (v = 0) falls back to the raw rate") {
    val df = (Seq((1L, true), (1L, false), (2L, true), (2L, false)))
      .toDF("restaurant_id", "is_loyalty")
      .withColumn("total_revenue", lit(1.0))
    val got = Experiment.ebShrunkLoyaltyShare(df)
      .as[(Long, Long, Double, Double)].collect()
    assert(got.forall(r => r._3 == 0.5 && r._4 == 0.5))
  }

  test("bhFdrLoyaltyLift: strong lifts rejected, null effect survives, step-up cutoff") {
    val rows =
      Seq.fill(38)((1L, true)) ++ Seq.fill(2)((1L, false)) ++ // A: 38/40
      Seq.fill(2)((2L, true)) ++ Seq.fill(38)((2L, false)) ++ // B: 2/40
      Seq.fill(20)((3L, true)) ++ Seq.fill(20)((3L, false)) // C: 20/40 = global
    val df = rows.toDF("restaurant_id", "is_loyalty")
      .withColumn("total_revenue", lit(1.0))
    val got = Experiment.bhFdrLoyaltyLift(df)
      .select($"restaurant_id", $"chi2", $"p_value", $"p_rank", $"m_tests",
        $"rejected")
      .as[(Long, Double, Double, Int, Long, Boolean)].collect().toSeq
    // hand 2x2 for A: diff = 38*58 - 2*22 = 2160,
    // chi2 = 120 * 2160^2 / (40*80*60*60) = 48.6; B symmetric; C null
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(got(0)._2 == 48.6 && got(1)._2 == 48.6 && got(2)._2 == 0.0)
    assert(got(0)._6 && got(1)._6 && !got(2)._6)
    assert(got.forall(_._5 == 3L))
    // erfc(0) under the A&S chain lands at 0.999999999, not 1.0 exactly
    assert(got(2)._3 == 0.999999999)
    // reference p for chi2 = 48.6 via the identical double chain
    val z = math.sqrt(48600000L / 2e6)
    val tt = 1.0 / (1.0 + 0.3275911 * z)
    val p = ((((1.061405429 * tt - 1.453152027) * tt + 1.421413741) * tt
      - 0.284496736) * tt + 0.254829592) * tt * math.exp(-(z * z))
    assert(got(0)._3 == math.round(p * 1e9) / 1e9)
    // rejections form a rank prefix (the step-up guarantee)
    val rej = got.sortBy(_._4).map(_._6)
    assert(!rej.dropWhile(identity).contains(true))
  }

  test("cmhLoyaltyOption: per-stratum OR 3 pooled exactly, crude OR confounded upward") {
    // X: a=30 b=10 c=5 d=5 and Y: a=5 b=5 c=10 d=30 -> OR 3 in BOTH
    // strata; crude 2x2 pools to 35*35/(15*15) = 5.44 (Simpson gap)
    def lines(r: Long, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((r, true, 1.0)) ++ Seq.fill(b)((r, true, 0.0)) ++
      Seq.fill(c)((r, false, 1.0)) ++ Seq.fill(d)((r, false, 0.0))
    val df = (lines(1L, 30, 10, 5, 5) ++ lines(2L, 5, 5, 10, 30))
      .toDF("restaurant_id", "is_loyalty", "option_price")
      .withColumn("total_revenue", lit(1.0))
    val got = Experiment.cmhLoyaltyOption(df)
      .as[(Long, Option[Double], Option[Double], Double, Double)]
      .collect().head
    assert(got._1 == 2L)
    assert(got._2 == Some(3.0)) // Sum ad/n = 6, Sum bc/n = 2
    assert(got._3 == Some(5.444444)) // 1225/225 half-up micro
    // E = 28 and 3, Sum(a-E) = 4; V = 1.714285714 each (quantized 1e-9)
    // chi2 = (4 - 0.5)^2 / 3.428571428 -> 3.572917 at 1e-6
    assert(got._4 == 3.572917)
    val x = math.sqrt(3572917L / 2e6)
    val tt = 1.0 / (1.0 + 0.3275911 * x)
    val p = ((((1.061405429 * tt - 1.453152027) * tt + 1.421413741) * tt
      - 0.284496736) * tt + 0.254829592) * tt * math.exp(-(x * x))
    assert(got._5 == math.round(p * 1e9) / 1e9)
  }

  test("mcnemarActivityShift: discordant cells drive the statistic") {
    // span Jan 2..10 -> mid Jan 6; u1 both, u2-u4 early-only, u5 late-only
    val rows = Seq(
      (1L, "2024-01-02"), (1L, "2024-01-10"),
      (2L, "2024-01-03"), (3L, "2024-01-04"), (4L, "2024-01-05"),
      (5L, "2024-01-09"))
    val df = rows.toDF("user_id", "day")
      .withColumn("creation_date", col("day").cast("date"))
      .withColumn("total_revenue", lit(1.0))
    val got = Experiment.mcnemarActivityShift(df)
      .as[(Long, Long, Long, Long, Double, Double)].collect().head
    // b=3, c=1 -> chi2 = (|3-1|-1)^2 / 4 = 0.25
    val x = math.sqrt(250000L / 2e6)
    val tt = 1.0 / (1.0 + 0.3275911 * x)
    val p = ((((1.061405429 * tt - 1.453152027) * tt + 1.421413741) * tt
      - 0.284496736) * tt + 0.254829592) * tt * math.exp(-(x * x))
    assert(got == ((5L, 1L, 3L, 1L, 0.25, math.round(p * 1e9) / 1e9)))
  }

  test("ksLoyaltySpend: separated samples hit D=1, identical samples p=1") {
    def df(rows: Seq[(Long, Boolean, Double)]) =
      rows.toDF("user_id", "is_loyalty", "total_revenue")
    val sep = Experiment.ksLoyaltySpend(df(Seq(
        (1L, true, 10.0), (2L, true, 20.0),
        (3L, false, 30.0), (4L, false, 40.0))))
      .as[(Long, Long, Double, Double, Double)].collect().head
    // fully separated: D = 1; ne = 1 -> lambda = 1.23
    val l2 = 1.23 * 1.23
    val p = 2.0 * (math.exp(-2.0 * l2) - math.exp(-8.0 * l2)
      + math.exp(-18.0 * l2) - math.exp(-32.0 * l2)
      + math.exp(-50.0 * l2))
    assert(sep == ((2L, 2L, 1.0, 1.23, math.round(p * 1e9) / 1e9)))
    // identical samples: D = 0, the series alternates to 1 -> clamp
    val same = Experiment.ksLoyaltySpend(df(Seq(
        (1L, true, 10.0), (2L, true, 20.0),
        (3L, false, 10.0), (4L, false, 20.0))))
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(same == ((2L, 2L, 0.0, 0.0, 1.0)))
  }

  test("PoissonThresholds: 9 strictly increasing cut points matching the Poisson(1) CDF") {
    val th = Experiment.PoissonThresholds
    assert(th.size == 9)
    assert(th == th.sorted && th.distinct.size == 9)
    val scale = math.pow(2.0, 60)
    // P(w = 0) = e^-1, P(w <= 1) = 2e^-1
    assert(math.abs(th.head / scale - math.exp(-1.0)) < 1e-12)
    assert(math.abs(th(1) / scale - 2.0 * math.exp(-1.0)) < 1e-12)
    assert(th.last < (1L << 60)) // tail mass truncates to w = 9
  }

  test("poissonBootstrapCI: point mean exact, CI matches the hand-replicated resample") {
    val rows = (1L to 12L).map { u =>
      (u, u % 2 == 0, 10.0 + u.toDouble) // arm 1 = evens, spends 11..22
    }
    val df = rows.toDF("user_id", "is_loyalty", "total_revenue")
    val reps = 40 // loRank = ceil(0.05*40) = 2, hiRank = ceil(0.95*40) = 38
    val got = Experiment.poissonBootstrapCI(df, reps = reps)
      .as[(Long, Long, Double, Double, Double, Long)].collect().toSeq
      .sortBy(_._1)
    assert(got.map(_._1) == Seq(0L, 1L))
    assert(got.forall(_._2 == 6L))

    // hand replica: identical hash -> weight -> half-up-ratio chain
    def weight(b: Int, u: Long): Long = {
      val h = Portable.h60Local(s"boot#$b#$u")
      Experiment.PoissonThresholds.count(t => h >= t).toLong
    }
    val byArm = rows.groupBy(r => if (r._2) 1L else 0L)
    byArm.foreach { case (arm, users) =>
      val xs = users.map(r => (r._1, math.rint(r._3 * 10000).toLong))
      val sx = xs.map(_._2).sum
      val n = xs.size.toLong
      val meanExpect = ((sx * 100 * 2 + n) / (2 * n)) / 1e6
      val mus = (0 until reps).flatMap { b =>
        val sw = xs.map { case (u, _) => weight(b, u) }.sum
        val swx = xs.map { case (u, x) => weight(b, u) * x }.sum
        if (sw > 0) Some(((swx * 100 * 2 + sw) / (2 * sw), b)) else None
      }.sorted
      val r = got.find(_._1 == arm).get
      assert(r._3 == meanExpect)
      assert(r._4 == mus(1)._1 / 1e6)  // rank 2 (1-indexed)
      assert(r._5 == mus(37)._1 / 1e6) // rank 38
      assert(r._6 == mus.size.toLong)
      assert(r._4 <= r._5)
    }
  }
}
