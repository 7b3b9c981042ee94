package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit pins for the third round-7 operator batch (q193–q213). */
class Round7cOpsSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("holtForecast: a constant series converges level to y, trend to 0") {
    val rev = (1 to 10).map(i =>
      (1L, d(f"2024-01-$i%02d"), 50.0)).toDF(
      "restaurant_id", "creation_date", "total_revenue")
    val rows = Timeseries.holtForecast(rev)
      .orderBy("creation_date")
      .select("daily_revenue", "level", "trend", "forecast_revenue")
      .as[(Double, Double, Double, Option[Double])].collect()
    assert(rows.head == ((50.0, 50.0, 0.0, None)))
    rows.tail.foreach { case (y, l, b, f) =>
      assert(y == 50.0 && l == 50.0 && b == 0.0 && f.contains(50.0))
    }
  }

  test("sequenceSupport: strict ordering separates a→b from b→a") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // user 1: a then b; user 2: only b then a
    val ev = Seq(
      (1L, 1L, "a", ts(0)), (1L, 2L, "b", ts(1)),
      (2L, 3L, "b", ts(0)), (2L, 4L, "a", ts(1)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val m = Behavior.sequenceSupport(ev)
      .select("type_a", "type_b", "n_users_both", "n_users_seq")
      .as[(String, String, Long, Long)].collect()
      .map { case (a, b, both, seq) => (a, b) -> ((both, seq)) }.toMap
    // both users have both types; each direction is satisfied by one user
    assert(m(("a", "b")) == ((2L, 1L)) && m(("b", "a")) == ((2L, 1L)))
  }

  test("covariancePairsIncremental merges partials to the full-rebuild values") {
    val vecs = (0 until 30).map(i =>
      (i.toLong, Array(i.toFloat / 10, (30 - i).toFloat / 10, 1.0f)))
      .toDF("vec_id", "embedding")
    val full = Profiling.covariancePairs(vecs, "vec_id", "embedding", dim = 3)
      .orderBy("i", "j").collect()
    val inc = Profiling.covariancePairsIncremental(
        vecs, "vec_id", "embedding", isDelta = col("vec_id") % 5 === 0, dim = 3)
      .orderBy("i", "j").collect()
    assert(full.toSeq == inc.toSeq)
  }

  test("loyaltyUpliftStrata: per-stratum and pooled rows are exact") {
    val rev = Seq(
      ("A", true, 10.0), ("A", false, 6.0),
      ("B", true, 20.0), ("B", false, 12.0), ("B", false, 8.0))
      .toDF("item_category", "is_loyalty", "total_revenue")
    val got = Experiment.loyaltyUpliftStrata(rev).orderBy("stratum")
      .select("stratum", "n_treat", "n_ctrl", "uplift")
      .as[(String, Long, Long, Double)].collect()
    // ALL: treat mean 15, ctrl mean 26/3; A: 10-6=4; B: 20-10=10
    assert(got.toSeq == Seq(
      ("A", 1L, 1L, 4.0),
      ("ALL", 2L, 3L, 6.333333),
      ("B", 1L, 2L, 10.0)))
  }

  test("weightedQuantilesDisc: bulk cheap units pull the weighted median down") {
    val df = Seq(
      ("g", 100L, 9L), ("g", 1000L, 1L))
      .toDF("grp", "v", "w")
    val got = Profiling.weightedQuantilesDisc(
        df, "grp", col("v"), col("w"), ps = Seq(50, 90))
      .select("wp50", "wp90", "total_weight")
      .as[(Long, Long, Long)].collect()
    // W=10: p50 target 5 → 100; p90 target 9 → 100 (cum 9 ≥ 9)
    assert(got.toSeq == Seq((100L, 100L, 10L)))
  }

  test("newVsReturning: first day is all-new, repeat day splits") {
    val rev = Seq(
      (1L, d("2024-01-01")), (2L, d("2024-01-01")),
      (1L, d("2024-01-02")), (3L, d("2024-01-02")))
      .toDF("user_id", "creation_date")
    val got = Timeseries.newVsReturning(rev).orderBy("creation_date")
      .select("active_users", "new_users", "returning_users")
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((2L, 2L, 0L), (2L, 1L, 1L)))
  }

  test("gainChart: positives concentrated at high scores fill early deciles") {
    val rev = (1 to 100).map { u =>
      // frequency u, loyalty iff frequency > 90 (top decile)
      (u.toLong, u.toLong, u > 90, 1.0)
    }.flatMap { case (u, f, loy, r) =>
      (1 to f.toInt).map(k => (u, u * 1000 + k, loy, r))
    }.toDF("user_id", "order_id", "is_loyalty", "total_revenue")
    val got = Experiment.gainChart(rev).orderBy("decile")
      .select("decile", "n_pos", "cum_gain").as[(Int, Long, Double)].collect()
    assert(got.head._2 == 10L && got.head._3 == 1.0,
      s"top decile must capture every positive: ${got.head}")
    assert(got.tail.forall(_._2 == 0L))
  }

  test("contingencyChi2: independent margins give zero chi2; grid includes zero cells") {
    val df = Seq(
      ("r1", "c1"), ("r1", "c2"), ("r2", "c1"), ("r2", "c2"))
      .toDF("r", "c")
    val got = Profiling.contingencyChi2(df, "r", "c")
      .select("chi2_cell").as[Double].collect()
    assert(got.forall(_ == 0.0))
    val sparse = Seq(("r1", "c1"), ("r2", "c2")).toDF("r", "c")
    val grid = Profiling.contingencyChi2(sparse, "r", "c").collect()
    assert(grid.length == 4, "full grid must include the zero cells")
  }

  test("fisherSeparability: a perfectly separating dim dwarfs a noise dim") {
    val vecs = (0 until 40).map { i =>
      val label = i % 2
      // dim 0 separates labels with tiny within-class jitter; dim 1 is
      // an exact constant (zero within-variance → NULL ratio)
      (i.toLong, label,
        Array(label.toFloat * 2 - 1 + (i % 4) * 0.01f, 0.5f))
    }.toDF("vec_id", "label", "embedding")
    val got = Profiling.fisherSeparability(vecs, "embedding", "label")
      .orderBy("dim_idx").select("fisher_ratio").as[Option[Double]].collect()
    assert(got(0).exists(_ > 1000.0),
      s"separating dim must dominate its jitter: ${got(0)}")
    assert(got(1).isEmpty, "zero-variance dim pins NULL (wu = 0)")
  }

  test("deadStock: untouched parts count per brand") {
    val li = Seq((1L, 10L), (2L, 11L)).toDF("l_orderkey", "l_partkey")
    val part = Seq((10L, "B1"), (11L, "B1"), (12L, "B2"))
      .toDF("p_partkey", "p_brand")
    val got = Olap.deadStock(li, part).orderBy("p_brand")
      .select("p_brand", "n_parts", "n_dead").as[(String, Long, Long)].collect()
    assert(got.toSeq == Seq(("B1", 2L, 0L), ("B2", 1L, 1L)))
  }

  test("sessionConversion: purchase sessions convert, pure-view sessions do not") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val ev = Seq(
      (1L, 1L, "view", ts(0)), (1L, 2L, "purchase", ts(5)),
      (2L, 3L, "view", ts(0)), (2L, 4L, "view", ts(5)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = Behavior.sessionConversion(ev)
      .select("depth", "n_sessions", "n_converting")
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((2L, 2L, 1L)))
  }
}
