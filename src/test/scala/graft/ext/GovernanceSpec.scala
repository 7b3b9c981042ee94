package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit pins for q237–q240 (closed-form OLS, Neyman allocation,
  * DQ rule audit, rank trajectories). */
class GovernanceSpec extends SparkSpec {
  import spark.implicits._

  test("olsNormalEq: an exact linear law is recovered with r2 = 1") {
    // y = 3 + 2·x1 + 5·x2, non-collinear integer design
    val pts = Seq((1L, 0L), (2L, 1L), (3L, 5L), (7L, 2L), (4L, 4L), (6L, 1L))
    val df = pts.map { case (x1, x2) => ("g", 3 + 2 * x1 + 5 * x2, x1, x2) }
      .toDF("grp_in", "y", "x1", "x2")
    val got = Profiling.olsNormalEq(df, col("grp_in"),
        col("y"), col("x1"), col("x2"))
      .select("grp", "n", "b0", "b1", "b2", "r2")
      .as[(String, Long, Double, Double, Double, Double)].collect()
    assert(got.toSeq == Seq(("g", 6L, 3.0, 2.0, 5.0, 1.0)))
  }

  test("neymanAllocation: a zero-variance stratum gets zero budget") {
    val docs = (Seq.fill(10)(("flat", 100L)) ++
      Seq((0 until 10).map(i => ("wide", 100L + i * 50L)): _*))
      .toDF("source", "n_chars")
    val got = Sampling.neymanAllocation(docs, "source", "n_chars", budget = 100)
      .orderBy("stratum")
      .select("stratum", "neyman_share", "allocated")
      .as[(String, Double, Long)].collect()
    assert(got.map(r => (r._1, r._2)).toSeq ==
      Seq(("flat", 0.0), ("wide", 1.0)))
    assert(got.find(_._1 == "wide").get._3 == 100L)
  }

  test("dqRuleAudit: violations count per rule from one shared string") {
    val df = Seq(
      (100.0, 0.05, 5.0, "A", "O", "1995-01-01 00:00:00"),
      (-10.0, 0.60, 0.0, "X", "O", "1991-06-01 00:00:00"),
      (200.0, 0.02, 3.0, "N", "F", "1996-01-01 00:00:00"))
      .toDF("l_extendedprice", "l_discount", "l_quantity",
        "l_returnflag", "l_linestatus", "ship")
      .withColumn("l_shipdate", col("ship").cast("timestamp"))
    val got = Quality.dqRuleAudit(df, Quality.LineitemRules)
      .select("rule", "n_violations").as[(String, Long)].collect().toMap
    assert(got == Map(
      "discount_range" -> 1L, "flag_domain" -> 1L, "high_discount" -> 1L,
      "nonneg_price" -> 1L, "qty_positive" -> 1L, "ship_in_range" -> 1L,
      "status_domain" -> 0L))
  }

  test("categoryRankTrajectory: a rank swap shows as ±1 deltas") {
    val rev = Seq(
      ("2024-01-05", "a", 100.0), ("2024-01-06", "b", 50.0),
      ("2024-02-05", "a", 30.0), ("2024-02-06", "b", 80.0))
      .toDF("day", "item_category", "total_revenue")
      .withColumn("creation_date", col("day").cast("date"))
    val got = Olap.categoryRankTrajectory(rev)
      .orderBy("month", "rank")
      .select("item_category", "rank", "rank_delta")
      .as[(String, Int, Option[Int])].collect()
    assert(got.toSeq == Seq(
      ("a", 1, None), ("b", 2, None),
      ("b", 1, Some(1)), ("a", 2, Some(-1))))
  }
}
