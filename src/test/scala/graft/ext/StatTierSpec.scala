package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit pins for q263–q265 (Spearman, Kruskal–Wallis, diff-in-diff). */
class StatTierSpec extends SparkSpec {
  import spark.implicits._

  test("spearmanByGroup: monotone ±1 regardless of spacing; ties shrink |rho|") {
    // g: y strictly increasing in x (nonlinearly — Pearson would be <1,
    // Spearman is exactly 1); h: strictly decreasing → −1
    val df = Seq(
      ("g", 1L, 1L), ("g", 2L, 10L), ("g", 3L, 100L), ("g", 4L, 101L),
      ("h", 1L, 90L), ("h", 2L, 7L), ("h", 3L, 5L), ("h", 4L, 1L))
      .toDF("grp", "x", "y")
    val got = Profiling.spearmanByGroup(df, "grp", col("x"), col("y"))
      .orderBy("grp").select("grp", "n", "rho")
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("g", 4L, 1.0), ("h", 4L, -1.0)), s"$got")
  }

  test("kruskalWallis: fully separated 3+3 pins the textbook H = 3.857143") {
    // A={1,2,3}, B={4,5,6}: rank sums 6 and 15 → H = 12/42·87 − 21
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 4L), ("b", 5L), ("b", 6L)).toDF("g", "v")
    val got = Experiment.kruskalWallis(df, "g", col("v"))
      .select("n_groups", "n_total", "h", "h_tie_adj")
      .as[(Long, Long, Double, Double)].collect().head
    assert(got == ((2L, 6L, 3.857143, 3.857143)), s"$got")
    // all-ties degenerate: every value equal → C = 0 → adjusted NULL
    val tied = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L)).toDF("g", "v")
    val t = Experiment.kruskalWallis(tied, "g", col("v"))
      .select(col("h"), col("h_tie_adj").isNull).as[(Double, Boolean)]
      .collect().head
    assert(t == ((0.0, true)), s"$t")
  }

  test("loyaltyDiffInDiff: hand-built 2x2 pins the effect") {
    // split = 01-01 + (20 div 2) = 01-11; treat 10→15, ctrl 1→2 → DiD 4
    val rows = Seq(
      (true, "2024-01-02", 10.0), (true, "2024-01-02", 10.0),
      (true, "2024-01-20", 15.0), (true, "2024-01-21", 15.0),
      (false, "2024-01-01", 1.0), (false, "2024-01-03", 1.0),
      (false, "2024-01-19", 2.0), (false, "2024-01-20", 2.0))
    val df = rows.toDF("is_loyalty", "day", "total_revenue")
      .withColumn("creation_date", col("day").cast("date"))
    val got = Experiment.loyaltyDiffInDiff(df)
      .select("split_date", "n_treat_pre", "mean_treat_pre",
        "mean_treat_post", "mean_ctrl_pre", "mean_ctrl_post", "did_estimate")
      .as[(java.sql.Date, Long, Double, Double, Double, Double, Double)]
      .collect().head
    assert(got._1.toString == "2024-01-11" && got._2 == 2L, s"$got")
    assert((got._3, got._4, got._5, got._6, got._7) ==
      ((10.0, 15.0, 1.0, 2.0, 4.0)), s"$got")
  }
}
