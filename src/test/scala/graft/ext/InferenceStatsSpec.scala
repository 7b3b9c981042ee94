package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit pins for the round-8 inference additions: histogram-grain
  * Kendall τ-b, Cramér's V, and the delete-a-group jackknife CI. */
class InferenceStatsSpec extends SparkSpec {
  import spark.implicits._

  test("kendallTauBinned: perfect concordance 1, perfect discordance -1") {
    val up = Seq(("g", 1, 1), ("g", 2, 2), ("g", 3, 3)).toDF("b", "x", "y")
    val gu = Profiling.kendallTauBinned(up, "b", col("x"), col("y"))
      .as[(String, Long, Double)].collect().toSeq
    assert(gu == Seq(("g", 3L, 1.0)))
    val down = Seq(("g", 1, 3), ("g", 2, 2), ("g", 3, 1)).toDF("b", "x", "y")
    val gd = Profiling.kendallTauBinned(down, "b", col("x"), col("y"))
      .as[(String, Long, Double)].collect().toSeq
    assert(gd == Seq(("g", 3L, -1.0)))
  }

  test("kendallTauBinned: tie correction — tied-x and tied-y pairs leave C and D but shrink both denominators") {
    // pairs: (1,1)(1,2) tied in x; (1,1)(2,2) concordant;
    // (1,2)(2,2) tied in y -> C=1, D=0, A=B=4 -> tau = 2/(2*2) = 0.5
    val df = Seq(("g", 1, 1), ("g", 1, 2), ("g", 2, 2)).toDF("b", "x", "y")
    val got = Profiling.kendallTauBinned(df, "b", col("x"), col("y"))
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("g", 3L, 0.5)))
  }

  test("kendallTauBinned: a single-row group and an all-tied group yield NULL tau") {
    val df = Seq(("one", 1, 1), ("tied", 2, 5), ("tied", 2, 7))
      .toDF("b", "x", "y")
    val got = Profiling.kendallTauBinned(df, "b", col("x"), col("y"))
      .select(col("b"), col("tau_b").isNull)
      .as[(String, Boolean)].collect().toSeq
    assert(got == Seq(("one", true), ("tied", true)))
  }

  test("cramersV: perfect association gives 1, independence gives 0, a single-level column guards NULL") {
    val perfect = Seq(("a", "p"), ("a", "p"), ("b", "q"), ("b", "q"))
      .toDF("u", "v")
    val gp = Profiling.cramersV(perfect, col("u"), col("v"))
      .select("n", "chi2", "cramers_v")
      .as[(Long, Double, Double)].collect().head
    assert(gp == ((4L, 4.0, 1.0)))
    val ind = Seq(("a", "p"), ("a", "q"), ("b", "p"), ("b", "q"))
      .toDF("u", "v")
    val gi = Profiling.cramersV(ind, col("u"), col("v"))
      .select("chi2", "cramers_v").as[(Double, Double)].collect().head
    assert(gi == ((0.0, 0.0)))
    val single = Seq(("a", "p"), ("a", "q")).toDF("u", "v")
    val gs = Profiling.cramersV(single, col("u"), col("v"))
      .select(col("cramers_v").isNull).as[Boolean].collect().head
    assert(gs)
  }

  test("jackknifeMeanCI: constant data collapses the CI to the mean; layout does not change the answer") {
    val df = (1L to 10L).map(i => (i, 2.5)).toDF("id", "v")
    val got = Experiment.jackknifeMeanCI(df, col("id"), col("v"), folds = 4)
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    assert(got.size == 1)
    val (n, kUsed, mean, se, lo, hi) = got.head
    assert(n == 10L && kUsed >= 1 && kUsed <= 4)
    assert(mean == 2.5 && se == 0.0 && lo == 2.5 && hi == 2.5)
    val re = Experiment.jackknifeMeanCI(
        df.repartition(7), col("id"), col("v"), folds = 4)
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    assert(re == got)
  }

  test("jackknifeMeanCI: varying data brackets the mean and reports a positive SE") {
    val df = (1L to 100L).map(i => (i, (i % 7).toDouble)).toDF("id", "v")
    val (n, kUsed, mean, se, lo, hi) = Experiment.jackknifeMeanCI(
        df, col("id"), col("v"), folds = 10)
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    assert(n == 100L && kUsed > 1)
    assert(se > 0.0 && lo < mean && mean < hi)
    // the leave-one-out means hug the grand mean, so the jackknife SE
    // must stay within the same order as the naive s/sqrt(n) ~ 0.2
    assert(se < 1.0)
  }
}
