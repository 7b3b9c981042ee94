package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit pins for the feature-screening additions: WoE/IV and the
  * exact Gini decision stump. */
class FeatureScreenSpec extends SparkSpec {
  import spark.implicits._

  test("woeInformationValue: symmetric 2-level case gives ±ln2 WoE and a symmetric IV split") {
    val df = Seq(
      ("a", true), ("a", true), ("a", false),
      ("b", true), ("b", false), ("b", false),
    ).toDF("f", "y")
    val got = Encoding.woeInformationValue(df, col("f"), col("y"))
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    val Seq(a, b) = got
    assert(a._1 == "a" && a._2 == 2L && a._3 == 1L)
    assert(a._4 == 0.693147 && b._4 == -0.693147)
    // symmetric shares -> equal IV contributions; the total rounds from
    // the RAW unit sum, so it can differ from 2x the rounded term by a
    // final-digit ulp at most
    assert(a._5 == b._5 && math.abs(a._6 - 2 * a._5) <= 2e-6)
  }

  test("woeInformationValue: a level with zero positives has NULL WoE and contributes no IV") {
    val df = Seq(("a", true), ("a", false), ("z", false)).toDF("f", "y")
    val got = Encoding.woeInformationValue(df, col("f"), col("y"))
      .select(col("lvl"), col("woe").isNull, col("iv_term"))
      .as[(String, Boolean, Double)].collect().toSeq
    assert(got.find(_._1 == "z").get._2, "zero-positive level must have NULL WoE")
    assert(got.find(_._1 == "z").get._3 == 0.0)
  }

  test("giniStump: a perfectly separable feature finds the split with gain = root gini") {
    val df = Seq(
      (1L, true), (1L, true), (2L, false), (2L, false),
    ).toDF("x", "y")
    val got = Encoding.giniStump(df, col("x"), col("y"))
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L, 2L, 0L, 0.5)))
  }

  test("giniStump: an uninformative feature ties every threshold and cuts at the smallest value") {
    val df = Seq(
      (1L, true), (1L, false), (2L, true), (2L, false), (3L, true),
      (3L, false),
    ).toDF("x", "y")
    val got = Encoding.giniStump(df, col("x"), col("y"))
      .as[(Long, Long, Long, Long, Long, Double)].collect().head
    assert(got._1 == 1L, "equal scores must tie-break to the smallest threshold")
    assert(got._6 == 0.0)
  }
}
