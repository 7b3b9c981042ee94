package graft.ext

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("psi: identical versions score zero, a planted shift crosses the 0.2 gate") {
    val base = (1 to 1000).map(i => (i % 100).toDouble).toDF("v")
    val same = Drift.psi(base, base, "v", bins = 10)
      .select($"psi_total").as[Double].head()
    assert(same == 0.0, s"identical distributions must score 0, got $same")
    val shifted = (1 to 1000).map(i => (i % 100).toDouble + 60).toDF("v")
    val moved = Drift.psi(base, shifted, "v", bins = 10)
      .select($"psi_total").as[Double].head()
    assert(moved > 0.2, s"a 60-point shift must trip the drift gate, got $moved")
    // every spine bucket present even where one side is empty
    assert(Drift.psi(base, shifted, "v", bins = 10).count() == 10)
  }

  test("ksBinned: D is 0 for identical versions and large for a planted shift") {
    val base = (1 to 1000).map(i => (i % 100).toDouble).toDF("v")
    val same = Drift.ksBinned(base, base, "v", bins = 10)
      .select($"ks_d").as[Double].head()
    assert(same == 0.0)
    val shifted = (1 to 1000).map(i => (i % 100).toDouble + 60).toDF("v")
    val moved = Drift.ksBinned(base, shifted, "v", bins = 10)
      .select($"ks_d", $"cdf_base", $"cdf_cur").as[(Double, Double, Double)].collect()
    assert(moved.forall { case (_, cb, cc) => cb >= 0 && cb <= 1 && cc >= 0 && cc <= 1 })
    assert(moved.head._1 > 0.4, s"a 60-point shift must move the CDFs apart: ${moved.head._1}")
  }
}
