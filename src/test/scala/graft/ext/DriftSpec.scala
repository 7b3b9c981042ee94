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

  test("chiSquare: identical category mixes score ~0, a planted skew scores large") {
    val base = (1 to 900).map(i => s"cat${i % 3}").toDF("c")
    val same = Drift.chiSquare(base, base, "c")
      .select($"chi2_total").as[Double].head()
    assert(same == 0.0, s"identical mixes must score 0, got $same")
    // current heavily over-represents cat0 (700/100/100 vs 300/300/300)
    val skew = ((1 to 700).map(_ => "cat0") ++ (1 to 100).map(_ => "cat1") ++
      (1 to 100).map(_ => "cat2")).toDF("c")
    val out = Drift.chiSquare(base, skew, "c").collect()
    assert(out.length == 3)
    val total = out.head.getAs[Double]("chi2_total")
    // chi2 >> critical value 5.99 (dof=2, alpha=.05)
    assert(total > 100, s"a 3x over-representation must dominate the statistic: $total")
    assert(out.forall(_.getAs[Long]("dof") == 2L))
    // a category absent from one side still appears with n=0
    val oneSided = Drift.chiSquare(base, Seq("cat0", "catNEW").toDF("c"), "c")
    assert(oneSided.count() == 4)
  }

  test("jsdPerGroup: zero for identical mixes, hand value for disjoint vocab") {
    import spark.implicits._
    // every source emits the same token -> each equals the pool exactly
    val same = Seq(("a", "x"), ("a", "x"), ("b", "x")).toDF("source", "text")
    val gs = Drift.jsdPerGroup(same, "source", "text")
      .as[(String, Long, Double)].collect()
      .map { case (g, n, j) => g -> ((n, j)) }.toMap
    assert(gs == Map("a" -> ((2L, 0.0)), "b" -> ((1L, 0.0))))
    // disjoint vocabularies, equal sizes: per-term 1e-9-unit quantization
    //   u(a,x) = round((ln(4/3) + 0.5 ln(2/3)) * 0.5e9) =  42474759
    //   u(a,y) = round((0.5 ln 2) * 0.5e9)              = 173286795
    // jsd = 0.215761554 nats for both sources (< ln 2 bound)
    val disj = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("source", "text")
    val gd = Drift.jsdPerGroup(disj, "source", "text")
      .as[(String, Long, Double)].collect()
      .map { case (g, n, j) => g -> ((n, j)) }.toMap
    assert(gd == Map("a" -> ((2L, 0.215761554)), "b" -> ((2L, 0.215761554))))
  }
}
