package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val skewed = (1 to 1000).map(i => ("hot", i.toLong)) ++
    (1 to 10).map(i => ("cold", i.toLong))

  test("salted sum equals direct sum") {
    val df = skewed.toDF("k", "v")
    val direct = df.groupBy($"k").agg(sum($"v").as("sum_v"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedSum(df, Seq("k"), "v", numSalts = 8, saltSource = $"v")
      .as[(String, Long)].collect().toMap
    assert(salted == direct)
  }

  test("salted join equals direct join") {
    val big = skewed.toDF("k", "v")
    val dim = Seq(("hot", "H"), ("cold", "C")).toDF("k", "name")
    val direct = big.join(dim, Seq("k")).select($"k", $"v", $"name")
      .as[(String, Long, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(big, dim, Seq("k"), numSalts = 8, saltSource = $"v")
      .select($"k", $"v", $"name")
      .as[(String, Long, String)].collect().sorted.toSeq
    assert(salted == direct)
  }

  test("skewProfile: hot key ranked first with exact share and skew ratio") {
    // 1000 hot + 10 cold rows, 2 keys: hot share = 1000/1010,
    // skew = share * n_keys = 2000/1010
    val got = Skew.skewProfile(skewed.toDF("k", "v"), col("k"), topK = 10)
      .orderBy($"rank")
      .as[(String, Long, Int, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("hot", 1000L, 1, 1000.0 / 1010, 1000.0 * 2 / 1010),
      ("cold", 10L, 2, 10.0 / 1010, 10.0 * 2 / 1010)))
    // the top-K truncation keeps the heaviest keys only
    val many = ((1 to 100).map(i => (s"k$i", 1L)) ++ Seq(("big", 50L)))
      .flatMap { case (k, n) => Seq.fill(n.toInt)(k) }.toDF("k")
    val top3 = Skew.skewProfile(many, col("k"), topK = 3)
      .orderBy($"rank").select($"key", $"rank").as[(String, Int)].collect()
    assert(top3.head == (("big", 1)) && top3.length == 3)
  }

  test("cmsHeavyHitters: estimates never undercount and hold the eps bound") {
    // 10 keys in 4x1024 buckets: no full-depth collision, so every
    // estimate is exact (a deterministic fact of the fixed hash family)
    val rows = (1L to 10L).flatMap(k => Seq.fill(k.toInt * 3)(k)).toDF("key")
    val got = Skew.cmsHeavyHitters(rows, col("key"), topK = 5)
      .orderBy($"key")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got.map(_._1) == Seq(6L, 7L, 8L, 9L, 10L)) // top-5 by count
    got.foreach { case (k, exact, est, over, within) =>
      assert(exact == k * 3)
      assert(est == exact && over == 0L && within)
    }
  }
}
