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
}
