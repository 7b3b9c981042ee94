package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")

  test("hashSplit: assignment is a pure function of the id — layout-independent") {
    val a = Sampling.hashSplit(docs, "doc_id").select("doc_id", "split")
    val b = Sampling.hashSplit(docs.repartition(7), "doc_id").select("doc_id", "split")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    // all three splits materialize and partition the table
    val counts = a.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.sum === docs.count())
    // rough proportions (80/10/10 within generous sf0.001 tolerance)
    val n = counts.values.sum.toDouble
    assert(counts("train") / n > 0.6 && counts("train") / n < 0.95)
  }

  test("mixtureSample: rate 1 keeps all, rate 0 drops all, mid-rates track, layout-stable") {
    val m = Sampling.mixtureSample(docs, "source", "doc_id",
      Map("src0" -> 1.0, "src1" -> 0.0), defaultRate = 0.5)
    val bySource = m.groupBy("source").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySource("src0") == totals("src0"), "rate 1.0 must keep every row")
    assert(!bySource.contains("src1"), "rate 0.0 must drop every row")
    val others = bySource.filterKeys(k => k != "src0").values.sum.toDouble /
      totals.filterKeys(k => !Set("src0", "src1").contains(k)).values.sum
    assert(others > 0.3 && others < 0.7, s"default 0.5 rate off: $others")
    val m2 = Sampling.mixtureSample(docs.repartition(7), "source", "doc_id",
      Map("src0" -> 1.0, "src1" -> 0.0), defaultRate = 0.5)
    assert(m.select("doc_id").except(m2.select("doc_id")).isEmpty,
      "mixture membership must be layout-independent")
  }

  test("stratifiedSample: exactly k per stratum, stable under repartition") {
    val k = 3
    val s1 = Sampling.stratifiedSample(docs, "source", "doc_id", k)
    val perStratum = s1.groupBy("source").count().as[(String, Long)].collect()
    assert(perStratum.forall(_._2 == k))
    val s2 = Sampling.stratifiedSample(docs.repartition(5), "source", "doc_id", k)
    assert(s1.select("doc_id").except(s2.select("doc_id")).isEmpty)
  }
}
