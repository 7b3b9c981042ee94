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

  test("stratifiedSample: exactly k per stratum, stable under repartition") {
    val k = 3
    val s1 = Sampling.stratifiedSample(docs, "source", "doc_id", k)
    val perStratum = s1.groupBy("source").count().as[(String, Long)].collect()
    assert(perStratum.forall(_._2 == k))
    val s2 = Sampling.stratifiedSample(docs.repartition(5), "source", "doc_id", k)
    assert(s1.select("doc_id").except(s2.select("doc_id")).isEmpty)
  }
}
