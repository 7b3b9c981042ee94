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

  test("weightedSample: k rows, rank contract, layout-stable, weight biases selection") {
    val ids = (1L to 400L).toDF("id")
    val w = when(col("id") % 5 === 0, 10L).otherwise(1L)
    val s1 = Sampling.weightedSample(ids, "id", w, k = 60)
    val rows = s1.orderBy("sample_rank")
      .select($"id", $"weight", $"draw", $"sample_rank")
      .as[(Long, Long, Long, Int)].collect()
    assert(rows.length == 60)
    assert(rows.map(_._4).toSeq == (1 to 60), "ranks must be dense 1..k")
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq,
      "rank order must follow ascending draws")
    // layout independence: same sample from a different partitioning
    val s2 = Sampling.weightedSample(ids.repartition(7), "id", w, k = 60)
    assert(s1.select("id").except(s2.select("id")).isEmpty)
    // weight 10 ids are 20% of the population; with 10 draws each they
    // must land well above their base rate in the winner set
    val heavy = rows.count(_._2 == 10L).toDouble / rows.length
    assert(heavy > 0.4, s"weight-10 ids underrepresented: $heavy")
  }
  test("weightedSample: capped mode identical to exact mode when weights <= cap") {
    val ids = (1L to 300L).toDF("id")
    val w = when(col("id") % 7 === 0, 8L).otherwise(2L)
    val exact = Sampling.weightedSample(ids, "id", w, k = 40)
    val tiered = Sampling.weightedSample(ids, "id", w, k = 40, maxDraws = 8L)
    val e = exact.orderBy("sample_rank")
      .select($"id", $"draw", $"sample_rank").as[(Long, Long, Int)].collect().toSeq
    val t = tiered.orderBy("sample_rank")
      .select($"id", $"draw", $"sample_rank").as[(Long, Long, Int)].collect().toSeq
    assert(e == t, "cap >= max weight must not change a single draw")
    // above the cap the fan-out is bounded: weight 8 rows compete with
    // only maxDraws=3 hashes — still a legal sample of the right size
    val capped = Sampling.weightedSample(ids, "id", w, k = 40, maxDraws = 3L)
    assert(capped.count() == 40)
  }

  test("temporalLeakage: train_only / test_only / both / no_dates classes") {
    import java.sql.Date
    val rows = Seq(
      (1L, Option(Date.valueOf("1997-05-01"))),           // train_only
      (2L, Option(Date.valueOf("1998-02-01"))),           // test_only
      (3L, Option(Date.valueOf("1997-12-31"))),
      (3L, Option(Date.valueOf("1998-01-01"))),           // both
      (4L, Option.empty[Date])                            // no_dates
    ).toDF("user_id", "creation_date")
    val got = Sampling.temporalLeakage(rows, "user_id", "creation_date",
        cutoff = "1998-01-01")
      .orderBy("user_id")
      .select($"user_id", $"n_before", $"n_after", $"leak_class")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 0L, "train_only"),
      (2L, 0L, 1L, "test_only"),
      (3L, 1L, 1L, "both"),
      (4L, 0L, 0L, "no_dates")))
  }

  test("splitContamination: near-dup pairs rolled up by unordered split pair, leaks flagged") {
    // many near-identical docs + unique ones; the roll-up must equal a
    // recomputation from the pair list and the split assignment
    val shared = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = (1L to 12L).map { i =>
      if (i <= 8) (i, s"$shared extra$i") else (i, s"unique only $i body ${i * 7}")
    }.toDF("doc_id", "text")
    val got = Sampling.splitContamination(docs, "doc_id", "text")
      .as[(String, String, Long, Boolean)].collect().toSeq
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text")
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    val split = Sampling.hashSplit(docs.select($"doc_id"), "doc_id")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val expect = pairs
      .map { case (a, b) =>
        val (lo, hi) = (Seq(split(a), split(b)).min, Seq(split(a), split(b)).max)
        (lo, hi)
      }
      .groupBy(identity).map { case ((lo, hi), g) =>
        (lo, hi, g.length.toLong, lo != hi)
      }.toSet
    assert(pairs.nonEmpty && got.toSet == expect)
    assert(got.forall(r => r._4 == (r._1 != r._2)))
  }
}
