package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit pins for the fourth round-7 operator batch (q214–q220). */
class Round7dOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pqCodeDedupPairs: identical vectors collide and verify at distance 0") {
    // ids 0 and 100 are seeds; 7 duplicates of vector 0 planted at
    // non-seed ids must collide with it on every block's code
    val base = Array.fill(8)(0.5f)
    val far = Array.fill(8)(-3.0f)
    val vecs = ((0 until 7).map(i => (i.toLong, base)) :+ (100L, far))
      .toDF("vec_id", "embedding")
    val got = Similarity.pqCodeDedupPairs(
        vecs, "vec_id", "embedding", maxDist = 0.1,
        blocks = 2, iters = 1, seedEvery = 100)
      .orderBy("id_a", "id_b")
      .select("id_a", "id_b", "dist").as[(Long, Long, Double)].collect()
    assert(got.length == 21,
      s"7 identical vectors collide pairwise (C(7,2)=21): ${got.length}")
    assert(got.forall(_._3 == 0.0))
  }

  test("collocations: an exclusive adjacent pair outranks common pairs") {
    // "alpha beta" always adjacent and exclusive; "the x" pairs dilute
    val docs = (1 to 10).map { i =>
      (i.toLong, s"alpha beta the w$i the w$i the w$i")
    }.toDF("doc_id", "text")
    val got = TextAnalysis.collocations(docs, "doc_id", "text",
        topK = 5, minCount = 5)
      .orderBy("rank").select("w1", "w2").as[(String, String)].collect()
    assert(got.head == (("alpha", "beta")),
      s"exclusive collocation must rank first: ${got.head}")
  }

  test("sourceDispersion: constant vectors pin dispersion 0; spread grows it") {
    val vecs = ((0 until 10).map(i => ("flat", Array(1.0f, 2.0f))) ++
      (0 until 10).map(i => ("wide", Array(i.toFloat, 0.0f))))
      .toDF("source", "embedding").withColumn("vec_id", monotonically_increasing_id())
    val got = Similarity.sourceDispersion(vecs, "embedding", col("source"))
      .orderBy("source").select("source", "dispersion")
      .as[(String, Double)].collect().toMap
    assert(got("flat") == 0.0)
    assert(got("wide") > 8.0, s"variance of 0..9 is 8.25: ${got("wide")}")
  }

  test("peakHourProfile: the heaviest hour wins with hour-asc ties") {
    val rev = Seq(
      (1L, "2024-01-01 03:00:00", 100.0),
      (1L, "2024-01-01 07:00:00", 300.0),
      (1L, "2024-01-02 07:00:00", 50.0),
      (2L, "2024-01-01 05:00:00", 10.0),
      (2L, "2024-01-01 09:00:00", 10.0))
      .toDF("restaurant_id", "ts", "total_revenue")
      .withColumn("creation_ts", col("ts").cast("timestamp"))
    val got = Olap.peakHourProfile(rev).orderBy("restaurant_id")
      .select("restaurant_id", "peak_hour").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 7L), (2L, 5L)),
      "hour 7 carries 350 for r1; r2 ties break to the earlier hour")
  }

  test("multiHoming: distinct-restaurant buckets and caps") {
    val rev = Seq(
      (1L, 10L, 5.0), (1L, 11L, 5.0),
      (2L, 10L, 3.0), (2L, 10L, 4.0))
      .toDF("user_id", "restaurant_id", "total_revenue")
    val got = Olap.multiHoming(rev).orderBy("n_restaurants")
      .select("n_restaurants", "n_users", "avg_user_revenue")
      .as[(Long, Long, Double)].collect()
    assert(got.toSeq == Seq((1L, 1L, 7.0), (2L, 1L, 10.0)))
  }

  test("dropReasonManifest: first failing rule wins and totals reconcile") {
    val docs = Seq(
      // long fluent English text → kept
      (1L, "s1", "the quick brown fox jumps over the lazy dog and keeps " +
        "running through the field with a friend of the family " * 3),
      // too short → low_quality fires FIRST even though lang also fails
      (2L, "s1", "xq"),
      (3L, "s2", "el rapido zorro marron salta sobre el perro perezoso " +
        "y la casa de la familia es grande y el dia es muy bueno " * 3))
      .toDF("doc_id", "source", "text")
    val got = Curation.dropReasonManifest(docs, "doc_id", "text", "source")
      .select("source", "disposition", "n_docs")
      .as[(String, String, Long)].collect().toSet
    assert(got.contains(("s1", "kept", 1L)), s"doc 1 must survive: $got")
    assert(got.contains(("s1", "low_quality", 1L)),
      s"doc 2 fails quality before lang: $got")
    assert(got.contains(("s2", "wrong_lang", 1L)),
      s"doc 3 is fluent Spanish: $got")
    val bySource = got.toSeq.groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toMap
    assert(bySource == Map("s1" -> 2L, "s2" -> 1L), "totals must reconcile")
  }
}
