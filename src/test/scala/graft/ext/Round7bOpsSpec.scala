package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit pins for the second round-7 operator batch (q177–q192): Gini,
  * item-item CF, cohort LTV, FK audit, burstiness, keyness, MASE
  * backtest, attribution, Markov baseline, bigram LM, association
  * rules, PCA, elasticity, session stats, IVF-PQ. */
class Round7bOpsSpec extends SparkSpec {
  import spark.implicits._

  test("revenueGini: equality pins 0, a whale-vs-zero split pins 0.5") {
    val rev = Seq(
      (1L, 10L, "2024-01-01", 50.0), (1L, 11L, "2024-01-02", 50.0),
      (2L, 20L, "2024-01-01", 0.0), (2L, 21L, "2024-01-02", 10.0))
      .toDF("restaurant_id", "user_id", "creation_date", "total_revenue")
      .withColumn("creation_date", col("creation_date").cast("date"))
    val got = Olap.revenueGini(rev).orderBy("restaurant_id")
      .select("restaurant_id", "gini").as[(Long, Double)].collect()
    // equal spenders → G = 0; x = [0, 10] → G = 40/20 − 3/2 = 0.5
    assert(got.toSeq == Seq((1L, 0.0), (2L, 0.5)))
  }

  test("itemSimilarityTopK: identical baskets give cosine 1 both ways") {
    val b = Seq((1L, 7L), (1L, 8L), (2L, 7L), (2L, 8L), (3L, 9L))
      .toDF("basket", "item")
    val got = Association.itemSimilarityTopK(b, "basket", "item",
      minCooc = 2, k = 3)
      .select("item_a", "item_b", "cosine").as[(Long, Long, Double)]
      .collect().toSet
    assert(got == Set((7L, 8L, 1.0), (8L, 7L, 1.0)))
  }

  test("fkOrphans: planted orphan and NULL key both count; one row per check") {
    val child = Seq(Some(1L), Some(2L), Some(99L), None)
      .toDF("fk").withColumn("other", lit("x"))
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = Quality.fkOrphans(child, "c",
      Seq(("fk", parent, "pk", "p"), ("fk", parent.limit(0), "pk", "empty")))
      .orderBy("fk")
      .select("fk", "n_child", "n_orphans", "orphan_share")
      .as[(String, Long, Long, Double)].collect()
    assert(got.toSeq == Seq(
      ("c.fk -> empty.pk", 4L, 4L, 1.0),
      ("c.fk -> p.pk", 4L, 2L, 0.5)))
  }

  test("interArrivalStats: a metronome pins cv = 0 and burstiness = −1") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = (0 until 5).map { i =>
      (7L, i.toLong, new java.sql.Timestamp(base.getTime + i * 60000L))
    }.toDF("user_id", "event_id", "ts")
    val got = Behavior.interArrivalStats(ev)
      .select("user_id", "n_gaps", "mean_gap_sec", "cv", "burstiness")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(got.toSeq == Seq((7L, 4L, 60.0, 0.0, -1.0)))
  }

  test("linearAttribution: equal credit across in-window touches; direct fallback") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val ev = Seq(
      (1L, 1L, "view", 0.0, ts(0)), (1L, 2L, "view", 0.0, ts(1)),
      (1L, 3L, "click", 0.0, ts(2)), (1L, 4L, "purchase", 30.0, ts(3)),
      (2L, 5L, "purchase", 12.0, ts(0)))
      .toDF("user_id", "event_id", "event_type", "value", "ts")
    val got = Behavior.linearAttribution(ev, Seq("click", "signup", "view"))
      .orderBy("touch_type")
      .select("touch_type", "n_purchases", "attributed_revenue")
      .as[(String, Long, Double)].collect()
    assert(got.toSeq == Seq(
      ("click", 1L, 10.0), ("direct", 1L, 12.0), ("view", 1L, 20.0)))
  }

  test("linearAttribution: a same-microsecond touch cannot precede its purchase (strict tt < tp)") {
    // the attribution family's shared causal boundary: the frame-form
    // operators must file this purchase under direct, exactly like the
    // join-form siblings (timeDecay/position) whose filter is tt < tp
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = Seq(
      (1L, 1L, "click", 0.0, t0),
      (1L, 2L, "purchase", 50.0, t0))
      .toDF("user_id", "event_id", "event_type", "value", "ts")
    val got = Behavior.linearAttribution(ev, Seq("click", "signup", "view"))
      .select("touch_type", "n_purchases", "attributed_revenue")
      .as[(String, Long, Double)].collect()
    assert(got.toSeq == Seq(("direct", 1L, 50.0)), s"got ${got.toSeq}")
  }

  test("markovPredictorAccuracy: a deterministic chain scores accuracy 1") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // every user cycles a -> b -> a -> b: the majority model predicts
    // perfectly on whichever users land in the test split
    val ev = (1 to 40).flatMap { u =>
      (0 until 4).map(i =>
        (u.toLong, (u * 10 + i).toLong, if (i % 2 == 0) "a" else "b", ts(i)))
    }.toDF("user_id", "event_id", "event_type", "ts")
    val got = Behavior.markovPredictorAccuracy(ev)
      .select("prev_type", "predicted", "accuracy")
      .as[(String, String, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (prev, pred, acc) =>
      assert(acc == 1.0, s"$prev -> $pred should be perfectly predictable")
      assert((prev == "a" && pred == "b") || (prev == "b" && pred == "a"))
    }
  }

  test("tokenKeyness: label-exclusive tokens surface as enriched; absence is not enrichment") {
    // with two classes, a token's ABSENCE associates as strongly as its
    // presence — the `enriched` flag is what separates the directions
    val docs = Seq(
      (1L, "en", "aaa aaa shared"), (2L, "en", "aaa shared"),
      (3L, "fr", "bbb bbb shared"), (4L, "fr", "bbb shared"))
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.tokenKeyness(docs, "text", "lang", k = 2)
      .select("label", "token", "enriched").as[(String, String, Boolean)]
      .collect().toSet
    assert(got.contains(("en", "aaa", true)) && got.contains(("fr", "bbb", true)))
    assert(!got.contains(("en", "bbb", true)) && !got.contains(("fr", "aaa", true)))
  }

  test("sessionStats: the 30-minute gap splits sessions; depth histogram is exact") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val ev = Seq(
      (1L, 1L, "view", ts(0)), (1L, 2L, "view", ts(10)), // depth 2
      (1L, 3L, "view", ts(100)),           // bounce after the gap
      (2L, 4L, "view", ts(0)))             // bounce
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = Behavior.sessionStats(ev).orderBy("depth")
      .select("depth", "n_sessions", "share", "mean_duration_sec")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.toSeq == Seq(
      (1L, 2L, 0.666667, 0.0), (2L, 1L, 0.333333, 600.0)))
  }

  test("sessionStats: an EXACT 30-minute gap starts a new session (the StatefulSessionizer boundary)") {
    // gap == gapMinutes must break, matching the streaming sessionizer
    // (us - last >= gapUs) and session_window's half-open interval —
    // under the old strict > rule these two events were one session
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = Seq(
      (1L, 1L, "view", t0),
      (1L, 2L, "view", new java.sql.Timestamp(t0.getTime + 30 * 60000L)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = Behavior.sessionStats(ev)
      .select("depth", "n_sessions").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L)),
      s"two single-event sessions expected: ${got.toSeq}")
  }

  test("seasonalNaiveBacktest: a perfect weekly cycle pins MAE 0 and NULL MASE") {
    val rev = (0 until 70).map { i =>
      (1L, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        if (i % 7 < 3) 100.0 else 40.0)
    }.toDF("restaurant_id", "creation_date", "total_revenue")
    val got = Timeseries.seasonalNaiveBacktest(rev)
      .select("restaurant_id", "mae_test", "mae_train")
      .as[(Long, Double, Double)].collect()
    assert(got.toSeq == Seq((1L, 0.0, 0.0)))
    val mase = Timeseries.seasonalNaiveBacktest(rev).select("mase").collect()
    assert(mase.head.isNullAt(0), "zero training MAE must yield NULL MASE")
  }

  test("associationRules: confidence is directional, lift symmetric") {
    // item 1 in 4 baskets, item 2 in 2, together twice:
    // conf(2→1) = 1.0, conf(1→2) = 0.5, lift = 2·4/(4·2) = 1.0
    val b = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (4L, 1L))
      .toDF("basket", "item")
    val got = Association.associationRules(b, "basket", "item",
      minItemSupport = 2, minPairSupport = 2)
      .orderBy("antecedent")
      .select("antecedent", "consequent", "confidence", "lift")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.toSeq == Seq((1L, 2L, 0.5, 1.0), (2L, 1L, 1.0, 1.0)))
  }

  test("pcaLoadings: variance concentrated on one axis recovers that axis") {
    val vecs = (0 until 20).map { i =>
      (i.toLong, Array((i - 10).toFloat, 0.1f))
    }.toDF("vec_id", "embedding")
    val got = Profiling.pcaLoadings(vecs, "vec_id", "embedding",
      dim = 2, unitsPerValue = 1000, iterations = 8)
      .orderBy("dim_idx")
      .select("dim_idx", "loading", "explained_share")
      .as[(Long, Double, Double)].collect()
    assert(math.abs(math.abs(got(0)._2) - 1.0) < 1e-4,
      s"dominant axis loading should be ±1, got ${got(0)._2}")
    assert(math.abs(got(1)._2) < 1e-4)
    assert(got(0)._3 > 0.999, "axis 0 carries all the variance")
  }

  test("pcaProjection: projections recover the dominant-axis coordinate") {
    val vecs = (0 until 20).map { i =>
      (i.toLong, Array((i - 10).toFloat, 0.0f))
    }.toDF("vec_id", "embedding")
    val got = Profiling.pcaProjection(vecs, "vec_id", "embedding",
      dim = 2, unitsPerValue = 1000, iterations = 8)
      .orderBy("vec_id").select("pc1").as[Double].collect()
    val diffs = got.sliding(2).map(p => p(1) - p(0)).toSeq
    assert(diffs.forall(d => math.abs(math.abs(d) - 1.0) < 1e-3),
      s"consecutive projections must step by ±1, got $diffs")
  }

  test("priceElasticity: qty = price^-2 recovers elasticity −2 exactly") {
    val li = (1 to 40).map { i =>
      val price = 1.0 + i * 0.25
      val qty = 1000.0 / (price * price)
      // l_extendedprice = qty · price so unit price reconstructs to `price`
      (i.toLong, 1L, qty, qty * price)
    }.toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val part = Seq((1L, "WIDGET")).toDF("p_partkey", "p_type")
    val got = Timeseries.priceElasticity(li, part)
      .select("item_category", "elasticity", "r2")
      .as[(String, Double, Double)].collect()
    assert(got.length == 1)
    assert(math.abs(got.head._2 - (-2.0)) < 1e-3, s"got ${got.head._2}")
    assert(got.head._3 > 0.999999)
  }

  test("ivfPqTopK degenerates to pqAdcTopK when one cell holds everything") {
    val vecs = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val single = Similarity.ivfPqTopK(vecs, "vec_id", "embedding",
      queryModEvery = 50, k = 3, blocks = 4, seedEvery = 100,
      centroidEvery = 1000000, nProbe = 1)
      .orderBy("query_id", "rank").collect()
    val adc = Similarity.pqAdcTopK(vecs, "vec_id", "embedding",
      queryModEvery = 50, k = 3, blocks = 4, seedEvery = 100)
      .orderBy("query_id", "rank").collect()
    assert(single.nonEmpty && single.toSeq == adc.toSeq,
      "single-cell IVF-PQ must equal plain ADC")
  }
}
