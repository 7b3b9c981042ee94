package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit pins for the round-7 operator batch: A-Priori pairs, Pareto
  * cut, LOCF, vocabulary profile, Jaro-Winkler, rolling correlation. */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  test("frequentItemPairs: support pruning is applied on items AND pairs") {
    // item 9 appears once → pruned at pass 1 (no pair with 9 survives
    // even though (1,9) co-occurs); pair (2,3) co-occurs once → pruned
    // at pass 2; everything else co-occurs twice among frequent items
    val b = Seq(
      (1L, 1L), (1L, 2L), (1L, 9L),
      (2L, 1L), (2L, 2L), (2L, 3L), (2L, 4L),
      (3L, 1L), (3L, 3L), (3L, 4L))
      .toDF("basket", "item")
    val got = Association.frequentItemPairs(b, "basket", "item",
      minItemSupport = 2, minPairSupport = 2)
      .orderBy("item_a", "item_b")
      .select("item_a", "item_b", "n_both", "n_a", "n_b")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, 3L, 2L), (1L, 3L, 2L, 3L, 2L),
      (1L, 4L, 2L, 3L, 2L), (3L, 4L, 2L, 2L, 2L)))
    assert(!got.exists { case (a, bb, _, _, _) => a == 2L && bb == 3L },
      "pair (2,3) co-occurs once and must be pruned at pass 2")
  }

  test("paretoCut: head is the minimal prefix crossing the threshold") {
    val rev = Seq(("a", 70.0), ("b", 20.0), ("c", 10.0))
      .flatMap { case (c, v) => Seq((c, v)) }
      .toDF("item_category", "total_revenue")
    val got = Olap.paretoCut(rev, "item_category", threshold = 0.8)
      .orderBy("rank")
      .select("item_category", "rank", "cum_share", "in_head")
      .as[(String, Int, Double, Boolean)].collect()
    assert(got.map(_._1).toSeq == Seq("a", "b", "c"))
    assert(got.map(_._4).toSeq == Seq(true, true, false),
      "a (0.7) and b (crossing to 0.9) are the head; c is past it")
  }

  test("gapFillLocf carries the last observation and tracks staleness") {
    val d = (i: Int) => java.sql.Date.valueOf(f"2024-01-$i%02d")
    val rev = Seq((1L, d(1), 10.0), (1L, d(4), 40.0))
      .toDF("restaurant_id", "creation_date", "total_revenue")
    val got = Timeseries.gapFillLocf(rev)
      .orderBy("creation_date")
      .select("creation_date", "revenue_locf", "is_imputed", "staleness_days")
      .as[(java.sql.Date, Double, Long, Int)].collect()
    assert(got.map(_._2).toSeq == Seq(10.0, 10.0, 10.0, 40.0))
    assert(got.map(_._3).toSeq == Seq(0L, 1L, 1L, 0L))
    assert(got.map(_._4).toSeq == Seq(0, 1, 2, 0))
  }

  test("vocabGrowth: hapax and TTR per source") {
    val docs = Seq(
      ("s1", "a a b"),     // tokens 3, types {a,b}, hapax {b}
      ("s2", "x y z x"))   // tokens 4, types {x,y,z}, hapax {y,z}
      .toDF("source", "text")
    val got = TextAnalysis.vocabGrowth(docs, "source", "text")
      .orderBy("source")
      .select("source", "n_tokens", "n_types", "n_hapax")
      .as[(String, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(("s1", 3L, 2L, 1L), ("s2", 4L, 3L, 2L)))
  }

  test("JaroWinkler matches the rapidfuzz/DuckDB convention") {
    val cases = Seq(
      ("martha", "marhta", 0.961111),
      ("dwayne", "duane", 0.84),
      ("crazy", "crz", 0.893333),
      // boost threshold: jaro = 0.5 ≤ 0.7, so NO prefix bonus
      ("aaaaaa", "aaxxxxxxxxxx", 0.5),
      ("abc", "abc", 1.0),
      ("a", "b", 0.0),
      ("", "", 0.0),
      ("", "abc", 0.0))
    val got = cases.toDF("a", "b", "want")
      .withColumn("jw",
        round(graft.functions.StringSimilarity.jaroWinkler(col("a"), col("b")), 6))
      .select("a", "b", "want", "jw")
      .as[(String, String, Double, Double)].collect()
    got.foreach { case (a, b, want, jw) =>
      assert(jw == want, s"jw('$a','$b') = $jw, want $want")
    }
  }

  test("rollingMarketCorr: perfectly co-moving series correlate at 1") {
    val d = (i: Int) => java.sql.Date.valueOf(f"2024-01-$i%02d")
    // two restaurants, each twice the market's other half — every
    // series is proportional to the market, so r = 1 once windows fill
    val rev = (1 to 31).flatMap { i =>
      Seq((1L, d(i), i * 10.0), (2L, d(i), i * 20.0))
    }.toDF("restaurant_id", "creation_date", "total_revenue")
    val got = Timeseries.rollingMarketCorr(rev, windowDays = 28)
      .orderBy("restaurant_id", "creation_date")
      .select("restaurant_id", "market_corr")
      .as[(Long, Option[Double])].collect()
    assert(got.length == 8, "31 days - 27 warmup = 4 full windows per restaurant")
    assert(got.forall(_._2.contains(1.0)), s"expected r=1, got ${got.toSeq}")
  }

  test("pqEncode: per-block codes, self-seeds at zero distance") {
    // 8-dim vectors, 2 blocks of 4; ids 0 and 100 seed the codebooks
    val vecs = Seq(
      (0L, Array(0.0, 0.0, 0.0, 0.0, 9.0, 9.0, 9.0, 9.0)),
      (100L, Array(5.0, 5.0, 5.0, 5.0, 0.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.1, 0.1, 0.1, 0.1, 0.2, 0.2, 0.2, 0.2)), // blk0→0, blk1→100
      (2L, Array(4.8, 4.9, 5.0, 5.1, 8.8, 9.0, 9.1, 9.2))) // blk0→100, blk1→0
      .toDF("vec_id", "embedding")
    val got = Similarity.pqEncode(vecs, "vec_id", "embedding",
      blocks = 2, iters = 1, seedEvery = 100)
      .orderBy("vec_id", "blk")
      .select("vec_id", "blk", "code", "dist")
      .as[(Long, Int, Long, Double)].collect()
    val codes = got.map(r => (r._1, r._2) -> r._3).toMap
    assert(codes((0L, 0)) == 0L && codes((0L, 1)) == 0L)
    assert(codes((100L, 0)) == 100L && codes((100L, 1)) == 100L)
    assert(got.filter(r => r._1 == 0L || r._1 == 100L).forall(_._4 == 0.0),
      "seeds must encode to themselves at distance 0")
    assert(codes((1L, 0)) == 0L && codes((1L, 1)) == 100L)
    assert(codes((2L, 0)) == 100L && codes((2L, 1)) == 0L)
  }

  test("pqAdcTopK ranks by summed per-block codeword distances") {
    val vecs = Seq(
      (0L, Array(0.0, 0.0, 0.0, 0.0, 9.0, 9.0, 9.0, 9.0)),
      (100L, Array(5.0, 5.0, 5.0, 5.0, 0.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.1, 0.1, 0.1, 0.1, 0.2, 0.2, 0.2, 0.2)), // codes (0, 100)
      (2L, Array(4.8, 4.9, 5.0, 5.1, 8.8, 9.0, 9.1, 9.2))) // codes (100, 0)
      .toDF("vec_id", "embedding")
    val got = Similarity.pqAdcTopK(vecs, "vec_id", "embedding",
      queryModEvery = 100, k = 3, blocks = 2, iters = 1, seedEvery = 100)
      .filter(col("query_id") === 0L)
      .orderBy("rank")
      .select("vec_id", "adc_dist")
      .as[(Long, Double)].collect()
    // ADC(0→2): d²(q0_b0, cw100_b0)=100 + d²(q0_b1, cw0_b1)=0  → 100
    // ADC(0→1): 0 + d²([9...], [0...])=324                     → 324
    // ADC(0→100): 100 + 324                                    → 424
    assert(got.toSeq == Seq((2L, 100.0), (1L, 324.0), (100L, 424.0)))
  }

  test("SquaredL2/l2dist: strict left-to-right accumulation") {
    val d = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 0.0, 3.0)))
      .toDF("a", "b")
      .select(graft.functions.VectorFunctions.l2dist(col("a"), col("b")).as("d"))
      .as[Double].head()
    assert(d == math.sqrt(9.0 + 4.0 + 0.0))
  }

  test("revenueAcf: a perfect 2-day alternation has acf(2)=1, acf(1)=-1") {
    val d = (i: Int) => java.sql.Date.valueOf(f"2024-01-$i%02d")
    val rev = (1 to 20).map(i =>
      (1L, d(i), if (i % 2 == 0) 100.0 else 300.0))
      .toDF("restaurant_id", "creation_date", "total_revenue")
    val got = Timeseries.revenueAcf(rev, maxLag = 2)
      .orderBy("lag")
      .select("lag", "n_pairs", "acf")
      .as[(Int, Long, Double)].collect()
    assert(got.map(t => (t._1, t._2)).toSeq == Seq((1, 19L), (2, 18L)))
    assert(got(0)._3 == -1.0 && got(1)._3 == 1.0, s"got ${got.toSeq}")
  }

  test("naiveBayesConfusion: separable vocabularies classify perfectly") {
    val docs = Seq(
      (1L, "foo foo bar", "en"), (2L, "foo bar bar", "en"),
      (3L, "uno dos uno", "es"), (4L, "dos dos uno", "es"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.naiveBayesConfusion(docs, "doc_id", "text", "lang")
      .orderBy("true_label", "predicted")
      .select("true_label", "predicted", "n_docs")
      .as[(String, String, Long)].collect()
    assert(got.toSeq == Seq(("en", "en", 2L), ("es", "es", 2L)),
      s"disjoint vocabularies must classify perfectly, got ${got.toSeq}")
  }

  test("revenueConcentration: monopoly HHI=1, even split HHI=1/n") {
    val rev = Seq(
      (1L, "a", 100.0),                     // restaurant 1: one category
      (2L, "a", 50.0), (2L, "b", 50.0))     // restaurant 2: even 2-way split
      .toDF("restaurant_id", "item_category", "total_revenue")
    val got = Olap.revenueConcentration(rev)
      .orderBy("restaurant_id")
      .select("restaurant_id", "n_categories", "hhi", "effective_categories")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.toSeq == Seq((1L, 1L, 1.0, 1.0), (2L, 2L, 0.5, 2.0)))
  }

  test("rollingMarketCorr: zero-variance windows yield NULL, not NaN") {
    val d = (i: Int) => java.sql.Date.valueOf(f"2024-01-$i%02d")
    val rev = (1 to 30).map(i => (1L, d(i), 5.0))
      .toDF("restaurant_id", "creation_date", "total_revenue")
    val got = Timeseries.rollingMarketCorr(rev, windowDays = 28)
      .select("market_corr").as[Option[Double]].collect()
    assert(got.nonEmpty && got.forall(_.isEmpty))
  }
}
