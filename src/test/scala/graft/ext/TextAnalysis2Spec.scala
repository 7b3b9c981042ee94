package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the round-2 TextAnalysis additions (TF-IDF, PII scrub) and
  * the int8 quantization report. */
class TextAnalysis2Spec extends SparkSpec {
  import spark.implicits._

  test("tfidfTopTerms: corpus-wide terms score zero, rare terms rank first") {
    val docs = Seq(
      (1L, "common alpha alpha"),
      (2L, "common beta"),
      (3L, "common gamma gamma gamma")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", topPerDoc = 2)
      .select("doc_id", "term_rank", "term", "tfidf")
      .as[(Long, Int, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4))).toMap
    // 'common' appears in every doc -> ln(3/3)=0; distinctive term wins
    assert(got(1L).head._1 === "alpha")
    assert(got(1L).head._2 === math.rint(2 * math.log(3.0) * 1e6) / 1e6)
    assert(got(2L).head._1 === "beta")
    assert(got(3L).head._1 === "gamma")
    assert(got(1L)(1) === ("common", 0.0))
  }

  test("piiScrub: counts and redaction for emails, urls, long numbers") {
    val docs = Seq(
      (1L, "contact a.smith+x@corp.example.com or see https://ex.org/p?id=9 ref 1234567"),
      (2L, "clean text only")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(docs, "doc_id", "text")
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1)
    assert(got(0)._2 === 1 && got(0)._3 === 1 && got(0)._4 === 1)
    assert(got(1)._2 === 0 && got(1)._3 === 0 && got(1)._4 === 0)
    // doc 2 has nothing to redact: md5 must equal the original text's
    assert(got(1)._5 ===
      docs.filter(col("doc_id") === 2).select(md5(col("text"))).head.getString(0))
    // doc 1 redacted text no longer contains the email
    val redacted = Seq((1L,
      "contact <EMAIL> or see <URL> ref <NUM>")).toDF("doc_id", "text")
    assert(got(0)._5 ===
      redacted.select(md5(col("text"))).head.getString(0))
  }

  test("chunk: sliding token windows with overlap, short docs -> one chunk") {
    val docs = Seq(
      (1L, "a b c d e f g h"), // 8 tokens
      (2L, "x y"),             // shorter than one window
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunk(docs, "doc_id", "text", chunkSize = 4, overlap = 2)
      .as[(Long, Long, Long, String)].collect().toSet
    // stride 2: starts 0,2,4 (ceil((8-4)/2)+1 = 3 chunks)
    assert(got == Set(
      (1L, 0L, 4L, "a b c d"),
      (1L, 1L, 4L, "c d e f"),
      (1L, 2L, 4L, "e f g h"),
      (2L, 0L, 2L, "x y")))
  }

  test("repetitionSignals: planted repetition scores above clean text") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "every word here is fully unique today"),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    val (_, n1, dw1, dg1, tw1) = got(1L)
    assert(n1 == 6 && dw1 > 0.8 && dg1 == 0.75 && tw1 == 1.0)
    val (_, n2, dw2, dg2, tw2) = got(2L)
    assert(n2 == 7 && dw2 == 0.0 && dg2 == 0.0 && tw2 == 0.142857) // round(1/7, 6)
  }

  test("packSequences: per-shard contiguous packing tracks the running budget") {
    val docs = (1L to 40L).map(i => (i, ("w " * (i % 7 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.packSequences(docs, "doc_id", "text", budget = 10, shards = 2)
      .select($"shard", $"doc_id", $"n_tokens", $"pack_id")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      var cum = 0L
      rs.sortBy(_._2).foreach { case (_, doc, n, pack) =>
        assert(pack == cum / 10,
          s"shard $shard doc $doc: pack $pack != ${cum / 10} at offset $cum")
        cum += n
      }
    }
    assert(rows.map(_._2).distinct.length == 40) // every doc packed exactly once
  }

  test("tokenEntropy: uniform text maxes entropy, constant text zeroes it") {
    val docs = Seq(
      (1L, "a b c d"),          // 4 uniform tokens -> ln(4)
      (2L, "x x x x"),          // constant -> 0
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 4 && math.abs(got(1L)._3 - math.log(4)) < 1e-5)
    assert(got(2L)._2 == 4 && got(2L)._3 == 0.0)
  }

  test("quantizeInt8Report: reconstruction error bounded by scale/2") {
    val vecs = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val rep = Similarity.quantizeInt8Report(vecs, "vec_id", "embedding")
    val bad = rep.filter(col("max_abs_err") > col("q_scale") * 0.5 + 1e-9).count()
    assert(bad === 0)
    assert(rep.filter(col("mean_abs_err") > col("max_abs_err") + 1e-12).count() === 0)
    assert(rep.count() === vecs.count())
  }

  test("lmScore: mean token log-prob under the corpus unigram model, rare-token docs score lower") {
    val docs = Seq(
      (1L, "x x y z"), // common mix
      (2L, "y"),       // single common token
      (3L, "z")        // single rare token
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    // corpus counts: x:2, y:2, z:2, total 6 — uniform model
    val expect = { // replicate the quantized math for doc 1
      def u(c: Long, total: Long) = math.rint(math.log(c.toDouble / total) * 1e9).toLong
      val total = 6L
      val su = 2 * u(2, total) + 1 * u(2, total) + 1 * u(2, total)
      math.rint((su / 1e9) / 4 * 1e6) / 1e6
    }
    assert(got.map(_._2) == Seq(4L, 1L, 1L))
    assert(got.head._3 == expect)
    // all tokens equally frequent here -> every doc has the same mean
    assert(got.map(_._3).distinct.size == 1)
    // now plant a genuinely rare token: doc 3 must score strictly lower
    val uneven = Seq(
      (1L, "x x x y"),
      (2L, "x y"),
      (3L, "rare")
    ).toDF("doc_id", "text")
    val s2 = TextAnalysis.lmScore(uneven, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(s2(2)._3 < s2(0)._3 && s2(2)._3 < s2(1)._3)
  }

  test("lmPruneBySource: per-source keep fraction by rank, cutoff is min kept score") {
    // source A: 5 docs, source B: 2 docs; keep 4/5 -> A keeps ceil(4) = 4,
    // B keeps ceil(1.6) = 2
    val docs = Seq(
      (1L, "x x x x", "A"), (2L, "x x x y", "A"), (3L, "x x y y", "A"),
      (4L, "x y y rare", "A"), (5L, "rare2 rare3 rare4 rare5", "A"),
      (6L, "x x", "B"), (7L, "rare6", "B")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis
      .lmPruneBySource(docs, "doc_id", "text", "source", keepNum = 4, keepDen = 5)
      .orderBy("source")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) == Seq(("A", 5L, 4L), ("B", 2L, 2L)))
    // cutoff = the 4th-highest avg_logprob within A (rank tie-break on id)
    val scores = TextAnalysis.lmScore(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .filter(_._1 <= 5L).sortBy(r => (-r._3, r._1))
    assert(got.head._4 == scores(3)._3)
    // keep everything: cutoff is the per-source min score
    val all = TextAnalysis
      .lmPruneBySource(docs, "doc_id", "text", "source", keepNum = 1, keepDen = 1)
      .as[(String, Long, Long, Double)].collect()
    assert(all.forall(r => r._2 == r._3))
  }

  test("boilerplateShare: frequent trigram counted, clean doc keeps share 0") {
    // "a b c" appears in docs 1..3 (df=3 >= minDf); each doc carries
    // unique tail trigrams; doc 4 shares nothing frequent
    val docs = Seq(
      (1L, "a b c t1a t1b"),
      (2L, "a b c t2a t2b"),
      (3L, "a b c t3a t3b"),
      (4L, "u v w u2 v2"),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.boilerplateShare(docs, "doc_id", "text", n = 3, minDf = 3)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // doc 1 trigrams: "a b c", "b c t1a", "c t1a t1b" -> 3 total, 1 frequent
    assert(got(1L) == ((1L, 3L, 1L, 1.0 / 3)))
    assert(got(4L) == ((4L, 3L, 0L, 0.0)))
    // doc frequency table itself: "a b c" has df 3
    val df3 = TextAnalysis.ngramDocFreq(docs, "doc_id", "text", n = 3)
      .filter($"ngram" === "a b c").as[(String, Long)].collect()
    assert(df3.toSeq == Seq(("a b c", 3L)))
  }

  test("bigramMergeStats: occurrence vs doc counts, ties on pair text, 1-token edge") {
    val docs = Seq(
      (1L, "x y x y"),   // "x y" twice, "y x" once
      (2L, "x y"),       // "x y" once
      (3L, "a b"),       // "a b" once -> ties with "y x" on count, a < y
      (4L, "solo"),      // single token -> zero pairs, must not error
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramMergeStats(docs, "doc_id", "text", topK = 2)
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(got == Seq((1, "x y", 3L, 2L), (2, "a b", 1L, 1L)))
  }

  test("postings: df exact, sample ascending and capped, repeats collapse per doc") {
    val docs = Seq(
      (3L, "w w common"),  // repeated token counts once per doc
      (1L, "common only1"),
      (2L, "common only2"),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.postings(docs, "doc_id", "text", maxPostings = 2)
      .as[(String, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("common") == ((3L, "1,2")))  // capped at 2, ascending ids
    assert(got("w") == ((1L, "3")))
    assert(got("only1") == ((1L, "1")))
  }

  test("goodTuring: hand-computed count-of-counts, r*, and unseen mass") {
    // counts: a=3 b=2 c=2 d=1 e=1 f=1 -> N=10, N1=3, N2=2, N3=1
    val docs = Seq("a a a b", "b c c d", "e f").toDF("text")
    val got = TextAnalysis.goodTuring(docs, "text")
      .as[(Long, Long, Option[Double], Double)].collect().toSeq
    assert(got == Seq(
      // r=1: r* = 2*N2/N1 = 4/3 -> 1.333333 half-up micro
      (1L, 3L, Some(1.333333), 0.3),
      // r=2: r* = 3*N3/N2 = 1.5
      (2L, 2L, Some(1.5), 0.3),
      // r=3: N4 = 0 -> the smoothed-fit zone, NULL
      (3L, 1L, None, 0.3)))
    // mass check: GT reassigns, never creates: sum over seen classes of
    // N_r * r* <= N, the gap is (approximately) the unseen mass
    val reassigned = got.flatMap(r => r._3.map(_ * r._2)).sum
    assert(reassigned <= 10.0 && got.head._4 == 0.3)
  }

  test("lexicalRichness: hand-computed vitals on a tiny corpus") {
    // source s: counts a=3 b=1 c=1 -> N=5 V=3 N1=2 scc=11
    val docs = Seq(("s", "a a b"), ("s", "a c")).toDF("source", "text")
    val got = TextAnalysis.lexicalRichness(docs, "source", "text")
      .as[(String, Long, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    val c = math.round(math.log(3.0) / math.log(5.0) * 1e6) / 1e6
    assert(got == Seq((
      "s", 5L, 3L,
      0.6, // TTR = 3/5
      0.666667, // hapax 2/3 half-up micro
      2400.0, // Yule K = 1e4 * 6 / 25
      0.3, // Simpson D = 6 / 20
      c))) // Herdan C = ln3/ln5
  }

  test("termBurstiness: uniform glue at VMR 0-1, bursty content above 1") {
    val docs = Seq((1L, "a a a b"), (2L, "a b"), (3L, "b c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.termBurstiness(docs, "doc_id", "text")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("b", 3L, 3L, 1.0, 0.0), // one per doc: zero dispersion
      ("a", 2L, 4L, 2.0, 1.166667), // bursty: (3*10-16)/12
      ("c", 1L, 1L, 1.0, 0.666667))) // rare singleton: (3-1)/3
  }
}
