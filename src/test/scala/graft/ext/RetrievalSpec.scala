package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25Search: shared rare terms outrank common ones, self excluded") {
    // query doc 0 (id % 50 == 0): shares the rare term "zebra" with doc 1
    // and only the ubiquitous term "the" with docs 2 and 3 — doc 1 must
    // rank first; the query doc itself never appears.
    val docs = Seq(
      (0L, "the zebra runs"),
      (1L, "a zebra sleeps"),
      (2L, "the cat sits"),
      (3L, "the dog barks")
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25Search(docs, "doc_id", "text",
        queryModEvery = 50, k = 3)
      .orderBy("rank")
      .select($"query_id", $"doc_id", $"bm25", $"rank")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(got.forall(_._1 == 0L))
    assert(got.forall(_._2 != 0L), "self must be excluded")
    assert(got.head._2 == 1L, s"rare-term match must rank first: $got")
    assert(got.map(_._3).forall(_ > 0.0))
    assert(got.map(_._3) == got.map(_._3).sorted.reverse, "scores descend by rank")
  }

  test("bm25Search: length normalization prefers the shorter of two equal-tf docs") {
    val filler = (1 to 40).map(i => s"filler$i").mkString(" ")
    val docs = Seq(
      (0L, "needle"),
      (1L, "needle haystack"),
      (2L, s"needle $filler")
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25Search(docs, "doc_id", "text",
        queryModEvery = 50, k = 2, maxDfFraction = 1.0)
      .orderBy("rank").select($"doc_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L), "b>0 must favor the shorter matching doc")
  }

  test("bm25Search: the df cap prunes ubiquitous terms from the probe") {
    // "common" appears in all 4 docs; "rare" only in docs 0 and 2.
    val docs = Seq(
      (0L, "common rare"),
      (1L, "common alpha"),
      (2L, "common rare"),
      (3L, "common beta")
    ).toDF("doc_id", "text")
    val capped = Retrieval.bm25Search(docs, "doc_id", "text",
        queryModEvery = 50, k = 4, maxDfFraction = 0.5)
      .select($"doc_id").as[Long].collect().toSeq
    // only the rare term survives the probe: doc 2 is the sole match
    assert(capped == Seq(2L))
    val uncapped = Retrieval.bm25Search(docs, "doc_id", "text",
        queryModEvery = 50, k = 4, maxDfFraction = 1.0)
      .select($"doc_id").as[Long].collect().toSet
    assert(uncapped == Set(1L, 2L, 3L), "uncapped probe reaches common-term docs")
  }

  test("rrfFuse: hand-computed fusion, single-list docs, doc-id ties") {
    // list1 ranks d1, d2; list2 ranks d2, d3. c = 60:
    //   d2 = round(1e9/61) + round(1e9/62) = 16393443 + 16129032 units
    //   d1 = 16393443 units; d3 = 16129032 units
    val l1 = Seq((7L, 1L, 1), (7L, 2L, 2)).toDF("query_id", "doc_id", "rank")
    val l2 = Seq((7L, 2L, 1), (7L, 3L, 2)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(l1, l2), c = 60, k = 10)
      .orderBy($"rank")
      .select($"doc_id", $"rrf", $"rank").as[(Long, Double, Int)].collect().toSeq
    assert(got == Seq(
      (2L, 0.032522475, 1), (1L, 0.016393443, 2), (3L, 0.016129032, 3)))
    // equal-score ties (same rank in disjoint lists) break on doc_id
    val t1 = Seq((8L, 5L, 1)).toDF("query_id", "doc_id", "rank")
    val t2 = Seq((8L, 4L, 1)).toDF("query_id", "doc_id", "rank")
    val tied = Retrieval.rrfFuse(Seq(t1, t2), c = 60, k = 2)
      .orderBy($"rank").select($"doc_id").as[Long].collect().toSeq
    assert(tied == Seq(4L, 5L))
  }

  test("bm25TruncatedFromPostings law: a non-binding M equals the exact uncapped probe") {
    val docs = (0L to 19L).map(i =>
      (i, s"alpha shared${i % 3} tail$i " + ("pad " * (i % 5).toInt)))
      .toDF("doc_id", "text")
    val scored = Retrieval.scoredPostings(docs, "doc_id", "text")
    val exact = Retrieval.bm25FromPostings(scored,
        queryModEvery = 10, k = 5, maxDfFraction = 1.0)
      .orderBy($"query_id", $"rank")
      .as[(Long, Long, Double, Long)].collect().toSeq
    val pruned = Retrieval.bm25TruncatedFromPostings(scored,
        queryModEvery = 10, k = 5, maxPostingsPerTerm = 1000)
      .orderBy($"query_id", $"rank")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(pruned == exact,
      "with M >= every df the candidate set is complete and rescoring is exact")
  }

  test("bm25TruncatedFromPostings: a binding M bounds candidates but retrieved scores stay EXACT") {
    // "common" in all docs; doc 1..4 share nothing else with the query.
    // M=2 keeps only common's two highest-impact postings -> candidates
    // shrink, but every returned pair's score must equal the exact one.
    val docs = Seq(
      (0L, "common zebra"),
      (1L, "common common alpha"),
      (2L, "common beta"),
      (3L, "common gamma gamma"),
      (4L, "common delta"),
      (5L, "common zebra epsilon")
    ).toDF("doc_id", "text")
    val scored = Retrieval.scoredPostings(docs, "doc_id", "text")
    val exact = Retrieval.bm25FromPostings(scored,
        queryModEvery = 50, k = 6, maxDfFraction = 1.0)
      .select($"doc_id", $"bm25").as[(Long, Double)].collect().toMap
    val pruned = Retrieval.bm25TruncatedFromPostings(scored,
        queryModEvery = 50, k = 6, maxPostingsPerTerm = 2)
      .select($"doc_id", $"bm25").as[(Long, Double)].collect().toMap
    assert(pruned.size < exact.size, "M=2 must prune some candidates")
    pruned.foreach { case (d, s) =>
      assert(exact(d) == s, s"doc $d: pruned score $s != exact ${exact(d)}")
    }
    // doc 5 shares the rare zebra -> always a candidate and top-ranked
    assert(pruned.contains(5L))
  }

  test("truncationRecallSweep: non-binding M pins recall 1.0, monotone in M") {
    val docs = (0L to 19L).map(i =>
      (i, s"alpha shared${i % 3} tail$i " + ("pad " * (i % 5).toInt)))
      .toDF("doc_id", "text")
    val scored = Retrieval.scoredPostings(docs, "doc_id", "text")
    val got = Retrieval.truncationRecallSweep(scored,
        queryModEvery = 10, k = 5, mList = Seq(1, 3, 1000))
      .orderBy($"max_postings")
      .select($"max_postings", $"hits", $"n_exact", $"recall")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 3L, 1000L))
    val last = got.last
    assert(last._2 == last._3 && last._4 == 1.0,
      s"M >= every df must recover the exact top-k in full: $got")
    assert(got.map(_._4) == got.map(_._4).sorted,
      s"candidate recall must be monotone in M: $got")
  }

  test("truncationRecallSweep stride law: conf stride s equals direct queryModEvery*s") {
    // the soak's sampling knob must be a pure query-anchor subsample:
    // stride s under the conf == the unstrided sweep at s x the anchor
    // modulus, row for row
    val docs = (0L to 39L).map(i =>
      (i, s"alpha shared${i % 3} tail$i " + ("pad " * (i % 5).toInt)))
      .toDF("doc_id", "text")
    val scored = Retrieval.scoredPostings(docs, "doc_id", "text")
    def run(): Seq[(Long, Long, Long, Double)] =
      Retrieval.truncationRecallSweep(scored,
          queryModEvery = 5, k = 3, mList = Seq(2, 1000))
        .orderBy($"max_postings")
        .select($"max_postings", $"hits", $"n_exact", $"recall")
        .as[(Long, Long, Long, Double)].collect().toSeq
    val strided =
      try { spark.conf.set("spark.graft.audit.queryStride", "3"); run() }
      finally spark.conf.unset("spark.graft.audit.queryStride")
    val direct = Retrieval.truncationRecallSweep(scored,
        queryModEvery = 15, k = 3, mList = Seq(2, 1000))
      .orderBy($"max_postings")
      .select($"max_postings", $"hits", $"n_exact", $"recall")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(strided == direct, s"$strided != $direct")
    assert(strided.last._3 > 0, "the sampled sweep must still score queries")
  }

  test("impactTruncate law: salted two-stage selection equals the direct per-term top-M") {
    // tiny vocab over 40 docs -> terms with df far above M, several docs
    // per salt slice, and abundant tn TIES (equal tf and length) so the
    // doc_id tie-break is exercised across slice boundaries
    val docs = (0L to 39L).map(i => (i, s"common shared${i % 2} tail${i % 7}"))
      .toDF("doc_id", "text")
    val scored = Retrieval.scoredPostings(docs, "doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] =
      df.select($"term", $"doc_id", $"tn").orderBy($"term", $"doc_id")
        .as[(String, Long, Long)].collect().toSeq
    // salts=1: stage 1 IS the bare per-term window — the direct reference
    val direct = canon(Retrieval.impactTruncate(scored, 5, salts = 1))
    assert(direct.nonEmpty)
    Seq(2, 3, 16, 64).foreach { s =>
      assert(canon(Retrieval.impactTruncate(scored, 5, salts = s)) == direct,
        s"salts=$s must select the identical top-M posting set")
    }
  }

  test("impactTruncateRanked law: rank filter at m <= M equals a direct truncation at m") {
    // the property the recall sweep exploits: one ranked pass at
    // max(mList), then per-arm rank filters — must reproduce the
    // per-arm truncation exactly, ties included
    val docs = (0L to 39L).map(i => (i, s"common shared${i % 2} tail${i % 7}"))
      .toDF("doc_id", "text")
    val scored = Retrieval.scoredPostings(docs, "doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] =
      df.select($"term", $"doc_id", $"tn").orderBy($"term", $"doc_id")
        .as[(String, Long, Long)].collect().toSeq
    val ranked = Retrieval.impactTruncateRanked(scored, 7)
    Seq(1, 2, 5, 7).foreach { m =>
      assert(canon(ranked.filter($"graft_pr" <= m).drop("graft_pr")) ==
        canon(Retrieval.impactTruncate(scored, m)),
        s"rank filter at m=$m must equal impactTruncate(m)")
    }
  }
}
