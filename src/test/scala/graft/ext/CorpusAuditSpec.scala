package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit pins for q251–q255 (lang mix, dedup yield, quality×dup,
  * LM length bias, n-gram novelty). */
class CorpusAuditSpec extends SparkSpec {
  import spark.implicits._

  test("sourceLangMix: dominant share and entropy of an even split") {
    val docs = (Seq.fill(3)(("s1", "en")) ++ Seq.fill(1)(("s1", "de")) ++
      Seq.fill(2)(("s2", "en")) ++ Seq.fill(2)(("s2", "fr")))
      .zipWithIndex.map { case ((s, l), i) => (i.toLong, s, l) }
      .toDF("doc_id", "source", "lang")
    val got = TextAnalysis.sourceLangMix(docs, "source", "lang")
      .orderBy("source")
      .select("source", "n_docs", "n_langs", "top_lang_share", "lang_entropy")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.map(r => (r._1, r._2, r._3, r._4)).toSeq ==
      Seq(("s1", 4L, 2L, 0.75), ("s2", 4L, 2L, 0.5)))
    // even 2-way split → ln 2 nats
    assert(math.abs(got(1)._5 - math.log(2)) < 1e-5)
  }

  test("dedupYield: keep-min-id accounting attributes removals per source") {
    val docs = Seq(
      (1L, "dup text", "a", 8L),   // kept (global min id)
      (2L, "dup text", "b", 8L),   // removed, charged to b
      (3L, "unique", "b", 6L))
      .toDF("doc_id", "text", "source", "n_chars")
    val got = Dedup.dedupYield(docs, "doc_id", "text", "source", "n_chars")
      .orderBy("source")
      .select("source", "n_docs", "n_removed", "bytes_removed", "bytes_total")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(("a", 1L, 0L, 0L, 8L), ("b", 2L, 1L, 8L, 14L)))
  }

  test("qualityDupDeciles: dup rows land in their quality decile") {
    val docs = (1 to 20).map { i =>
      // ids 19,20 duplicate id 1's text
      val t = if (i >= 19) "the a and short" else s"the a and text number $i ok"
      (i.toLong, if (i == 1) "the a and short" else t)
    }.toDF("doc_id", "text")
    val got = Dedup.qualityDupDeciles(docs, "doc_id", "text")
      .agg(sum(col("n_docs")), sum(col("n_dups")))
      .as[(Long, Long)].collect()
    assert(got.head == ((20L, 2L)), s"two dups total: ${got.head}")
  }

  test("qualityDupDeciles law: distributed decile assignment equals the window ntile") {
    // 23 docs (not divisible by 10) exercises the remainder buckets:
    // ntile gives the first 3 buckets 3 rows and the rest 2
    val docs = (0L until 23L).map(i =>
      (i, s"doc body ${"x " * (i % 7).toInt} tail$i")).toDF("doc_id", "text")
    val got = Dedup.qualityDupDeciles(docs, "doc_id", "text")
      .orderBy("decile").select("decile", "n_docs")
      .as[(Int, Long)].collect().toSeq
    assert(got.map(_._2).sum == 23L)
    assert(got.map(_._2) == Seq(3L, 3L, 3L, 2L, 2L, 2L, 2L, 2L, 2L, 2L),
      s"ntile remainder buckets first: $got")
  }

  test("lmLengthBias: buckets split documents by token-count magnitude") {
    val docs = Seq(
      (1L, "a b c"),                          // 3 tokens → bucket 2
      (2L, "a b c d e f g h i j k l m n o p")) // 16 tokens → bucket 5
      .toDF("doc_id", "text")
    val got = TextAnalysis.lmLengthBias(docs, "doc_id", "text")
      .orderBy("bucket").select("bucket", "n_docs", "avg_tokens")
      .as[(Int, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((2, 1L, 3.0), (5, 1L, 16.0)))
  }

  test("ngramNovelty: repeated batches stop contributing new grams") {
    // bucket 0 (ids 0..1) introduces grams; bucket 1 (ids 2..3) repeats
    val docs = Seq(
      (0L, "w x y z"), (1L, "p q r s"),
      (2L, "w x y z"), (3L, "p q r s t"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(docs, "doc_id", "text", bucketSize = 2)
      .orderBy("bucket").select("bucket", "n_grams", "n_new")
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((0L, 4L, 4L), (1L, 5L, 1L)),
      s"only 'q r s t' is new in batch 1: ${got.toSeq}")
  }
}
