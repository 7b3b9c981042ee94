package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat and the dog sat in the house of the king"),
    (2L, "el perro y el gato en la casa de la reina no se fue"),
    (3L, "xyzzy plugh qwerty asdf"),
  ).toDF("doc_id", "text")

  test("langId picks the language with most lexicon hits, 'und' when none") {
    val got = TextAnalysis.langId(docs, "doc_id", "text")
      .select($"doc_id", $"detected_lang").as[(Long, String)].collect().toMap
    assert(got(1L) == "en")
    assert(got(2L) == "es")
    assert(got(3L) == "und")
  }

  test("langId projection equals the explode/join/argmax reference " +
      "(ties, overlapping lexicon words, dup tokens, empty, null)") {
    // reference = the pre-r16 shape: token explode -> broadcast lexicon
    // join -> per-(doc, lang) count -> argmax window with the
    // (hits desc, lang asc) tie-break, 'und' when nothing matches
    val adversarial = Seq(
      (1L, "the cat and the dog"),            // plain en
      (2L, "de la de la"),                    // fr/es overlap + dups
      (3L, "in den la"),                      // en/de/es three-way mix
      (4L, "le el der the 的"),               // five-way single-hit tie
      (5L, ""),                               // empty text
      (6L, null.asInstanceOf[String]),        // null text
      (7L, "zzz qqq"),                        // no hits
    ).toDF("doc_id", "text")
    val lex = TextAnalysis.lexicon.toDF("lex_lang", "t")
    val hits = adversarial
      .select($"doc_id",
        explode(graft.functions.Portable.tokens($"text")).as("t"))
      .join(broadcast(lex), Seq("t"))
      .groupBy($"doc_id", $"lex_lang")
      .agg(count(lit(1)).as("hits"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"hits".desc, $"lex_lang")
    val reference = adversarial.select($"doc_id")
      .join(hits.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"doc_id", $"lex_lang".as("detected_lang"), $"hits"),
        Seq("doc_id"), "left")
      .na.fill(Map("detected_lang" -> "und", "hits" -> 0L))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    val got = TextAnalysis.langId(adversarial, "doc_id", "text")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == reference.toSeq)
  }

  test("quality score: stopword-rich english text scores above gibberish") {
    val got = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .select($"doc_id", $"quality_score").as[(Long, Double)].collect().toMap
    assert(got(1L) > got(3L))
    assert(got.values.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("token counts: whitespace vs word vs subword") {
    val d = Seq((1L, "hello world-wide web2 x")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenCounts(d, "doc_id", "text")
      .as[(Long, Int, Int, Int)].collect().head
    assert(got._2 == 4)  // ws: hello | world-wide | web2 | x
    assert(got._3 == 5)  // words: hello, world, wide, web2, x
    assert(got._4 == 9)  // subwords: hell,o | worl,d,-,wide | web,2 | x
  }

  test("fingerprint: identical text yields identical fingerprints, different text differs") {
    val d = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "f g h i j")).toDF("doc_id", "text")
    val got = TextAnalysis.fingerprint(d, "doc_id", "text")
      .select($"doc_id", $"content_md5", $"shingle_fp").as[(Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == got(2L))
    assert(got(1L) != got(3L))
  }
}
