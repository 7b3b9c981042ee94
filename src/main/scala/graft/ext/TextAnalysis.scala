package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Portable, WordShingles}

/** Text-analysis operator suite for corpus pipelines: language ID,
  * quality scoring, token counting, content fingerprinting.
  *
  * Everything is built from codegen'd built-ins (split / regexp /
  * higher-order array functions) — no UDFs — and every formula has an
  * exact DuckDB mirror for the t2 gate.
  */
object TextAnalysis {

  /** Tiny demonstration stopword lexicon (top function words per
    * language). Real deployments plug in full stopword lists — the
    * operator shape (token explode → broadcast lexicon join → argmax)
    * is unchanged by lexicon size. */
  val lexicon: Seq[(String, String)] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "for", "on"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "se", "no", "por"),
    "fr" -> Seq("le", "la", "de", "et", "un", "que", "pour", "dans", "ce", "pas"),
    "de" -> Seq("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "nicht"),
    "zh" -> Seq("的", "一", "是", "不", "了", "人", "我", "在", "有", "他"),
  ).flatMap { case (lang, ws) => ws.map(lang -> _) }

  /** SQL VALUES clause mirroring [[lexicon]] (oracle side). */
  def lexiconSqlValues: String =
    lexicon.map { case (l, w) => s"('$l', '$w')" }.mkString(", ")

  /** English stopword subset used by the quality score. */
  val qualityStopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "it")

  /** N-gram/stopword-hit language ID: most-matching lexicon language per
    * doc, 'und' when no token matches. Deterministic tie-break on lang. */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lex = lexicon.toDF("lex_lang", "t")
    val hits = docs
      .select(col(idCol), explode(Portable.tokens(col(textCol))).as("t"))
      .join(broadcast(lex), Seq("t"))
      .groupBy(col(idCol), col("lex_lang"))
      .agg(count(lit(1)).as("hits"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("hits").desc, col("lex_lang"))
    val best = hits
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("lex_lang").as("detected_lang"), col("hits"))
    docs.select(col(idCol))
      .join(best, Seq(idCol), "left")
      .na.fill(Map("detected_lang" -> "und", "hits" -> 0L))
  }

  /** Heuristic quality score: length saturation + alphabetic ratio +
    * stopword density. All terms are identical double formulas on both
    * engines; rounded at the end. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Portable.tokens(col(textCol))
    val stopArr = array(qualityStopwords.map(lit): _*)
    docs.select(
        col(idCol),
        length(col(textCol)).as("n_chars"),
        size(toks).as("n_tokens"),
        length(regexp_replace(col(textCol), "[^a-zA-Z]", "")).as("n_alpha"),
        size(filter(toks, t => array_contains(stopArr, t))).as("n_stop"))
      .withColumn("alpha_ratio", col("n_alpha").cast("double") / col("n_chars"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
      .withColumn(
        "quality_score",
        round(
          lit(0.5) * least(lit(1.0), col("n_tokens") / 64.0)
            + lit(0.25) * col("alpha_ratio")
            + lit(0.25) * least(lit(1.0), col("stop_ratio") * 4.0),
          6))
  }

  /** Token counting: whitespace tokens, word tokens, and a BPE-ish
    * subword count (greedy ≤4-letter chunks / digits / punctuation). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      size(Portable.tokens(col(textCol))).as("n_ws_tokens"),
      size(regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)))
        .as("n_word_tokens"),
      size(regexp_extract_all(lower(col(textCol)), lit("[a-z]{1,4}|[0-9]|[^a-z0-9 ]"), lit(0)))
        .as("n_subword_tokens"))

  /** Content fingerprints: exact md5 plus a 1-permutation MinHash over
    * word shingles (computed array-level — no explode). */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sh = WordShingles.shingles(lower(col(textCol)))
    docs.select(
      col(idCol),
      md5(col(textCol)).as("content_md5"),
      array_min(transform(sh, s => Portable.h60(s))).as("shingle_fp"))
  }

  /** Corpus term statistics: the `topK` terms by document frequency
    * (docs containing the term), with total term frequency — the
    * vocabulary/df building block of TF-IDF and stopword discovery.
    * One explode + one hash aggregate; df's exact distinct is per-term
    * (two-phase partial agg), ties break on the term for a total order.
    * At 100 TB swap the exact df for `approx_count_distinct` and keep
    * the same shape. */
  def termStats(
      docs: DataFrame, idCol: String, textCol: String, topK: Int = 100): DataFrame =
    docs
      .select(col(idCol), explode(Portable.tokens(col(textCol))).as("term"))
      .groupBy(col("term"))
      .agg(
        countDistinct(col(idCol)).as("df"),
        count(lit(1)).as("tf"))
      .orderBy(col("df").desc, col("term"))
      .limit(topK)
}
