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

  /** (detected_lang, hits) as PURE COLUMN EXPRESSIONS over a text
    * column (r16, guide §4): with a FIXED broadcast-sized lexicon the
    * per-language occurrence count is
    * `size(filter(tokens, t -> t IN lang_words))` — duplicates counted
    * exactly as the old explode→lexicon-join→count counted them — and
    * the argmax with the (hits desc, lang asc) tie-break is a when
    * chain over the per-language counts in ascending language order.
    * Whole-stage codegen, zero exchanges, one scan; the r15 shape paid
    * an explode, a broadcast join, a count shuffle, a row_number window
    * shuffle, and a join back on the id PER CALL. */
  private[ext] def langIdCols(textCol: Column): (Column, Column) = {
    val toks = Portable.tokens(textCol)
    val perLang = lexicon.groupBy(_._1).map { case (l, ws) =>
      val arr = array(ws.map { case (_, w) => lit(w) }: _*)
      // size(null array) is null, not -1 (non-legacy): coalesce keeps
      // null/empty text on the old "no match -> ('und', 0)" contract
      l -> coalesce(
        size(filter(toks, t => array_contains(arr, t))), lit(0)).cast("long")
    }.toSeq.sortBy(_._1)
    val best = greatest(perLang.map(_._2): _*)
    val detected = perLang.foldRight(lit("und"): Column) {
      case ((l, h), acc) => when(best > 0 && h === best, lit(l)).otherwise(acc)
    }
    (detected, best)
  }

  /** N-gram/stopword-hit language ID: most-matching lexicon language per
    * doc, 'und' when no token matches. Deterministic tie-break on lang.
    * One projection over the corpus scan ([[langIdCols]]). */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (detected, hits) = langIdCols(col(textCol))
    docs.select(col(idCol), detected.as("detected_lang"), hits.as("hits"))
  }

  /** The [[qualityScore]] projection as named column expressions over a
    * text column — exposed (r16, guide §4) so composed pipelines
    * ([[Curation]]) compute the score INLINE on their base scan instead
    * of joining the per-doc frame back on id (one scan + zero
    * exchanges vs an extra scan + an id-keyed join). Expression trees
    * are identical to the r15 `withColumn` chain, so the IEEE results
    * match bit-for-bit. */
  private[ext] def qualityCols(textCol: Column): Seq[(String, Column)] = {
    val toks = Portable.tokens(textCol)
    val stopArr = array(qualityStopwords.map(lit): _*)
    val nChars = length(textCol)
    val nTokens = size(toks)
    val nAlpha = length(regexp_replace(textCol, "[^a-zA-Z]", ""))
    val nStop = size(filter(toks, t => array_contains(stopArr, t)))
    val alphaRatio = nAlpha.cast("double") / nChars
    val stopRatio = nStop.cast("double") / nTokens
    Seq(
      "n_chars" -> nChars, "n_tokens" -> nTokens,
      "n_alpha" -> nAlpha, "n_stop" -> nStop,
      "alpha_ratio" -> alphaRatio, "stop_ratio" -> stopRatio,
      "quality_score" -> round(
        lit(0.5) * least(lit(1.0), nTokens / 64.0)
          + lit(0.25) * alphaRatio
          + lit(0.25) * least(lit(1.0), stopRatio * 4.0),
        6))
  }

  /** The quality_score expression alone ([[qualityCols]]). */
  private[ext] def qualityScoreCol(textCol: Column): Column =
    qualityCols(textCol).last._2

  /** Heuristic quality score: length saturation + alphabetic ratio +
    * stopword density. All terms are identical double formulas on both
    * engines; rounded at the end. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol) +: qualityCols(col(textCol)).map { case (n, c) => c.as(n) }: _*)

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

  /** Document frequency of word n-gram shingles: how many distinct docs
    * contain each n-gram. [[WordShingles.shingles]] is distinct-per-doc,
    * so a plain count IS the doc frequency — no countDistinct Expand.
    * One hash aggregation over the exploded shingles; map-side partials
    * collapse each task to its local gram set before the single shuffle
    * on the gram key. At 100 TB shuffle `Portable.h60(gram)` (8-byte
    * keys) instead of the strings when the report doesn't need gram
    * text. */
  def ngramDocFreq(
      docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    graft.core.Scans.spread(docs.filter(col(textCol).isNotNull))
      .select(col(idCol),
        explode(WordShingles.shingles(lower(col(textCol)), n)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("doc_freq"))

  /** Boilerplate-share signal — the analogue of the frequent-LINE
    * filters web-curation pipelines run (headers, footers, licence
    * blurbs repeat across pages): an n-gram appearing in ≥ `minDf`
    * distinct docs is boilerplate; each doc reports its distinct n-gram
    * count, how many are boilerplate, and the share (a doc that is
    * mostly boilerplate gets dropped or down-weighted).
    *
    * Scale shape: the corpus is scanned twice (recompute beats caching
    * 100 TB of shingles) and shuffled once for the doc-freq
    * aggregation plus the tiny per-doc agg. The probe join carries NO
    * broadcast hint on purpose: with a proportionally-chosen minDf the
    * frequent set is the power-law head and AQE broadcasts it from its
    * runtime size, but an absolute minDf on a huge corpus qualifies
    * most n-grams, and a forced broadcast would OOM the driver where
    * AQE degrades to a sane shuffle join. The share is one IEEE
    * division of two exact longs — no rounding — so both engines
    * produce the identical double. */
  def boilerplateShare(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minDf: Long = 10): DataFrame = {
    val freq = ngramDocFreq(docs, idCol, textCol, n)
      .filter(col("doc_freq") >= minDf)
      .select(col("ngram"), lit(1).as("hit"))
    graft.core.Scans.spread(docs.filter(col(textCol).isNotNull))
      .select(col(idCol),
        explode(WordShingles.shingles(lower(col(textCol)), n)).as("ngram"))
      .join(freq, Seq("ngram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"), count(col("hit")).as("n_boiler"))
      .withColumn("boiler_share", col("n_boiler") / col("n_ngrams"))
  }

  /** Adjacent-token-pair (bigram) merge statistics — the counting core
    * of BPE-style vocabulary induction: the highest-occurrence adjacent
    * pair is the next merge candidate, and corpus-wide pair counts are
    * what each merge round recomputes. Reports the top-`topK` pairs by
    * total occurrences (ties broken by pair text) with their document
    * frequency.
    *
    * Scale shape: pairs come from two array slices zipped per doc — a
    * narrow projection, no self-join — then ONE hash aggregation on the
    * pair key (count + countDistinct; the distinct Expand doubles
    * exploded rows before partial agg, the standard price of an exact
    * doc frequency). Top-K is `orderBy().limit()` — Spark plans
    * TakeOrderedAndProject, a per-partition bounded heap merged on the
    * driver, never a global sort — and only the `topK` survivors see
    * the rank window. */
  def bigramMergeStats(
      docs: DataFrame, idCol: String, textCol: String, topK: Int = 50): DataFrame = {
    val t = Portable.tokens(col(textCol))
    val pairs = zip_with(
      slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
      (a, b) => concat(a, lit(" "), b))
    val counts = graft.core.Scans.spread(docs.filter(col(textCol).isNotNull))
      .select(col(idCol), explode(pairs).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n_occurrences"), countDistinct(col(idCol)).as("n_docs"))
    counts.orderBy(col("n_occurrences").desc, col("pair").asc).limit(topK)
      .withColumn("merge_rank",
        row_number().over(Window.orderBy(col("n_occurrences").desc, col("pair").asc)))
      .select(col("merge_rank"), col("pair"), col("n_occurrences"), col("n_docs"))
  }

  /** Inverted-index postings: per term (distinct token per doc), the
    * document frequency and a BOUNDED ascending sample of its posting
    * list, emitted as a comma-joined string — the index-construction
    * step of a corpus search/retrieval layer.
    *
    * The posting sample rides the bounded-heap top-k aggregate
    * ([[graft.functions.TopKAggregate]]): only `maxPostings` ids per
    * term ever cross the shuffle, never the full list — a stopword's
    * posting list is corpus-sized, and `collect_list` there is the OOM.
    * Doc ids are negated into the heap's double score (exact below
    * 2^53, plenty for any id space), so rank order IS ascending id.
    * One shuffle total, map-side partial top-k included. */
  def postings(
      docs: DataFrame, idCol: String, textCol: String,
      maxPostings: Int = 20): DataFrame =
    graft.core.Scans.spread(docs.filter(col(textCol).isNotNull))
      .select(col(idCol).cast("long").as("doc_id"),
        explode(array_distinct(Portable.tokens(col(textCol)))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("doc_freq"),
        graft.functions.TopKAggregate.top_k(
          -col("doc_id").cast("double"), col("doc_id"), maxPostings).as("tk"))
      .select(col("term"), col("doc_freq"),
        concat_ws(",",
          transform(col("tk"), x => x.getField("id").cast("string")))
          .as("posting_sample"))

  /** Sliding-window document chunking: split each doc into token windows
    * of `chunkSize` advancing by `chunkSize - overlap` — the
    * context-window packing step every RAG / pretraining pipeline runs
    * before embedding or tokenizer batching. Chunk k covers tokens
    * `[k·stride, k·stride + chunkSize)`; the last window may be short but
    * always starts within the text, so no chunk is a pure suffix rerun.
    *
    * A narrow projection + explode — no shuffle at all; chunk counts per
    * doc are data-bounded so the explode cannot blow up a partition
    * beyond `n_tokens / stride` rows per doc. */
  def chunk(
      docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 64, overlap: Int = 16): DataFrame = {
    require(chunkSize > overlap && overlap >= 0,
      s"need chunkSize > overlap >= 0, got ($chunkSize, $overlap)")
    val stride = chunkSize - overlap
    docs
      .select(col(idCol).as("doc_id"), Portable.tokens(col(textCol)).as("t"))
      .withColumn("n", size(col("t")).cast("long"))
      // chunks = ceil(max(0, n - chunkSize) / stride) + 1 (n >= 1 always:
      // splitting "" yields [""])
      .withColumn("n_chunks",
        ((greatest(col("n") - chunkSize, lit(0L)) + (stride - 1)) / stride)
          .cast("long") + 1)
      .withColumn("chunk_id", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .select(
        col("doc_id"),
        col("chunk_id"),
        least(lit(chunkSize.toLong), col("n") - col("chunk_id") * stride)
          .as("n_tokens"),
        concat_ws(" ",
          slice(col("t"), (col("chunk_id") * stride + 1).cast("int"), lit(chunkSize)))
          .as("chunk_text"))
  }

  /** Deterministic sequence packing: assign documents to fixed
    * token-budget packs (the concat-then-chunk batching step before
    * pretraining tokenization). Documents are sharded by a portable hash
    * and packed WITHIN a shard in doc-id order via a running token
    * cumsum — pack `k` holds the docs whose preceding shard tokens fill
    * `[k·budget, (k+1)·budget)`; a doc straddling the boundary overflows
    * into the earlier pack (contiguous packing, the standard trade vs
    * bin-perfect packing which is inherently sequential).
    *
    * Scale: the window sorts PER SHARD, never globally — `shards` sizes
    * the parallelism, so the plan is one shuffle on the shard id no
    * matter the corpus size. */
  def packSequences(
      docs: DataFrame, idCol: String, textCol: String,
      budget: Int = 2048, shards: Int = 8): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
    docs
      .select(
        col(idCol).as("doc_id"),
        size(Portable.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("shard",
        pmod(Portable.h60(col("doc_id").cast("string")), lit(shards.toLong)))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .select(
        col("doc_id"), col("shard"), col("n_tokens"),
        ((col("__cum") - col("n_tokens")) / budget).cast("long").as("pack_id"))
  }

  /** Materialized training sequences: concatenate each pack's token
    * streams (doc-id order, `sep`-joined) into one text per pack — the
    * final artifact a tokenizer consumes. Builds on [[packSequences]];
    * the concat is one hash aggregate on (shard, pack) whose groups are
    * budget-bounded, so no group can exceed ~budget tokens + separators
    * regardless of corpus size. */
  def packedText(
      docs: DataFrame, idCol: String, textCol: String,
      budget: Int = 2048, shards: Int = 8,
      sep: String = " <|doc|> "): DataFrame = {
    val packs = packSequences(docs, idCol, textCol, budget, shards)
    val txt = docs.select(
      col(idCol).as("doc_id"),
      concat_ws(" ", Portable.tokens(col(textCol))).as("txt"))
    packs.join(txt, Seq("doc_id"))
      .groupBy(col("shard"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("txt")))),
            x => x.getField("txt")),
          sep).as("pack_text"))
  }

  /** Gopher-style repetition signals per document: duplicate-word and
    * duplicate-3-gram fractions plus the most-frequent-word share — the
    * standard repetition filters a pretraining curation pass applies
    * (high duplicate-n-gram fractions flag boilerplate / degenerate
    * generation loops). Fractions are exact integer ratios rounded to 6
    * so both engines agree bit-for-bit.
    *
    * Shape: the fractions are array-level projections (no shuffle); the
    * top-word share is one explode + two hash aggregates keyed on
    * (doc, word) then doc — map-side partials collapse repeats, so the
    * shuffle carries distinct words per doc, not tokens. */
  def repetitionSignals(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs
      .select(col(idCol).as("doc_id"), Portable.tokens(col(textCol)).as("t"))
      .withColumn("n_tokens", size(col("t")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("t"))).cast("long"))
      .withColumn("g_total",
        when(col("n_tokens") >= 3, col("n_tokens") - 2).otherwise(lit(1L)))
      .withColumn("g_distinct",
        when(col("n_tokens") >= 3,
          size(Portable.shingles(col("t"), 3)).cast("long")).otherwise(lit(1L)))
    val top = base
      .select(col("doc_id"), explode(col("t")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_c"))
    base.join(top, Seq("doc_id"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"), 6)
          .as("dup_word_frac"),
        round(lit(1.0) - col("g_distinct").cast("double") / col("g_total"), 6)
          .as("dup_3gram_frac"),
        round(col("top_c").cast("double") / col("n_tokens"), 6)
          .as("top_word_frac"))
  }

  /** Token-distribution entropy per document (nats) — low entropy flags
    * repetitive/boilerplate text, complementing [[repetitionSignals]]'
    * ratio-based checks with a distribution-shape signal.
    *
    * Cross-engine exactness: H = ln(n) − (Σ c·ln c)/n, with each c·ln c
    * term quantized to integral 1e-9 units BEFORE the sum — float sums
    * are order-dependent and hash-agg order differs between engines, so
    * only an integer accumulation is bit-stable; the final value rounds
    * to 6. Shape: one explode + two hash aggregates (the shuffle carries
    * distinct words per doc after map-side partials). */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), explode(Portable.tokens(col(textCol))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n"),
        sum(round(col("c") * log(col("c")) * 1e9).cast("long")).as("sn"))
      .select(
        col("doc_id"),
        col("n").as("n_tokens"),
        round(log(col("n")) - (col("sn") / 1e9) / col("n"), 6).as("token_entropy"))

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

  /** Good–Turing frequency smoothing over the corpus token counts —
    * the estimator BEHIND every held-out LM probability the text tier
    * reports: raw counts overestimate seen types and give unseen types
    * zero, while Turing's estimate r* = (r+1)·N_{r+1}∕N_r (N_r = how
    * many types occur exactly r times) discounts each frequency class
    * by how the class above thins out, and the leftover mass
    * P₀ = N₁∕N is exactly what a singleton suggests remains unseen.
    * Reported at frequency-class grain: r, N_r, r* (NULL where
    * N_{r+1} = 0 — the classic smoothed-fit zone), and the constant
    * unseen mass alongside.
    *
    * Exactness: counts and count-of-counts are exact longs; r* and P₀
    * are half-up micro ratios with decimal(38,0)/HUGEINT numerators
    * ((r+1)·N_{r+1}·10⁶·2 can pass 2⁶³ only past ~10¹² tokens — inside
    * the widened envelope either way).
    *
    * Scale shape: one token explode → vocabulary-grain hash aggregate;
    * the count-of-counts table is ≤ O(√N) rows (Σ r·N_r = N bounds the
    * number of distinct r), so the r↦r+1 self-join and the scalar
    * totals all run on a mart smaller than the vocabulary. */
  def goodTuring(docs: DataFrame, textCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val coc = docs
      .select(explode(Portable.tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("n_types"))
      // read by both sides of the r->r+1 join, the totals, the output
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.CacheLifecycle.unpersistAfterNextAction(coc)
    val tot = coc.agg(
      sum(col("c").cast(dec) * col("n_types").cast(dec)).as("n_tok"),
      sum(when(col("c") === 1L, col("n_types")).otherwise(0L)).as("n1"))
    val nxt = coc.select((col("c") - 1).as("rm"), col("n_types").as("nt1"))
    coc.join(nxt, col("c") === col("rm"), "left_outer")
      .crossJoin(broadcast(tot))
      .select(col("c").as("r"), col("n_types"),
        when(col("nt1").isNotNull,
          expr(s"""((cast(c + 1 as $dec) * nt1 * 1000000 * 2 + n_types)
                   div (n_types * 2))""").cast("double") / 1e6)
          .as("r_star"),
        (expr(s"""((cast(n1 as $dec) * 1000000 * 2 + n_tok)
                  div (n_tok * 2))""").cast("double") / 1e6).as("p_unseen"))
      .orderBy(col("r"))
  }

  /** Per-source lexical-richness vitals — the corpus-quality readout
    * next to [[goodTuring]]'s frequency estimates and the q167 Heaps
    * profile: type–token ratio, hapax share, Yule's K
    * (10⁴·(Σc²−N)∕N² — the repeat-rate statistic, size-stable where
    * raw TTR is not), Simpson's D over tokens ((Σc²−N)∕(N(N−1)) — the
    * chance two random tokens are the same type), and Herdan's C
    * (ln V ∕ ln N). A template-heavy or boilerplate-ridden source
    * shows high K∕D and low TTR long before a human reads it.
    *
    * Exactness: everything derives from ONE (source, term) count
    * aggregate: N, V, N₁, Σc² are exact longs∕decimal(38,0); K, D,
    * TTR, hapax are half-up micro∕nano ratios of exact integers; only
    * Herdan's C is a double chain (two lns, quantized 1e-6).
    *
    * Scale shape: token explode → vocabulary-grain hash aggregate →
    * source-grain rollup; no window, no join. */
  def lexicalRichness(
      docs: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    docs
      .select(col(srcCol).as("source"),
        explode(Portable.tokens(col(textCol))).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"),
        sum(col("c").cast(dec) * col("c")).as("scc"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        expr("((n_types * 1000000 * 2 + n_tokens) div (n_tokens * 2)) " +
          "/ cast(1000000 as double)").as("ttr"),
        expr("((n_hapax * 1000000 * 2 + n_types) div (n_types * 2)) " +
          "/ cast(1000000 as double)").as("hapax_share"),
        expr(s"""(((scc - n_tokens) * 10000 * 1000000 * 2
                  + cast(n_tokens as $dec) * n_tokens)
                 div (cast(n_tokens as $dec) * n_tokens * 2))""")
          .cast("double")./(1e6).as("yule_k"),
        // n_tokens = 1 makes the n(n-1) denominator zero: Spark's non-ANSI
        // div would yield NULL while DuckDB's // raises — guard the ratio
        // identically on both engines (NULL = "not defined for one token").
        expr(s"""case when n_tokens > 1 then
                 (((scc - n_tokens) * 1000000000 * 2
                  + cast(n_tokens as $dec) * (n_tokens - 1))
                 div (cast(n_tokens as $dec) * (n_tokens - 1) * 2)) end""")
          .cast("double")./(1e9).as("simpson_d"),
        (round(log(col("n_types").cast("double"))
          / log(col("n_tokens").cast("double")) * 1e6).cast("long") / 1e6)
          .as("herdan_c"))
      .orderBy(col("source"))
  }

  /** Term burstiness (Church & Gale's dispersion readout) for the
    * top-df vocabulary: the variance-to-mean ratio of a term's
    * per-document count over ALL documents — ≈ 1 for Poisson-scattered
    * function words, ≫ 1 for bursty content words that pile up inside
    * the few documents that are ABOUT them. The companion `burst` =
    * tf∕df is the mean occurrences per containing document. Together
    * they separate topical vocabulary from glue even where raw df∕tf
    * ranks cannot.
    *
    * Exactness: VMR expands to the exact rational
    * (N·Σc² − tf²)∕(N·tf) — non-negative by Cauchy–Schwarz — computed
    * as a half-up micro ratio in decimal(38,0)∕HUGEINT; burst and
    * per-doc rate likewise. No doubles anywhere.
    *
    * Scale shape: (doc, term) then term-grain hash aggregates; the
    * final orderBy+limit is a distributed TakeOrdered (the termStats
    * discipline), never a full vocabulary sort. */
  def termBurstiness(
      docs: DataFrame, idCol: String, textCol: String,
      topK: Int = 30): DataFrame = {
    val dec = "decimal(38,0)"
    val nd = docs.agg(count(lit(1)).as("n_docs"))
    docs.select(col(idCol), explode(Portable.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("c"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("c")).as("tf"),
        sum(col("c").cast(dec) * col("c")).as("s2"))
      .crossJoin(broadcast(nd))
      .select(col("term"), col("df"), col("tf"),
        expr("((tf * 1000000 * 2) + df) div (df * 2)").cast("double")
          ./(1e6).as("burst"),
        expr(s"""(((cast(n_docs as $dec) * s2 - cast(tf as $dec) * tf)
                   * 1000000 * 2) + (cast(n_docs as $dec) * tf))
                 div (cast(n_docs as $dec) * tf * 2)""").cast("double")
          ./(1e6).as("vmr"))
      .orderBy(col("df").desc, col("term")).limit(topK)
  }

  /** Per-document top terms by TF-IDF (tf × ln(N/df)), the relevance
    * weighting layer over [[termStats]]. Ties (identical scores — same
    * (tf, df) pair) break on the term, so the per-doc ranking is total.
    *
    * Shape: one token explode → (doc, term, tf) hash aggregate → term-df
    * aggregate joined back on term → per-doc top-k window. The corpus
    * size N rides in as a broadcast scalar, not a driver constant, so
    * the plan stays a single job. At 100 TB the df side is
    * vocabulary-sized (broadcastable) and the window becomes the
    * bounded-heap top-k aggregate. */
  def tfidfTopTerms(
      docs: DataFrame, idCol: String, textCol: String, topPerDoc: Int = 3): DataFrame = {
    val tok = docs.select(col(idCol), explode(Portable.tokens(col(textCol))).as("term"))
    val tf = tok.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tok.groupBy(col("term")).agg(countDistinct(col(idCol)).as("df"))
    val n = docs.select(countDistinct(col(idCol)).as("n_docs"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= topPerDoc)
      .select(col(idCol), col("term_rank"), col("term"), col("tf"), col("df"),
        col("tfidf"))
  }

  /** PII patterns shared with the DuckDB mirror — deliberately simple
    * (both Java regex and RE2 execute them identically: no backrefs, no
    * lookaround). */
  val EmailPat = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val UrlPat = "https?://[^ ]+"
  val LongNumPat = "[0-9]{6,}"

  /** PII scrub: per-doc counts of email / URL / long-number matches plus
    * the md5 of the redacted text (emails → <EMAIL>, URLs → <URL>,
    * 6+-digit runs → <NUM>, applied in that order). A pure projection —
    * the scrub adds zero shuffles to whatever pipeline it sits in. */
  def piiScrub(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), EmailPat, "<EMAIL>"),
          UrlPat, "<URL>"),
        LongNumPat, "<NUM>")
    docs.select(
      col(idCol),
      size(regexp_extract_all(col(textCol), lit(EmailPat), lit(0))).as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(UrlPat), lit(0))).as("n_urls"),
      size(regexp_extract_all(col(textCol), lit(LongNumPat), lit(0))).as("n_longnums"),
      md5(redacted).as("redacted_md5"))
  }

  /** Unigram-LM document scoring (the CCNet-style LM quality filter):
    * fit a unigram model on the corpus itself (token → corpus
    * probability) and score each document by its mean token log-prob —
    * low scores flag gibberish/boilerplate, high scores flag
    * stopword-heavy fluff; pretraining curation keeps the middle band.
    *
    * Cross-engine exactness: each distinct (doc, token)'s contribution
    * `tf · round(ln(c/total)·1e9)` is an integer BEFORE the per-doc sum
    * (float sums are order-dependent across engines, integer sums are
    * not); the mean rounds to 6.
    *
    * Shape: one token explode feeding two hash aggregates (per-doc tf
    * and the corpus model), one join on the token, one per-doc agg. The
    * model side is vocabulary-sized — far sublinear in the corpus — so
    * AQE broadcasts it for moderate vocabularies and falls back to a
    * token-keyed shuffle for web-scale ones; the corpus total rides in
    * as a broadcast scalar, keeping this a single job with no driver
    * constants. */
  def lmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(
      col(idCol).as("doc_id"), explode(Portable.tokens(col(textCol))).as("w"))
    val docTf = tok.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val model = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val total = model.agg(sum(col("c")).as("total"))
    docTf.join(model, Seq("w"))
      .crossJoin(broadcast(total))
      .withColumn("units",
        col("tf") * round(log(col("c").cast("double") / col("total")) * 1e9).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"), sum(col("units")).as("su"))
      .select(
        col("doc_id"), col("n_tokens"),
        round((col("su") / 1e9) / col("n_tokens"), 6).as("avg_logprob"))
  }

  /** Rank-based LM-quality pruning audit, per source: keep each source's
    * top `keepNum/keepDen` fraction of documents by [[lmScore]] and
    * report what the cut does — kept count and the cutoff log-prob (the
    * per-source quality bar a curation run would publish next to its
    * manifest). Per-source (not pooled) ranking is the point: a pooled
    * threshold silently empties the noisiest source.
    *
    * The keep predicate is pure integer arithmetic — `rank ≤ ⌈p·n⌉`
    * rewritten as `keepDen·(rank−1) < keepNum·n` — so no float
    * threshold can straddle engines, and ties at the cutoff break on
    * (score DESC, doc_id): deterministic membership, not approximate.
    *
    * Shape: [[lmScore]]'s aggregates plus one source-partitioned
    * ranking window — a per-source sort, the quantile-by-rank cost. At
    * 100 TB swap the exact window for the approx-quantile threshold
    * tier (the q52 pattern): compute each source's cutoff from a
    * sketch, then keep is a scan-time filter. */
  def lmPruneBySource(
      docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
      keepNum: Int, keepDen: Int): DataFrame = {
    require(keepNum >= 0 && keepDen > 0 && keepNum <= keepDen,
      s"keep fraction $keepNum/$keepDen outside [0, 1]")
    val scored = lmScore(docs, idCol, textCol)
    val src = docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source"))
    val byScore = Window.partitionBy(col("source"))
      .orderBy(col("avg_logprob").desc, col("doc_id"))
    scored.join(src, Seq("doc_id"))
      .withColumn("rnk", row_number().over(byScore))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
      .withColumn("keep",
        lit(keepDen) * (col("rnk") - 1) < lit(keepNum) * col("n"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        min(when(col("keep"), col("avg_logprob"))).as("cutoff_logprob"))
  }

  /** Per-source vocabulary profile: token volume, type (distinct-term)
    * count, hapax legomena (terms occurring exactly once in the
    * source), and the derived type-token and hapax-type ratios — the
    * Heaps'-law vitals a corpus audit reads to spot boilerplate-heavy
    * (low TTR) or OCR-noisy (hapax-inflated) sources before training.
    *
    * Shape: one token explode → (source, term) hash aggregate (map-side
    * combinable; vocabulary-sized, not token-sized, past the exchange)
    * → one source-grain rollup. The ratios are single divisions of
    * exact longs, 6dp-rounded. */
  def vocabGrowth(
      docs: DataFrame, sourceCol: String, textCol: String): DataFrame =
    docs
      .select(col(sourceCol).as("source"),
        explode(Portable.tokens(col(textCol))).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("source"))
      .agg(
        sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("tf") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        round(col("n_types").cast("double") / col("n_tokens"), 6).as("ttr"),
        round(col("n_hapax").cast("double") / col("n_types"), 6).as("hapax_ratio"))

  /** Coleman–Liau readability per source: mean grade-level index
    * CLI = 0.0588·L − 0.296·S − 15.8 (L = non-space chars per 100
    * words, S = sentence marks per 100 words) plus the share of
    * college-level (CLI ≥ 12) documents — the only classic
    * readability formula that needs NO syllable counting, which is
    * exactly what makes it computable as three exact counts per doc
    * (chars via a whitespace-stripped length, words via the engine's
    * shared tokenizer split, sentences via a `[.!?]+` run count).
    * The audience-difficulty audit a curriculum/mixing plan reads
    * next to [[qualityScore]].
    *
    * Exactness: the three counts are exact integers; each doc's CLI is
    * one fixed double chain over them (identical on both engines),
    * quantized to 1e-6 units BEFORE the per-source mean so the sums
    * are order-free; the formula constants are shared decimal
    * literals. Zero-word docs are excluded (L and S undefined).
    * Shape: a projection and one hash aggregate. */
  def readability(
      docs: DataFrame, textCol: String, srcCol: String): DataFrame = {
    val w = size(Portable.tokens(col(textCol))).cast("long")
    val c = length(regexp_replace(col(textCol), "\\s", "")).cast("long")
    // Column-based (not a spliced SQL string): a textCol needing
    // backticks would misparse, and a dotted name would silently
    // resolve as a struct field
    val s = regexp_count(col(textCol), lit("[.!?]+")).cast("long")
    val cli = lit(0.0588) * (lit(100.0) * c / w) -
      lit(0.296) * (lit(100.0) * s / w) - lit(15.8)
    docs
      .filter(w > 0)
      .select(col(srcCol).as("source"),
        round(cli * 1e6).cast("long").as("cq"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("cq")).as("scq"),
        sum(when(col("cq") >= 12000000L, 1L).otherwise(0L)).as("n_college"))
      .select(col("source"), col("n_docs"),
        // sign-aware half-up: `div` truncates toward zero, so the
        // (2a+b) div 2b trick is HALF_UP only for a >= 0 — a negative
        // CLI sum (short-word corpora go below zero) must round half
        // AWAY from zero via its magnitude or the mean biases up to
        // 1.5e-6 toward zero
        expr("(CASE WHEN scq >= 0 THEN ((scq * 2) + n_docs) div (n_docs * 2) " +
          "ELSE -((((-scq) * 2) + n_docs) div (n_docs * 2)) END) " +
          "/ cast(1000000 as double)").as("mean_cli"),
        expr("(((n_college * 1000000 * 2) + n_docs) div (n_docs * 2)) " +
          "/ cast(1000000 as double)").as("college_share"))
      .orderBy(col("source"))
  }

  /** Out-of-vocabulary rate of the held-out split against the train
    * split's top-V vocabulary, per language — the tokenizer/vocab
    * generalization audit ("how much of unseen data does a vocab built
    * on train even cover, and which languages pay"). Splits come from
    * the engine's deterministic [[Sampling.hashBucket]] contract (the
    * [[Sampling.hashSplit]] 80/10/10 bands — train builds the vocab,
    * TEST measures), so the audit is reproducible on any layout and
    * engine.
    *
    * Scale shape: the vocab top-V is an `orderBy().limit(V)` →
    * TakeOrderedAndProject (per-partition partial top-V, never a
    * single-partition window over the full vocabulary); the V-row
    * vocab broadcasts to one conditional-count aggregate over the test
    * tokens. Ties at the V boundary break on the term, so both
    * engines cut the identical vocabulary. */
  def oovRate(
      docs: DataFrame, idCol: String, textCol: String, langCol: String,
      vocabSize: Int = 1000, trainPct: Int = 80, valPct: Int = 10,
      salt: String = "split"): DataFrame = {
    val toks = docs.select(
      Sampling.hashBucket(col(idCol), salt).as("bucket"),
      col(langCol).as("lang"),
      explode(Portable.tokens(col(textCol))).as("w"))
    val vocab = toks.filter(col("bucket") < trainPct)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(vocabSize)
      .select(col("w"), lit(1L).as("in_vocab"))
    toks.filter(col("bucket") >= trainPct + valPct)
      .join(broadcast(vocab), Seq("w"), "left_outer")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("lang"), col("n_tokens"), col("n_oov"),
        expr("(((n_oov * 1000000 * 2) + n_tokens) div (n_tokens * 2)) " +
          "/ cast(1000000 as double)").as("oov_share"))
      .orderBy(col("lang"))
  }

  /** Multinomial naive Bayes trained in-engine (add-one smoothing over
    * the shared vocabulary) and evaluated on the corpus, reported as a
    * (true label, predicted label) confusion matrix — the fit/score
    * primitive behind supervised quality/language classifiers, run as
    * pure aggregates instead of an ML-library export.
    *
    *   score(d, c) = log P(c) + Σ_w tf(d, w) · log P̂(w|c)
    *   P̂(w|c) = (count(w, c) + 1) / (tokens_c + V)
    *
    * Exactness: each log quantizes to integral 1e-9 units (one IEEE
    * log of a ratio of exact longs — the [[lmScore]] discipline), the
    * per-doc sum is order-free long arithmetic, and argmax breaks ties
    * on the class label asc. Smoothing is over the FULL vocab × class
    * grid, so every class scores every document.
    *
    * Shape: the model is vocabulary × classes — broadcast-sized by
    * construction (vocab past the aggregate, not corpus tokens); the
    * scoring join fans doc-terms × classes (a small constant), one hash
    * aggregate per (doc, class), top-1 heap per doc, and the confusion
    * matrix is a classes² rollup. */
  def naiveBayesConfusion(
      docs: DataFrame, idCol: String, textCol: String,
      labelCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      col(labelCol).as("label"), col(textCol).as("text"))
    val tok = base.select(col("doc_id"), col("label"),
      explode(Portable.tokens(col("text"))).as("w"))
    val docTf = tok.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val classCount = tok.groupBy(col("label"), col("w")).agg(count(lit(1)).as("cwc"))
    val classTokens = tok.groupBy(col("label")).agg(count(lit(1)).as("ctok"))
    val vocab = tok.select(col("w")).distinct()
    val vsize = vocab.agg(count(lit(1)).as("v"))
    val priors = base.groupBy(col("label")).agg(count(lit(1)).as("cdocs"))
      .crossJoin(broadcast(base.agg(count(lit(1)).as("ndocs"))))
      .select(col("label"),
        round(log(col("cdocs").cast("double") / col("ndocs")) * 1e9)
          .cast("long").as("prior_units"))
    // smoothed log-likelihood over the full vocab × class grid
    val model = vocab.crossJoin(classTokens)
      .join(classCount, Seq("label", "w"), "left")
      .crossJoin(broadcast(vsize))
      .select(col("w"), col("label"),
        round(log(
          (coalesce(col("cwc"), lit(0L)) + lit(1L)).cast("double")
            / (col("ctok") + col("v"))) * 1e9)
          .cast("long").as("ll_units"))
    val scores = docTf.join(broadcast(model), Seq("w"))
      .groupBy(col("doc_id"), col("label"))
      .agg(sum(col("tf") * col("ll_units")).as("tu"))
      .join(broadcast(priors), Seq("label"))
      .select(col("doc_id"), col("label"),
        (col("tu") + col("prior_units")).cast("double").as("score"))
    // argmax via an order-free min over (−score, label) structs: score
    // DESC with label-ASC tie-break, no window, no Long-id constraint
    val predicted = scores
      .groupBy(col("doc_id"))
      .agg(min(struct((-col("score")).as("ns"), col("label")))
        .getField("label").as("predicted"))
    base.select(col("doc_id"), col("label").as("true_label"))
      .join(predicted, Seq("doc_id"))
      .groupBy(col("true_label"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Bigram-LM document scoring: average log-probability of each doc's
    * token bigrams under an add-one-smoothed first-order language model
    * trained on the corpus itself — [[lmScore]]'s unigram model with
    * one token of context, so word-salad documents (plausible tokens,
    * implausible sequences) finally separate from fluent ones.
    * P(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁·)+V), with c(w₁·) the CONTEXT count
    * (bigrams starting with w₁) so probabilities normalize exactly.
    *
    * Exactness (the q76 discipline): each distinct (w₁,w₂)'s smoothed
    * log-prob quantizes ONCE to integer 1e-9-nat units; per-doc totals
    * are order-free `tf·units` long sums; the mean is one fixed IEEE
    * chain. Docs with fewer than two tokens have no bigrams and drop
    * out.
    *
    * Shape: one bigram explode (persisted — it feeds the per-doc tf,
    * the bigram model, and the context counts, and Catalyst does not
    * share subplans) feeding three hash aggregates; the model and
    * context tables are bigram-/vocab-sized past the aggregate, so AQE
    * broadcasts moderate vocabularies and falls back to keyed shuffles
    * at web scale; |V| rides in as a broadcast scalar. */
  def bigramLmScore(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = Portable.tokens(col(textCol))
    val pairs = zip_with(
      slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val bg = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), explode(pairs).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.CacheLifecycle.unpersistAfterNextAction(bg)
    val docTf = bg.groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
    val model = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val ctx = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vsize = docs.filter(col(textCol).isNotNull)
      .select(explode(t).as("w")).agg(countDistinct(col("w")).as("v"))
    docTf
      .join(model, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .crossJoin(broadcast(vsize))
      .withColumn("units",
        col("tf") * round(log(
          (col("c12") + lit(1L)).cast("double") / (col("c1") + col("v")))
          * 1e9).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"), sum(col("units")).as("su"))
      .select(
        col("doc_id"), col("n_bigrams"),
        round((col("su") / 1e9) / col("n_bigrams"), 6).as("avg_logprob"))
  }

  /** PMI collocations: the top-k adjacent token pairs by pointwise
    * mutual information, PMI = ln(P(w₁w₂)/(P(w₁)P(w₂))) — the classic
    * collocation detector ("New York" scores high, "of the" does not),
    * complementing [[bigramMergeStats]]'s raw-frequency merge ranking.
    * `minCount` prunes the unstable low-count tail PMI is notorious
    * for.
    *
    * Exactness: all counts are exact longs; PMI is one shared
    * three-term ln chain on identical doubles, ranked RAW (identical
    * cross-engine) with (w₁, w₂) tie-breaks and 6dp-rounded for
    * display.
    *
    * Shape: one bigram explode → corpus pair counts (bigram-vocab
    * sized past the exchange), unigram counts joined in (AQE
    * broadcasts moderate vocabularies), scalar totals broadcast; the
    * ranking window runs over the minCount-pruned pair table —
    * collocation-candidate sized, and the prune is what bounds it. */
  def collocations(
      docs: DataFrame, idCol: String, textCol: String,
      topK: Int = 50, minCount: Long = 5): DataFrame = {
    val t = Portable.tokens(col(textCol))
    val pairsCol = zip_with(
      slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val bg = docs.filter(col(textCol).isNotNull)
      .select(explode(pairsCol).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val model = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.CacheLifecycle.unpersistAfterNextAction(model)
    val bTot = model.agg(sum(col("c12")).as("b"))
    val uni = docs.filter(col(textCol).isNotNull)
      .select(explode(t).as("w")).groupBy(col("w")).agg(count(lit(1)).as("c"))
    val nTot = uni.agg(sum(col("c")).as("n"))
    val byPmi = Window.orderBy(col("pmi_raw").desc, col("w1"), col("w2"))
    model.filter(col("c12") >= minCount)
      .join(uni.toDF("w1", "c1"), Seq("w1"))
      .join(uni.toDF("w2", "c2"), Seq("w2"))
      .crossJoin(broadcast(bTot))
      .crossJoin(broadcast(nTot))
      .withColumn("pmi_raw",
        log(col("c12").cast("double") / col("b"))
          - log(col("c1").cast("double") / col("n"))
          - log(col("c2").cast("double") / col("n")))
      .withColumn("rank", row_number().over(byPmi))
      .filter(col("rank") <= topK)
      .select(col("rank"), col("w1"), col("w2"), col("c12"),
        round(col("pmi_raw"), 6).as("pmi"))
  }

  /** Zipf's-law fit per source: the OLS slope of ln(freq) on ln(rank)
    * over each source's top-`topN` terms — natural text sits near −1;
    * a flat slope flags templated/boilerplate sources, a steep one
    * flags degenerate repetition. The distributional sibling of
    * [[vocabGrowth]]'s Heaps'-law vitals.
    *
    * Exactness: ranks are deterministic (freq DESC, term ASC); both
    * logs are computed once on identical values and quantized to
    * integer 1e-6 units, so the five OLS moment sums are order-free
    * longs and slope/R² are the q154 fixed IEEE chain (unit scale
    * cancels in the slope).
    *
    * Shape: one token explode → (source, term) hash aggregate
    * (vocab-sized past the exchange) → a source-partitioned top-N rank
    * window at vocab grain → a source-grain moment aggregate. */
  def zipfFit(
      docs: DataFrame, sourceCol: String, textCol: String,
      topN: Int = 200): DataFrame = {
    val tf = docs
      .select(col(sourceCol).as("source"),
        explode(Portable.tokens(col(textCol))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("freq"))
    val byFreq = Window.partitionBy(col("source"))
      .orderBy(col("freq").desc, col("w"))
    val pts = tf
      .withColumn("rank", row_number().over(byFreq))
      .filter(col("rank") <= topN)
      .select(col("source"),
        round(log(col("rank").cast("double")) * 1e6).cast("long").as("x"),
        round(log(col("freq").cast("double")) * 1e6).cast("long").as("y"))
    val m = pts.groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val nD = col("n").cast("double")
    val num = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val denX = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val denY = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    m.select(
      col("source"), col("n").as("n_terms"),
      when(denX === 0.0, lit(null).cast("double"))
        .otherwise(num / denX).as("zipf_slope"),
      when(denX === 0.0 || denY === 0.0, lit(null).cast("double"))
        .otherwise((num * num) / (denX * denY)).as("r2"))
  }

  /** Chi-square token keyness: the top-k tokens most associated with
    * each label (corpus-linguistics keyness / the χ² feature-selection
    * score behind classic text classifiers). For token w and label l,
    * the 2×2 occurrence table is a = c(w,l), b = c(w)−a, c = N_l−a,
    * d = N−N_l−b and χ² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)); `enriched`
    * (w over-represented in l vs the rest) is the exact integer
    * comparison a·N > c(w)·N_l — no float boundary decides membership.
    *
    * Exactness: all counts are exact longs; ad−bc stays inside int64
    * (token counts ≤ ~1e9 would need the double path, corpus counts
    * here are ≤ 1e6 so ad ≤ 1e12); the χ² value itself is ONE shared
    * IEEE chain over double-cast longs, ranked raw (identical on both
    * engines) and 6dp-rounded only for display.
    *
    * Shape: one token explode feeding three hash aggregates ((label,
    * token), token totals, label totals — the first two vocab-sized
    * past the exchange, AQE broadcasts what fits), the grand total as a
    * broadcast scalar, and a per-label top-k window over the
    * vocab-sized association table. */
  def tokenKeyness(
      docs: DataFrame, textCol: String, labelCol: String,
      k: Int = 10): DataFrame = {
    val tok = docs.select(col(labelCol).as("label"),
      explode(Portable.tokens(col(textCol))).as("w"))
    val lw = tok.groupBy(col("label"), col("w")).agg(count(lit(1)).as("a"))
    val wTot = tok.groupBy(col("w")).agg(count(lit(1)).as("n_w"))
    val lTot = tok.groupBy(col("label")).agg(count(lit(1)).as("n_l"))
    val grand = tok.agg(count(lit(1)).as("n"))
    val byChi = Window.partitionBy(col("label"))
      .orderBy(col("chi2_raw").desc, col("w"))
    lw
      .join(wTot, Seq("w"))
      .join(broadcast(lTot), Seq("label"))
      .crossJoin(broadcast(grand))
      .withColumn("b", col("n_w") - col("a"))
      .withColumn("c", col("n_l") - col("a"))
      .withColumn("d", col("n") - col("n_l") - col("b"))
      .withColumn("det",
        (col("a") * col("d") - col("b") * col("c")).cast("double"))
      .withColumn("chi2_raw",
        col("n").cast("double") * col("det") * col("det")
          / (col("n_w").cast("double") * (col("c") + col("d"))
             * col("n_l") * (col("b") + col("d"))))
      .withColumn("rank", row_number().over(byChi))
      .filter(col("rank") <= k)
      .select(col("label"), col("rank"), col("w").as("token"),
        col("a").as("n_token_label"), col("n_w"), col("n_l"),
        round(col("chi2_raw"), 6).as("chi2"),
        (col("a") * col("n") > col("n_w") * col("n_l")).as("enriched"))
  }

  /** Language mix per source: distinct languages, the dominant
    * language's share, and the language entropy (nats) — the
    * code-switching / routing audit a multilingual curation plan reads
    * before per-language budgets. Counts are exact longs; entropy uses
    * the [[tokenEntropy]] 1e-9-unit Σc·ln c discipline; the top share
    * is an integer half-up micro ratio. Two stacked hash aggregates. */
  def sourceLangMix(
      docs: DataFrame, srcCol: String, langCol: String): DataFrame =
    docs.groupBy(col(srcCol).as("source"), col(langCol).as("lang"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_langs"), sum(col("c")).as("n_docs"),
        max(col("c")).as("top_c"),
        sum(round(col("c") * log(col("c")) * 1e9).cast("long")).as("sn"))
      .select(col("source"), col("n_docs"), col("n_langs"),
        expr("((top_c * 1000000 * 2 + n_docs) div (n_docs * 2)) " +
          "/ cast(1000000 as double)").as("top_lang_share"),
        round(log(col("n_docs")) - (col("sn") / 1e9) / col("n_docs"), 6)
          .as("lang_entropy"))

  /** Length bias of the [[lmScore]] quality scorer: documents bucketed
    * by token-count magnitude (binary-string length — an exact integer
    * ⌊log₂⌋+1 on both engines; a float log2 diverges at exact powers),
    * with the mean score per bucket — "does the scorer systematically
    * punish long documents". Means are truncating micro-unit ratios of
    * exact longs. */
  def lmLengthBias(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    lmScore(docs, idCol, textCol)
      .select(col("doc_id"), col("n_tokens"),
        length(conv(col("n_tokens"), 10, 2)).as("bucket"),
        round(col("avg_logprob") * 1e6).cast("long").as("lp"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("st"),
        sum(col("lp")).as("slp"))
      .select(col("bucket"), col("n_docs"),
        expr("((st * 1000000 * 2 + n_docs) div (n_docs * 2)) " +
          "/ cast(1000000 as double)").as("avg_tokens"),
        // slp (a log-prob sum) is negative on essentially every input:
        // sign-aware half-up (see readability's mean_cli note)
        expr("(CASE WHEN slp >= 0 THEN (slp * 2 + n_docs) div (n_docs * 2) " +
          "ELSE -(((-slp) * 2 + n_docs) div (n_docs * 2)) END) " +
          "/ cast(1000000 as double)").as("mean_logprob"))

  /** Corpus novelty saturation: documents in id-order batches of
    * `bucketSize`; per batch, how many of its distinct word 3-grams
    * appear for the FIRST time — the diminishing-returns curve that
    * tells a crawl when additional data stops adding vocabulary
    * (the streaming view of [[graft.ext.Dedup.dupNgramShare]]).
    *
    * Scale shape: (batch, gram) pairs dedupe FIRST (hash aggregate),
    * the first-seen table is one min-aggregate at gram grain, and the
    * audit is a gram-keyed equi join — no window over the corpus. */
  def ngramNovelty(
      docs: DataFrame, idCol: String, textCol: String,
      bucketSize: Int = 50): DataFrame = {
    val pairs = docs.select(
        // backtick-quoted: a raw splice would misparse id columns
        // needing quoting (and `div` keeps the bucket exact in LONG —
        // double division would lose exactness past 2^53)
        expr(s"`$idCol` div $bucketSize").as("bucket"),
        explode(graft.functions.WordShingles.shingles(
          lower(col(textCol)), 3)).as("g"))
      .distinct()
    val first = pairs.groupBy(col("g")).agg(min(col("bucket")).as("fb"))
    pairs.join(first, Seq("g"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_grams"),
        sum((col("bucket") === col("fb")).cast("long")).as("n_new"))
      .select(col("bucket"), col("n_grams"), col("n_new"),
        expr("((n_new * 1000000 * 2 + n_grams) div (n_grams * 2)) " +
          "/ cast(1000000 as double)").as("novelty_share"))
  }
}
