package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.functions.TopKAggregate.top_k

/** Sparse lexical retrieval — BM25 (Robertson/Spärck Jones) top-k
  * search of a document corpus for a set of query documents. The
  * term-overlap complement of the dense tier ([[Similarity]]): curation
  * pipelines run both to mine retrieval training pairs, pick few-shot
  * exemplars, and audit near-duplicate leakage that embeddings smooth
  * over.
  *
  *   score(q, d) = Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))
  *   idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)      (the Lucene form)
  *
  * Shape — an inverted-index probe, never a doc×doc join: postings are
  * (term, doc, tf) rows; the query-term list (queries · unique terms —
  * tiny) broadcasts onto them, so only documents SHARING a term with a
  * query are ever scored, and the per-(query, doc) accumulation is one
  * hash aggregate. `maxDfFraction` prunes terms above a document-
  * frequency share from the probe on BOTH engines (the
  * [[TextAnalysis]] postings discipline): a ubiquitous term's postings
  * row count is the corpus itself while its idf is ~0.5/N — all the
  * join fan-out of a stopword for none of the signal. The cap is part
  * of the scoring spec (the oracle mirrors it exactly), not an
  * approximation knob. Two gated queries cover both branches: the
  * uncapped spec (1.0 — the synthetic ~31-term vocabulary is nearly
  * all ubiquitous, so the Zipfian-default 0.5 would empty it) and the
  * capped path at 0.78, which genuinely splits that vocabulary (one
  * rare term at df-share 0.05 plus a 0.746–0.83 stopword band) — the
  * branch a real corpus runs is oracle-evidenced, not parameter-tested.
  *
  * Cross-engine exactness: the per-term score is one fixed double
  * formula (identical literal parenthesization in the DuckDB mirror),
  * quantized to integral 1e-9 units BEFORE the per-pair sum (float
  * addition order differs between engines; long addition is
  * order-free), ranked on the rounded total with doc-id tie-break.
  * The emitted score rounds to 6dp IN THE INTEGER DOMAIN —
  * (sn + 500) div 1000 half-up on the 1e-9-unit long, then one double
  * division — never `round(double, 6)`: a double `round` re-derives the
  * decimal expansion, and Spark/DuckDB disagree on half-1e-6 ties
  * (scores are ≥ 0, so truncating div and floor div agree too). */
object Retrieval {

  /** The scored inverted index: one row per (doc, term) posting carrying
    * the quantized per-term BM25 contribution `tn` (integral 1e-9 units)
    * plus `df`/`n_docs` so a document-frequency cap can prune AFTER the
    * index is built. This is the subtree every lexical query shares —
    * the materialized-index shape a real retrieval system persists once
    * and probes many times. The df-cap filter commutes with `tn` (it
    * only drops rows), so one index serves every `maxDfFraction`.
    * Callers running several probes over the same corpus should
    * `persist` the result (see [[graft.bindings.Corpus]]). */
  def scoredPostings(
      docs: DataFrame, idCol: String, textCol: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tok = docs.select(
      col(idCol).as("doc_id"), explode(Portable.tokens(col(textCol))).as("term"))
    val tf = tok.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("len"))
    val dfv = tok.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    // corpus scalars ride in as a broadcast row, never driver constants
    val scal = dl.agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_len"))
    val idf = log(
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val norm = col("tf") + lit(k1) *
      (lit(1.0 - b) + lit(b) *
        ((col("len").cast("double") * col("n_docs")) / col("sum_len")))
    tf
      .join(dfv, Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(scal))
      .withColumn("tn",
        round(idf * ((col("tf") * lit(k1 + 1)) / norm) * lit(1e9)).cast("long"))
  }

  /** Probe a [[scoredPostings]] index: broadcast the query-term list onto
    * the (optionally df-capped) postings, accumulate per (query, doc),
    * bounded top-k per query. */
  def bm25FromPostings(
      scored: DataFrame, queryModEvery: Int, k: Int,
      maxDfFraction: Double = 0.5): DataFrame = {
    val qt = scored.filter(pmod(col("doc_id"), lit(queryModEvery.toLong)) === 0)
      .select(col("doc_id").as("query_id"), col("term"))
    val hits = scored
      .filter(col("df") <= col("n_docs") * lit(maxDfFraction))
      .join(broadcast(qt), Seq("term"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("tn")).as("sn"))
      .select(col("query_id"), col("doc_id"),
        (expr("(sn + 500) div 1000").cast("double") / lit(1e6)).as("bm25"))
    hits.groupBy(col("query_id"))
      .agg(top_k(col("bm25"), col("doc_id"), k).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("t"))
      .select(col("query_id"), col("t.id").as("doc_id"),
        col("t.score").as("bm25"), col("t.rank").as("rank"))
  }

  def bm25Search(
      docs: DataFrame, idCol: String, textCol: String,
      queryModEvery: Int, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      maxDfFraction: Double = 0.5): DataFrame =
    bm25FromPostings(
      scoredPostings(docs, idCol, textCol, k1, b), queryModEvery, k, maxDfFraction)

  /** Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of retrieval
    * rank lists: score(q, d) = Σ_lists 1/(c + rank_list(q, d)), summed
    * over the lists where (q, d) appears — the standard way to merge a
    * lexical ([[bm25Search]]) and a dense
    * ([[graft.ext.Similarity.topKNeighbors]]) ranking without score
    * calibration, since only RANKS enter the formula. Hybrid retrieval
    * is the default for training-pair mining: BM25 finds term-overlap
    * pairs embeddings smooth over, dense finds paraphrases sharing no
    * terms; fusion keeps both.
    *
    * Input contract: each frame carries (query_id, doc_id, rank). A
    * document missing from a list simply contributes no term (the RRF
    * convention) — the doc universes need not coincide.
    *
    * Shape: union of the (already top-k-bounded, so queries·k-sized)
    * rank lists, one hash aggregate per (query, doc), bounded top-k
    * heap per query — nothing here scales with the corpus, only with
    * the fused lists. Exactness: 1/(c+rank) quantizes to integral 1e-9
    * units per term (a pure function of the integer rank — identical on
    * both engines), sums as order-free longs, and the emitted score is
    * a single division of identical longs. Ties break on doc_id. */
  def rrfFuse(rankings: Seq[DataFrame], c: Int = 60, k: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(c >= 0, "c must be nonnegative")
    val u = rankings
      .map(_.select(col("query_id"), col("doc_id"),
        col("rank").cast("long").as("rank")))
      .reduce(_ unionByName _)
    val fused = u
      .withColumn("u",
        round(lit(1e9) / (lit(c.toLong) + col("rank"))).cast("long"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("u")).as("su"))
      .select(col("query_id"), col("doc_id"),
        (col("su").cast("double") / lit(1e9)).as("rrf"))
    fused.groupBy(col("query_id"))
      .agg(top_k(col("rrf"), col("doc_id"), k).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("t"))
      .select(col("query_id"), col("t.id").as("doc_id"),
        col("t.score").as("rrf"), col("t.rank").as("rank"))
  }
}
