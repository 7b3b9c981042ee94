package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed corpus-curation pipeline — the end-to-end workload the
  * individual extension operators exist for, as one operator:
  *
  *   quality gate → language gate → near-dup removal (keep each
  *   cluster's canonical doc) → deterministic train/val/test split
  *
  * Mirrors the shape of a production training-data pipeline: every stage
  * is one of the oracle-gated building blocks ([[TextAnalysis]],
  * [[Clusters]], [[Sampling]]), so the composition is itself exactly
  * mirrorable in SQL and hash-gated end-to-end.
  *
  * Scale: quality + split are shuffle-free projections; language ID is
  * a broadcast-lexicon join + per-doc argmax; dedup is the LSH
  * candidate→verify→cluster path whose shuffles are band-key- and
  * cluster-sized, never corpus²; the near-dup drop is a LEFT ANTI join
  * against the (tiny) non-canonical member list.
  */
object Curation {

  def curate(
      docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.3, lang: String = "en",
      minJaccard: Double = 0.5): DataFrame = {
    // quality + language are pure projections over the corpus scan
    // (r16, guide §4): compute them INLINE instead of the r15 shape's
    // two extra corpus scans joined back on the id — the expression
    // trees are TextAnalysis's own ([[TextAnalysis.qualityScoreCol]] /
    // [[TextAnalysis.langIdCols]]), so the kept set is bit-identical
    val (detected, _) = TextAnalysis.langIdCols(col(textCol))
    val dupLosers = Clusters.nearDupClusters(docs, idCol, textCol, minJaccard)
      .filter(!col("is_canonical"))
      .select(col(idCol))
    val curated = docs.select(col(idCol),
        TextAnalysis.qualityScoreCol(col(textCol)).as("quality_score"),
        detected.as("detected_lang"))
      .filter(col("quality_score") >= minQuality && col("detected_lang") === lang)
      .join(dupLosers, Seq(idCol), "left_anti")
    Sampling.hashSplit(curated, idCol)
      .select(col(idCol), col("detected_lang"), col("quality_score"),
        col("bucket"), col("split"))
  }

  /** Drop-reason manifest: per (source, disposition) accounting of
    * WHERE the corpus shrinks under [[curate]]'s rules — each doc gets
    * its FIRST failing rule in the fixed order low_quality → wrong_lang
    * → near_dup (or `kept`), so Σ n_docs per source reconciles exactly
    * to the source size and the reasons never double-count. The "why
    * did my data shrink" report a curation run publishes next to its
    * keep list.
    *
    * Shape: the same three signal frames as [[curate]] (quality and
    * lang are per-doc projections; the dup-loser set is the bucketed
    * LSH+CC pass), one left join each, a CASE, and a mart-grain rollup
    * with a source-partitioned share window. */
  def dropReasonManifest(
      docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
      minQuality: Double = 0.3, lang: String = "en",
      minJaccard: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // inline quality/lang projections — the [[curate]] r16 rationale
    // (one corpus scan; two id-keyed joins and two extra scans removed)
    val (detected, _) = TextAnalysis.langIdCols(col(textCol))
    val losers = Clusters.nearDupClusters(docs, idCol, textCol, minJaccard)
      .filter(!col("is_canonical"))
      .select(col(idCol)).withColumn("is_loser", lit(true))
    val bySource = Window.partitionBy(col("source"))
    docs.select(col(idCol), col(sourceCol).as("source"),
        TextAnalysis.qualityScoreCol(col(textCol)).as("quality_score"),
        detected.as("detected_lang"))
      .join(losers, Seq(idCol), "left_outer")
      .withColumn("disposition",
        // null-safe: a NULL quality score (null/empty text zeroes the
        // ratio denominators) FAILS curate's `quality >= min` gate, so
        // the manifest must file it under low_quality too — otherwise
        // it would fall through to wrong_lang/kept and break the
        // manifest-vs-keep-list reconciliation this operator promises
        when(col("quality_score").isNull
          || col("quality_score") < minQuality, "low_quality")
          .when(col("detected_lang") =!= lang, "wrong_lang")
          .when(col("is_loser"), "near_dup")
          .otherwise("kept"))
      .groupBy(col("source"), col("disposition"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("source_share",
        round(col("n_docs").cast("double")
          / sum(col("n_docs")).over(bySource), 6))
  }

  /** The full corpus→training-batches composition: [[curate]] →
    * sliding-window chunking ([[TextAnalysis.chunk]]) → per-(split,
    * shard) sequence packing — curated text turned into fixed
    * token-budget packs, train/val/test packed separately (packs never
    * mix splits). Every stage is an oracle-gated building block, so the
    * composition hash-gates end-to-end.
    *
    * Scale: curation as in [[curate]]; chunking is shuffle-free; packing
    * windows sort per (split, shard), never globally — `shards` sizes
    * the pack parallelism independently of corpus size. */
  def packCorpus(
      docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.3, lang: String = "en", minJaccard: Double = 0.5,
      chunkSize: Int = 64, overlap: Int = 16,
      budget: Int = 2048, shards: Int = 4): DataFrame = {
    // Materialize the curated set between the curation and packing
    // stages: it feeds BOTH downstream joins (kept docs, chunk→split),
    // and Catalyst does not share subplans across consumers — without
    // this the whole curation (including the LSH candidate→verify→
    // cluster pass) runs twice. A production pipeline writes this
    // doc_id→split manifest to a lakehouse zone between jobs; within
    // one job a persist of the id-sized frame is the same cut.
    val curated = curate(docs, idCol, textCol, minQuality, lang, minJaccard)
      .select(col(idCol).as("doc_id"), col("split"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-call persist, freed after the consuming action (r16, guide §5
    // — the Dedup lifecycle rationale; both downstream joins live in
    // ONE final plan, so the first execution is the last consumer)
    graft.core.CacheLifecycle.unpersistAfterNextAction(curated)
    val kept = docs.withColumnRenamed(idCol, "doc_id")
      .join(curated, Seq("doc_id"))
    val chunks = TextAnalysis.chunk(kept, "doc_id", textCol, chunkSize, overlap)
      .join(curated, Seq("doc_id"))
      .withColumn("shard",
        pmod(graft.functions.Portable.h60(col("doc_id").cast("string")),
          lit(shards.toLong)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("split"), col("shard"))
      .orderBy(col("doc_id"), col("chunk_id"))
    chunks
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .select(
        col("doc_id"), col("chunk_id"), col("split"), col("shard"),
        col("n_tokens"),
        ((col("__cum") - col("n_tokens")) / budget).cast("long").as("pack_id"))
  }

  /** Training-mix token plan: apportion a fixed token `budget` across
    * sources proportionally to each source's available (whitespace-)
    * token mass, by largest-remainder (Hamilton) apportionment — the
    * allocator that turns "sample sources by weight" into an exact
    * integer plan a data loader can execute, with Σ alloc = budget by
    * construction (floor shares + one extra token to the R sources
    * with the largest remainders, ties broken by source name).
    *
    * `epochs` = alloc/available is the oversampling factor the mix
    * implies (> 1 means the source repeats). All apportionment
    * arithmetic is int64 (exact on both engines): budget·w_s must fit
    * in int64, i.e. budget × the largest source's token count < 2⁶³ —
    * a 1e6-token plan over exabyte-scale (1e12-token) sources is at
    * 1e18, inside the envelope; larger plans divide weights down first.
    *
    * Scale shape: one doc-grain projection + hash aggregate to source
    * grain; everything after runs at mix grain (#sources rows — the
    * unpartitioned rank window is over that mart, not data). */
  def tokenBudgetPlan(
      docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, budget: Long = 1000000L): DataFrame =
    apportion(perSourceTokens(docs, idCol, textCol, sourceCol), "n_tokens",
        budget)
      .select(
        col("source"), col("n_tokens"), col("alloc_tokens"),
        (col("alloc_tokens").cast("double") / col("n_tokens").cast("double"))
          .as("epochs"))

  /** Doc-grain whitespace-token counts with their source — the shared
    * head of every mix planner. */
  private def docTokens(
      docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame =
    TextAnalysis.tokenCounts(docs, idCol, textCol)
      .join(docs.select(col(idCol), col(sourceCol).as("source")), Seq(idCol))
      .select(col(idCol).as("doc_id"), col("source"),
        col("n_ws_tokens").cast("long").as("tk"))

  private def perSourceTokens(
      docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame =
    docTokens(docs, idCol, textCol, sourceCol)
      .groupBy(col("source"))
      .agg(sum(col("tk")).as("n_tokens"))

  /** Largest-remainder (Hamilton) integer apportionment of `budget`
    * across the mix-grain `perSource` frame, proportional to
    * `weightCol`: floor shares + one extra unit to the R sources with
    * the largest remainders (ties by source name), so Σ alloc = budget
    * exactly. ONE body for both planners — the r_extra-via-window and
    * tie-break rules are subtle enough that two copies WOULD drift.
    * All arithmetic int64-exact; budget·max(weight) must fit int64
    * (the caller-facing envelope documented on [[tokenBudgetPlan]]).
    * Returns the input columns plus `alloc_tokens`. */
  private def apportion(
      perSource: DataFrame, weightCol: String, budget: Long): DataFrame = {
    val total = perSource.agg(sum(col(weightCol)).as("w_total"))
    val shares = perSource.crossJoin(broadcast(total))
      .withColumn("share", expr(s"(${budget}L * `$weightCol`) div w_total"))
      .withColumn("rem", expr(s"(${budget}L * `$weightCol`) % w_total"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    shares
      .withColumn("r_extra", lit(budget) - sum(col("share")).over(wAll))
      .withColumn("rnk", row_number().over(
        wAll.orderBy(col("rem").desc, col("source"))))
      .withColumn("alloc_tokens",
        col("share") + when(col("rnk") <= col("r_extra"), 1L).otherwise(0L))
      .drop("w_total", "share", "rem", "r_extra", "rnk")
  }

  /** Budget REALIZATION: turn [[tokenBudgetPlan]]'s per-source token
    * allocations into an actual greedy document selection (docs taken
    * in id order until the source's allocation is exhausted) and report
    * how well the plan lands — docs selected, tokens actually used,
    * and utilization. The gap between plan and realization is document
    * granularity: a source of huge docs strands budget the planner
    * promised (the packing problem q63 then solves at sequence grain).
    *
    * Exactness: integer token cumsums against integer allocations — the
    * keep predicate has no float boundary; utilization is one division.
    *
    * Shape: the plan is mix-grain (broadcast); selection is ONE
    * source-partitioned cumsum window at doc grain + a mart-grain
    * rollup; sources whose first doc overflows their allocation emit
    * the zero row (LEFT join from the plan, so Σ sources reconciles). */
  def budgetRealization(
      docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, budget: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE tokenization scan: the plan's per-source aggregate and the
    // selection cumsum both read this doc-grain frame, and Catalyst
    // does not share subplans across consumers (the packCorpus rule) —
    // deriving the plan via tokenBudgetPlan would tokenize the corpus
    // twice per action
    val docToks = docTokens(docs, idCol, textCol, sourceCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val plan = apportion(
        docToks.groupBy(col("source")).agg(sum(col("tk")).as("n_tokens")),
        "n_tokens", budget)
      .select(col("source"), col("alloc_tokens"))
    val cum = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val sel = docToks
      .withColumn("cum", sum(col("tk")).over(cum))
      .join(broadcast(plan), Seq("source"))
      .filter(col("cum") <= col("alloc_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_selected"),
        max(col("cum")).as("tokens_used"))
    plan.join(sel, Seq("source"), "left")
      .select(
        col("source"), col("alloc_tokens"),
        coalesce(col("n_docs_selected"), lit(0L)).as("n_docs_selected"),
        coalesce(col("tokens_used"), lit(0L)).as("tokens_used"),
        round(coalesce(col("tokens_used"), lit(0L)).cast("double")
          / col("alloc_tokens"), 6).as("utilization"))
  }

  /** Temperature-scaled training mix (the multilingual/DoReMi-style
    * flattening of [[tokenBudgetPlan]]'s proportional plan): source
    * weights are n_tokens^(1/T) with T = 2 — i.e. integer
    * `floor(sqrt(n_tokens))`, so big sources stop dominating and tail
    * sources up-sample — then the same largest-remainder integer
    * apportionment (Σ alloc = budget exactly). The sqrt keeps the
    * weight integral and cross-engine exact: one IEEE sqrt of an exact
    * long, floored — no pow(x, 1/T) (libm pow is not pinned across
    * engines; sqrt is correctly rounded by IEEE 754).
    *
    * Scale shape: identical to [[tokenBudgetPlan]] — doc-grain
    * aggregate to source grain, then mix-grain (#sources) windows. */
  def temperatureMixPlan(
      docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, budget: Long = 1000000L): DataFrame =
    apportion(
        perSourceTokens(docs, idCol, textCol, sourceCol)
          .withColumn("w",
            floor(sqrt(col("n_tokens").cast("double"))).cast("long")),
        "w", budget)
      .select(
        col("source"), col("n_tokens"), col("w").as("weight"),
        col("alloc_tokens"),
        (col("alloc_tokens").cast("double") / col("n_tokens").cast("double"))
          .as("epochs"))

  /** Source-ablation ledger: for every source, the corpus health
    * metrics WITHOUT that source — leave-one-source-out mean quality,
    * English share, and mean document length, each with its delta vs
    * the full corpus. The data-valuation readout a curation review
    * reads before dropping or re-weighting a source ("removing
    * crawl-X moves mean quality +0.04 and en-share −0.02") — the
    * [[graft.ext.Experiment.jackknifeMeanCI]] complement-arithmetic
    * device at source grain, with the sources as the meaningful folds.
    *
    * Exactness: quality rides integer micro-units, chars and flags
    * exact counts, all sums decimal(38,0) (the 100 TB envelope);
    * every without-mean is a half-up micro ratio of complement sums;
    * deltas subtract two already-quantized doubles. Shape: one doc
    * pass to source grain, a one-row total broadcast back — nothing
    * scales past the first aggregate. */
  def sourceAblation(
      docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, langCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val q = TextAnalysis.qualityScore(docs, idCol, textCol)
      .select(col(idCol),
        round(col("quality_score") * 1e6).cast("long").as("qu"))
    // chars derive from textCol, NOT a physical n_chars column — the
    // signature's contract is (id, text, src, lang); requiring a
    // precomputed count column would silently break any other input
    val base = docs.select(col(idCol), col(srcCol).as("source"),
        when(col(langCol) === "en", 1L).otherwise(0L).as("en"),
        length(col(textCol)).cast("long").as("nc"))
      .join(q, Seq(idCol))
    val per = base.groupBy(col("source")).agg(
      count(lit(1)).as("n_s"),
      sum(col("qu").cast(dec)).as("q_s"),
      sum(col("en")).as("e_s"),
      sum(col("nc").cast(dec)).as("c_s"))
    val tot = per.agg(sum(col("n_s")).as("n"), sum(col("q_s")).as("q"),
      sum(col("e_s")).as("e"), sum(col("c_s")).as("c"))
    // half-up micro ratios; qu is ALREADY micro so its mean skips the
    // 1e6 scale-up the count/char means need
    per.crossJoin(broadcast(tot))
      .filter(col("n") > col("n_s"))
      .select(col("source"), col("n_s").as("n_docs"),
        expr("((q - q_s) * 2 + (n - n_s)) div ((n - n_s) * 2)").as("qw"),
        expr("((q * 2) + n) div (n * 2)").as("qf"),
        expr("((e - e_s) * 1000000 * 2 + (n - n_s)) div ((n - n_s) * 2)")
          .as("ew"),
        expr("((e * 1000000 * 2) + n) div (n * 2)").as("ef"),
        expr("((c - c_s) * 1000000 * 2 + (n - n_s)) div ((n - n_s) * 2)")
          .as("cw"),
        expr("((c * 1000000 * 2) + n) div (n * 2)").as("cf"))
      .select(col("source"), col("n_docs"),
        (col("qw") / 1e6).as("mean_quality_wo"),
        round((col("qw") - col("qf")) / 1e6, 6).as("delta_quality"),
        (col("ew") / 1e6).as("en_share_wo"),
        round((col("ew") - col("ef")) / 1e6, 6).as("delta_en_share"),
        (col("cw") / 1e6).as("mean_chars_wo"),
        round((col("cw") - col("cf")) / 1e6, 6).as("delta_chars"))
      .orderBy(col("source"))
  }

  /** Ingest-side per-entity event-rate cap — the data contract BOTH
    * 10×-soak findings prescribe (`BASELINE.md` round-10 section): a
    * 20%-hot key must be tamed at ingest, before it reaches the
    * attribution pair join (q305-class) or stream-join state
    * (q98-class). Keeps each entity's NEWEST `maxPerDay` events per
    * UTC day; the rank order is total and deterministic — (ts desc,
    * id asc), the SAME convention as the q338 recency cap — so replays
    * keep identical rows. Bots and runaway clients are capped at a
    * bounded per-day rate while normal entities pass untouched
    * (law-tested: with `maxPerDay` above every per-day count this is
    * the identity, so capped∘join == join downstream).
    *
    * Scale shape: ONE shuffle on (entity, day) — the q338 grain that
    * splits a hot entity's history across its active days instead of
    * funneling one hash key — then a per-group sort bounded by the
    * entity-day (the soak's 20%-hot user is ~10⁴ rows per day: sorts
    * in-partition, no spill). No fact-scale rejoin: the window
    * carries the full row. */
  def eventRateCap(
      events: DataFrame, entityCol: String, idCol: String,
      tsCol: String, maxPerDay: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(col(entityCol), expr(
        s"unix_micros(`$tsCol`) div 86400000000"))
      .orderBy(col(tsCol).desc, col(idCol).asc)
    events.withColumn("graft_rk", row_number().over(w))
      .filter(col("graft_rk") <= maxPerDay)
      .drop("graft_rk")
  }

  /** Accounting manifest for [[eventRateCap]] in the
    * [[dropReasonManifest]] (q220) discipline: per (class, disposition)
    * — `kept` or `rate_capped` — row counts, distinct capped entities,
    * an exact decimal(38,0) id-sum (order-free membership pin: any
    * single row flipping disposition changes it), and the within-class
    * share. Σ n_events per class reconciles exactly to the class's
    * source total by construction (every event gets exactly one
    * disposition). */
  def eventRateCapManifest(
      events: DataFrame, entityCol: String, idCol: String,
      tsCol: String, classCol: String, maxPerDay: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wEnt = Window
      .partitionBy(col("ent"), expr("unix_micros(ts) div 86400000000"))
      .orderBy(col("ts").desc, col("id").asc)
    val byClass = Window.partitionBy(col("class"))
    events.select(col(classCol).as("class"), col(entityCol).as("ent"),
        col(idCol).as("id"), col(tsCol).as("ts"))
      .withColumn("disposition",
        when(row_number().over(wEnt) <= maxPerDay, "kept")
          .otherwise("rate_capped"))
      .groupBy(col("class"), col("disposition"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("ent")).as("n_entities"),
        // decimal(38,0) internally (id sums overflow int64 at the
        // 100 TB envelope), rendered as a string: exact at any scale,
        // and the oracle's pandas bridge would flatten a decimal
        sum(col("id").cast("decimal(38,0)")).cast("string").as("sum_ids"))
      .withColumn("share",
        round(col("n_events").cast("double")
          / sum(col("n_events")).over(byClass), 6))
      .orderBy(col("class"), col("disposition"))
  }
}
