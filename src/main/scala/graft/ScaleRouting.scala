package graft

/** Routing from "executable spec" operators to their scale-safe
  * siblings.
  *
  * Three gated operators are retained deliberately as the EXACT,
  * oracle-shaped specifications of semantics whose raw volume is
  * unbounded under key concentration — the 10× soak with a 20%-hot
  * key executed each pathology (`soak_r10.jsonl`):
  *
  *  - `q305_position_attribution` (per-user pair explosion; the hot
  *    user alone emitted ~10⁸ pre-cap pairs and the run was aborted
  *    after 15+ min) → `q338_attribution_capped` finished in 38 s via
  *    the (user, day) re-key + bounded-heap per-purchase recency cap;
  *  - `q98_stream_stream_join` (symmetric-join state funnels one hash
  *    key; 398 s single-threaded) → `q339_stream_join_bucketed`
  *    finished in 14 s with IDENTICAL rows via the (user, time-bucket)
  *    re-key + lossless two-bucket explode;
  *  - `q122_hard_negatives` (corpus² scoring; 393 s + 24 GB spill) →
  *    `q137_hard_negatives_cells` finished in 43 s with zero spill via
  *    kmeans cell blocking (exact within cells).
  *
  * The spec forms stay in the registry because the DuckDB gate proves
  * the siblings against them (the oracle ranks/joins over ALL pairs).
  * They are NOT reachable from any composed entry point — pipelines
  * and the soak harness call the siblings — and each spec form emits a
  * once-per-JVM advisory (below) so an operator of this engine who
  * calls one directly learns the scale contract without digging
  * through scaladoc. */
object ScaleRouting {

  /** Machine-readable spec → scale-safe sibling map over
    * [[SparkEntry.queries]] names (both sides are gated queries; a
    * contract test pins that). The round-11 full-surface sweep added
    * the lexical pair: the UNCAPPED BM25 probe floods
    * Σ_term qdf·df candidates (~9·10⁸ at the 10× soak — 7 GB shuffle,
    * 80 GB spill, and the fused hybrid q141 OOM'd an 8 GiB heap);
    * the impact-truncated index (q341/q342) bounds each term's
    * fan-out at M postings. */
  val siblings: Map[String, String] = Map(
    "q305_position_attribution" -> "q338_attribution_capped",
    "q98_stream_stream_join" -> "q339_stream_join_bucketed",
    "q122_hard_negatives" -> "q137_hard_negatives_cells",
    "q128_bm25_search" -> "q341_bm25_truncated",
    "q136_bm25_capped" -> "q341_bm25_truncated",
    "q141_rrf_fusion" -> "q342_rrf_fusion_truncated")

  /** Queries whose scale path is CONTRACT-CLEAN INPUT rather than a
    * re-planned sibling: the window-form attribution family rides
    * user-partitioned range frames — no pair materialization, no
    * spill — but a range frame still SCANS rows×frame-size per
    * entity, so a 20%-hot key is semantically quadratic (round-11
    * full sweep: q184 415 s, q303 375 s, q314 478 s at 10×, all with
    * zero spill). The production contract is the q340 per-entity
    * event-rate cap at ingest ([[graft.ext.Curation.eventRateCap]]),
    * measured in the SoakBench rate-cap leg; for the U-shaped model a
    * per-purchase cap also ships as its own operator (q305 → q338 in
    * [[siblings]]). */
  val ingestContract: Set[String] = Set(
    "q130_attribution",
    "q184_linear_attribution",
    "q303_time_decay_attribution",
    "q314_shapley_attribution")

  /** Gated ACCEPTANCE AUDITS that embed a spec-form arm by
    * construction: q343 measures the truncated probe's recall AGAINST
    * the exact uncapped probe, so its 10× wall is the q128 flood's —
    * deliberately, at index-design time, on a sampled query set at
    * scale (its scaladoc's sampling rule). The soak harness and
    * [[graft.SoakGate]] treat these like the spec forms: expected to
    * grind at planted skew, never part of a production pipeline. */
  val specAudits: Set[String] = Set("q343_bm25_truncation_recall")

  /** The documented per-key concentration bound above which the spec
    * forms grind: the soak's planted profile — one key holding ~20% of
    * the fact rows (≈10⁵ events for a single entity at the 10× sf0.1
    * corpus). Below it the spec forms are fine; above it run the
    * sibling. Measure with the q142 skew-profile operator. */
  val hotKeyBound: String =
    "~1e5 rows on one key (a 20%-hot key at 10x sf0.1; profile with q142)"

  /** [[hotKeyBound]] as a number — what the sampled guard compares
    * against (the 10× soak's hot user held ~2·10⁶ events and ground the
    * range-frame family 375–478 s; the documented grind threshold is an
    * order of magnitude below that). */
  val hotKeyBoundRows: Long = 100000L

  /** Session conf controlling the sampled input guard on the
    * [[ingestContract]] family: `off` (default — advisory log only),
    * `warn` (run the sampled probe, log when the bound is exceeded), or
    * `fail` (throw BEFORE the quadratic window executes). The probe is
    * one cheap job over a [[guardSampleFraction]] sample — enable it in
    * soaks and scheduled production runs; leave it off for interactive
    * exploration where the caller knows the input. */
  val guardConfKey: String = "spark.graft.hotkey.guard"

  /** Sample fraction of the guard probe: 1% keeps the probe ~100× below
    * the operator's own scan while a contract-breaking key (≥ 10⁵ rows)
    * still lands ~10³ sampled rows — far above Poisson noise. */
  val guardSampleFraction: Double = 0.01

  private val warned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** One-line, once-per-JVM advisory the spec forms emit on use. */
  private[graft] def advise(specOp: String, scaleOp: String): Unit =
    if (warned.add(specOp))
      org.slf4j.LoggerFactory.getLogger("graft.ScaleRouting").warn(
        s"$specOp is the executable SPEC form (exact, oracle-gated); " +
        s"above $hotKeyBound run $scaleOp instead - same results, " +
        "hot-key-safe (measured: soak_r10.jsonl).")

  /** Once-per-JVM advisory the [[ingestContract]] family emits on use:
    * these operators stay the production plan — no pair explosion, no
    * spill — but a per-entity range frame scans rows×frame-size per
    * entity, so the CALLER owns the per-key concentration contract. */
  private[graft] def adviseIngestContract(op: String): Unit =
    if (warned.add(op))
      org.slf4j.LoggerFactory.getLogger("graft.ScaleRouting").warn(
        s"$op rides a per-entity range frame - semantically quadratic " +
        s"under key concentration (measured 375-478 s on a 20%-hot key " +
        s"at the 10x soak). Above $hotKeyBound rate-cap the input at " +
        "ingest first (graft.ext.Curation.eventRateCap, q340 - measured " +
        s"36-195x there); set $guardConfKey=warn|fail to enforce with a " +
        "sampled input probe.")

  /** The sampled hot-key guard ([[guardConfKey]]): one
    * sample→count→top-1 job over `events`, comparing the heaviest
    * sampled key against [[hotKeyBoundRows]]·[[guardSampleFraction]].
    * `warn` logs the offending entity and its estimated row count;
    * `fail` throws before the caller's quadratic window ever executes —
    * the fail-fast a scheduled 100 TB run wants (minutes of probe vs
    * hours of grind). Off (default): zero work, zero behavior change. */
  private[graft] def guardHotKeys(
      events: org.apache.spark.sql.DataFrame, entityCol: String,
      op: String): Unit = {
    val mode = events.sparkSession.conf.get(guardConfKey, "off")
    if (mode != "warn" && mode != "fail") return
    import org.apache.spark.sql.functions.col
    val sampledBound =
      math.max(1L, math.round(hotKeyBoundRows * guardSampleFraction))
    val top = events.select(col(entityCol))
      .sample(withReplacement = false, guardSampleFraction, seed = 42L)
      .groupBy(col(entityCol)).count()
      .orderBy(col("count").desc, col(entityCol))
      .limit(1).collect()
    top.headOption.filter(_.getLong(1) > sampledBound).foreach { r =>
      val est = math.round(r.getLong(1) / guardSampleFraction)
      val msg =
        s"$op hot-key guard: $entityCol=${r.get(0)} holds ~$est rows " +
        s"(sampled ${r.getLong(1)} at $guardSampleFraction), above the " +
        s"$hotKeyBoundRows-row contract bound - rate-cap at ingest " +
        "(graft.ext.Curation.eventRateCap, q340) before this operator."
      if (mode == "fail") throw new IllegalStateException(msg)
      org.slf4j.LoggerFactory.getLogger("graft.ScaleRouting").warn(msg)
    }
  }
}
