package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experiment-analysis tier: variance-reduced A/B readouts over the
  * behavioral event stream.
  *
  * The reference pipeline ends at descriptive gold marts; an analytics
  * engine that feeds experimentation also needs the readout that turns
  * those marts into a decision. CUPED (Controlled-experiment Using
  * Pre-Experiment Data) is the industry-standard first step: regress
  * the in-experiment metric on its own pre-period value and compare
  * adjusted means, typically cutting required sample size ~40-50% for
  * sticky metrics like revenue.
  */
object Experiment {

  /** CUPED-adjusted experiment readout. Users are assigned to variants
    * by the engine's portable salted hash (the [[Sampling.hashSplit]]
    * contract — reproducible on any engine and layout); the covariate
    * is each user's PRE-period metric, the outcome the POST-period
    * metric, split at `splitTs`. Emits one row per variant: raw mean,
    * CUPED-adjusted mean (`ȳ_v − θ·(x̄_v − x̄)`), and the pooled θ.
    *
    * Exactness across engines: money rides as integral cents, so every
    * per-user covariate/outcome and every pooled sum (Σx, Σy, Σxy, Σx²)
    * is an order-free integer; θ and the means are then a FIXED chain
    * of IEEE double ops over those exact integers, mirrored
    * parenthesis-for-parenthesis in the oracle — emitted unrounded
    * because identical chains produce identical bits (rounding, by
    * contrast, can diverge on half-ulp boundaries). A zero pre-period
    * variance pins θ = 0 (the unadjusted readout) on both engines.
    *
    * Shape: one user-keyed hash aggregate (map-side partials) feeding
    * a 2-row variant aggregate and a 1-row global moment aggregate
    * that returns via `broadcast` — no window, no second scan of the
    * event log, nothing driver-side. At 100 TB this is exactly the
    * metrics-cube shape: the per-user frame is the reusable
    * materialization, everything above it is constant-sized. */
  def cupedReadout(
      events: DataFrame, userCol: String, tsCol: String, valueCol: String,
      splitTs: String, salt: String = "cuped"): DataFrame = {
    val cents = round(col(valueCol) * 100).cast("long")
    val pre = col(tsCol) < lit(splitTs).cast("timestamp")
    val perUser = events
      .filter(col(valueCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(userCol).cast("long").as("user_id"))
      .agg(
        sum(when(pre, cents).otherwise(0L)).as("x"),
        sum(when(!pre, cents).otherwise(0L)).as("y"))
      .withColumn("variant",
        when(Sampling.hashBucket(col("user_id"), salt, 2) === 0, "control")
          .otherwise("treatment"))
      // both the pooled-moment and per-variant consumers read this frame;
      // without the persist each would re-scan the event log
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.CacheLifecycle.unpersistAfterNextAction(perUser)
    val pooled = perUser.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    val byVariant = perUser.groupBy(col("variant"))
      .agg(count(lit(1)).as("nv"),
        sum(col("x")).as("sxv"), sum(col("y")).as("syv"))
    val nD = col("n").cast("double")
    val num = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val den = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val nvD = col("nv").cast("double")
    byVariant.crossJoin(broadcast(pooled))
      .withColumn("theta", when(den === 0.0, 0.0).otherwise(num / den))
      .withColumn("mean_x_all", col("sx").cast("double") / nD)
      .select(
        col("variant"),
        col("nv").as("n_users"),
        ((col("syv").cast("double") / nvD) / 100.0).as("mean_y"),
        ((col("syv").cast("double") / nvD) / 100.0 -
          col("theta") * ((col("sxv").cast("double") / nvD - col("mean_x_all"))
            / 100.0)).as("mean_y_adj"),
        col("theta"))
  }

  /** Stratified loyalty-uplift readout: per item category (and the
    * pooled `ALL` row, from the same ROLLUP pass), the revenue gap
    * between loyalty and non-loyalty order lines — the observational
    * companion to [[cupedReadout]] (stratifying by category exposes
    * Simpson-style reversals the pooled row hides). Strata missing
    * either group are dropped — there is no uplift to read there.
    *
    * Exactness: integer-cent sums per (stratum × arm) via conditional
    * aggregates; means and the uplift are shared IEEE division chains,
    * 6dp. Shape: ONE hash aggregate with ROLLUP (the Expand doubles
    * rows map-side but the exchange carries stratum-grain partials —
    * the q31/q93 grouping-sets judgment), no joins, no windows. */
  /** Cumulative gain chart (decile lift table): rank users by a score —
    * here order frequency, the classic heuristic targeting model — and
    * report, per decile, the capture of the positive class (users with
    * any loyalty order): response rate, cumulative gain (share of all
    * positives reached by decile d), and cumulative lift vs random.
    * The model-evaluation readout a campaign-targeting pass publishes
    * ([[graft.ext.Profiling.rankAuc]] scores the ranking; this shows
    * WHERE the value concentrates).
    *
    * Determinism: deciles are `ntile(10)` over (score DESC, user ASC) —
    * the q42 total-order precedent; the window runs at USER grain (the
    * one global sort, shared judgment with q42/q101 — at 100 TB swap in
    * rank-by-approx-quantile thresholds). All counts exact; the three
    * ratios are single shared IEEE chains.
    */
  def gainChart(orderRevenue: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val users = orderRevenue
      .groupBy(col("user_id"))
      .agg(countDistinct(col("order_id")).as("freq"),
        max(when(col("is_loyalty"), 1L).otherwise(0L)).as("pos"))
    val byScore = Window.orderBy(col("freq").desc, col("user_id"))
    val deciles = users
      .withColumn("decile", ntile(10).over(byScore))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("pos")).as("n_pos"))
    val cum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = deciles.agg(sum(col("n_users")).as("tot_users"),
      sum(col("n_pos")).as("tot_pos"))
    deciles
      .withColumn("cum_users", sum(col("n_users")).over(cum))
      .withColumn("cum_pos", sum(col("n_pos")).over(cum))
      .crossJoin(broadcast(tot))
      .select(
        col("decile"), col("n_users"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n_users"), 6)
          .as("response_rate"),
        round(col("cum_pos").cast("double") / col("tot_pos"), 6)
          .as("cum_gain"),
        round((col("cum_pos").cast("double") / col("tot_pos"))
          / (col("cum_users").cast("double") / col("tot_users")), 6)
          .as("cum_lift"))
  }

  def loyaltyUpliftStrata(orderRevenue: DataFrame): DataFrame = {
    val cents = graft.gold.Money.cents(col("total_revenue")).cast("long")
    orderRevenue
      .rollup(col("item_category"))
      .agg(
        sum(when(col("is_loyalty"), 1L).otherwise(0L)).as("n_treat"),
        sum(when(!col("is_loyalty"), 1L).otherwise(0L)).as("n_ctrl"),
        sum(when(col("is_loyalty"), cents).otherwise(0L)).as("s_treat"),
        sum(when(!col("is_loyalty"), cents).otherwise(0L)).as("s_ctrl"))
      .filter(col("n_treat") > 0 && col("n_ctrl") > 0)
      .select(
        coalesce(col("item_category"), lit("ALL")).as("stratum"),
        col("n_treat"), col("n_ctrl"),
        round(col("s_treat") / 10000.0 / col("n_treat"), 6).as("mean_treat"),
        round(col("s_ctrl") / 10000.0 / col("n_ctrl"), 6).as("mean_ctrl"),
        round(col("s_treat") / 10000.0 / col("n_treat")
          - col("s_ctrl") / 10000.0 / col("n_ctrl"), 6).as("uplift"))
  }

  /** Mann–Whitney U per category: does the loyalty cohort's line-revenue
    * DISTRIBUTION differ from the rest (rank-based, so immune to the
    * heavy right tail that breaks a t-test on money), with the
    * tie-corrected normal approximation z. Average ranks are carried as
    * exact integers (2·avgrank = 2·rank + ties − 1), the tie term as
    * Σ(t³−t), so U and z are assembled from exact longs with one fixed
    * double formula — bit-reproducible across engines and partitions.
    *
    * Scale shape: one rank window + one tie aggregate per category
    * partition (the same shuffle key), then category-grain joins. */
  def loyaltyMannWhitney(orderRevenue: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = orderRevenue.select(col("item_category"), col("is_loyalty"),
      round(col("total_revenue") * 10000).cast("long").as("c"))
    val ranked = v.withColumn("r2",
      rank().over(Window.partitionBy(col("item_category")).orderBy(col("c")))
        .cast("long") * 2 +
        count(lit(1)).over(Window.partitionBy(col("item_category"), col("c")))
        - 1)
    val agg = ranked.groupBy(col("item_category"))
      .agg(
        sum(when(col("is_loyalty"), col("r2")).otherwise(0L)).as("s2"),
        sum(when(col("is_loyalty"), 1L).otherwise(0L)).as("n1"),
        sum(when(!col("is_loyalty"), 1L).otherwise(0L)).as("n2"))
    val ties = v.groupBy(col("item_category"), col("c"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("item_category"))
      .agg(sum(col("t") * col("t") * col("t") - col("t")).as("tt"))
    val nn = col("n1") + col("n2")
    val u = (col("s2") - col("n1") * (col("n1") + 1)) / lit(2.0)
    val mu = col("n1") * col("n2") / lit(2.0)
    val sig2 = col("n1") * col("n2") / lit(12.0) *
      ((nn + 1) - col("tt") / (nn * (nn - lit(1.0))))
    agg.join(ties, Seq("item_category"))
      .filter(col("n1") > 0 && col("n2") > 0)
      .select(col("item_category"),
        col("n1").as("n_loyal"), col("n2").as("n_other"),
        u.as("u_stat"),
        when(sig2 > 0, round((u - mu) / sqrt(sig2), 6)).as("z"))
  }

  /** Kruskal–Wallis H across the groups of `groupCol` — the K-sample
    * generalization of [[loyaltyMannWhitney]]: "do any of these
    * segments draw from a different distribution", rank-based so the
    * money tail cannot dominate. Emits one row: group/row counts, H,
    * and the tie-corrected H.
    *
    * Exactness: global tied average ranks come from the VALUE
    * HISTOGRAM — doubled rank of value v is 2·(#rows below v) + t + 1,
    * all integers — so per-group rank sums s2 are order-free longs.
    * The per-group term s2²∕(4nᵢ) is one fixed IEEE chain from exact
    * integers, quantized to integer 1e-6 units BEFORE the cross-group
    * sum (a float sum's order differs between engines — the
    * [[Profiling.fisherSeparability]] discipline); unit sums and the
    * tie cubes ride DECIMAL(38,0)/HUGEINT. H and its correction are
    * then single mirrored chains, 6dp.
    *
    * Shape: one hash aggregate to value grain, ONE window over that
    * histogram — distinct-value grain, NOT row grain (money units
    * concentrate: ~52k distinct cents under 600k rows here; for a
    * domain where distinct ≈ rows, swap in the
    * [[Profiling.quantileNormalize]] bucketed-prefix-sum histogram) —
    * a value-keyed shuffle join back to rows, and constant-size
    * aggregates above. Callers pass an integer-unit column. */
  def kruskalWallis(
      df: DataFrame, groupCol: String, unitsCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = df.select(col(groupCol).as("g"), unitsCol.as("c"))
    val hist = v.groupBy(col("c")).agg(count(lit(1)).as("t"))
    val wv = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val r2 = hist
      .withColumn("below", coalesce(sum(col("t")).over(wv), lit(0L)))
      .select(col("c"), (lit(2L) * col("below") + col("t") + 1L).as("r2"))
    val byG = v.join(r2, Seq("c"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_i"),
        sum(col("r2").cast("decimal(38,0)")).as("s2"))
    val terms = byG.select(col("n_i"),
      round(col("s2").cast("double") * col("s2").cast("double")
        / (lit(4.0) * col("n_i").cast("double")) * 1e6)
        .cast("decimal(38,0)").as("term_units"))
    val ties = hist.agg(
      sum(col("t").cast("decimal(38,0)") * col("t") * col("t") - col("t"))
        .as("tt"))
    val tot = terms.agg(count(lit(1)).as("n_groups"),
      sum(col("n_i")).as("n_total"), sum(col("term_units")).as("hu"))
    val nd = col("n_total").cast("double")
    val hRaw = lit(12.0) / (nd * (nd + lit(1.0))) *
      (col("hu").cast("double") / lit(1e6)) - lit(3.0) * (nd + lit(1.0))
    val tieC = lit(1.0) - col("tt").cast("double") / (nd * nd * nd - nd)
    tot.crossJoin(ties).select(
      col("n_groups"), col("n_total"),
      round(hRaw, 6).as("h"),
      when(tieC > 0, round(hRaw / tieC, 6)).as("h_tie_adj"))
  }

  /** Loyalty difference-in-differences: the 2×2 natural-experiment
    * readout. Treatment = the loyalty flag, periods split at the
    * calendar midpoint of the observed fact window, cells = mean
    * per-line revenue; DiD = (T̄post − T̄pre) − (C̄post − C̄pre) —
    * the parallel-trends-adjusted loyalty effect that a raw
    * post-period comparison (q11's shape) confounds with seasonality.
    *
    * Exactness: the split date is data-derived (min/max dates, integer
    * floor-halved — never the wall clock, SURVEY §7.4 risk 2); cell
    * sums are exact integer cents and counts, each mean ONE division,
    * and the DiD combination a fixed four-operand chain over those
    * identical doubles, 6dp at the edge.
    *
    * Shape: a constant-size min/max aggregate broadcast back onto the
    * fact, then ONE conditional-sum aggregate to a single row — two
    * scans total, no window, nothing driver-side. */
  def loyaltyDiffInDiff(orderRevenue: DataFrame): DataFrame = {
    val bounds = orderRevenue.agg(
      min(col("creation_date")).as("d0"), max(col("creation_date")).as("d1"))
    val withSplit = orderRevenue
      .select(col("is_loyalty"), col("creation_date"), col("total_revenue"))
      .crossJoin(broadcast(bounds))
      .withColumn("split",
        expr("date_add(d0, cast(datediff(d1, d0) div 2 as int))"))
    val c = round(col("total_revenue") * 10000).cast("long")
    val t = col("is_loyalty")
    val p = col("creation_date") > col("split")
    def cell(cond: org.apache.spark.sql.Column, tag: String) = Seq(
      sum(when(cond, c).otherwise(0L)).as(s"cents_$tag"),
      sum(when(cond, 1L).otherwise(0L)).as(s"n_$tag"))
    val agg = withSplit.agg(
      max(col("split")).as("split_date"),
      (cell(t && !p, "tp") ++ cell(t && p, "tq")
        ++ cell(!t && !p, "cp") ++ cell(!t && p, "cq")): _*)
    // Empty-cell guard: a degenerate 2×2 (e.g. no loyalty orders in the
    // pre period) must surface as NULL in BOTH engines — an unguarded
    // 0/0 is NULL in Spark but NaN/Inf under DuckDB's IEEE division,
    // so the mirror would diverge exactly when the data is degenerate.
    def mean(tag: String) =
      when(col(s"n_$tag") > 0,
        col(s"cents_$tag").cast("double") / (lit(10000.0) * col(s"n_$tag")))
    agg.select(
      col("split_date"),
      col("n_tp").as("n_treat_pre"), col("n_tq").as("n_treat_post"),
      col("n_cp").as("n_ctrl_pre"), col("n_cq").as("n_ctrl_post"),
      round(mean("tp"), 6).as("mean_treat_pre"),
      round(mean("tq"), 6).as("mean_treat_post"),
      round(mean("cp"), 6).as("mean_ctrl_pre"),
      round(mean("cq"), 6).as("mean_ctrl_post"),
      round((mean("tq") - mean("tp")) - (mean("cq") - mean("cp")), 6)
        .as("did_estimate"))
  }

  /** Delete-a-group jackknife CI for a mean: rows hash into `folds`
    * deterministic groups ([[Sampling.hashBucket]] — layout- and
    * engine-independent), each fold's leave-one-out mean θ_i comes
    * from the complement's exact sums, and the jackknife variance
    * (K−1)/K·Σ(θ_i−θ̄)² gives a distribution-free standard error and
    * 95% CI — the uncertainty readout a mart's point estimate lacks,
    * without the RNG a bootstrap needs (resampling is NOT
    * reproducible across engines; deterministic fold deletion is).
    *
    * Exactness: values ride integral 1e-4 units accumulated as
    * decimal(38,0) (the 100 TB revenue envelope); each θ_i lands as a
    * half-up integer micro-unit ratio, so the K fold rows sum
    * order-free; the deviation sum uses the exact-moment identity
    * K·Σθ²−T² in decimal; doubles appear only at the final √ and the
    * ±z edge. Shape: one fold-grain hash aggregate (K rows), a one-row
    * complement broadcast — nothing scales past the first pass. */
  def jackknifeMeanCI(
      df: DataFrame, idCol: Column, valueCol: Column,
      folds: Int = 20, salt: String = "jk", z: Double = 1.96): DataFrame = {
    val dec = "decimal(38,0)"
    val perFold = df
      .select(Sampling.hashBucket(idCol, salt, folds).as("fold"),
        round(valueCol * 10000).cast("long").as("u"))
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("n_i"), sum(col("u").cast(dec)).as("s_i"))
    val tot = perFold.agg(sum(col("n_i")).as("n"), sum(col("s_i")).as("s"))
    // θ_i in integer micro-value units: the complement mean
    // (s−s_i)/(n−n_i) in value units is ·100 on the 1e-4-unit sums at
    // micro precision, half-up via the 2a+b div 2b idiom; the decimal
    // div long IntegralDivide lands a LONG θ_i, so the K-row sums are
    // exact and order-free
    val theta = perFold.crossJoin(broadcast(tot))
      .filter(col("n") > col("n_i"))
      .select(col("n"), col("s"),
        expr("((s - s_i) * 100 * 2 + (n - n_i)) div ((n - n_i) * 2)")
          .as("tq"))
    theta.groupBy(col("n"), col("s"))
      .agg(count(lit(1)).as("k_used"),
        sum(col("tq").cast(dec)).as("t"),
        sum(col("tq").cast(dec) * col("tq")).as("ssq"))
      .select(col("n"), col("k_used"),
        expr("((s * 100 * 2 + n) div (n * 2)) / cast(1000000 as double)")
          .as("mean"),
        when(col("k_used") > 1,
          sqrt(((col("k_used") - 1).cast("double")
            * (col("k_used").cast(dec) * col("ssq")
               - col("t") * col("t")).cast("double")))
            / col("k_used").cast("double") / 1e6).as("se"))
      .select(col("n"), col("k_used").as("folds_used"), col("mean"),
        round(col("se"), 6).as("jk_se"),
        round(col("mean") - lit(z) * col("se"), 6).as("ci_lo"),
        round(col("mean") + lit(z) * col("se"), 6).as("ci_hi"))
  }

  /** z quantiles shared with the SQL mirror as 17-significant-digit
    * literals (the dcgDiscounts device — a decimal→double parse is
    * correctly rounded in both engines, each engine's own inverse-Φ
    * need not exist, let alone agree). */
  val Z975 = 1.9599639845400545 // Φ⁻¹(0.975): two-sided α = 0.05
  val Z80 = 0.8416212335729143 // Φ⁻¹(0.80): power 0.80
  /** z_{α∕2}+z_β, summed ONCE here so the plan's literal and the SQL
    * mirror's interpolation are the identical double. */
  val MdeZ: Double = Z975 + Z80

  /** Minimum detectable effect of the two-arm experiment the marts
    * feed: given the observed arm sizes and pooled variance, the
    * smallest true mean difference a two-sided α=0.05 test would
    * detect with 80% power — MDE = (z_{α∕2}+z_β)·√(s²·(1∕n_t+1∕n_c)).
    * The pre-readout sanity check CUPED ([[cuped]]) and DiD
    * ([[loyaltyDiffInDiff]]) both need: an observed lift below the
    * MDE is noise regardless of its point estimate.
    *
    * Exactness: values ride integral 1e-4 units; Σx and Σx² accumulate
    * as decimal(38,0) (x² exceeds int64 at ~5·10⁵ in value units —
    * cast BEFORE the square); the corrected sums n·Σx²−(Σx)² stay
    * decimal; doubles enter only in the FIXED final chain (two √, the
    * z-sum, four divides) mirrored parenthesis-for-parenthesis.
    * Shape: ONE conditional-sum aggregate to a single row. */
  def mdeReadout(
      df: DataFrame, treatCol: Column, valueCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.select(
      when(treatCol, 1L).otherwise(0L).as("t"),
      round(valueCol * 10000).cast("long").as("u"))
    val a = base.agg(
      sum(col("t")).as("n_t"),
      sum(lit(1L) - col("t")).as("n_c"),
      sum(when(col("t") === 1L, col("u")).otherwise(0L).cast(dec)).as("s_t"),
      sum(when(col("t") === 0L, col("u")).otherwise(0L).cast(dec)).as("s_c"),
      sum(when(col("t") === 1L, col("u").cast(dec) * col("u"))
        .otherwise(lit(0).cast(dec))).as("ss_t"),
      sum(when(col("t") === 0L, col("u").cast(dec) * col("u"))
        .otherwise(lit(0).cast(dec))).as("ss_c"))
    // corrected sums of squares per arm, n-scaled in decimal:
    // SS·n = n·Σx² − (Σx)²; pooled s² = (SS_t + SS_c)/(n_t+n_c−2)
    val ssdT = (col("n_t").cast(dec) * col("ss_t") - col("s_t") * col("s_t"))
      .cast("double") / col("n_t").cast("double")
    val ssdC = (col("n_c").cast(dec) * col("ss_c") - col("s_c") * col("s_c"))
      .cast("double") / col("n_c").cast("double")
    val s2 = (ssdT + ssdC) / (col("n_t") + col("n_c") - 2).cast("double")
    val mde = lit(MdeZ) *
      sqrt(s2 * (lit(1.0) / col("n_t") + lit(1.0) / col("n_c"))) / 1e4
    val meanC = expr("(((s_c * 100 * 2) + n_c) div (n_c * 2)) " +
      "/ cast(1000000 as double)")
    a.select(
      col("n_t").as("n_treat"), col("n_c").as("n_ctrl"),
      expr("(((s_t * 100 * 2) + n_t) div (n_t * 2)) " +
        "/ cast(1000000 as double)").as("mean_treat"),
      meanC.as("mean_ctrl"),
      when(col("n_t") > 1 && col("n_c") > 1,
        round(sqrt(s2) / 1e4, 6)).as("pooled_sd"),
      when(col("n_t") > 1 && col("n_c") > 1,
        round(mde, 6)).as("mde_abs"),
      when(col("n_t") > 1 && col("n_c") > 1 && meanC > 0,
        round(mde / meanC, 6)).as("mde_rel"))
  }

  /** Empirical-Bayes beta-binomial shrinkage of each restaurant's
    * loyalty-line share — the small-sample league-table fix (the
    * [[graft.ext.Supply]] Wilson bound ranks by a pessimistic bound;
    * this RE-ESTIMATES: a 3-line restaurant at 100% should not outrank
    * a 500-line one at 60%). Method-of-moments beta prior across
    * restaurants: m and v are the mean and population variance of the
    * per-restaurant rates, K = m(1−m)∕v − 1, and the posterior mean is
    * (x + mK)∕(n + K) — shrinking low-n rates toward the global m.
    * Degenerate priors (v = 0, or over-dispersion making K ≤ 0) fall
    * back to the raw rate on BOTH engines via the same guard.
    *
    * Exactness: x and n are exact longs; each raw rate is the half-up
    * micro ratio, so the prior moments accumulate as order-free
    * integer sums (Σp, Σp² in micro units); m, v, K, and the posterior
    * are then one fixed IEEE chain over those integers, mirrored
    * parenthesis-for-parenthesis, rounded to 6dp only at render.
    *
    * Scale shape: one fact-grain hash aggregate to restaurant grain,
    * a constant-size moment aggregate returning via broadcast, and a
    * projection — no window, no second scan. */
  def ebShrunkLoyaltyShare(orderRevenue: DataFrame): DataFrame = {
    val per = orderRevenue
      .groupBy(col("restaurant_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("is_loyalty"), 1L).otherwise(0L)).as("x"))
      .withColumn("pu", expr("((x * 1000000 * 2) + n) div (n * 2)"))
      // the moment aggregate and the posterior projection both read it
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.CacheLifecycle.unpersistAfterNextAction(per)
    val mom = per.agg(count(lit(1)).as("m_rest"),
      sum(col("pu")).as("sp"), sum(col("pu") * col("pu")).as("spp"))
    val m = col("sp").cast("double") / col("m_rest").cast("double") / 1e6
    val ex2 = col("spp").cast("double") / col("m_rest").cast("double") / 1e12
    val v = ex2 - (col("sp").cast("double") / col("m_rest").cast("double")
      / 1e6) * (col("sp").cast("double") / col("m_rest").cast("double") / 1e6)
    val k = m * (lit(1.0) - m) / v - lit(1.0)
    per.crossJoin(broadcast(mom))
      .select(col("restaurant_id"), col("n").as("n_lines"),
        (col("pu") / 1e6).as("raw_share"),
        round(when(v > 0.0 && k > 0.0,
            (col("x").cast("double") + m * k) / (col("n").cast("double") + k))
          .otherwise(col("pu") / 1e6), 6).as("shrunk_share"))
      .orderBy(col("restaurant_id"))
  }

  /** Benjamini–Hochberg FDR control over the per-restaurant
    * loyalty-lift family — the multiplicity fix the single-test tier
    * ([[kruskalWallis]], the log-rank arm test) leaves open: testing
    * every restaurant's loyalty share against the rest of the
    * population at α = 0.05 would expect 5% false flags from noise
    * alone; BH's step-up rule (reject the largest prefix of
    * p-ascending tests with p₍ᵢ₎ ≤ i·α∕m) bounds the false-discovery
    * RATE instead. Per restaurant: the 2×2 chi-square (restaurant vs
    * complement × loyalty vs not, 1 df), p = erfc(√(χ²∕2)) via the
    * Abramowitz–Stegun 7.1.26 rational chain (|ε| < 1.5·10⁻⁷ — far
    * below any honest significance claim), evaluated as the IDENTICAL
    * double chain on both engines and quantized to 1e-9 before every
    * comparison.
    *
    * Exactness: counts are exact longs; the ad−bc cross term is exact
    * decimal(38,0) (≤ ~10²⁴ at 10¹² lines — HUGEINT-mirrored); χ² and
    * p are fixed double chains over those integers, quantized 1e-6 /
    * 1e-9; the BH compare p₍ᵢ₎ ≤ i·α∕m cross-multiplies in
    * decimal(38,0) (pu·m·1000 vs i·α‰·10⁹) so no division enters the
    * decision. Degenerate margins (all/no loyalty rows) leave the
    * family before ranking, m counts only testable restaurants.
    *
    * Scale shape: one fact-grain hash aggregate to restaurant grain,
    * two scalar aggregates returning via broadcast, and the p-rank
    * window over the restaurant MART (post-aggregate, entity-bounded
    * per the total-order audit). */
  def bhFdrLoyaltyLift(
      orderRevenue: DataFrame, alphaPerMille: Int = 50): DataFrame = {
    val dec = "decimal(38,0)"
    val per = orderRevenue
      .groupBy(col("restaurant_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("is_loyalty"), 1L).otherwise(0L)).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.CacheLifecycle.unpersistAfterNextAction(per)
    val tot = per.agg(sum(col("n")).as("nn"), sum(col("x")).as("xx"))
    val z = per.crossJoin(broadcast(tot))
      .withColumn("diff",
        col("x").cast(dec)
            * ((col("nn") - col("n")) - (col("xx") - col("x"))).cast(dec)
          - (col("n") - col("x")).cast(dec) * (col("xx") - col("x")).cast(dec))
      .withColumn("den",
        col("n").cast("double") * (col("nn") - col("n")).cast("double")
          * col("xx").cast("double") * (col("nn") - col("xx")).cast("double"))
      .filter(col("den") > 0.0)
      .withColumn("chi2q",
        round(col("nn").cast("double") * col("diff").cast("double")
          * col("diff").cast("double") / col("den") * 1e6).cast("long"))
      .withColumn("z", sqrt(col("chi2q") / lit(2e6)))
      .withColumn("tt", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("z")))
      .withColumn("pu",
        round(((((lit(1.061405429) * col("tt") - lit(1.453152027)) * col("tt")
            + lit(1.421413741)) * col("tt") - lit(0.284496736)) * col("tt")
            + lit(0.254829592)) * col("tt")
          * exp(-(col("z") * col("z"))) * 1e9).cast("long"))
    val ranked = z
      .withColumn("p_rank", row_number().over(
        Window.orderBy(col("pu"), col("restaurant_id"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.CacheLifecycle.unpersistAfterNextAction(ranked)
    // step-up cutoff: the LARGEST passing rank (everything below it is
    // rejected, even ranks whose own compare fails) — two scalar
    // aggregates returned via broadcast, never a second total-order
    // window; the compare cross-multiplies so no division enters
    val mRow = ranked.agg(count(lit(1)).as("m"))
    val flagged = ranked.crossJoin(broadcast(mRow))
      .withColumn("fr",
        when(col("pu").cast(dec) * col("m").cast(dec) * lit(1000L)
            <= col("p_rank").cast(dec) * lit(alphaPerMille.toLong)
               * lit(1000000000L),
          col("p_rank")).otherwise(lit(0)))
    val cut = flagged.agg(max(col("fr")).as("cutoff"))
    flagged.crossJoin(broadcast(cut))
      .select(col("restaurant_id"), col("n").as("n_lines"),
        col("x").as("n_loyal"),
        (col("chi2q") / 1e6).as("chi2"), (col("pu") / 1e9).as("p_value"),
        col("p_rank"), col("m").as("m_tests"),
        (col("p_rank") <= col("cutoff")).as("rejected"))
      .orderBy(col("p_rank"))
  }

  /** Cochran–Mantel–Haenszel pooled association between loyalty
    * membership and option attach, stratified by restaurant — the
    * Simpson's-paradox-proof effect estimate the crude 2×2 cannot
    * give: restaurants differ in BOTH loyalty mix and attach rate, so
    * the unstratified odds ratio confounds venue with behavior. Per
    * stratum i: OR_CMH = Σ(aᵢdᵢ∕nᵢ) ∕ Σ(bᵢcᵢ∕nᵢ), the CMH χ² with
    * continuity correction (|Σ(aᵢ−Eᵢ)|−½)² ∕ ΣVᵢ, and
    * p = erfc(√(χ²∕2)) via the shared A&S chain; the crude OR rides
    * alongside so the readout SHOWS the confounding gap.
    *
    * Exactness: cell counts are exact longs; each stratum's aᵢdᵢ∕nᵢ,
    * bᵢcᵢ∕nᵢ, aᵢ−Eᵢ, and Vᵢ terms are fixed double chains over exact
    * integer products (pairwise products ≤ n² stay inside int64; the
    * n³ variance denominator is built double-first), quantized 1e-9
    * BEFORE the order-free decimal(38,0) rollup; ratios are half-up
    * micro divisions in decimal. Singleton strata (nᵢ < 2) contribute
    * their true zero variance; χ² collapses to 0 when the continuity
    * correction exceeds |Σ(aᵢ−Eᵢ)| (the classic convention).
    *
    * Scale shape: ONE fact-grain hash aggregate to restaurant strata,
    * one constant-size rollup — no window, no join. */
  def cmhLoyaltyOption(orderRevenue: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = orderRevenue
      .groupBy(col("restaurant_id"))
      .agg(
        sum(when(col("is_loyalty") && col("option_price") > 0, 1L)
          .otherwise(0L)).as("a"),
        sum(when(col("is_loyalty") && !(col("option_price") > 0), 1L)
          .otherwise(0L)).as("b"),
        sum(when(!col("is_loyalty") && col("option_price") > 0, 1L)
          .otherwise(0L)).as("c"),
        sum(when(!col("is_loyalty") && !(col("option_price") > 0), 1L)
          .otherwise(0L)).as("d"))
      .withColumn("n", col("a") + col("b") + col("c") + col("d"))
      .withColumn("rq", round(col("a").cast("double") * col("d") / col("n")
        * 1e9).cast("long"))
      .withColumn("sq", round(col("b").cast("double") * col("c") / col("n")
        * 1e9).cast("long"))
      .withColumn("eq", round((col("a").cast("double")
          - ((col("a") + col("b")) * (col("a") + col("c"))).cast("double")
            / col("n")) * 1e9).cast("long"))
      .withColumn("vq", when(col("n") > 1,
        round(((col("a") + col("b")) * (col("c") + col("d"))).cast("double")
          * ((col("a") + col("c")) * (col("b") + col("d"))).cast("double")
          / (col("n").cast("double") * col("n") * (col("n") - 1))
          * 1e9).cast("long")).otherwise(0L))
    val roll = cells.agg(
      count(lit(1)).as("n_strata"),
      sum(col("a")).as("ta"), sum(col("b")).as("tb"),
      sum(col("c")).as("tc"), sum(col("d")).as("td"),
      sum(col("rq").cast(dec)).as("sr"), sum(col("sq").cast(dec)).as("ss"),
      sum(col("eq").cast(dec)).as("se"), sum(col("vq").cast(dec)).as("sv"))
    roll
      .withColumn("sed", col("se").cast("double") / 1e9)
      .withColumn("svd", col("sv").cast("double") / 1e9)
      .withColumn("chi2q", when(col("svd") > 0.0 && abs(col("sed")) > 0.5,
        round((abs(col("sed")) - 0.5) * (abs(col("sed")) - 0.5) / col("svd")
          * 1e6).cast("long")).otherwise(0L))
      .withColumn("x", sqrt(col("chi2q") / lit(2e6)))
      .withColumn("tt", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("x")))
      .withColumn("pu",
        round(((((lit(1.061405429) * col("tt") - lit(1.453152027)) * col("tt")
            + lit(1.421413741)) * col("tt") - lit(0.284496736)) * col("tt")
            + lit(0.254829592)) * col("tt")
          * exp(-(col("x") * col("x"))) * 1e9).cast("long"))
      .select(col("n_strata"),
        when(col("ss") > 0,
          expr("((sr * 1000000 * 2 + ss) div (ss * 2))").cast("double")
            / 1e6).as("or_cmh"),
        when(col("tb").cast(dec) * col("tc") > 0,
          expr(s"""((cast(ta as $dec) * td * 1000000 * 2
                    + cast(tb as $dec) * tc)
                   div (cast(tb as $dec) * tc * 2))""").cast("double")
            / 1e6).as("or_crude"),
        (col("chi2q") / 1e6).as("chi2_cmh"),
        (col("pu") / 1e9).as("p_value"))
  }

  /** McNemar's test of paired activity change across the two halves of
    * the timeline — the PAIRED companion to the two-sample tiers: each
    * user is their own control, so "did the population's activity
    * pattern shift?" is asked only of the DISCORDANT users (active
    * early-only b vs late-only c); concordant users carry no signal
    * and drop out of the statistic by construction.
    * χ² = (|b−c|−1)²∕(b+c) with the continuity correction (collapsing
    * to 0 when |b−c| ≤ 1, the classic convention), p via the shared
    * A&S chain.
    *
    * Exactness: the midpoint is exact integer date arithmetic; b, c
    * are exact counts; the χ² numerator is an exact integer; one
    * quantized division then the p chain.
    *
    * Scale shape: one scalar span aggregate returning via broadcast,
    * one user-grain hash aggregate, one cell rollup. */
  def mcnemarActivityShift(orderRevenue: DataFrame): DataFrame = {
    val span = orderRevenue.agg(
      min(col("creation_date")).as("d0"), max(col("creation_date")).as("d1"))
      .select(date_add(col("d0"),
        (datediff(col("d1"), col("d0")) / 2).cast("int")).as("mid"))
    val cells = orderRevenue.select(col("user_id"), col("creation_date"))
      .crossJoin(broadcast(span))
      .groupBy(col("user_id"))
      .agg(max(when(col("creation_date") <= col("mid"), 1L).otherwise(0L))
          .as("h1"),
        max(when(col("creation_date") > col("mid"), 1L).otherwise(0L))
          .as("h2"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("h1") === 1L && col("h2") === 1L, 1L).otherwise(0L))
          .as("n_both"),
        sum(when(col("h1") === 1L && col("h2") === 0L, 1L).otherwise(0L))
          .as("b"),
        sum(when(col("h1") === 0L && col("h2") === 1L, 1L).otherwise(0L))
          .as("c"))
    cells
      .withColumn("chi2q", when(col("b") + col("c") > 0
          && abs(col("b") - col("c")) > 1,
        round((abs(col("b") - col("c")) - 1).cast("double")
          * (abs(col("b") - col("c")) - 1) / (col("b") + col("c")) * 1e6)
          .cast("long")).otherwise(0L))
      .withColumn("x", sqrt(col("chi2q") / lit(2e6)))
      .withColumn("tt", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("x")))
      .withColumn("pu",
        round(((((lit(1.061405429) * col("tt") - lit(1.453152027)) * col("tt")
            + lit(1.421413741)) * col("tt") - lit(0.284496736)) * col("tt")
            + lit(0.254829592)) * col("tt")
          * exp(-(col("x") * col("x"))) * 1e9).cast("long"))
      .select(col("n_users"), col("n_both"), col("b").as("early_only"),
        col("c").as("late_only"), (col("chi2q") / 1e6).as("chi2"),
        (col("pu") / 1e9).as("p_value"))
  }

  /** Exact (unbinned) two-sample Kolmogorov–Smirnov test of user
    * spend, loyal-leaning vs other users — the DISTRIBUTION-level
    * companion to the Mann–Whitney location test and the binned
    * [[graft.ext.Drift.ksBinned]] screen: D is the max ECDF gap over
    * the exact value grain (no bin coarsening), and the asymptotic
    * Kolmogorov p arrives through the truncated alternating series
    * 2Σ(−1)^{k−1}e^{−2k²λ²} (k ≤ 5 — the next term is < 10⁻³⁹ for any
    * λ the gate can produce) with Stephens' small-sample λ correction
    * (√nₑ + 0.12 + 0.11∕√nₑ)·D.
    *
    * Exactness: D is an EXACT rational — the max over values of
    * |K₁·n − K₂·m| over exact cumulative counts, divided once at the
    * end (half-up micro in decimal) — no per-row CDF doubles; λ and
    * the series are fixed double chains quantized 1e-6∕1e-9. A user
    * is "loyal-leaning" when strictly more than half their lines are
    * loyalty (the deterministic integer compare 2·nl > n).
    *
    * Scale shape: fact → user hash aggregate → value-grain aggregate;
    * the one unpartitioned cumulative window runs on DISTINCT user
    * spend values (entity-bounded, above a hash aggregate — the
    * total-order audit's envelope); scalars return via broadcast. */
  def ksLoyaltySpend(orderRevenue: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val users = orderRevenue.groupBy(col("user_id"))
      .agg(sum(round(col("total_revenue") * 10000).cast("long")).as("cents"),
        sum(when(col("is_loyalty"), 1L).otherwise(0L)).as("nl"),
        count(lit(1)).as("nn"))
      .select(col("cents"), (col("nl") * 2 > col("nn")).as("loyal"))
    val vals = users.groupBy(col("cents"))
      .agg(sum(when(col("loyal"), 1L).otherwise(0L)).as("c1"),
        sum(when(!col("loyal"), 1L).otherwise(0L)).as("c2"))
      // the cumulative window and the totals both read it
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.CacheLifecycle.unpersistAfterNextAction(vals)
    val w = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = vals.agg(sum(col("c1")).as("m"), sum(col("c2")).as("n"))
    vals
      .select(sum(col("c1")).over(w).as("k1"),
        sum(col("c2")).over(w).as("k2"))
      .crossJoin(broadcast(tot))
      .select(abs(col("k1").cast(dec) * col("n")
        - col("k2").cast(dec) * col("m")).as("diff"), col("m"), col("n"))
      .groupBy(col("m"), col("n")).agg(max(col("diff")).as("maxd"))
      .withColumn("dq", expr(s"""((maxd * 1000000 * 2)
          + cast(m as $dec) * n) div (cast(m as $dec) * n * 2)""")
        .cast("long"))
      .withColumn("ne",
        col("m").cast("double") * col("n") / (col("m") + col("n")))
      .withColumn("lam", round((sqrt(col("ne")) + lit(0.12)
        + lit(0.11) / sqrt(col("ne"))) * (col("dq") / 1e6) * 1e6)
        .cast("long"))
      .withColumn("l2", (col("lam") / 1e6) * (col("lam") / 1e6))
      .withColumn("pu", round(greatest(least(lit(2.0)
        * (exp(lit(-2.0) * col("l2")) - exp(lit(-8.0) * col("l2"))
          + exp(lit(-18.0) * col("l2")) - exp(lit(-32.0) * col("l2"))
          + exp(lit(-50.0) * col("l2"))), lit(1.0)), lit(0.0)) * 1e9)
        .cast("long"))
      .select(col("m").as("n_loyal_users"), col("n").as("n_other_users"),
        (col("dq") / 1e6).as("ks_d"), (col("lam") / 1e6).as("lambda"),
        (col("pu") / 1e9).as("p_value"))
  }

  /** Poisson(1) inverse-CDF thresholds in [[graft.functions.Portable.h60]]
    * units: a uniform h ∈ [0, 2⁶⁰) maps to weight w = #{k : h ≥ t_k},
    * so P(w = k) = e⁻¹∕k! for k ≤ 8 (the tail above k = 9 — total mass
    * ~3·10⁻⁶ — truncates to 9; both engines truncate identically, so
    * the bootstrap distribution is exactly shared even where it is
    * approximately Poisson). Computed ONCE driver-side over exact
    * factorials; the integer literals are the cross-engine contract. */
  val PoissonThresholds: Seq[Long] = {
    val p0 = math.exp(-1.0)
    val scale = math.pow(2.0, 60)
    (0 to 8).scanLeft((0.0, 1.0)) { case ((cdf, fact), k) =>
      (cdf + p0 / fact, fact * (k + 1))
    }.tail.map { case (cdf, _) => math.rint(cdf * scale).toLong }
  }

  /** Poisson-bootstrap CI for mean user spend per loyalty arm — the
    * distribution-free companion to [[jackknifeMeanCI]] (whose delta
    * method assumes near-normality the heavy revenue tail can break)
    * and to [[mdeReadout]]'s parametric band. Each user contributes an
    * independent Poisson(1) resample weight per replicate, derived
    * from the portable salted hash of (salt, replicate, user) — the
    * streaming-friendly bootstrap (Chamandy et al., Google 2012) that
    * never materializes a resampled dataset and is bit-reproducible on
    * any engine, partitioning, or row order. The CI is the nearest-rank
    * 5th∕95th percentile of the replicate means.
    *
    * Exactness: spends ride as integral 1e-4 units; weights are exact
    * integers from [[PoissonThresholds]] h60 comparisons; replicate
    * sums accumulate in decimal(38,0) (HUGEINT mirror — the 100 TB
    * envelope: Σ 9·x over 10¹⁰ users brushes int64); each replicate
    * mean is the half-up micro ratio; rank selection breaks mu ties by
    * replicate id.
    *
    * Scale shape: ONE user-grain hash aggregate feeds both the point
    * estimate and the replicate frame; the explode is ×reps on the
    * USER-grain frame (never the raw fact), the replicate shuffle key
    * is (arm, replicate) = 2·reps groups with map-side partials, and
    * the rank window runs on ≤ reps rows per arm. The only data-sized
    * costs are the per-user aggregate and reps hash evaluations per
    * user — the documented price of any bootstrap. */
  def poissonBootstrapCI(
      orderRevenue: DataFrame, reps: Int = 100,
      salt: String = "boot"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(reps >= 20, "reps must be at least 20 for a 5th/95th CI")
    val loRank = math.ceil(0.05 * reps).toLong
    val hiRank = math.ceil(0.95 * reps).toLong
    val cents = graft.gold.Money.cents(col("total_revenue")).cast("long")
    val perUser = orderRevenue
      .groupBy(col("user_id"))
      .agg(max(when(col("is_loyalty"), 1L).otherwise(0L)).as("arm"),
        sum(cents).as("x"))
      // both the point estimate and the ×reps replicate frame read
      // this user-grain aggregate; without the persist each would
      // re-scan the fact
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.CacheLifecycle.unpersistAfterNextAction(perUser)
    val point = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x").cast("decimal(38,0)")).as("sx"))
      .select(col("arm"), col("n_users"),
        (expr("((sx * 100 * 2) + n_users) div (n_users * 2)") / 1e6)
          .as("mean_spend"))
    val wExpr = PoissonThresholds.foldLeft(lit(0L)) { (acc, t) =>
      acc + when(col("h") >= t, 1L).otherwise(0L)
    }
    val repMeans = perUser
      .select(col("arm"), col("user_id"), col("x"),
        explode(sequence(lit(0), lit(reps - 1))).as("b"))
      .withColumn("h", graft.functions.Portable.h60(concat_ws("#",
        lit(salt), col("b").cast("string"), col("user_id").cast("string"))))
      .withColumn("w", wExpr)
      .groupBy(col("arm"), col("b"))
      .agg(sum(col("w")).as("sw"),
        sum((col("w") * col("x")).cast("decimal(38,0)")).as("swx"))
      // an all-zero-weight replicate (probability e^{-n} per arm) has
      // no mean; both engines drop it before ranking
      .filter(col("sw") > 0)
      .withColumn("mu", expr("((swx * 100 * 2) + sw) div (sw * 2)"))
    val rw = Window.partitionBy(col("arm")).orderBy(col("mu"), col("b"))
    val ci = repMeans
      .withColumn("rn", row_number().over(rw))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n_reps"),
        min(when(col("rn") === loRank, col("mu"))).as("lo_u"),
        min(when(col("rn") === hiRank, col("mu"))).as("hi_u"))
    point.join(ci, Seq("arm"))
      .select(col("arm"), col("n_users"), col("mean_spend"),
        (col("lo_u") / 1e6).as("ci_lo"),
        (col("hi_u") / 1e6).as("ci_hi"),
        col("n_reps"))
      .orderBy(col("arm"))
  }
}
