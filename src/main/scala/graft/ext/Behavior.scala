package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over the event stream: cohort retention and
  * ordered-step funnels. Extends the reference's user-grain marts (RFM
  * `scripts/cdc_metrics_job_gold.py:108-126`, churn `:147-183`) with the
  * two standard event-sequence marts they stop short of.
  *
  * Scale shape: both operators reduce the event log to per-user
  * aggregates first (map-side-combinable hash aggregates keyed on
  * user_id), then join user-grain frames — never event×event. The
  * retention matrix is (cohorts × offsets), mart-sized; the funnel is one
  * row per entered user.
  */
object Behavior {

  /** Weekly cohort retention: users bucketed by first-activity week
    * (Monday-start), counted once per (cohort, week-offset) they were
    * active in.
    *
    * Two shuffles at event grain ((user, week) distinct + cohort min —
    * AQE-coalesced), then user-grain join and mart-grain count. */
  def retentionWeekly(events: DataFrame): DataFrame = {
    val weeks = events
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
    val cohorts = weeks.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    weeks.join(cohorts, Seq("user_id"))
      .withColumn("week_offset",
        (datediff(col("week"), col("cohort_week")) / 7).cast("int"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Ordered three-step funnel (strictly increasing timestamps):
    * first `step1` → first `step2` after it → first `step3` after that.
    * One row per user who entered the funnel, with per-stage timestamps
    * (NULL once the user drops out) and the stage count reached.
    *
    * Each stage is filter → per-user min-timestamp hash aggregate →
    * user-grain left join: linear scans, no window sorts, no
    * event-grain joins. */
  def funnel(
      events: DataFrame,
      step1: String = "signup", step2: String = "view", step3: String = "purchase")
      : DataFrame = {
    val s1 = events.filter(col("event_type") === step1)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = events.filter(col("event_type") === step2)
      .join(s1, Seq("user_id"))
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = events.filter(col("event_type") === step3)
      .join(s2, Seq("user_id"))
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    s1.join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"),
        col("t1").as(s"${step1}_ts"),
        col("t2").as(s"${step2}_ts"),
        col("t3").as(s"${step3}_ts"),
        when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2)
          .otherwise(1).as("stage_reached"))
  }

  /** First-order event-type transition matrix: per (from, to) pair of
    * consecutive events of one user, the transition count and its
    * probability among all transitions leaving `from` — sequence mining
    * over the event log (the Markov layer under next-event prediction
    * and funnel discovery). Consecutive = by (ts, event_id) — the id
    * tie-break makes simultaneous events a total order, so the chain is
    * deterministic.
    *
    * One window sort per user (the unavoidable sequence shuffle), then
    * mart-sized aggregates; probability = count over a window sum, no
    * second pass. */
  def transitions(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val steps = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
    val counts = steps.groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val wFrom = org.apache.spark.sql.expressions.Window.partitionBy(col("from_type"))
    counts.withColumn("p_transition",
      round(col("n_transitions") / sum(col("n_transitions")).over(wFrom), 6))
  }

  /** Ordered event-type path per session (the first `k` steps, joined
    * with '>') — the sequence feature a funnel/intent model consumes.
    * Ordering inside `collect_list` is partition-dependent, so the
    * aggregate collects (ts, event_id, type) STRUCTS and sorts them
    * after the fact — `sort_array` on structs orders by field position,
    * and (ts, event_id) is a total order, making the path deterministic
    * on any layout.
    *
    * One `session_window` aggregate (same shuffle as sessionization);
    * per-group state is the session's events — bounded by the session
    * gap, the same envelope any session aggregate carries. */
  def sessionPaths(
      events: DataFrame, gapMinutes: Int = 30, k: Int = 5): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(
        count(lit(1)).as("n_events"),
        sort_array(collect_list(
          struct(col("ts"), col("event_id"), col("event_type")))).as("__evs"))
      .select(
        col("user_id"),
        col("sw.start").as("session_start"),
        concat_ws(">",
          transform(slice(col("__evs"), 1, k), e => e.getField("event_type")))
          .as("path"),
        col("n_events"))

  /** First/last-touch attribution: for every purchase, the earliest and
    * latest NON-purchase event of the same user inside a trailing
    * lookback window — the credit-assignment mart of campaign analytics
    * (first touch = acquisition channel, last touch = conversion
    * trigger).
    *
    * Shape: one window over the unioned event stream, NOT a
    * purchase×touch range join — the range frame (in epoch micros)
    * slides over each user's timeline once, so cost is one shuffle on
    * user_id regardless of touch density; the oracle cross-checks with
    * the naive BETWEEN join. Determinism: candidate touches reduce via
    * min/max over a (ts, event_id, type) struct — total order, no
    * first()/last() physical-row dependence; a purchase with no touch
    * in window keeps NULL attribution (it is still a conversion). */
  def attribution(events: DataFrame, lookbackDays: Int = 7): DataFrame = {
    val lookbackMicros = lookbackDays * 86400L * 1000000L
    val base = events.select(
      col("user_id"), col("event_id"), col("event_type"), col("ts"),
      unix_micros(col("ts")).as("tsu"))
    val tagged = base.withColumn("touch",
      when(col("event_type") =!= "purchase",
        struct(col("tsu").as("t"), col("event_id").as("id"),
          col("event_type").as("ty"))))
    val w = Window.partitionBy(col("user_id")).orderBy(col("tsu"))
      .rangeBetween(-lookbackMicros, 0)
    tagged
      .withColumn("first_touch", min(col("touch")).over(w))
      .withColumn("last_touch", max(col("touch")).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"),
        col("first_touch.id").as("first_touch_id"),
        col("first_touch.ty").as("first_touch_type"),
        col("last_touch.id").as("last_touch_id"),
        col("last_touch.ty").as("last_touch_type"))
  }

  /** Per-user sequence log-likelihood under the corpus's own
    * first-order Markov model ([[transitions]]) — users whose event
    * order is improbable under the global transition matrix surface
    * with a high average negative log-likelihood: the behavioral-
    * anomaly / bot-detection score a sequence model starts from.
    *
    * Exactness: transition probabilities are ratios of exact counts;
    * each DISTINCT transition's log gets quantized ONCE to integer
    * 1e-9 units (ln of identical doubles agrees across engines — the
    * q76 LM-score precedent), so per-user totals are order-free
    * integer sums; the final average is one fixed IEEE chain.
    *
    * Shape: one window sort per user (the unavoidable sequence
    * shuffle, shared with [[transitions]]), a mart-sized (|types|²)
    * broadcast of the log-prob matrix, and a per-user hash aggregate.
    * The step frame is persisted: it feeds both the matrix and the
    * per-user join, and Catalyst does not share subplans. */
  def sequenceLikelihood(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val steps = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .select(col("user_id"), col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = steps.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_ft"))
    val tot = m.groupBy(col("from_type")).agg(sum(col("n_ft")).as("n_f"))
    val lp = m.join(broadcast(tot), Seq("from_type"))
      .withColumn("lp_units",
        round(log(col("n_ft").cast("double") / col("n_f").cast("double"))
          * 1e9).cast("long"))
      .select(col("from_type"), col("to_type"), col("lp_units"))
    steps.join(broadcast(lp), Seq("from_type", "to_type"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_transitions"),
        sum(col("lp_units")).as("loglik_units"))
      .select(
        col("user_id"), col("n_transitions"), col("loglik_units"),
        ((col("loglik_units").cast("double") / lit(-1.0e9))
          / col("n_transitions").cast("double")).as("avg_nll"))
  }

  /** Funnel conversion rates with Wilson 95% confidence intervals:
    * per transition, entrants, conversions, the raw rate, and the
    * score-interval bounds — the uncertainty-aware readout a growth
    * dashboard needs before comparing funnels of different sizes.
    *
    * Exactness: counts are exact integers; rate and the Wilson bounds
    * are fixed IEEE chains over them with the z = 1.96 literal,
    * mirrored parenthesis-for-parenthesis (z² stays the expression
    * 1.96 * 1.96 on both engines — never a pre-squared decimal, whose
    * parse could differ from the IEEE product). Mart-grain output. */
  def funnelConversion(
      events: DataFrame,
      step1: String = "signup", step2: String = "view", step3: String = "purchase")
      : DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val f = funnel(events, step1, step2, step3)
    val counts = f.agg(
      count(col(s"${step1}_ts")).as("n1"),
      count(col(s"${step2}_ts")).as("n2"),
      count(col(s"${step3}_ts")).as("n3"))
    val pairs = counts.select(
      lit(s"$step1>$step2").as("transition"),
      col("n1").as("n_entered"), col("n2").as("n_converted"))
      .unionByName(counts.select(lit(s"$step2>$step3").as("transition"),
        col("n2").as("n_entered"), col("n3").as("n_converted")))
    val n = col("n_entered").cast("double")
    val x = col("n_converted").cast("double")
    val z = lit(1.96)
    val z2 = z * z
    val phat = x / n
    val denom = lit(1.0) + z2 / n
    val centerNum = phat + z2 / (lit(2.0) * n)
    val rad = z * sqrt(phat * (lit(1.0) - phat) / n
      + z2 / (lit(4.0) * n * n))
    pairs.select(
      col("transition"), col("n_entered"), col("n_converted"),
      when(col("n_entered") === 0L, lit(null).cast("double"))
        .otherwise(phat).as("conv_rate"),
      when(col("n_entered") === 0L, lit(null).cast("double"))
        .otherwise((centerNum - rad) / denom).as("wilson_lo"),
      when(col("n_entered") === 0L, lit(null).cast("double"))
        .otherwise((centerNum + rad) / denom).as("wilson_hi"))
  }

  /** Time-to-convert quantiles per funnel transition: the exact
    * nearest-rank p25/p50/p75/p90 (plus pair count) of the latency, in
    * whole seconds, between consecutive completed [[funnel]] stages —
    * the "how long does conversion take" readout next to the funnel's
    * "how many convert".
    *
    * Exact discrete spec, no interpolation: quantile q is the value at
    * position ⌈q·n/100⌉ = (q·n + 99) div 100 of the sorted latencies —
    * pure integer arithmetic, so both engines pick the identical
    * element (ties in the latency value cannot diverge: the value at a
    * position is tie-order-independent).
    *
    * Scale shape: latencies reduce to a (transition, second) histogram
    * FIRST (hash aggregate, map-side combine); the cumulative count is
    * a window over DISTINCT seconds partitioned by transition — its
    * grain is bounded by the clock span of the funnel in seconds, not
    * by row count, so it does not grow with data volume; the
    * position→value probe joins the mart-sized quantile targets
    * against the histogram. No user-grain window anywhere. */
  def funnelLatencyQuantiles(
      events: DataFrame,
      step1: String = "signup", step2: String = "view", step3: String = "purchase",
      quantiles: Seq[Int] = Seq(25, 50, 75, 90)): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val f = funnel(events, step1, step2, step3)
    val lat = f.filter(col(s"${step2}_ts").isNotNull)
      .select(lit(s"$step1>$step2").as("transition"),
        (unix_timestamp(col(s"${step2}_ts"))
          - unix_timestamp(col(s"${step1}_ts"))).as("sec"))
      .unionByName(f.filter(col(s"${step3}_ts").isNotNull)
        .select(lit(s"$step2>$step3").as("transition"),
          (unix_timestamp(col(s"${step3}_ts"))
            - unix_timestamp(col(s"${step2}_ts"))).as("sec")))
    val hist = lat.groupBy(col("transition"), col("sec"))
      .agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum", sum(col("c")).over(
      Window.partitionBy(col("transition")).orderBy(col("sec"))))
    val targets = hist.groupBy(col("transition"))
      .agg(sum(col("c")).as("n_pairs"))
      .crossJoin(quantiles.toDF("quantile"))
      .withColumn("tgt", expr("(quantile * n_pairs + 99) div 100"))
    cum.join(broadcast(targets), Seq("transition"))
      .filter(col("cum") >= col("tgt"))
      .groupBy(col("transition"), col("quantile").cast("long").as("quantile"),
        col("n_pairs"))
      .agg(min(col("sec")).as("latency_sec"))
      .select(col("transition"), col("quantile"), col("n_pairs"),
        col("latency_sec"))
  }

  /** Event-time debounce (rolling throttle): per (user, event_type),
    * keep the first event, then suppress every event closer than
    * `deltaSeconds` to the LAST KEPT one — the retry/burst collapse an
    * ingest pipeline applies before counting. Unlike a tumbling bucket
    * (floor(ts/Δ)), the window restarts at each kept event, so the
    * contract is inherently sequential: whether an event survives
    * depends on which earlier events survived.
    *
    * That sequential dependency is exactly what windows/aggregates
    * cannot express, so this is the secondary-sort pattern done the
    * scale-right way: hash-repartition on the key, sort WITHIN each
    * partition by (key, ts, id) — a partition-local spillable sort, no
    * global exchange — then one streaming `mapPartitions` pass that
    * never materializes a group. State is two longs per open key; ties
    * break on event_id so the kept set is deterministic. The DuckDB
    * oracle recomputes the same recurrence as a recursive CTE. */
  def debounce(events: DataFrame, deltaSeconds: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val deltaMicros = deltaSeconds * 1000000L
    val sorted = events
      .select(col("user_id").cast("long").as("user_id"),
        col("event_type").cast("string").as("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("tsu"),
        col("event_id").cast("long").as("event_id"))
      .repartition(col("user_id"), col("event_type"))
      .sortWithinPartitions(col("user_id"), col("event_type"),
        col("tsu"), col("event_id"))
      .as[(Long, String, Long, Long)]
    sorted.mapPartitions { it =>
      var curUser = Long.MinValue
      var curType: String = null
      var lastKept = Long.MinValue
      it.flatMap { case row @ (u, t, tsu, _) =>
        val newKey = u != curUser || t != curType
        if (newKey || tsu >= lastKept + deltaMicros) {
          curUser = u; curType = t; lastKept = tsu
          Some(row)
        } else None
      }
    }.toDF("user_id", "event_type", "tsu", "event_id")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("tsu")).as("ts"), col("event_id"))
  }
}
