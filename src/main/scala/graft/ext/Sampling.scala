package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Deterministic sampling / splitting for training-data curation.
  *
  * Spark's `df.sample`/`randomSplit` are seed-dependent AND
  * partitioning-dependent (per-partition RNG streams), so the same call
  * on the same data reshuffled yields a different sample — useless as a
  * reproducible train/val/test contract at 100 TB, where partitioning is
  * never stable. Both operators here derive membership from a portable
  * content hash ([[Portable.h60]]) of the row's id: the assignment is a
  * pure function of the data, identical on any cluster layout, any
  * engine (the DuckDB oracle recomputes it), and stable across reruns —
  * the property a dataset-versioning pipeline actually needs.
  */
object Sampling {

  /** Hash bucket in [0, buckets) for an id column, salted so different
    * splits/samples of the same table decorrelate. */
  def hashBucket(idCol: Column, salt: String, buckets: Int = 100): Column =
    Portable.h60(concat(lit(salt + ":"), idCol.cast("string"))) % buckets

  /** SQL mirror of [[hashBucket]]. */
  def hashBucketSql(idExpr: String, salt: String, buckets: Int = 100): String =
    s"${Portable.h60Sql(s"'$salt:' || CAST($idExpr AS VARCHAR)")} % $buckets"

  /** Deterministic train/val/test assignment: hash-bucket the id into
    * percent space; [0,trainPct) → train, [trainPct,trainPct+valPct) →
    * val, rest → test. A pure projection — no shuffle, no state; at any
    * scale the split is a scan-time filter and prunes nothing less than
    * a stored split column would. */
  def hashSplit(
      df: DataFrame, idCol: String,
      trainPct: Int = 80, valPct: Int = 10, salt: String = "split"): DataFrame =
    df.withColumn("bucket", hashBucket(col(idCol), salt))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))

  /** Deterministic mixture sampling: keep each group's rows at that
    * group's rate — the source/language re-weighting step of a training
    * mix (e.g. temperature-scaled per-language rates). Membership is a
    * pure hash function of the id (same contract as [[hashSplit]]), so
    * the mix is reproducible on any layout and any engine; groups
    * without a configured rate fall back to `defaultRate`.
    *
    * A pure projection — the rate lookup is a literal CASE chain, no
    * join, no shuffle; at 100 TB the filter runs at scan time. Rates are
    * resolved at 1e-6 granularity (`rate * 1e6` over a [0, 1e6) hash
    * space), exactly mirrored by the SQL oracle. */
  def mixtureSample(
      df: DataFrame, groupCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = "mix"): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val h = Portable.h60(concat(lit(salt + ":"), col(idCol).cast("string"))) % 1000000L
    val rate = rates.foldLeft(lit((defaultRate * 1e6).toLong)) {
      case (acc, (g, r)) =>
        when(col(groupCol) === g, lit((r * 1e6).toLong)).otherwise(acc)
    }
    df.filter(h < rate)
  }

  /** SQL mirror of [[mixtureSample]]'s keep predicate. Group keys and
    * the salt are embedded as SQL string literals, so single quotes are
    * doubled — an apostrophe in a source name must not break (or
    * redirect) the oracle SQL. */
  def mixtureSampleSql(
      groupExpr: String, idExpr: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = "mix"): String = {
    def lit(s: String): String = s.replace("'", "''")
    val h = s"${Portable.h60Sql(s"'${lit(salt)}:' || CAST($idExpr AS VARCHAR)")} % 1000000"
    val cases = rates.toSeq.sortBy(_._1)
      .map { case (g, r) => s"WHEN $groupExpr = '${lit(g)}' THEN ${(r * 1e6).toLong}" }
      .mkString(" ")
    s"$h < (CASE $cases ELSE ${(defaultRate * 1e6).toLong} END)"
  }

  /** Exact-size stratified sample: the `k` rows of each stratum with the
    * smallest salted id-hash (ties broken by id) — a deterministic
    * "random" k-per-group sample, reproducible on any layout.
    *
    * The rank is a per-stratum window sort; at 100 TB with mart-sized
    * strata this is one shuffle on the stratum key. For huge strata swap
    * the window for the bounded-heap top-k aggregate
    * ([[graft.functions.TopKAggregate]]) — same result, no full sort. */
  def stratifiedSample(
      df: DataFrame, stratumCol: String, idCol: String,
      k: Int, salt: String = "sample"): DataFrame = {
    val h = Portable.h60(concat(lit(salt + ":"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(stratumCol)).orderBy(h.asc, col(idCol).asc)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Temporal-split leakage audit: split a fact at a date cutoff and
    * report, per key, whether it appears only before, only after, or on
    * BOTH sides — the entity-overlap check an evaluation split must
    * pass before metrics mean anything (a user in both train and test
    * leaks their behavior across the boundary; time-based splits
    * guarantee no ROW overlap but say nothing about entities).
    *
    * One hash aggregate to key grain (min/max date + side counts);
    * the output is key-sized. The summary a release gate would assert
    * on derives from this table (`GROUP BY leak_class`). A key whose
    * dates are ALL NULL falls on neither side (`n_before = n_after =
    * 0`) and is labeled `no_dates`, never `test_only` — an audit
    * consumers act on must not lump unknowable keys into a real
    * class. */
  def temporalLeakage(
      df: DataFrame, keyCol: String, dateCol: String,
      cutoff: String): DataFrame = {
    val c = lit(cutoff).cast("date")
    df.groupBy(col(keyCol))
      .agg(
        sum(when(col(dateCol) < c, 1L).otherwise(0L)).as("n_before"),
        sum(when(col(dateCol) >= c, 1L).otherwise(0L)).as("n_after"),
        min(col(dateCol)).cast("date").as("first_date"),
        max(col(dateCol)).cast("date").as("last_date"))
      .withColumn("leak_class",
        when(col("n_before") > 0 && col("n_after") > 0, "both")
          .when(col("n_before") > 0, "train_only")
          .when(col("n_after") > 0, "test_only")
          .otherwise("no_dates"))
  }

  /** Deterministic WEIGHTED sampling by repeated hashing: a row with
    * integer weight w draws w independent salted hashes and competes
    * with its minimum; the sample is the k smallest minima. Selection
    * probability rises with w (the min of w uniform draws is
    * stochastically smaller), yet everything stays exact integer
    * arithmetic — reproducible on any engine/partitioning, unlike
    * float `pow(u, 1/w)` A-ES keys, whose cross-engine rounding can
    * flip near-ties.
    *
    * Scale shape: the explode fans each row into its draw count, so
    * total work is O(Σ min(w, maxDraws)) — with the default UNCAPPED
    * maxDraws that is O(Σ w), exact but only safe when weights are
    * small integers (priorities, not magnitudes: a single weight of
    * 10⁶ becomes 10⁶ rows). For large-weight domains set `maxDraws`:
    * fan-out is then bounded per row, the result is IDENTICAL to the
    * exact mode whenever every weight ≤ maxDraws (same draws, same
    * hashes — SamplingSpec pins this), and above the cap selection
    * probability saturates at min-of-maxDraws (rows with w > maxDraws
    * compete as equals; rank the cap large enough that saturation is
    * acceptable, e.g. 64 ⇒ P(selected) within 2⁻⁶⁴-ish of the w→∞
    * limit). The per-id min is a hash aggregate with map-side
    * partials, and the global top-k is sort+limit — Spark's
    * TakeOrdered, a per-partition heap + driver merge of k rows, never
    * a global sort. The final rank window runs on k rows. */
  def weightedSample(
      df: DataFrame, idCol: String, weight: Column, k: Int,
      salt: String = "wsample", maxDraws: Long = Long.MaxValue): DataFrame = {
    require(maxDraws >= 1, "maxDraws must be positive")
    val drawn = df
      .withColumn("weight", weight.cast("long"))
      .withColumn("__copy",
        explode(sequence(lit(1L), least(col("weight"), lit(maxDraws)))))
      .withColumn("__draw", Portable.h60(concat_ws("#",
        lit(salt), col(idCol).cast("string"), col("__copy").cast("string"))))
      .groupBy(col(idCol), col("weight"))
      .agg(min(col("__draw")).as("draw"))
      .orderBy(col("draw"), col(idCol))
      .limit(k)
    drawn.withColumn(
      "sample_rank",
      row_number().over(Window.orderBy(col("draw"), col(idCol))))
  }

  /** Cross-split near-duplicate contamination audit: how many
    * near-duplicate pairs ([[Dedup.minhashNearDups]]'s LSH tier)
    * STRADDLE the train/val/test boundary of [[hashSplit]] — the
    * leakage [[temporalLeakage]] cannot see, because a near-copy of a
    * training document sitting in test inflates eval without sharing a
    * key or a timestamp. One row per unordered split pair with its
    * pair count; `is_leak` marks the cross-split rows a release gate
    * would assert empty (or re-assign: move each leaked pair's
    * lower-id doc's duplicates into its split).
    *
    * Shape: the banded LSH self-join is the whole cost (its persist /
    * asymmetry arguments live on [[Dedup.minhashNearDups]]); split
    * labels are a pure hash projection joined at pair grain, and the
    * final aggregate is at most split² rows. Nothing new scales with
    * the corpus. */
  def splitContamination(
      docs: DataFrame, idCol: String, textCol: String,
      trainPct: Int = 80, valPct: Int = 10, salt: String = "split",
      numPerms: Int = 16, bands: Int = 4, minEst: Double = 0.5): DataFrame = {
    val pairs = Dedup.minhashNearDups(docs, idCol, textCol, numPerms, bands, minEst)
    val splits = hashSplit(docs.select(col(idCol)), idCol, trainPct, valPct, salt)
      .select(col(idCol).as("id"), col("split"))
    pairs
      .join(splits.select(col("id").as("id_a"), col("split").as("split_a")),
        Seq("id_a"))
      .join(splits.select(col("id").as("id_b"), col("split").as("split_b")),
        Seq("id_b"))
      .groupBy(
        least(col("split_a"), col("split_b")).as("split_lo"),
        greatest(col("split_a"), col("split_b")).as("split_hi"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("split_lo"), col("split_hi"), col("n_pairs"),
        (col("split_lo") =!= col("split_hi")).as("is_leak"))
  }

  /** Neyman-optimal labeling-budget allocation: given strata (e.g.
    * corpus sources) and a cost-relevant size column, allocate a fixed
    * annotation `budget` proportionally to n_h·s_h (stratum size ×
    * stddev) — the variance-minimizing split a labeling campaign uses
    * instead of proportional sampling. The weights are quantized to
    * integer milli-units BEFORE the total, so the share and the
    * integer floor allocation are exact on both engines (a raw double
    * Σ n_h·s_h is summation-order-dependent). Allocations floor, so
    * Σ allocated ≤ budget by at most one unit per stratum — the
    * campaign's rounding slack, reported as-is.
    *
    * One stratum hash aggregate + a one-row broadcast total. */
  def neymanAllocation(
      df: DataFrame, stratumCol: String, sizeCol: String,
      budget: Int = 1000): DataFrame = {
    val m = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_h"),
        sum(col(sizeCol)).as("sy"),
        sum(col(sizeCol) * col(sizeCol)).as("syy"))
      .filter(col("n_h") > 1)
      .withColumn("s_h",
        sqrt((col("n_h").cast("double") * col("syy")
          - col("sy").cast("double") * col("sy"))
          / (col("n_h").cast("double") * (col("n_h") - lit(1.0)))))
      .withColumn("w",
        round(col("n_h").cast("double") * col("s_h") * 1000).cast("long"))
    val tot = m.agg(sum(col("w")).as("tw"))
    m.join(broadcast(tot))
      .filter(col("tw") > 0)
      .select(col("stratum"), col("n_h"),
        round(col("s_h"), 6).as("stddev"),
        round(col("w").cast("double") / col("tw"), 6).as("neyman_share"),
        expr(s"($budget * w) div tw").as("allocated"))
  }

  /** Temperature-scaled (α = ½) mixture weights per group: the
    * multilingual-pretraining resampling rule w_g ∝ n_g^α that upweights
    * small sources relative to proportional sampling (α=1 is
    * proportional, α=0 uniform; ½ is the common compromise). Output per
    * group: raw doc share, the α=½ share, and the boost ratio a sampler
    * feeds [[mixtureSample]] as its per-group rate multiplier.
    * Complementary to [[Curation.temperatureMixPlan]], which apportions
    * a fixed TOKEN budget across sources (Hamilton integer allocation at
    * token grain); this computes the DOC-grain sampling rates themselves
    * — the knob the row-level sampler consumes directly.
    *
    * α is FIXED at ½ because √ is the one fractional power IEEE defines
    * as correctly rounded — both engines' sqrt agree to the last bit,
    * while a general pow(x, α) may differ by an ulp and flip a rounded
    * edge. Each √n quantizes to integer 1e-6 units before the order-free
    * total; shares are integer half-up micro ratios; the boost divides
    * the two already-quantized shares (6dp at the edge).
    *
    * Shape: one hash aggregate to group grain, a one-row total
    * broadcast back — nothing scales past the first aggregate. */
  def temperatureWeights(df: DataFrame, groupCol: Column): DataFrame = {
    val g = df.groupBy(groupCol.as("grp")).agg(count(lit(1)).as("n_docs"))
      .withColumn("w", round(sqrt(col("n_docs")) * 1e6).cast("long"))
    val tot = g.agg(sum(col("n_docs")).as("nt"), sum(col("w")).as("wt"))
    g.crossJoin(broadcast(tot))
      .select(col("grp"), col("n_docs"),
        expr("((n_docs * 1000000 * 2 + nt) div (nt * 2)) " +
          "/ cast(1000000 as double)").as("doc_share"),
        expr("((w * 1000000 * 2 + wt) div (wt * 2)) " +
          "/ cast(1000000 as double)").as("temp_share"))
      .withColumn("boost",
        when(col("doc_share") > 0,
          round(col("temp_share") / col("doc_share"), 6)))
      .orderBy(col("grp"))
  }
}
