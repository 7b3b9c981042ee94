package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two dataset versions: the
  * Population Stability Index over shared equi-width bins — the gate a
  * dataset-versioning pipeline runs before swapping training snapshots
  * (PSI ≳ 0.2 conventionally flags a shifted feature).
  *
  * Bin edges derive from the BASELINE's min/max only (the versioning
  * contract: the old snapshot defines the reference frame), current
  * values outside the baseline range clamp into the edge bins, and both
  * sides get a +1 Laplace floor so empty bins keep the log ratio finite.
  *
  * Cross-engine exactness: bucket ids and the Laplace probabilities are
  * exact-integer-derived doubles; each bin's PSI term quantizes to
  * integral 1e-9 units before the total (float sums are order-dependent;
  * integer sums are not), and terms/total round to 6.
  *
  * Shape: two scans (one per version) into bucket hash-aggregates, one
  * broadcast of the baseline min/max, a `bins`-row spine join, and an
  * unpartitioned window over `bins` rows — nothing scales with the data
  * beyond the two scans. */
object Drift {

  /** Baseline-framed per-bucket counts for both versions over a full
    * `bins`-row spine (zero bins kept — both [[psi]] and [[ksBinned]]
    * need them). */
  private def binnedCounts(
      baseline: DataFrame, current: DataFrame, colName: String,
      bins: Int): DataFrame = {
    val spark = baseline.sparkSession
    val c = col(colName).cast("double")
    val st = baseline.filter(c.isNotNull).agg(min(c).as("mn"), max(c).as("mx"))
    def counts(df: DataFrame, out: String) = df.filter(c.isNotNull)
      .crossJoin(broadcast(st))
      .select(
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(lit(bins - 1L), greatest(lit(0L),
            floor((c - col("mn")) * bins / (col("mx") - col("mn"))).cast("long"))))
          .as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as(out))
    spark.range(bins).toDF("bucket")
      .join(counts(baseline, "nb"), Seq("bucket"), "left")
      .join(counts(current, "nc"), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("nb"), lit(0L)).as("n_base"),
        coalesce(col("nc"), lit(0L)).as("n_cur"))
  }

  def psi(
      baseline: DataFrame, current: DataFrame, colName: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, "bins must be positive")
    val j = binnedCounts(baseline, current, colName, bins)
    val w = Window.partitionBy() // bins rows — not a data-sized window
    val p = (col("n_base") + 1).cast("double") / (sum(col("n_base")).over(w) + bins)
    val q = (col("n_cur") + 1).cast("double") / (sum(col("n_cur")).over(w) + bins)
    j.withColumn("nanos", round((p - q) * log(p / q) * 1e9).cast("long"))
      .select(
        col("bucket"), col("n_base"), col("n_cur"),
        round(col("nanos") / 1e9, 6).as("psi_term"),
        round(sum(col("nanos")).over(w) / 1e9, 6).as("psi_total"))
  }

  /** Binned two-sample Kolmogorov–Smirnov statistic over the same
    * baseline frame: D = max over buckets of |CDF_base − CDF_cur| — the
    * nonparametric companion to [[psi]] (sensitive to location shifts
    * even when bin masses stay similar). CDFs are exact integer-cumsum
    * ratios rounded to 6, so D hash-gates cross-engine. */
  def ksBinned(
      baseline: DataFrame, current: DataFrame, colName: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, "bins must be positive")
    val j = binnedCounts(baseline, current, colName, bins)
    // bins rows by construction (spark.range(bins) spine) — these
    // unpartitioned windows never see more than `bins` rows
    val w = Window.partitionBy()
    val wcum = Window.partitionBy().orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    j.withColumn("cdf_base",
        round(sum(col("n_base")).over(wcum).cast("double")
          / sum(col("n_base")).over(w), 6))
      .withColumn("cdf_cur",
        round(sum(col("n_cur")).over(wcum).cast("double")
          / sum(col("n_cur")).over(w), 6))
      .select(
        col("bucket"), col("n_base"), col("n_cur"),
        col("cdf_base"), col("cdf_cur"),
        round(max(abs(col("cdf_base") - col("cdf_cur"))).over(w), 6).as("ks_d"))
  }

  /** Chi-square homogeneity test between two versions of a CATEGORICAL
    * column (the companion to the numeric [[psi]]/[[ksBinned]]): for each
    * category and each side, the (observed − expected)²/expected term
    * under the pooled distribution, plus the total statistic and degrees
    * of freedom. NULL categories are excluded; both versions must be
    * non-empty (expected counts would otherwise be zero).
    *
    * Exactness: observed counts are integers, expected counts are ratios
    * of those integers, and each category's term quantizes to integral
    * 1e-9 units before the order-independent total; terms/total round
    * to 6. Shape: two scans into per-category hash-aggregates, one
    * category-keyed outer join, and an unpartitioned window over the
    * (category-cardinality-sized) result — nothing data-sized past the
    * scans. */
  def chiSquare(
      baseline: DataFrame, current: DataFrame, colName: String): DataFrame = {
    val c = col(colName)
    def counts(df: DataFrame, out: String) = df.filter(c.isNotNull)
      .groupBy(c.as("category")).agg(count(lit(1)).as(out))
    val j = counts(baseline, "nb")
      .join(counts(current, "nc"), Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("nb"), lit(0L)).as("n_base"),
        coalesce(col("nc"), lit(0L)).as("n_cur"))
    val w = Window.partitionBy() // category-cardinality rows, not data-sized
    val nB = sum(col("n_base")).over(w).cast("double")
    val nC = sum(col("n_cur")).over(w).cast("double")
    val tot = (col("n_base") + col("n_cur")).cast("double")
    val grand = nB + nC
    def term(obs: Column, side: Column) = {
      val e = side * tot / grand
      (obs.cast("double") - e) * (obs.cast("double") - e) / e
    }
    j.withColumn("nanos",
        round((term(col("n_base"), nB) + term(col("n_cur"), nC)) * 1e9)
          .cast("long"))
      .select(
        col("category"), col("n_base"), col("n_cur"),
        round(col("nanos") / 1e9, 6).as("chi2_term"),
        round(sum(col("nanos")).over(w) / 1e9, 6).as("chi2_total"),
        (count(lit(1)).over(w) - 1).cast("long").as("dof"))
  }

  /** Per-group Jensen-Shannon divergence of each group's TOKEN
    * distribution against the pooled corpus distribution — the
    * vocabulary-drift companion to [[psi]]/[[ksBinned]]/[[chiSquare]]
    * (those watch numeric/categorical columns; this watches what the
    * text itself is made of). The training-mix audit: which sources'
    * language diverges most from the blend the model will actually see?
    * JSD is symmetric, bounded by ln 2, and never infinite (unlike KL),
    * so one threshold works across sources of any size.
    *
    *   JSD(P‖M) = ½·Σ_t p·ln(p/a) + ½·Σ_t m·ln(m/a),  a = (p+m)/2
    *
    * with P the group's term distribution and M the pooled one (which
    * includes the group — the standard vs-mix convention). Terms with
    * p = 0 contribute only their m-side; m = 0 cannot occur (m ≥ p/|G|).
    *
    * Shape: token explode + one hash aggregate to (group, term) grain,
    * then everything is vocabulary-sized: pooled counts broadcast onto a
    * groups × vocab spine (exact JSD needs the m-side sum over the FULL
    * vocabulary per group — at web scale cap the vocabulary first, e.g.
    * [[graft.ext.Retrieval]]'s df discipline, and the spine stays
    * bounded). Per-term quantization to 1e-9 nats, order-free long sums,
    * single-division emit — the [[graft.ext.Profiling.mutualInformation]]
    * exactness contract. */
  def jsdPerGroup(
      docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(groupCol).as("g"),
      explode(graft.functions.Portable.tokens(col(textCol))).as("term"))
    val cst = tok.groupBy(col("g"), col("term")).agg(count(lit(1)).as("cst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.CacheLifecycle.unpersistAfterNextAction(cst)
    val ct = cst.groupBy(col("term")).agg(sum(col("cst")).as("ct"))
    val ns = cst.groupBy(col("g")).agg(sum(col("cst")).as("ns"))
    val n = cst.agg(sum(col("cst")).as("n"))
    val full = ns.crossJoin(broadcast(ct)).crossJoin(broadcast(n))
      .join(cst, Seq("g", "term"), "left")
      .na.fill(0L, Seq("cst"))
    val p = col("cst").cast("double") / col("ns")
    val m = col("ct").cast("double") / col("n")
    val a = (p + m) / lit(2.0)
    full
      .withColumn("u",
        round((when(col("cst") > 0, p * log(p / a)).otherwise(lit(0.0))
          + m * log(m / a)) * lit(0.5) * lit(1e9)).cast("long"))
      .groupBy(col("g"), col("ns"))
      .agg(sum(col("u")).as("su"))
      .select(col("g").as(groupCol), col("ns").as("n_tokens"),
        (col("su").cast("double") / lit(1e9)).as("jsd_nats"))
  }
}
