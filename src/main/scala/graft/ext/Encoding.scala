package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised feature encoding over categorical columns — the
  * feature-engineering step between the conformed facts and a model:
  * category → number, without letting a row see its own label.
  */
object Encoding {

  /** Leave-one-out target encoding: each row's category becomes the
    * mean label of the OTHER rows in its category,
    * (Σy_g − y_i) / (n_g − 1) — the standard high-cardinality encoder
    * that a plain group-mean would leak the row's own label through
    * (on rare categories a row would largely encode itself).
    * Singleton categories (n_g = 1) emit NULL: there is no "other"
    * evidence, and a consumer imputes the global prior explicitly.
    *
    * Exactness: label sums and counts are exact integers; the encoding
    * is ONE double division of integer-lifted values, emitted
    * UNROUNDED. Shape: one hash aggregate to category grain
    * (map-side combined) broadcast back onto the fact — the fact is
    * never shuffled, so the encoder is a linear scan at any scale. */
  def looTargetEncode(
      df: DataFrame, keyCols: Seq[String], groupCol: String, label: Column)
      : DataFrame = {
    val base = df.select(
      (keyCols.map(col) :+ col(groupCol).as("grp")
        :+ when(label, 1L).otherwise(0L).as("y")): _*)
    val agg = base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_g"), sum(col("y")).as("p_g"))
    base.join(broadcast(agg), Seq("grp"))
      .select((keyCols.map(col) :+ col("grp").as(groupCol) :+ col("y") :+
        when(col("n_g") > 1L,
          (col("p_g") - col("y")).cast("double")
            / (col("n_g") - lit(1L)).cast("double"))
          .otherwise(lit(null).cast("double")).as("loo_enc")): _*)
  }

  /** Weight-of-evidence + information value per feature level — the
    * credit-scoring feature screen: WoE = ln(share of positives at
    * the level ∕ share of negatives), IV = Σ(p_share − n_share)·WoE.
    * IV ≈ 0.02∕0.1∕0.3 are the weak/medium/strong screening
    * conventions; [[looTargetEncode]] then encodes whatever survives.
    *
    * Exactness: ln enters ONLY through integer counts, each ln(c)
    * quantized to 1e-9 nats (the entropy discipline), so
    * WoE = (ln p − ln P) − (ln n − ln N) is an exact LONG in
    * nano-nats; each IV term is the exact integer product
    * (p_share_micro − n_share_micro)·woe_nano at scale 1e15, so the
    * total IV is an order-free integer sum. Levels with zero
    * positives or zero negatives emit NULL WoE and contribute no IV
    * (the standard convention; a smoothed variant is a caller-side
    * +0.5 on the counts). Shape: one hash aggregate to level grain, a
    * one-row total broadcast back. */
  def woeInformationValue(
      df: DataFrame, featureCol: Column, label: Column): DataFrame = {
    def lnq(c: Column) = round(log(c) * 1e9).cast("long")
    val lv = df
      .select(featureCol.as("lvl"), when(label, 1L).otherwise(0L).as("y"))
      .groupBy(col("lvl"))
      .agg(sum(col("y")).as("p"), sum(lit(1L) - col("y")).as("ng"))
    val tot = lv.agg(sum(col("p")).as("pt"), sum(col("ng")).as("nt"))
    val woeU = (lnq(col("p")) - lnq(col("pt"))) -
      (lnq(col("ng")) - lnq(col("nt")))
    val pShareU = expr("((p * 1000000 * 2) + pt) div (pt * 2)")
    val nShareU = expr("((ng * 1000000 * 2) + nt) div (nt * 2)")
    val defined = col("p") > 0 && col("ng") > 0
    val scored = lv.crossJoin(broadcast(tot))
      .withColumn("woe_u", when(defined, woeU))
      .withColumn("iv_u", when(defined, (pShareU - nShareU) * col("woe_u"))
        .otherwise(0L))
    val ivTot = scored.agg(sum(col("iv_u")).as("iv_tot_u"))
    scored.crossJoin(broadcast(ivTot))
      .select(col("lvl"), col("p").as("n_pos"), col("ng").as("n_neg"),
        round(col("woe_u") / 1e9, 6).as("woe"),
        round(col("iv_u") / 1e15, 6).as("iv_term"),
        round(col("iv_tot_u") / 1e15, 6).as("iv_total"))
      .orderBy(col("lvl"))
  }

  /** Exact one-feature decision stump by Gini impurity: every distinct
    * feature value is a candidate threshold (split: x ≤ t), scored by
    * the weighted child impurity and minimized — "train a depth-1 tree
    * in-engine", the screening model that needs no ML library and no
    * iteration. Works at HISTOGRAM grain: candidates and cumulative
    * class counts live on the feature's value domain (bounded —
    * quantity is ~50 values at any row count), so the one
    * unpartitioned window is domain-sized, never data-sized.
    *
    * Determinism: every count is exact; the impurity score
    * pl(cl−pl)/cl + pr(cr−pr)/cr evaluates as the identical fixed IEEE
    * chain on both engines (products lifted to decimal(38,0) BEFORE
    * the double — n²∕4 passes 2⁵³ at ~1.9e8 rows), and the argmin
    * orders by (score, threshold) — a total order, so equal scores cut
    * at the same threshold everywhere. Output: the winning threshold
    * with child counts and the Gini gain vs the unsplit root. */
  def giniStump(
      df: DataFrame, featureCol: Column, label: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val hist = df
      .select(featureCol.as("x"), when(label, 1L).otherwise(0L).as("y"))
      .groupBy(col("x"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("p"))
    val w = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = hist.agg(sum(col("c")).as("n"), sum(col("p")).as("ptot"))
    def child(pc: Column, cc: Column) =
      (pc.cast(dec) * (cc - pc)).cast("double") / cc.cast("double")
    val scored = hist
      .withColumn("cl", sum(col("c")).over(w))
      .withColumn("pl", sum(col("p")).over(w))
      .crossJoin(broadcast(tot))
      .filter(col("cl") < col("n")) // right child must be non-empty
      .withColumn("cr", col("n") - col("cl"))
      .withColumn("pr", col("ptot") - col("pl"))
      .withColumn("score",
        child(col("pl"), col("cl")) + child(col("pr"), col("cr")))
    val byScore = Window.orderBy(col("score").asc, col("x").asc)
    scored
      .withColumn("rn", row_number().over(byScore))
      .filter(col("rn") === 1)
      .select(col("x").as("threshold"),
        col("cl").as("n_left"), col("cr").as("n_right"),
        col("pl").as("pos_left"), col("pr").as("pos_right"),
        // gain = root gini − weighted child gini, both ×2/n of the
        // rational cores — one shared double chain
        round((child(col("ptot"), col("n")) - col("score"))
          * 2.0 / col("n"), 6).as("gini_gain"))
  }
}
