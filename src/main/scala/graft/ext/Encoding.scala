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
}
