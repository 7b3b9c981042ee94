package graft.silver

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Silver-zone revenue conform operator.
  *
  * Reference capability: `order_revenue` = order_items ⟕ order_item_options
  * on the line-item key, null→0 fill on the option price, and
  * `TOTAL_REVENUE = ITEM_PRICE + coalesce(OPTION_PRICE, 0)`
  * (reference `scripts/cdc_metrics_job_silver.py:101-117`).
  *
  * Spark-first shape: a single declarative left join + `na.fill` +
  * derived column; Catalyst prunes columns into both scans and AQE
  * picks broadcast-hash when the options side is small. At 100 TB
  * both sides are fact-sized and co-keyed — bucket both tables by the
  * join key to turn this into a shuffle-free sort-merge join.
  */
object RevenueConform {

  /** @param items    line-grain frame carrying `item_price` and the join keys
    * @param options  line-grain frame carrying `option_price` (may be missing rows)
    * @param keys     equi-join key columns (USING-style)
    */
  def apply(items: DataFrame, options: DataFrame, keys: Seq[String]): DataFrame =
    items
      .join(options, keys, "left")
      .na.fill(Map("option_price" -> 0.0))
      .withColumn("total_revenue", col("item_price") + col("option_price"))
}

/** Silver-zone cleanse operator: targeted casts + keyed dedup
  * (reference `cdc_metrics_job_silver.py:65-66,89-90`).
  *
  * The reference uses keep-any `dropDuplicates(keys)` — nondeterministic
  * under parallelism. `deterministic = true` switches to keep-first by
  * an explicit ordering (row_number over the key, P15 note in SURVEY §2.2),
  * which is what the oracle-gated queries use.
  */
object CleanConform {
  def apply(
      df: DataFrame,
      casts: Map[String, String],
      dedupKeys: Seq[String],
      orderCols: Seq[Column] = Nil): DataFrame = {
    val casted = casts.foldLeft(df) { case (d, (c, t)) => d.withColumn(c, col(c).cast(t)) }
    if (dedupKeys.isEmpty) casted.dropDuplicates()
    else if (orderCols.isEmpty) casted.dropDuplicates(dedupKeys)
    else {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(dedupKeys.map(col): _*).orderBy(orderCols: _*)
      casted
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn")
    }
  }
}
