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
  * under parallelism. Passing `orderCols` switches to keep-first by that
  * ordering (P15 note in SURVEY §2.2), which is what the oracle-gated
  * queries use. Keep-first runs as `min_by(payload, ordering)` — a hash
  * aggregate with map-side partial combine — rather than a
  * `row_number` window, which would shuffle and then FULLY SORT every
  * key group just to discard all but row 1; at 100 TB the agg form
  * collapses duplicates before the exchange. For determinism
  * `orderCols` must totally order rows within a key (ties are broken
  * arbitrarily, exactly like the window form's tie behavior; null
  * ordering inside the `min_by` struct comparison is nulls-first,
  * matching the window default). Output column order is keys first,
  * then remaining columns in input order.
  */
object CleanConform {
  def apply(
      df: DataFrame,
      casts: Map[String, String],
      dedupKeys: Seq[String],
      orderCols: Seq[Column] = Nil): DataFrame = {
    // try_cast, not cast: a CLEANSE must null malformed values and keep
    // going (the reference's non-ANSI Spark-3 behavior) — under this
    // engine's ANSI default a plain cast would abort the whole silver
    // job on the first dirty field, inverting the operator's purpose
    val casted = casts.foldLeft(df) { case (d, (c, t)) =>
      d.withColumn(c, expr(s"try_cast(`$c` AS $t)"))
    }
    if (dedupKeys.isEmpty) casted.dropDuplicates()
    else if (orderCols.isEmpty) casted.dropDuplicates(dedupKeys)
    else {
      val payload = casted.columns.filterNot(dedupKeys.contains)
      casted.groupBy(dedupKeys.map(col): _*)
        .agg(min_by(struct(payload.map(col): _*), struct(orderCols: _*)).as("__kept"))
        .select(dedupKeys.map(col) ++
          payload.map(c => col("__kept").getField(c).as(c)): _*)
    }
  }
}
