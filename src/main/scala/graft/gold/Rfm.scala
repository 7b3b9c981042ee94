package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RFM scoring mart (recency / frequency / monetary + rule segment).
  *
  * Reference capability: `mart_customer_rfm`
  * (`scripts/cdc_metrics_job_gold.py:98-131`): per-user
  * `countDistinct(ORDER_ID)` frequency, `sum(TOTAL_REVENUE)` monetary,
  * `max(CREATION_DATE)` last purchase joined back (J3), recency vs the
  * wall clock, and the VIP / New / Churn Risk / Standard CASE chain
  * (`:120-126`).
  *
  * Spark-first deviations (results identical):
  *  - the reference's two aggregations + left join (`:108-116`) collapse
  *    into ONE hash aggregate — same rows, one shuffle instead of two and
  *    a join;
  *  - "today" is the max conformed date (deterministic anchor), not
  *    `datetime.now()` (SURVEY §7.4 risk 2);
  *  - monetary sums use exact integer cents ([[Money]]).
  *
  * Scale: one shuffle on user_id; the anchor is a 1-row broadcast. The
  * exact `countDistinct(order_id)` is a second expand pass — at the
  * 100 TB tier swap `approxDistinct = true` for HLL.
  */
object Rfm {
  def apply(orderRevenue: DataFrame, approxDistinct: Boolean = false): DataFrame =
    build(orderRevenue, approxDistinct, anchorDate = None)

  /** Fixed-anchor variant: `today` supplied by the caller instead of
    * derived as `max(creation_date)` of the input. Required for
    * key-scoped incremental maintenance ([[IncrementalKeyScoped]]) —
    * a rebuild over a user-pruned subset would otherwise re-derive the
    * anchor from that subset and shift every recency. */
  def anchoredAt(
      orderRevenue: DataFrame, today: java.sql.Date,
      approxDistinct: Boolean = false): DataFrame =
    build(orderRevenue, approxDistinct, anchorDate = Some(today))

  private def build(
      orderRevenue: DataFrame, approxDistinct: Boolean,
      anchorDate: Option[java.sql.Date]): DataFrame = {
    val freq =
      if (approxDistinct) approx_count_distinct(col("order_id"))
      else countDistinct(col("order_id"))
    val grouped = orderRevenue
      .groupBy(col("user_id"))
      .agg(
        freq.as("frequency"),
        Money.sumMoney(col("total_revenue")).as("monetary"),
        max(col("creation_date")).as("last_purchase_date"))
    val withToday = anchorDate match {
      case Some(d) => grouped.withColumn("today", lit(d))
      case None => grouped.crossJoin(broadcast(
        orderRevenue.agg(max(col("creation_date")).as("today"))))
    }
    withToday
      .withColumn("recency", datediff(col("today"), col("last_purchase_date")))
      .withColumn(
        "segment",
        when(col("recency") <= 15 && col("frequency") >= 5 && col("monetary") >= 100, "VIP")
          .when(col("frequency") <= 1 && col("recency") <= 15, "New")
          .when(col("recency") > 45 && col("frequency") <= 2, "Churn Risk")
          .otherwise("Standard"))
      .select(
        col("user_id"), col("frequency"), col("monetary"),
        col("last_purchase_date"), col("recency"), col("segment"))
  }

  /** RFM segment MIGRATION matrix: each user's segment `backDays` ago
    * (scored over only the orders visible then, anchored at that date)
    * versus today — the (from, to) transition counts and row shares a
    * retention team reads to see where VIPs leak. Users who first
    * purchased inside the window migrate from the synthetic `None`
    * segment.
    *
    * Anchors are data-derived, not wall-clock: t₂ = max(creation_date)
    * (one bounded driver-side scalar read — the watermark-read
    * precedent), t₁ = t₂ − backDays; the past score uses
    * [[anchoredAt]] so the pruned subset cannot shift recencies.
    *
    * Shape: two RFM hash aggregates (one over the date-pruned fact —
    * the filter pushes into the scan) + a user-grain join; the matrix
    * is |segments|² rows, so its row-share window is mart-sized. */
  def migrationMatrix(
      orderRevenue: DataFrame, backDays: Int = 90): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tRow = orderRevenue.agg(max(col("creation_date")).as("t")).head()
    require(!tRow.isNullAt(0),
      "migrationMatrix: input has no rows (no anchor date)")
    val t2 = tRow.getDate(0)
    val t1 = java.sql.Date.valueOf(t2.toLocalDate.minusDays(backDays.toLong))
    val past = anchoredAt(
        orderRevenue.filter(col("creation_date") <= lit(t1)), t1)
      .select(col("user_id"), col("segment").as("segment_from"))
    val now = anchoredAt(orderRevenue, t2)
      .select(col("user_id"), col("segment").as("segment_to"))
    val byFrom = Window.partitionBy(col("segment_from"))
    now.join(past, Seq("user_id"), "left")
      .select(coalesce(col("segment_from"), lit("None")).as("segment_from"),
        col("segment_to"))
      .groupBy(col("segment_from"), col("segment_to"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("row_share",
        round(col("n_users").cast("double")
          / sum(col("n_users")).over(byFrom), 6))
  }
}
