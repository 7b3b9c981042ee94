package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.bindings.Conformed
import graft.gold.Ltv
import graft.oracle.OracleSql

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an operator (or composite mart) from
  * SURVEY.md §2; [[oracleSql]] carries its DuckDB mirror for the t2
  * correctness gate. Column names/aliases match pairwise; every query
  * ends with a total ORDER BY so compares are row-order-independent
  * either way.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_ltv_daily")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
    // ---- silver conform (J2, P10, P4, P12, F6) ----
    "q01_order_revenue" -> ((s, dir) =>
      Conformed.orderRevenue(s, dir)
        .orderBy(col("order_id"), col("lineitem_id"))),

    // ---- gold: LTV / CLV (A1, W1, W2, P8, A8) ----
    "q02_ltv_daily" -> ((s, dir) =>
      Ltv.daily(Conformed.orderRevenue(s, dir))
        .orderBy(col("user_id"), col("creation_date"))),
    "q03_ltv_latest" -> ((s, dir) =>
      Ltv.latest(Ltv.daily(Conformed.orderRevenue(s, dir)))
        .orderBy(col("user_id"))),
    "q04_clv_segments" -> ((s, dir) =>
      Ltv.segments(Ltv.latest(Ltv.daily(Conformed.orderRevenue(s, dir))))
        .orderBy(col("user_id"))),
  )

  def oracleSql: Map[String, String] = ListMap(
    "q01_order_revenue" -> OracleSql.withBase(
      """SELECT * FROM order_revenue ORDER BY order_id, lineitem_id"""),

    "q02_ltv_daily" -> OracleSql.withBase(
      """SELECT user_id, creation_date, daily_revenue, cumulative_ltv
         FROM ltv_cum ORDER BY user_id, creation_date"""),

    "q03_ltv_latest" -> OracleSql.withBase(
      """SELECT user_id, last_date, lifetime_value
         FROM ltv_latest ORDER BY user_id"""),

    "q04_clv_segments" -> OracleSql.withBase(
      """SELECT user_id, lifetime_value,
                CASE WHEN lifetime_value <=
                       (SELECT quantile_cont(lifetime_value, 0.2) FROM ltv_latest) THEN 'Low'
                     WHEN lifetime_value <=
                       (SELECT quantile_cont(lifetime_value, 0.8) FROM ltv_latest) THEN 'Medium'
                     ELSE 'High' END AS clv_segment
         FROM ltv_latest ORDER BY user_id"""),
  )
}
