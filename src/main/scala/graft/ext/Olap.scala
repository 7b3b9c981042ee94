package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-dimensional OLAP rollups: CUBE over (year, priority) with the
  * standard `grouping_id` bit vector labeling each grouping set — the
  * all-subtotals report a metrics warehouse serves from one pass.
  *
  * Scale shape: `cube` over d dimensions Expands each input row into
  * 2^d grouping-set rows BEFORE the exchange, but partial aggregation
  * runs on the expanded rows map-side, so the shuffle carries only
  * (group, partial) pairs — cardinality bounded by the result size, not
  * 2^d × input. With low-cardinality dims (years × priorities here) the
  * exchange is mart-sized however big the fact is. Money stays on the
  * integral 1e-4-unit rule ([[graft.gold.Money]]) so sums are exact and
  * order-independent in both engines.
  */
object Olap {

  /** Revenue/volume cube over order year × priority. `gid` is the
    * standard grouping bit vector (year bit 2, priority bit 1): 0 =
    * cell, 1 = per-year subtotal, 2 = per-priority subtotal, 3 = grand
    * total. NULL dimension values mark the rolled-up axes, exactly as
    * SQL CUBE emits them. */
  def ordersCube(orders: DataFrame): DataFrame =
    orders
      .withColumn("order_year", year(col("o_orderdate")))
      .cube(col("order_year"), col("o_orderpriority"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_orders"),
        (sum(round(col("o_totalprice") * 10000)) / 10000.0).as("revenue"))
}
