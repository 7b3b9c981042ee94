package graft.oracle

/** DuckDB oracle SQL mirrors for every oracle-gated query in
  * [[graft.SparkEntry]]. Shared lineage lives in one CTE block so the
  * Spark implementation and the oracle stay in lock-step.
  *
  * Portability rules observed on both sides (see SURVEY.md §5):
  *  - per-row arithmetic on identical inputs is bit-exact — never rounded;
  *  - money sums go through exact integer 1e-4 units ("cents"):
  *    `sum(round(x * 10000))` is an order-independent integer sum, so
  *    Spark and DuckDB agree bit-for-bit; division back to dollars is a
  *    single double op on identical inputs;
  *  - averages/ratios are written as the same explicit formula (sum /
  *    count, a / b) on both sides — never the engine's `avg` on doubles;
  *  - "today" is never the wall clock: the anchor date is
  *    `max(creation_date)` of the conformed fact, so runs are reproducible
  *    (the reference bakes in `datetime.now()` — SURVEY §7.4 risk 2);
  *  - every query ends with a total ORDER BY on its key columns;
  *  - all output column names are lowercase snake_case and aliased
  *    identically in Spark and SQL (the driver compare is name-keyed).
  */
object OracleSql {

  /** Conformed-business-schema lineage over the TPC-H-ish testdata —
    * mirrors [[graft.bindings.Conformed]] and [[graft.gold.Ltv]]. */
  val conformedCtes: String = """
opts_raw AS (
  SELECT l_orderkey AS order_id, l_linenumber AS lineitem_id,
         'surcharge' AS option_name,
         l_tax * l_extendedprice AS option_price
  FROM lineitem WHERE l_tax > 0.04
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount',
         -(l_discount * l_extendedprice)
  FROM lineitem WHERE l_discount >= 0.08),
opts AS (
  SELECT order_id, lineitem_id, option_name, option_price
  FROM (SELECT *, row_number() OVER (PARTITION BY order_id, lineitem_id
          ORDER BY option_name, option_price) AS rn FROM opts_raw)
  WHERE rn = 1),
items AS (
  SELECT l.l_orderkey AS order_id, l.l_linenumber AS lineitem_id,
         o.o_custkey AS user_id, l.l_suppkey AS restaurant_id,
         p.p_type AS item_category,
         o.o_orderpriority IN ('1-URGENT','2-HIGH') AS is_loyalty,
         l.l_extendedprice * (1 - l.l_discount) AS item_price,
         CAST(o.o_orderdate AS DATE) AS creation_date,
         o.o_orderdate
           + to_hours((l.l_orderkey * 7 + l.l_linenumber * 3) % 24)
           AS creation_ts
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey),
order_revenue AS (
  SELECT i.order_id, i.lineitem_id, i.user_id, i.restaurant_id,
         i.item_category, i.is_loyalty, i.item_price, i.creation_date,
         i.creation_ts, t.option_name,
         COALESCE(t.option_price, 0.0) AS option_price,
         i.item_price + COALESCE(t.option_price, 0.0) AS total_revenue
  FROM items i LEFT JOIN opts t USING (order_id, lineitem_id)),
anchor AS (
  SELECT max(creation_date) AS today FROM order_revenue),
ltv_daily AS (
  SELECT user_id, creation_date,
         sum(round(total_revenue * 10000)) AS cents
  FROM order_revenue GROUP BY 1, 2),
ltv_cum AS (
  SELECT user_id, creation_date, cents / 10000.0 AS daily_revenue,
         sum(cents) OVER (PARTITION BY user_id ORDER BY creation_date
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 10000.0
           AS cumulative_ltv
  FROM ltv_daily),
ltv_latest AS (
  SELECT user_id, creation_date AS last_date, cumulative_ltv AS lifetime_value
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
          ORDER BY creation_date DESC) AS rnk FROM ltv_cum)
  WHERE rnk = 1)
"""

  /** Compose a query over the shared lineage. */
  def withBase(select: String): String = s"WITH $conformedCtes\n$select"

  /** Compose with extra CTEs appended after the shared block. */
  def withBase(extraCtes: String, select: String): String =
    s"WITH $conformedCtes,\n$extraCtes\n$select"

  /** [[withBase]] whose extra CTEs include a recursive one (the
    * RECURSIVE keyword must lead the whole WITH clause). */
  def withBaseRecursive(extraCtes: String, select: String): String =
    s"WITH RECURSIVE $conformedCtes,\n$extraCtes\n$select"
}
