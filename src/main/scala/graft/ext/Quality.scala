package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-extra-scan data-quality counters, attached to a pass the
  * pipeline already runs (Spark's `Observation` API): row counts, null
  * keys, and out-of-domain values accumulate DURING the action instead
  * of a second ANALYZE scan — at 100 TB the difference between free
  * metrics and doubling the read.
  *
  * Usage: `val (df, obs) = Quality.observed(fact, "user_id", "total_revenue")`,
  * run the write/count, then `obs.get` returns the metric map. The
  * metrics are plain aggregate expressions, so anything
  * [[Profiling.summarize]] computes can ride along; these are the three
  * a CDC load gates on.
  */
object Quality {

  def observed(
      df: DataFrame, keyCol: String, amountCol: String): (DataFrame, Observation) = {
    val obs = Observation()
    val observed = df.observe(
      obs,
      count(lit(1)).as("n_rows"),
      sum(when(col(keyCol).isNull, 1L).otherwise(0L)).as("n_null_keys"),
      sum(when(col(amountCol) < 0, 1L).otherwise(0L)).as("n_negative_amounts"))
    (observed, obs)
  }

  /** Referential-integrity audit: for one child table, count the rows
    * whose foreign key finds no parent (NULL keys count as orphans —
    * they can't join either). The contract check a warehouse load gates
    * on before marts consume the feed.
    *
    * Scale shape: ALL of a child's FK checks ride ONE scan — the child
    * is projected to just its key columns (parquet column pruning makes
    * this a key-column read, not a table read), each parent collapses to
    * a DISTINCT key set (dimension-sized → AQE broadcasts it; the one
    * fact-fact check shuffles on the key like any PK/FK join), and a
    * single aggregate emits every orphan counter at once. The per-check
    * rows are then sliced from that one aggregate row — re-scanning the
    * child per check would multiply the dominant cost by the number of
    * checks.
    *
    * `fks`: (childKeyCol, parentFrame, parentKeyCol, parentTableName). */
  def fkOrphans(
      child: DataFrame, childName: String,
      fks: Seq[(String, DataFrame, String, String)]): DataFrame = {
    val base = child.select(fks.map(f => col(f._1)): _*)
    val joined = fks.zipWithIndex.foldLeft(base) {
      case (acc, ((ck, parent, pk, _), i)) =>
        acc.join(
          parent.select(col(pk).as(ck)).distinct()
            .withColumn(s"m_$i", lit(1)),
          Seq(ck), "left_outer")
    }
    val aggs = count(lit(1)).as("n_child") +:
      fks.zipWithIndex.map { case (_, i) =>
        sum(when(col(s"m_$i").isNull, 1L).otherwise(0L)).as(s"o_$i")
      }
    val row = joined.agg(aggs.head, aggs.tail: _*)
    // one explode unpivots the single aggregate row into per-check rows —
    // a union of per-check selects would re-plan the whole scan+join
    // subtree once per check, defeating the single-scan design
    val arms = fks.zipWithIndex.map { case ((ck, _, pk, pname), i) =>
      struct(
        lit(s"$childName.$ck -> $pname.$pk").as("fk"),
        lit(childName).as("child_table"),
        lit(pname).as("parent_table"),
        col(s"o_$i").as("n_orphans"))
    }
    row.select(col("n_child"), explode(array(arms: _*)).as("a"))
      .select(
        col("a.fk").as("fk"),
        col("a.child_table").as("child_table"),
        col("a.parent_table").as("parent_table"),
        col("n_child"),
        col("a.n_orphans").as("n_orphans"),
        round(col("a.n_orphans").cast("double") / col("n_child"), 6)
          .as("orphan_share"))
  }

  /** Declarative data-quality rules over the order-line fact — each
    * rule is ONE portable SQL boolean; the same strings drive the Spark
    * plan (via `expr`) and the DuckDB oracle, so engine and gate cannot
    * drift (the dbt-test shape as an in-engine operator). */
  val LineitemRules: Seq[(String, String)] = Seq(
    "discount_range" -> "l_discount BETWEEN 0 AND 0.5",
    "flag_domain" -> "l_returnflag IN ('A', 'N', 'R')",
    "high_discount" -> "l_discount <= 0.08",
    "nonneg_price" -> "l_extendedprice >= 0",
    "qty_positive" -> "l_quantity >= 1",
    "ship_in_range" -> "l_shipdate >= DATE '1992-01-01'",
    "status_domain" -> "l_linestatus IN ('O', 'F')")

  /** Single-source column list for the orders profile (q311): name →
    * kind, where kind picks the exact cross-engine min/max rendering
    * ("long" numeric, "string" lexicographic, "date" ISO, "money2dp" an
    * integer x100 grain — note this is a PROFILE-ONLY rendering at two
    * decimal places, coarser than the repo-wide Money.cents x10000
    * money contract; the grain is part of this profile's schema
    * contract, not a money computation). Both [[columnProfile]] and
    * [[columnProfileSql]] consume THIS list. */
  val OrdersProfile: Seq[(String, String)] = Seq(
    "o_orderkey" -> "long",
    "o_custkey" -> "long",
    "o_orderstatus" -> "string",
    "o_totalprice" -> "money2dp",
    "o_orderdate" -> "date",
    "o_orderpriority" -> "string")

  /** Exact per-column table profile in ONE aggregate pass — the
    * ingest-review readout every new feed gets before anything trusts
    * it (the Deequ-analyzer shape without a framework): row count,
    * null count + share, EXACT distinct count, and type-aware min/max
    * rendered as strings both engines agree on (typed aggregate first,
    * string render after — never lexicographic min over numbers).
    *
    * Scale: one pass; the per-column exact distincts ride Spark's
    * multi-distinct Expand (input duplicated n_cols-way with map-side
    * partial collapse — the standard profiler cost, n_cols small by
    * construction). The gated HLL tier (q51) is the documented approx
    * sibling when a 100 TB profile tolerates ±2% on distincts. The
    * result is ONE scalar row exploded to column grain. */
  def columnProfile(df: DataFrame, cols: Seq[(String, String)]): DataFrame = {
    def keyed(name: String, kind: String): Column = kind match {
      case "date"  => col(name).cast("date")
      case "money2dp" => round(col(name) * 100).cast("long")
      case _       => col(name)
    }
    val aggCols = count(lit(1)).as("n_rows") +:
      cols.flatMap { case (name, kind) =>
        Seq(
          sum(when(col(name).isNull, 1L).otherwise(0L)).as(s"nn_$name"),
          countDistinct(col(name)).as(s"nd_$name"),
          min(keyed(name, kind)).cast("string").as(s"mn_$name"),
          max(keyed(name, kind)).cast("string").as(s"mx_$name"))
      }
    df.agg(aggCols.head, aggCols.tail: _*)
      .select(col("n_rows"), explode(array(cols.map { case (name, _) =>
        struct(lit(name).as("col_name"),
          col(s"nn_$name").as("n_nulls"),
          col(s"nd_$name").as("n_distinct"),
          col(s"mn_$name").as("min_value"),
          col(s"mx_$name").as("max_value"))
      }: _*)).as("c"))
      .select(col("c.col_name").as("col_name"), col("n_rows"),
        col("c.n_nulls").as("n_nulls"),
        col("c.n_distinct").as("n_distinct"),
        expr("""((c.n_nulls * 1000000 * 2 + n_rows) div (n_rows * 2))
                / cast(1000000 as double)""").as("null_share"),
        col("c.min_value").as("min_value"),
        col("c.max_value").as("max_value"))
      .orderBy(col("col_name"))
  }

  /** DuckDB mirror generated from the SAME column list (one SELECT per
    * column, UNION ALL — the [[dqRuleAuditSql]] device). */
  def columnProfileSql(table: String, cols: Seq[(String, String)]): String =
    cols.map { case (name, kind) =>
      val k = kind match {
        case "date"  => s"CAST($name AS DATE)"
        case "money2dp" => s"CAST(round($name * 100) AS BIGINT)"
        case _       => name
      }
      s"""SELECT '$name' AS col_name, count(*) AS n_rows,
             CAST(sum(CASE WHEN $name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
             CAST(count(DISTINCT $name) AS BIGINT) AS n_distinct,
             ((CAST(sum(CASE WHEN $name IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) * 1000000 * 2 + count(*)) // (count(*) * 2))
               / 1000000.0 AS null_share,
             CAST(min($k) AS VARCHAR) AS min_value,
             CAST(max($k) AS VARCHAR) AS max_value
         FROM $table"""
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  /** Run a declarative rule list in ONE pass over the fact: a single
    * hash-free aggregate computes the row count and each rule's
    * violation count, then the scalar row explodes to rule grain.
    * Violation share is an exact half-up micro-unit ratio. */
  def dqRuleAudit(df: DataFrame, rules: Seq[(String, String)]): DataFrame = {
    val aggCols = count(lit(1)).as("n_rows") +:
      rules.map { case (name, cond) =>
        sum(when(!expr(cond), 1L).otherwise(0L)).as(s"v_$name")
      }
    df.agg(aggCols.head, aggCols.tail: _*)
      .select(col("n_rows"), explode(array(rules.map { case (name, _) =>
        struct(lit(name).as("rule"), col(s"v_$name").as("n_violations"))
      }: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("n_rows"),
        col("r.n_violations").as("n_violations"),
        expr("""((r.n_violations * 1000000 * 2 + n_rows) div (n_rows * 2))
                / cast(1000000 as double)""").as("violation_share"))
  }

  /** The DuckDB mirror generated from the SAME rule list (one SELECT
    * per rule, UNION ALL) — [[LineitemRules]] is the single source. */
  def dqRuleAuditSql(table: String, rules: Seq[(String, String)]): String =
    rules.map { case (name, cond) =>
      s"""SELECT '$name' AS rule, count(*) AS n_rows,
                 CAST(sum(CASE WHEN NOT ($cond) THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violations,
                 ((CAST(sum(CASE WHEN NOT ($cond) THEN 1 ELSE 0 END) AS BIGINT)
                   * 1000000 * 2 + count(*)) // (count(*) * 2)) / 1000000.0
                   AS violation_share
          FROM $table"""
    }.mkString("", "\nUNION ALL\n", "\nORDER BY rule")
}
