package graft.gold

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact money arithmetic shared by the gold marts.
  *
  * Source prices carry exactly 4 decimals, so `round(x * 10000)` recovers
  * an exact integral double; integer-valued sums are order-independent and
  * bit-exact across engines up to 2^53 (≈ 9e15 — far above sf0.1's ~3e14
  * total cents). Switch to DecimalType at the 100 TB tier. The DuckDB
  * oracles use the identical formula (see [[graft.oracle.OracleSql]]).
  */
object Money {
  /** Exact integral 1e-4 units of a money column. */
  def cents(c: Column): Column = round(c * 10000)

  /** Order-independent exact money sum, back in dollars. */
  def sumMoney(c: Column): Column = sum(cents(c)) / 10000.0
}
