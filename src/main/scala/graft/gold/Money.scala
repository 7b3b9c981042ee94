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

  /** Net lineitem revenue in exact integer cents — the ONE definition
    * of `price × (1 − discount)` the TPC-H-shape reports share
    * (Fulfillment, Logistics, Geography's trade spine); a money-
    * quantization change happens here or nowhere. */
  def lineNetCents: Column =
    round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
      .cast("long")

  /** Order-independent exact money sum, back in dollars. */
  def sumMoney(c: Column): Column = sum(cents(c)) / 10000.0

  /** 100 TB-tier variant: integer-valued doubles stop being exact past
    * 2^53 total cents (≈ $9e11 per group); DecimalType(38,4) sums stay
    * exact at any realistic magnitude at the cost of non-vectorized
    * decimal arithmetic. Same value as [[sumMoney]] within the double
    * range (tested), so marts can switch per deployment. */
  def sumMoneyDecimal(c: Column): Column =
    sum(c.cast("decimal(38,4)")).cast("double")
}
