package graft.bindings

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Deterministic previous/current snapshot pair for exercising
  * [[graft.cdc.SnapshotDiff]] against the DuckDB oracle.
  *
  * Derived purely from the `orders` table (no wall clock, no RNG):
  *  - the base is made PK-unique by max-aggregating per key (the testdata
  *    carries duplicate keys by design);
  *  - `previous` drops keys ≡ 3 (mod 10)  → those become INSERTS;
  *  - `current`  drops keys ≡ 5 (mod 13)  → those become DELETES;
  *  - `previous` shifts totalprice by +100 on keys ≡ 2 (mod 7) → those
  *    become UPDATES (and, per the reference's full-row EXCEPT semantics,
  *    also an insert of the new image + a delete of the old image).
  */
object CdcFixture {

  def base(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderkey"))
      .agg(
        max(col("o_custkey")).as("custkey"),
        max(col("o_totalprice")).as("totalprice"),
        max(to_date(col("o_orderdate"))).as("odate"),
        max(col("o_orderpriority")).as("priority"))

  def previous(spark: SparkSession, dir: String): DataFrame =
    base(spark, dir)
      .filter(col("o_orderkey") % 10 =!= 3)
      .withColumn(
        "totalprice",
        when(col("o_orderkey") % 7 === 2, col("totalprice") + 100)
          .otherwise(col("totalprice")))

  def current(spark: SparkSession, dir: String): DataFrame =
    base(spark, dir).filter(col("o_orderkey") % 13 =!= 5)
}
