package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (see
  * /root/repo/TESTDATA.md). Plain parquet scans — column pruning and
  * predicate pushdown are left to Catalyst from the consuming plan
  * (check `.explain("formatted")` for `ReadSchema`/`PushedFilters`).
  *
  * Scale note: at 100 TB these would be partitioned/bucketed tables
  * behind a catalog; the loader stays a single `spark.read.parquet`
  * so partition discovery and pruning keep working unchanged.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** The events table carries nanosecond parquet timestamps, which Spark
    * refuses by default (PARQUET_TYPE_ILLEGAL). Read them as raw nanos
    * and floor to microseconds — exactly how DuckDB converts
    * TIMESTAMP_NS, so the oracle sees identical instants.
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true`, set explicitly
    * at session build ([[GraftSession.local]]) — deliberately NOT set
    * here: the conf must hold for the plan's whole lifetime (schema
    * inference and executor-side scans), so a read-time mutation of the
    * shared session would be both silent and un-scopeable. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet stores TIMESTAMP(NANOS): build the session with " +
        "spark.sql.legacy.parquet.nanosAsLong=true (GraftSession.local does)")
    import org.apache.spark.sql.functions._
    // integer floor division, not `/`: epoch-nanos (~1.7e18) overflow
    // double's 2^53 exact range, and `div` alone truncates toward zero
    // where DuckDB's ns→us conversion floors (differs pre-1970)
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
