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
  /** The events table's `ts` column has shipped in three physical /
    * inferred forms:
    *   - TIMESTAMP(NANOS) — Spark refuses it by default
    *     (PARQUET_TYPE_ILLEGAL) and reads it as raw int64 nanos under
    *     `spark.sql.legacy.parquet.nanosAsLong=true` → LongType;
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=true) → TimestampType;
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false) → TimestampNTZType
    *     (Spark 4's `spark.sql.parquet.inferTimestampNTZ.enabled`
    *     defaults to true).
    * The loader normalizes on the INFERRED schema so every consumer
    * sees a microsecond TimestampType `ts`: LongType → floor-div to
    * micros; NTZ → cast to TimestampType, which under the session's
    * fixed UTC timezone ([[GraftSession]]) preserves the stored
    * wall-clock micros bit-for-bit and matches DuckDB's TIMESTAMP
    * (also naive) semantics in the oracle.
    *
    * Nanos branch: floor (not truncate) to micros — exactly how DuckDB
    * converts TIMESTAMP_NS, so the oracle sees identical instants.
    * Integer floor division, not `/`: epoch-nanos (~1.7e18) overflow
    * double's 2^53 exact range, and `div` alone truncates toward zero
    * where DuckDB floors (differs pre-1970).
    *
    * The nanosAsLong conf is set at session build ([[GraftSession]]) —
    * deliberately NOT here: the conf must hold for the plan's whole
    * lifetime (schema inference and executor-side scans), so a
    * read-time mutation of the shared session would be both silent and
    * un-scopeable. It is a no-op for non-NANOS files. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case _: TimestampType => raw
      case _: TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case LongType =>
        raw.withColumn(
          "ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported physical type $other (expected " +
            "TIMESTAMP, TIMESTAMP_NTZ, or int64 nanos under " +
            "spark.sql.legacy.parquet.nanosAsLong=true — build the " +
            "session via graft.core.GraftSession to get the right confs)")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
