package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC ingestion with watermark predicate pushdown.
  *
  * Reference capability: Glue DynamicFrame reads from SQL Server — a
  * full-table read for dimensions (S2, `cdc_metrics_job_bronze.py:68-76`)
  * and a `customSql` incremental read for the watermarked fact (S1,
  * `:57-67`): `SELECT * FROM t WHERE CREATION_TIME_UTC >= '<last_run>'`.
  *
  * Spark-native shape: `spark.read.format("jdbc")` with either `dbtable`
  * or a pushed-down `query`. The watermark predicate is embedded in the
  * query (the reference's approach) so the DATABASE does the filtering —
  * this is the incremental-correctness contract, not just an
  * optimization. `partitionColumn`/bounds split the read across
  * executors; without them JDBC reads are single-threaded, which is the
  * classic 100 TB ingest bottleneck.
  *
  * No database ships in this environment, so the query construction is
  * unit-tested and the reader wiring is exercised only when a URL is
  * provided by the caller.
  */
object JdbcSource {

  /** The reference's incremental extract SQL (S1). The watermark value is
    * a timestamp string from the [[graft.cdc.ControlStore]]; `>=` re-reads
    * the boundary instant (late-data policy, SURVEY §2.9). Single quotes
    * in the value are SQL-escaped — the control file is plain writable
    * text, so an unescaped interpolation would be an injection vector
    * against the source database. */
  def incrementalQuery(table: String, watermarkCol: String, lastRun: String): String =
    s"SELECT * FROM $table WHERE $watermarkCol >= '${lastRun.replace("'", "''")}'"

  /** S1: watermarked incremental read with the predicate pushed to the
    * DB. The pushed SQL is wrapped as a `dbtable` subquery rather than
    * the `query` option — Spark forbids `query` + `partitionColumn`,
    * and the incremental FACT extract is exactly the read that needs
    * parallel range partitions: a large backfill through the `query`
    * path would run as ONE single-threaded JDBC cursor on one executor
    * (the 100 TB ingest bottleneck this file warns about). Pass
    * `partitionColumn` for volume loads; dimension-sized deltas can
    * omit it. */
  def readIncremental(
      spark: SparkSession, url: String, table: String,
      watermarkCol: String, lastRun: String,
      partitionColumn: Option[(String, Long, Long, Int)] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable",
        s"(${incrementalQuery(table, watermarkCol, lastRun)}) graft_inc")
      .options(options)
    partitionColumn.fold(base) { case (c, lo, hi, n) =>
      base.option("partitionColumn", c)
        .option("lowerBound", lo).option("upperBound", hi)
        .option("numPartitions", n)
    }.load()
  }

  /** S2: full-table read, optionally partitioned across executors. */
  def readFull(
      spark: SparkSession, url: String, table: String,
      partitionColumn: Option[(String, Long, Long, Int)] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
    partitionColumn.fold(base) { case (c, lo, hi, n) =>
      base.option("partitionColumn", c)
        .option("lowerBound", lo).option("upperBound", hi)
        .option("numPartitions", n)
    }.load()
  }
}
