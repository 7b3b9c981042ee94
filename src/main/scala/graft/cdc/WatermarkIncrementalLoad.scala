package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermark-driven incremental processing.
  *
  * Reference capability: read-since-watermark, process, advance the
  * watermark to max(processed) (`scripts/cdc_metrics_job_bronze.py:57-67,90`;
  * `scripts/cdc_metrics_job_silver.py:53-75`). Two reference policies are
  * preserved:
  *  - bronze re-reads the boundary instant (`>=` on a timestamp,
  *    `cdc_metrics_job_bronze.py:64`) and advances to "now";
  *  - silver drops same-day late rows (`>` on a DATE-granularity
  *    watermark, `cdc_metrics_job_silver.py:59`) and advances to the max
  *    date actually processed (`:73-74`) — the safer contract, and the
  *    default here.
  *
  * Scale: the watermark predicate is applied directly after the scan so
  * Catalyst pushes it into the source (JDBC query pushdown / parquet
  * row-group skipping / partition pruning when the layout is partitioned
  * by the watermark column — `.explain` shows it under PushedFilters).
  * Watermark advancement is a single-row aggregate, not a collect of data.
  */
object WatermarkIncrementalLoad {

  /** Rows strictly after the watermark (silver policy). */
  def sinceExclusive(df: DataFrame, watermarkCol: String, lastRun: String): DataFrame =
    df.filter(col(watermarkCol) > lit(lastRun))

  /** Rows at-or-after the watermark (bronze boundary-instant policy). */
  def sinceInclusive(df: DataFrame, watermarkCol: String, lastRun: String): DataFrame =
    df.filter(col(watermarkCol) >= lit(lastRun))

  /** Max processed watermark value as a string, None when empty. */
  def maxWatermark(df: DataFrame, watermarkCol: String): Option[String] = {
    val row = df.agg(max(col(watermarkCol)).cast("string")).head()
    Option(row.getString(0))
  }

  /** Full cycle: filter since watermark, process, write via `sink`,
    * advance the stored watermark to max(processed). Returns the new
    * watermark, or None when there was nothing to process (watermark
    * untouched — reference `cdc_metrics_job_silver.py:61-63`). */
  def run(
      store: ControlStore,
      key: String,
      input: DataFrame,
      watermarkCol: String,
      defaultWatermark: String = "2020-01-01")(
      process: DataFrame => DataFrame)(
      sink: DataFrame => Unit): Option[String] = {
    val lastRun = store.get(key, defaultWatermark)
    val fresh = sinceExclusive(input, watermarkCol, lastRun)
    if (fresh.isEmpty) None
    else {
      // persist: the processed lineage is consumed twice (sink + max
      // aggregate) and `process` typically contains the expensive
      // cast/dedup work — without this the silver job runs its
      // dominant cost twice (the reference recomputes, SURVEY §3.2)
      val processed = process(fresh)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        sink(processed)
        val wm = maxWatermark(processed, watermarkCol)
        wm.foreach(store.put(key, _))
        wm
      } finally { processed.unpersist() }
    }
  }
}

/** Append-only CDC tagging for watermarked fact extracts: every fresh row
  * is an `insert` (reference `cdc_metrics_job_bronze.py:86-90`). */
object AppendOnlyCdc {
  def apply(df: DataFrame, cdcTimestamp: Column = current_timestamp()): DataFrame =
    df.withColumn("cdc_action", lit("insert"))
      .withColumn("cdc_timestamp", cdcTimestamp)
}
