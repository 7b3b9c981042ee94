package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Consumers of a [[SnapshotDiff]] changeset: MERGE (upsert the changes
  * into a target snapshot) and SCD Type-2 history building. The reference
  * stops at emitting change rows (`cdc_metrics_job_bronze.py:91-112`);
  * these close the CDC loop on the Spark side.
  *
  * Scale shape: CDC deltas are small relative to the target, so `merge`
  * is a pk anti-join (changeset side aggregates to distinct keys —
  * broadcastable under AQE) plus a union of the new images. The target is
  * scanned once and, when the key set broadcasts, never shuffled. `scd2`
  * is the same single null-safe full-outer pk join as [[SnapshotDiff]] —
  * one shuffle per side, all branches share the exchanges.
  */
object CdcApply {

  /** Apply a changeset to a PK-unique target snapshot:
    * `merge(previous, SnapshotDiff(current, previous, pk), pk) == current`.
    *
    * Accepts both changeset contracts: the reference's triple-emission
    * (updated key → insert+update+delete rows, new/new/old images) and a
    * minimal one-row-per-key set. Keys carrying any change row leave the
    * target; the new images (insert/update actions, identical per key by
    * construction) re-enter deduped. Pure deletes carry no insert/update
    * row, so they just drop.
    *
    * Rows with a NULL or unrecognized `cdc_action` are IGNORED — they
    * neither pull the key out of the target nor contribute an image
    * (the compactLog null-handling rule: a malformed log row must never
    * silently destroy a key). An unfiltered key set would anti-join the
    * key away while `isin("insert","update")` (NULL for a NULL action)
    * drops its image — unknown action silently becoming delete. */
  def merge(target: DataFrame, changes: DataFrame, pk: Seq[String]): DataFrame = {
    val dataCols = target.columns.toIndexedSeq
    val known = changes.filter(
      coalesce(col("cdc_action").isin("insert", "update", "delete"),
        lit(false)))
    val changedKeys = known.select(pk.map(col): _*).distinct()
    val survivors = target.join(changedKeys, pk, "left_anti")
    val images = known
      .filter(col("cdc_action").isin("insert", "update"))
      .select(dataCols.map(col): _*)
      .dropDuplicates(pk)
    survivors.unionByName(images)
  }

  /** Slowly-changing-dimension Type 2 from a snapshot pair: per key,
    * version rows with `valid_from` / `valid_to` run numbers and an
    * `is_current` flag.
    *
    *  - unchanged (all non-PK columns null-safe equal): one open row,
    *    `(image, valid_from=1, valid_to=NULL, is_current=true)`;
    *  - updated: the closed old image `(1, 2, false)` plus the open new
    *    image `(2, NULL, true)`;
    *  - deleted: the closed old image `(1, 2, false)`;
    *  - inserted: the open new image `(2, NULL, true)`.
    *
    * Run numbers are injectable literals so a real pipeline can pass
    * ingestion timestamps; the defaults (1, 2) keep the gated query
    * clock-free. One null-safe full-outer join on the PK; the two output
    * branches reuse its exchanges. */
  def scd2(
      current: DataFrame,
      previous: DataFrame,
      pk: Seq[String],
      priorRun: Long = 1L,
      currentRun: Long = 2L): DataFrame = {
    val dataCols = current.columns.toIndexedSeq
    val nonPk = dataCols.filterNot(pk.contains)

    val cur = dataCols.foldLeft(current)((d, c) => d.withColumnRenamed(c, s"__c_$c"))
      .withColumn("__c_present", lit(true))
    val prev = dataCols.foldLeft(previous)((d, c) => d.withColumnRenamed(c, s"__p_$c"))
      .withColumn("__p_present", lit(true))
    val joined = cur.join(
      prev, pk.map(k => col(s"__c_$k") <=> col(s"__p_$k")).reduce(_ && _), "full_outer")

    val changed = nonPk.map(c => !(col(s"__c_$c") <=> col(s"__p_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val inPrev = col("__p_present").isNotNull
    val inCur = col("__c_present").isNotNull
    val closes = !inCur || changed // old image superseded or deleted

    def image(side: String) = dataCols.map(c => col(s"__${side}_$c").as(c))

    val history = joined.filter(inPrev).select(
      image("p")
        :+ lit(priorRun).as("valid_from")
        :+ when(closes, lit(currentRun)).cast("long").as("valid_to")
        :+ (inCur && !changed).as("is_current"): _*)
    val fresh = joined.filter(inCur && (!inPrev || changed)).select(
      image("c")
        :+ lit(currentRun).as("valid_from")
        :+ lit(null).cast("long").as("valid_to")
        :+ lit(true).as("is_current"): _*)
    history.unionByName(fresh)
  }

  /** Change-log compaction: collapse an append-only change log (multiple
    * actions per key over time) to the latest SURVIVING state per key —
    * the Kafka-compacted-topic / CDC-log-to-snapshot contract. The
    * newest entry per key wins by `ordering` (which must be a total
    * order within a key — include a unique id as the final tiebreaker);
    * keys whose newest entry is a delete leave the snapshot entirely.
    *
    * One shuffle on the pk + a per-key window sort (rows-per-key is the
    * log's version depth — small). An unknown/NULL action on the newest
    * entry is conservatively treated as an upsert, not a delete: a
    * malformed log row must never silently destroy a key (same
    * null-handling rule as the merge path's insert detection). */
  def compactLog(
      log: DataFrame, pk: Seq[String],
      ordering: Seq[org.apache.spark.sql.Column],
      actionCol: String = "cdc_action", deleteValue: String = "delete"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pk.map(col): _*).orderBy(ordering.map(_.desc): _*)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 &&
        !coalesce(col(actionCol) === deleteValue, lit(false)))
      .drop("__rn")
  }
}
