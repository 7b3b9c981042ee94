package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins: as-of join and
  * range (interval) join. Neither exists in the reference (SURVEY §2.3
  * notes the gap) — they are part of the training-pipeline extension
  * tier, built with the scale-correct decompositions:
  *
  *  - as-of: union both sides, ONE shuffle by the partition key, and a
  *    running `last(_, ignoreNulls)` window — never a per-row
  *    inequality join (which Spark would execute as a nested-loop /
  *    broadcast-theta join, quadratic per key);
  *  - range: map intervals to fixed-width buckets (exploding an
  *    interval into every bucket it covers), equi-join points to
  *    buckets, then apply the exact BETWEEN residual — turning an
  *    inequality join into a shuffle-on-bucket hash join. Bucket width
  *    trades explosion factor against residual selectivity; pick it
  *    near the median interval length.
  */
object Temporal {

  /** Left as-of join: for every left row, the single most recent right
    * row (same `partitionCols`) with `rightTime <= leftTime` (inclusive;
    * ties on the instant take the right row — pass `strict = true` for
    * `<`). Right payload columns surface as `asof_<name>`; left rows
    * with no prior right row keep NULLs (left-join semantics).
    *
    * Deterministic when no two right rows share (partition, time);
    * with such ties the later-sorted one wins (`rightTime` then input
    * order — pass pre-deduped rights for a total contract). */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      partitionCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      strict: Boolean = false): DataFrame = {
    val leftTag = if (strict) 0 else 1 // equal instants: right first unless strict
    val rightTag = 1 - leftTag
    val r = right.select(
      partitionCols.map(col) ++
        Seq(col(rightTime).cast("timestamp").as("__t"), lit(rightTag).as("__side")) ++
        rightPayload.map(c => col(c).as(s"__r_$c")): _*)
    val l = left
      .withColumn("__t", col(leftTime).cast("timestamp"))
      .withColumn("__side", lit(leftTag))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightPayload.foldLeft(u) { (d, c) =>
      d.withColumn(s"asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === leftTag)
      .drop("__t" +: "__side" +: rightPayload.map(c => s"__r_$c"): _*)
  }

  /** Range join of date `points` into [start, end] (inclusive)
    * intervals, via `bucketDays`-wide day buckets: each interval
    * explodes to the buckets it covers, points equi-join on their
    * bucket, and the exact BETWEEN residual filters. Returns the inner
    * join (point ∈ interval), all left + right columns. */
  def rangeJoinDates(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketDays: Int = 7): DataFrame = {
    require(bucketDays >= 1, "bucketDays must be >= 1")
    val epoch = lit("1970-01-01").cast("date")
    def bucketOf(c: Column): Column = floor(datediff(c, epoch) / bucketDays)
    val bi = intervals.withColumn(
      "__bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    val bp = points.withColumn("__bucket", bucketOf(col(pointCol)))
    bp.join(bi, Seq("__bucket"))
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__bucket")
  }
}
