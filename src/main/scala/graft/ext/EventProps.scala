package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Semi-structured event-property handling: the `events.props` column is
  * JSON-ish text. Spark-native shape: `from_json` with an explicit
  * schema into a struct (typed access, codegen'd), then normal
  * aggregation. At 100 TB, parse ONCE into a materialized struct/Map
  * column at ingest rather than per query. */
object EventProps {

  private val propsSchema = StructType(Seq(StructField("k", IntegerType)))

  /** Per-event-type rollup of the parsed `k` property. */
  def propRollup(events: DataFrame): DataFrame =
    events
      .withColumn("k", from_json(col("props"), propsSchema).getField("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("k_sum"),
        max(col("k")).as("k_max"))
}

/** Calendar-dimension generator — the reference maintains a `date_dim`
  * table (PK date_key, is_weekend/is_holiday flags,
  * `cdc_metrics_job_bronze.py:45,82-83`) ingested through the same
  * bronze→silver path as any dimension. The reference sources it from
  * JDBC; generating it is the self-contained equivalent (one `range`,
  * no shuffle). is_holiday is a fixed-date rule here (Jan 1 / Dec 25) —
  * deployments swap in a real holiday calendar. */
object DateDim {
  def generate(spark: org.apache.spark.sql.SparkSession,
      start: String, end: String): DataFrame = {
    spark.range(1).select(
        explode(sequence(
          to_date(lit(start)), to_date(lit(end)),
          expr("interval 1 day"))).as("date_key"))
      .select(
        col("date_key"),
        (dayofweek(col("date_key")).isin(1, 7)).as("is_weekend"),
        (month(col("date_key")) === 1 && dayofmonth(col("date_key")) === 1 ||
          month(col("date_key")) === 12 && dayofmonth(col("date_key")) === 25)
          .as("is_holiday"),
        year(col("date_key")).as("year"),
        month(col("date_key")).as("month"),
        weekofyear(col("date_key")).as("week"))
  }
}
