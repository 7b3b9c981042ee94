package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory (SURVEY §7.1 core): UTC, AQE, right-sized shuffle
  * partitions, and the engine's SQL functions registered. One place so
  * Verify/Bench/tests and library users get identical semantics —
  * session timezone differences would silently shift every to_date /
  * window boundary. */
object GraftSession {
  def local(threads: Int, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // The events table stores nanosecond parquet timestamps; reading
      // them as raw longs is a session-level choice made HERE, visibly,
      // not as a read-time side effect (Tables.events validates it).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.GraftExtensions.register(spark)
    spark
  }
}
