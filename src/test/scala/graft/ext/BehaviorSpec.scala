package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel: stage attribution follows strict event-time order") {
    val events = Seq(
      // u1 completes all three stages in order
      (1L, ts("2024-01-01 10:00:00"), "signup", 0.0),
      (1L, ts("2024-01-01 11:00:00"), "view", 0.0),
      (1L, ts("2024-01-01 12:00:00"), "purchase", 5.0),
      // u2: purchase BEFORE its first view after signup -> stage 2 only
      (2L, ts("2024-01-02 10:00:00"), "signup", 0.0),
      (2L, ts("2024-01-02 10:30:00"), "purchase", 9.0),
      (2L, ts("2024-01-02 11:00:00"), "view", 0.0),
      // u3: view precedes signup -> that view must not count; stage 1
      (3L, ts("2024-01-03 09:00:00"), "view", 0.0),
      (3L, ts("2024-01-03 10:00:00"), "signup", 0.0),
      // u4 never signs up -> not in the funnel at all
      (4L, ts("2024-01-04 10:00:00"), "view", 0.0)
    ).toDF("user_id", "ts", "event_type", "value")

    val got = Behavior.funnel(events)
      .select("user_id", "stage_reached").as[(Long, Int)]
      .collect().toMap
    assert(got === Map(1L -> 3, 2L -> 2, 3L -> 1))
  }

  test("retentionWeekly: offsets count from each user's first week") {
    val events = Seq(
      // u1 active weeks 0 and 2 of cohort 2024-01-01 (a Monday)
      (1L, ts("2024-01-02 10:00:00"), "view", 0.0),
      (1L, ts("2024-01-16 10:00:00"), "view", 0.0),
      // u2 active only week 0 of the same cohort
      (2L, ts("2024-01-03 10:00:00"), "click", 0.0),
      // u3 cohort one week later, active weeks 0 and 1
      (3L, ts("2024-01-10 10:00:00"), "view", 0.0),
      (3L, ts("2024-01-15 10:00:00"), "view", 0.0)
    ).toDF("user_id", "ts", "event_type", "value")

    val got = Behavior.retentionWeekly(events)
      .select(col("cohort_week").cast("string"), col("week_offset"), col("n_users"))
      .as[(String, Int, Long)].collect().toSet
    assert(got === Set(
      ("2024-01-01", 0, 2L), ("2024-01-01", 2, 1L),
      ("2024-01-08", 0, 1L), ("2024-01-08", 1, 1L)))
  }
}
