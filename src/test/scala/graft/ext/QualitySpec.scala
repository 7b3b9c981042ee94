package graft.ext

import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("observed: counters accumulate during the action, no second scan") {
    val df = Seq(
      (Some(1L), 10.0), (Some(2L), -3.0), (None, 5.0), (Some(4L), 0.0),
    ).toDF("user_id", "total_revenue")
    val (observed, obs) = Quality.observed(df, "user_id", "total_revenue")
    val n = observed.count() // the pipeline's own action drives the metrics
    assert(n == 4)
    val m = obs.get
    assert(m("n_rows") == 4L)
    assert(m("n_null_keys") == 1L)
    assert(m("n_negative_amounts") == 1L)
  }

  test("columnProfile: hand-computed nulls/distincts, and numeric min/max never goes lexicographic") {
    import java.sql.Date
    val df = Seq(
      (Some(9L), Some("b"), Some(1.25), Some(Date.valueOf("2024-02-01"))),
      (Some(10L), Some("a"), Some(3.50), Some(Date.valueOf("2024-01-15"))),
      (None, Some("a"), None, None)
    ).toDF("k", "s", "p", "d")
    val cols = Seq("k" -> "long", "s" -> "string",
      "p" -> "money2dp", "d" -> "date")
    val got = Quality.columnProfile(df, cols)
      .as[(String, Long, Long, Long, Double, String, String)]
      .collect().toSeq
    assert(got == Seq(
      // lexicographic min of {"9","10"} would be "10" — typed min is 9
      ("d", 3L, 1L, 2L, 0.333333, "2024-01-15", "2024-02-01"),
      ("k", 3L, 1L, 2L, 0.333333, "9", "10"),
      ("p", 3L, 1L, 2L, 0.333333, "125", "350"),
      ("s", 3L, 0L, 2L, 0.0, "a", "b")))
  }
}
