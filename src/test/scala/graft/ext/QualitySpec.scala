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
}
