package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The sampled hot-key guard on the ingest-contract attribution family:
  * off by default (zero behavior change), warn logs, fail throws BEFORE
  * the quadratic window executes, and contract-clean input passes in
  * every mode with identical results. */
class ScaleRoutingSpec extends SparkSpec {

  /** One 200k-row hot entity (1% sample ≈ 2000 ≫ the 1000 sampled
    * bound) next to a handful of normal users. */
  private def hotEvents: DataFrame =
    spark.range(200000).select(
      lit(7L).as("user_id"),
      col("id").as("event_id"),
      when(pmod(col("id"), lit(10L)) === 0, "purchase").otherwise("view")
        .as("event_type"),
      timestamp_micros(lit(1700000000000000L) + col("id") * 1000000L).as("ts"),
      lit(1.0).as("value"))

  private def cleanEvents: DataFrame =
    spark.range(1000).select(
      pmod(col("id"), lit(50L)).as("user_id"),
      col("id").as("event_id"),
      when(pmod(col("id"), lit(10L)) === 0, "purchase").otherwise("view")
        .as("event_type"),
      timestamp_micros(lit(1700000000000000L) + col("id") * 1000000L).as("ts"),
      lit(1.0).as("value"))

  private def withGuard[A](mode: String)(body: => A): A =
    try { spark.conf.set(ScaleRouting.guardConfKey, mode); body }
    finally spark.conf.unset(ScaleRouting.guardConfKey)

  test("guard off (default): hot input passes through untouched") {
    // conf unset -> the guard runs no job and never throws
    ScaleRouting.guardHotKeys(hotEvents, "user_id", "test_op")
  }

  test("guard warn: hot input logs but does not throw; clean input is silent") {
    withGuard("warn") {
      ScaleRouting.guardHotKeys(hotEvents, "user_id", "test_op")
      ScaleRouting.guardHotKeys(cleanEvents, "user_id", "test_op")
    }
  }

  test("guard fail: hot input throws before the operator's window executes") {
    withGuard("fail") {
      val e = intercept[IllegalStateException] {
        graft.ext.Behavior.linearAttribution(
          hotEvents, Seq("view"), lookbackDays = 7)
      }
      assert(e.getMessage.contains("hot-key guard"))
      assert(e.getMessage.contains("eventRateCap"),
        "the failure must name the prescribed fix (q340 ingest cap)")
      // the other three family members enforce the same contract
      intercept[IllegalStateException] {
        graft.ext.Behavior.timeDecayAttribution(hotEvents, Seq("view"))
      }
      intercept[IllegalStateException] {
        graft.ext.Behavior.shapleyAttribution(hotEvents, Seq("view"))
      }
      intercept[IllegalStateException] {
        graft.ext.Behavior.attribution(hotEvents)
      }
    }
  }

  test("q130 attribution: clean input identical with guard on (fail) vs off") {
    val off = graft.ext.Behavior.attribution(cleanEvents)
      .orderBy("purchase_id").collect().toSeq
    val on = withGuard("fail") {
      graft.ext.Behavior.attribution(cleanEvents)
        .orderBy("purchase_id").collect().toSeq
    }
    assert(off.nonEmpty)
    assert(on == off, "the guard must be zero-behavior-change on clean input")
  }

  test("guard fail: contract-clean input runs with results identical to guard-off") {
    val off = graft.ext.Behavior.linearAttribution(cleanEvents, Seq("view"))
      .orderBy("touch_type").collect().toSeq
    val on = withGuard("fail") {
      graft.ext.Behavior.linearAttribution(cleanEvents, Seq("view"))
        .orderBy("touch_type").collect().toSeq
    }
    assert(off.nonEmpty)
    assert(on == off, "the guard must be zero-behavior-change on clean input")
  }
}
