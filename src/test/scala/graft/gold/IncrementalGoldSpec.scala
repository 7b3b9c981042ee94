package graft.gold

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.bindings.Conformed

class IncrementalGoldSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("IncrementalLtv over a user-scoped delta equals the full recompute") {
    val v1 = Conformed.orderRevenue(spark, sf)
    // v2: a "second run" where some users' revenue changed
    val v2 = v1.withColumn(
      "total_revenue",
      when($"user_id" % 7 === 0, $"total_revenue" * 2).otherwise($"total_revenue"))
    val mart1 = Ltv.daily(v1)
    val delta = v2.filter($"user_id" % 7 === 0) // the changed rows (cdc log)
    val incremental = IncrementalLtv(mart1, v2, delta)
      .select($"user_id", $"creation_date".cast("string"), $"daily_revenue",
        $"cumulative_ltv")
      .as[(Long, String, Double, Double)].collect().toSet
    val full = Ltv.daily(v2)
      .select($"user_id", $"creation_date".cast("string"), $"daily_revenue",
        $"cumulative_ltv")
      .as[(Long, String, Double, Double)].collect().toSet
    assert(incremental == full)
  }

  test("IncrementalRollup.addDelta over an append split equals the one-shot rollup") {
    val rev = Conformed.orderRevenue(spark, sf)
    val cutoff = "1996-12-31"
    val old = rev.filter($"creation_date" <= lit(cutoff))
    val fresh = rev.filter($"creation_date" > lit(cutoff))
    assert(old.count() > 0 && fresh.count() > 0)
    val keys = Seq("creation_date", "restaurant_id", "item_category")
    val merged = IncrementalRollup.addDelta(
        SalesTrends.daily(old), SalesTrends.daily(fresh), keys, "daily_revenue")
      .select($"creation_date".cast("string"), $"restaurant_id", $"item_category",
        $"daily_revenue")
      .as[(String, Long, String, Double)].collect().toSet
    val oneShot = SalesTrends.daily(rev)
      .select($"creation_date".cast("string"), $"restaurant_id", $"item_category",
        $"daily_revenue")
      .as[(String, Long, String, Double)].collect().toSet
    assert(merged == oneShot)
  }
}
