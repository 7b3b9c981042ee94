package graft.gold

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Edge-semantics unit tests for the gold marts (SURVEY §5.1): the null
  * paths, guards, and boundaries the oracle exercises only by accident. */
class MartsSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  // line-grain order_revenue rows: (order, line, user, restaurant,
  // category, loyalty, item_price, date)
  private def revenue(rows: (Long, Int, Long, Long, String, Boolean, Double, String)*) =
    rows.toDF("order_id", "lineitem_id", "user_id", "restaurant_id",
        "item_category", "is_loyalty", "item_price", "creation_date")
      .withColumn("creation_date", to_date($"creation_date"))
      .withColumn("creation_ts", to_timestamp($"creation_date"))
      .withColumn("option_price", lit(0.0))
      .withColumn("total_revenue", $"item_price")

  test("churn: single-order user has null avg gap; zero prev-spend gives null pct change") {
    val df = revenue(
      (1, 1, 10, 1, "c", false, 100.0, "2024-03-01"),   // user 10: one order, recent
      (2, 1, 20, 1, "c", false, 50.0, "2024-01-01"),    // user 20: old orders only
      (3, 1, 20, 1, "c", false, 70.0, "2024-01-05"))
    val churn = Churn(df).collect().map(r => r.getLong(0) -> r).toMap
    // anchor = 2024-03-01 (max date)
    val u10 = churn(10L)
    assert(u10.isNullAt(u10.fieldIndex("avg_order_gap_days")))
    // user 10 spent only in the last 30 days: prev window 0 → pct null
    assert(u10.getDouble(u10.fieldIndex("spend_last_30")) == 100.0)
    assert(u10.getDouble(u10.fieldIndex("spend_prev_30")) == 0.0)
    assert(u10.isNullAt(u10.fieldIndex("pct_spend_change")))
    val u20 = churn(20L)
    assert(u20.getDouble(u20.fieldIndex("avg_order_gap_days")) == 4.0)
    assert(u20.getString(u20.fieldIndex("churn_risk_tag")) == "At Risk") // 55+ days
    assert(u10.getString(u10.fieldIndex("churn_risk_tag")) == "Active")
  }

  test("rfm: segment rules and recency from the data anchor, not the wall clock") {
    val df = revenue(
      // user 1: 5 orders, recent, high spend → VIP
      (1, 1, 1, 1, "c", false, 50.0, "2024-02-28"), (2, 1, 1, 1, "c", false, 50.0, "2024-02-27"),
      (3, 1, 1, 1, "c", false, 50.0, "2024-02-26"), (4, 1, 1, 1, "c", false, 50.0, "2024-02-25"),
      (5, 1, 1, 1, "c", false, 50.0, "2024-03-01"),
      // user 2: single recent order → New
      (6, 1, 2, 1, "c", false, 10.0, "2024-02-20"),
      // user 3: stale single order → Churn Risk
      (7, 1, 3, 1, "c", false, 10.0, "2023-01-01"))
    val seg = Rfm(df).select($"user_id", $"segment").as[(Long, String)].collect().toMap
    assert(seg == Map(1L -> "VIP", 2L -> "New", 3L -> "Churn Risk"))
  }

  test("ltv: cumulative is a running sum; latest picks max date; segments split 20/80") {
    val df = revenue(
      (1, 1, 1, 1, "c", false, 10.0, "2024-01-01"),
      (2, 1, 1, 1, "c", false, 20.0, "2024-01-02"),
      (3, 1, 2, 1, "c", false, 5.0, "2024-01-01"))
    val daily = Ltv.daily(df)
    val cum = daily.filter($"user_id" === 1).orderBy($"creation_date")
      .select($"cumulative_ltv").as[Double].collect().toSeq
    assert(cum == Seq(10.0, 30.0))
    val latest = Ltv.latest(daily)
    assert(latest.filter($"user_id" === 1).select($"lifetime_value").as[Double].head() == 30.0)
    assert(latest.filter($"user_id" === 1).select($"last_date").as[Date].head() == d("2024-01-02"))
    val segs = Ltv.segments(latest).select($"user_id", $"clv_segment")
      .as[(Long, String)].collect().toMap
    assert(segs(2L) == "Low" && segs(1L) == "High")
  }

  test("discount: any negative option line marks the whole order discounted") {
    val items = Seq((1L, 1, 10L), (1L, 2, 10L), (2L, 1, 20L))
      .toDF("order_id", "lineitem_id", "user_id")
    val options = Seq((1L, 1, -2.0)).toDF("order_id", "lineitem_id", "option_price")
    val rev = Seq((1L, 30.0), (1L, 20.0), (2L, 40.0))
      .toDF("order_id", "total_revenue")
    val out = Discount(items, options, rev)
      .select($"is_discounted_order", $"num_orders", $"total_revenue")
      .as[(String, Long, Double)].collect().map { case (k, n, t) => k -> ((n, t)) }.toMap
    // order 1: 2 item lines × (30+20) revenue = 100 (fan-out preserved)
    assert(out("Yes") == (1L, 100.0))
    assert(out("No") == (1L, 40.0))
  }

  test("loyalty: repeat rate counts multi-order users per cohort") {
    val items = Seq(
      (1L, 1L, true), (2L, 1L, true),          // user 1 loyal, 2 orders → repeat
      (3L, 2L, false))                          // user 2 not loyal, 1 order
      .toDF("order_id", "user_id", "is_loyalty")
    val rev = Seq((1L, 10.0), (2L, 20.0), (3L, 40.0)).toDF("order_id", "total_revenue")
    val out = Loyalty(items, rev)
      .select($"is_loyalty", $"num_customers", $"avg_spend_per_customer",
        $"num_repeat_customers", $"repeat_order_rate")
      .as[(Boolean, Long, Double, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(true) == ((true, 1L, 30.0, 1L, 1.0)))
    assert(out(false) == ((false, 1L, 40.0, 0L, 0.0)))
  }

  test("fused single-input marts equal the reference three/two-frame decompositions") {
    val sf = "/root/testdata/sf0.001"
    val items = graft.bindings.Conformed.items(spark, sf)
    val options = graft.bindings.Conformed.options(spark, sf)
    val rev = graft.bindings.Conformed.orderRevenue(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(Discount(rev)) == rows(Discount(items, options, rev)))
    assert(rows(Loyalty(rev)) == rows(Loyalty(items, rev)))
    assert(rows(Location(rev)) == rows(Location(items, rev)))
  }

  test("trends: unpadded year-week/month keys and ISO week at the year boundary") {
    val df = revenue(
      (1, 1, 1, 1, "cat", false, 10.0, "1998-01-01"),   // ISO week 1 of 1998
      (2, 1, 1, 1, "cat", false, 10.0, "2021-01-01"))   // ISO week 53 of 2020!
    val weekly = SalesTrends.weekly(df).select($"year_week").as[String].collect().toSet
    assert(weekly == Set("1998-1", "2021-53"))  // calendar year + ISO week, no pad
    val monthly = SalesTrends.monthly(df).select($"year_month").as[String].collect().toSet
    assert(monthly == Set("1998-1", "2021-1"))
  }
}
