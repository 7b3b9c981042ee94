package graft.gold

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UnpivotSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 12:00:00")

  private lazy val revenue = Seq(
    (1L, ts("2024-01-10"), 10.5),
    (1L, ts("2024-01-20"), 2.25),
    (1L, ts("2024-03-01"), 7.0),
    (2L, ts("2024-02-14"), 99.99)
  ).toDF("restaurant_id", "creation_date", "total_revenue")

  test("unpivotMonths inverts monthlyPivot to the direct monthly aggregate") {
    val roundTrip = SalesTrends.unpivotMonths(SalesTrends.monthlyPivot(revenue))
    val direct = revenue
      .groupBy($"restaurant_id", month($"creation_date").cast("long").as("month"))
      .agg(Money.sumMoney($"total_revenue").as("revenue"))
    assert(roundTrip.except(direct).isEmpty && direct.except(roundTrip).isEmpty)
    // absent months are dropped, not NULL rows
    assert(roundTrip.count() == 3)
    val got = roundTrip.orderBy($"restaurant_id", $"month")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1L, 12.75), (1L, 3L, 7.0), (2L, 2L, 99.99)))
  }
}
