package graft.gold

import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

class FulfillmentSpec extends SparkSpec {
  import spark.implicits._

  private def planText(df: org.apache.spark.sql.DataFrame): String =
    df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  private val ts = (s: String) => java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("shippingBacklog: only pre-cutoff orders with post-cutoff lines; boundary-tie resolved by orderkey; top-k is a partial sort") {
    val customer = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val orders = Seq(
      (10L, 1L, ts("1998-01-01"), "5-LOW"),   // in scope
      (11L, 1L, ts("1998-07-01"), "5-LOW"),   // placed after cutoff
      (12L, 2L, ts("1998-01-01"), "5-LOW"),   // wrong segment
      (13L, 1L, ts("1998-01-02"), "5-LOW"),   // ties with 10 on revenue
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val lines = Seq(
      (10L, 100.0, 0.0, ts("1998-07-01")),  // unshipped -> counts
      (10L, 999.0, 0.0, ts("1998-01-05")),  // already shipped -> excluded
      (11L, 100.0, 0.0, ts("1998-07-02")),
      (12L, 100.0, 0.0, ts("1998-07-02")),
      (13L, 100.0, 0.0, ts("1998-07-03")),
    ).toDF("l_orderkey", "l_extendedprice", "l_discount", "l_shipdate")
    val got = Fulfillment.shippingBacklog(
        lines, orders, customer, "BUILDING", "1998-06-01", k = 1)
      .select($"o_orderkey", $"revenue").as[(Long, Double)].collect()
    // orders 10 and 13 tie at 100.0; the orderkey tiebreak keeps 10
    assert(got.toSeq == Seq((10L, 100.0)))
    val txt = planText(Fulfillment.shippingBacklog(
      lines, orders, customer, "BUILDING", "1998-06-01"))
    assert(txt.contains("TakeOrderedAndProject"),
      s"top-k must be a distributed partial sort, not a global sort:\n$txt")
  }

  test("orderCountHistogram: zero-order customers form a bucket; excluded priority doesn't count") {
    val customer = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq(
      (10L, 1L, "5-LOW"), (11L, 1L, "5-LOW"),
      (12L, 2L, "1-URGENT"), // excluded -> customer 2 counts as zero
    ).toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val got = Fulfillment.orderCountHistogram(orders, customer, "1-URGENT")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 2L, 2L -> 1L))
  }

  test("topQuarterSupplier keeps ties; window is scalar-broadcast, not unpartitioned") {
    val lines = Seq(
      (1L, 100.0, 0.0, ts("1997-01-05")),
      (2L, 100.0, 0.0, ts("1997-02-05")),  // ties with supplier 1
      (3L, 50.0, 0.0, ts("1997-03-05")),
      (1L, 75.0, 0.0, ts("1997-06-05")),   // outside the quarter
    ).toDF("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    val supplier = Seq((1L, "s1"), (2L, "s2"), (3L, "s3"))
      .toDF("s_suppkey", "s_name")
    val df = Fulfillment.topQuarterSupplier(lines, supplier, "1997-01-01")
    assert(df.select($"s_suppkey").as[Long].collect().toSeq == Seq(1L, 2L))
    val wins = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
      .queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
    assert(wins.isEmpty, "the max must be a broadcast scalar, not a window")
  }

  test("disjunctivePricing: each arm's qty band binds only to its own brand; no match yields the 0.0 row") {
    val part = Seq(
      (1L, "Brand#3", 10), (2L, "Brand#14", 10), (3L, "Brand#25", 10),
    ).toDF("p_partkey", "p_brand", "p_size")
    val lines = Seq(
      (1L, 5.0, 100.0, 0.0),   // arm 0: qty 1-11 -> in
      (1L, 15.0, 999.0, 0.0),  // qty 15 outside arm 0's band -> out
      (2L, 15.0, 200.0, 0.0),  // arm 1: qty 10-20 -> in
      (3L, 15.0, 999.0, 0.0),  // arm 2 needs qty 20-30 -> out
    ).toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val arms = Seq(
      Fulfillment.PricingArm("Brand#3", 1, 11, 1, 15),
      Fulfillment.PricingArm("Brand#14", 10, 20, 1, 25),
      Fulfillment.PricingArm("Brand#25", 20, 30, 5, 50))
    val got = Fulfillment.disjunctivePricing(lines, part, arms)
      .as[(Long, Double)].collect()
    assert(got.toSeq == Seq((2L, 300.0)))
    val empty = Fulfillment.disjunctivePricing(
        lines.filter($"l_extendedprice" < 0), part, arms)
      .as[(Long, Double)].collect()
    assert(empty.toSeq == Seq((0L, 0.0)))
  }

  test("bulkOrders: strict threshold; HAVING runs before the dim joins") {
    val lines = Seq(
      (10L, 150.0), (10L, 51.0),  // 201 -> in
      (11L, 200.0),               // exactly 200 -> out (strict >)
    ).toDF("l_orderkey", "l_quantity")
    val orders = Seq(
      (10L, 1L, ts("1997-01-01"), 500.0), (11L, 1L, ts("1997-01-02"), 400.0),
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val customer = Seq((1L, "c1")).toDF("c_custkey", "c_name")
    val got = Fulfillment.bulkOrders(lines, orders, customer, 200L)
      .select($"o_orderkey", $"sum_qty").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((10L, 201L)))
  }

  test("repricingWhatIf filters reach the scan; supplierVariety plans no count-distinct expand") {
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val what = planText(Fulfillment.repricingWhatIf(
      li, "1997-01-01", 0.05, 0.07, 24))
    val scanRead = what.linesIterator
      .dropWhile(!_.contains("lineitem.parquet"))
      .find(_.startsWith("PushedFilters"))
      .getOrElse(fail("no lineitem PushedFilters found"))
    assert(scanRead.contains("l_quantity") && scanRead.contains("l_discount"),
      s"Q6 predicates must push into the scan: $scanRead")
    val variety = planText(Fulfillment.supplierVariety(
      li, graft.core.Tables.part(spark, "/root/testdata/sf0.001"),
      "Brand#13"))
    assert(!variety.contains("Expand"),
      s"distinct-then-count must not plan an Expand:\n$variety")
  }

  test("pricingSummary: one line per (flag, status) with exact integer money and half-up averages; cutoff is inclusive") {
    val lines = Seq(
      ("A", "F", 10.0, 100.0, 0.10, 0.05, ts("1998-09-02")), // on cutoff
      ("A", "F", 20.0, 200.0, 0.00, 0.00, ts("1998-01-01")),
      ("N", "O", 5.0, 50.0, 0.20, 0.10, ts("1998-12-31")),   // after cutoff
    ).toDF("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_shipdate")
    val got = Fulfillment.pricingSummary(lines, "1998-09-02")
      .as[(String, String, Long, Double, Double, Double,
        Double, Double, Double, Long)].collect().toSeq
    // sums: qty 30, base 300, disc 90+200=290, charge 94.5+200=294.5
    // avgs: qty 15, price 150, disc 0.05
    assert(got == Seq(
      ("A", "F", 30L, 300.0, 290.0, 294.5, 15.0, 150.0, 0.05, 2L)))
  }

  test("disjunctivePricing: overlapping same-brand arms behave as a true OR — a line qualifying under the earlier arm is kept") {
    val part = Seq((1L, "Brand#3", 20)).toDF("p_partkey", "p_brand", "p_size")
    val lines = Seq(
      (1L, 5.0, 100.0, 0.0),   // qty 5: arm 1's band only
      (1L, 25.0, 100.0, 0.0),  // qty 25: arm 2's band only
      (1L, 15.0, 100.0, 0.0),  // neither band
    ).toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val arms = Seq(
      Fulfillment.PricingArm("Brand#3", 1, 10, 1, 50),
      Fulfillment.PricingArm("Brand#3", 20, 30, 1, 50))
    val got = Fulfillment.disjunctivePricing(lines, part, arms)
      .as[(Long, Double)].collect().head
    assert(got == ((2L, 200.0)),
      "both overlapping arms must admit their own quantity bands")
  }
}
