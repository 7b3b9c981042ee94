package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit pins for the supply-chain analytics batch (q224–q229). */
class SupplySpec extends SparkSpec {
  import spark.implicits._

  private def li(rows: (Long, Long, Long, Double, Double, Double, String)*) =
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "ship")
      .withColumn("l_shipdate", col("ship").cast("timestamp"))

  private val suppliers = Seq(
    (1L, "SupA", 10), (2L, "SupB", 10), (3L, "SupC", 20))
    .toDF("s_suppkey", "s_name", "s_nationkey")
  private val nations = Seq((10, "GAUL", 100), (20, "IBERIA", 100))
    .toDF("n_nationkey", "n_name", "n_regionkey")
  private val regions = Seq((100, "EUROPE")).toDF("r_regionkey", "r_name")

  test("minCostSupplier: lowest unit price wins; supplier-key tie-break") {
    // part 7: supplier 1 sells 10 units for $100 (10/u), supplier 2
    // sells 5 units for $40 (8/u) → supplier 2 wins.
    // part 8: suppliers 1 and 3 both at 5/u → tie → lower key (1) wins.
    val lines = li(
      (1L, 7L, 1L, 10.0, 100.0, 0.0, "2024-01-01 00:00:00"),
      (2L, 7L, 2L, 5.0, 40.0, 0.0, "2024-01-01 00:00:00"),
      (3L, 8L, 1L, 4.0, 20.0, 0.0, "2024-01-01 00:00:00"),
      (4L, 8L, 3L, 2.0, 10.0, 0.0, "2024-01-01 00:00:00"))
    val got = Supply.minCostSupplier(lines, suppliers, nations, regions)
      .orderBy("p_partkey")
      .select("p_partkey", "best_suppkey", "supplier_name", "nation", "unit_price")
      .as[(Long, Long, String, String, Double)].collect()
    assert(got.toSeq == Seq(
      (7L, 2L, "SupB", "GAUL", 8.0),
      (8L, 1L, "SupA", "GAUL", 5.0)))
  }

  test("latePriorityAudit: per-order ANY-late flag; zero-line orders counted") {
    val orders = Seq(
      (1L, "1-URGENT", "2024-01-01 00:00:00"),
      (2L, "1-URGENT", "2024-01-01 00:00:00"),
      (3L, "2-HIGH", "2024-01-01 00:00:00")) // no lines at all
      .toDF("o_orderkey", "o_orderpriority", "od")
      .withColumn("o_orderdate", col("od").cast("timestamp"))
    // order 1: one on-time + one late line → late once; order 2 on time
    val lines = li(
      (1L, 7L, 1L, 1.0, 1.0, 0.0, "2024-01-05 00:00:00"),
      (1L, 7L, 1L, 1.0, 1.0, 0.0, "2024-02-15 00:00:00"),
      (2L, 7L, 1L, 1.0, 1.0, 0.0, "2024-01-10 00:00:00"))
    val got = Supply.latePriorityAudit(orders, lines, graceDays = 21)
      .orderBy("o_orderpriority")
      .select("o_orderpriority", "n_orders", "n_late_ship", "late_share")
      .as[(String, Long, Long, Double)].collect()
    assert(got.toSeq == Seq(
      ("1-URGENT", 2L, 1L, 0.5),
      ("2-HIGH", 1L, 0L, 0.0)))
  }

  test("importantStock: cross-multiplied cutoff keeps above-average parts") {
    // brand X: parts 1,2,3 with revenue 60/30/10 → shares .6/.3/.1,
    // avg share 1/3; 1.5× avg = .5 → only part 1 passes
    val parts = Seq((1L, "X"), (2L, "X"), (3L, "X"))
      .toDF("p_partkey", "p_brand")
    val lines = li(
      (1L, 1L, 1L, 1.0, 60.0, 0.0, "2024-01-01 00:00:00"),
      (2L, 2L, 1L, 1.0, 30.0, 0.0, "2024-01-01 00:00:00"),
      (3L, 3L, 1L, 1.0, 10.0, 0.0, "2024-01-01 00:00:00"))
    val got = Supply.importantStock(lines, parts, multipleTenths = 15)
      .select("p_brand", "p_partkey", "revenue", "share")
      .as[(String, Long, Double, Double)].collect()
    assert(got.toSeq == Seq(("X", 1L, 60.0, 0.6)))
  }

  test("smallQuantityRevenue: below-half-average lines aggregate per brand") {
    // part 1 avg qty = (1+9)/2 = 5 → the qty-1 line (< 2.5) is small
    val parts = Seq((1L, "B1")).toDF("p_partkey", "p_brand")
    val lines = li(
      (1L, 1L, 1L, 1.0, 10.0, 0.0, "2024-01-01 00:00:00"),
      (2L, 1L, 1L, 9.0, 90.0, 0.0, "2024-01-01 00:00:00"))
    val got = Supply.smallQuantityRevenue(lines, parts)
      .select("p_brand", "n_lines", "n_small", "small_revenue", "small_share")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.toSeq == Seq(("B1", 2L, 1L, 10.0, 0.1)))
  }

  test("dormantHighValue: above-average balance AND no recent orders") {
    val customers = Seq(
      (1L, "SEG", 100.0),  // above avg(50+100+150)/… but ordered recently
      (2L, "SEG", 150.0),  // above avg, dormant → kept
      (3L, "SEG", 50.0),   // below avg positive balance (avg = 100)
      (4L, "SEG", -10.0))  // negative balances excluded from the average
      .toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val orders = Seq(
      (1L, 1L, "2024-06-30 00:00:00"), // recent (max date anchor)
      (2L, 2L, "2024-01-01 00:00:00"), // stale
      (3L, 3L, "2024-06-29 00:00:00"))
      .toDF("o_orderkey", "o_custkey", "od")
      .withColumn("o_orderdate", col("od").cast("timestamp"))
    val got = Supply.dormantHighValue(customers, orders, dormantDays = 90)
      .select("c_mktsegment", "n_dormant", "total_balance", "avg_balance")
      .as[(String, Long, Double, Double)].collect()
    assert(got.toSeq == Seq(("SEG", 1L, 150.0, 150.0)))
  }

  test("supplierReliability: exact late rate and a Wilson bound below it") {
    val orders = Seq((1L, "2024-01-01 00:00:00"), (2L, "2024-01-01 00:00:00"))
      .toDF("o_orderkey", "od")
      .withColumn("o_orderdate", col("od").cast("timestamp"))
    val lines = li(
      (1L, 7L, 1L, 1.0, 1.0, 0.0, "2024-02-15 00:00:00"), // late
      (2L, 7L, 1L, 1.0, 1.0, 0.0, "2024-01-05 00:00:00"),
      (1L, 7L, 2L, 1.0, 1.0, 0.0, "2024-01-02 00:00:00"),
      (2L, 7L, 2L, 1.0, 1.0, 0.0, "2024-01-03 00:00:00"))
    val got = Supply.supplierReliability(lines, orders, suppliers, graceDays = 21)
      .orderBy("s_suppkey")
      .select("s_suppkey", "n_lines", "n_late", "late_rate", "wilson_lb")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(got.map(r => (r._1, r._2, r._3, r._4)).toSeq ==
      Seq((1L, 2L, 1L, 0.5), (2L, 2L, 0L, 0.0)))
    val wilson = got.map(r => r._1 -> r._5).toMap
    assert(wilson(1L) > 0.0 && wilson(1L) < 0.5,
      s"Wilson LB shrinks a 1/2 rate toward 0: ${wilson(1L)}")
    assert(wilson(2L) == 0.0)
  }

  test("abcXyz: integer-boundary ABC classes and CV-thresholded XYZ") {
    // part 7: 80 of 100 total cents across two steady months → A/X;
    // part 8: 20 cents in one month → C (cum hits 100%)/Z (no variance
    // sample). Boundary: cum=80, tot=100 → 5·80 ≤ 4·100 keeps A exact.
    val lines = li(
      (1L, 7L, 1L, 10.0, 0.40, 0.0, "2024-01-05 00:00:00"),
      (1L, 7L, 1L, 10.0, 0.40, 0.0, "2024-02-05 00:00:00"),
      (2L, 8L, 1L, 5.0, 0.20, 0.0, "2024-01-06 00:00:00"))
    val parts = Seq((7L, "B1"), (8L, "B1")).toDF("p_partkey", "p_brand")
    val got = Supply.abcXyz(lines, parts)
      .orderBy("abc_class", "xyz_class")
      .select("abc_class", "xyz_class", "n_parts", "revenue_share")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(("A", "X", 1L, 0.8), ("C", "Z", 1L, 0.2)), s"$got")
  }

  test("orderAging: data-anchored buckets with exact value sums") {
    val orders = Seq(
      (1L, "1-URGENT", 100.0, "2024-12-31 00:00:00"), // age 0 → 0-30
      (2L, "1-URGENT", 50.0, "2024-11-15 00:00:00"),  // age 46 → 31-90
      (3L, "2-HIGH", 25.0, "2023-06-01 00:00:00"))    // age 579 → 365+
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice", "od")
      .withColumn("o_orderdate", col("od").cast("timestamp"))
    val got = Supply.orderAging(orders)
      .orderBy("o_orderpriority", "bucket_id")
      .select("o_orderpriority", "age_bucket", "n_orders", "total_value")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(("1-URGENT", "0-30", 1L, 100.0),
      ("1-URGENT", "31-90", 1L, 50.0), ("2-HIGH", "365+", 1L, 25.0)), s"$got")
  }

  test("safetyStock: hand-computed normal-model SS and ROP") {
    // brand B1 daily qty {10, 14}: mean 12, sample var 8, σ = 2√2
    val lines = li(
      (1L, 7L, 1L, 10.0, 1.0, 0.0, "2024-01-01 00:00:00"),
      (2L, 7L, 1L, 14.0, 1.0, 0.0, "2024-01-02 00:00:00"))
    val parts = Seq((7L, "B1")).toDF("p_partkey", "p_brand")
    val got = Supply.safetyStock(lines, parts)
      .select("p_brand", "n_days", "mean_daily_qty", "sigma_daily",
        "safety_stock", "reorder_point")
      .as[(String, Long, Double, Double, Double, Double)].collect().head
    val sigma = math.sqrt(8.0)
    val ss = 1.6448536269514722 * sigma * math.sqrt(7.0)
    assert(got._1 == "B1" && got._2 == 2L && got._3 == 12.0, s"$got")
    assert(got._4 == math.rint(sigma * 1e6) / 1e6, s"$got")
    assert(math.abs(got._5 - ss) < 1e-6 &&
      math.abs(got._6 - (84.0 + ss)) < 1e-6, s"$got")
  }
}
