package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit pins for q241–q245 (trade matrix, market share, promo share,
  * centroid confusion, ship latency). */
class TradeTierSpec extends SparkSpec {
  import spark.implicits._

  private val nations = Seq((1, "ALPHA", 0), (2, "BETA", 1))
    .toDF("n_nationkey", "n_name", "n_regionkey")
  private val regions = Seq((0, "WEST"), (1, "EAST"))
    .toDF("r_regionkey", "r_name")
  private val customers = Seq((10L, 1), (11L, 2))
    .toDF("c_custkey", "c_nationkey")
  private val suppliers = Seq((20L, 1), (21L, 2))
    .toDF("s_suppkey", "s_nationkey")
  private val orders = Seq(
    (100L, 10L, "1995-03-01 00:00:00"), (101L, 11L, "1996-07-01 00:00:00"))
    .toDF("o_orderkey", "o_custkey", "od")
    .withColumn("o_orderdate", col("od").cast("timestamp"))

  private def li(rows: (Long, Long, Long, Double, Double, String)*) =
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "ship")
      .withColumn("l_shipdate", col("ship").cast("timestamp"))

  test("tradeMatrix: nation-pair × year cells with net revenue") {
    val lines = li(
      (100L, 1L, 21L, 100.0, 0.0, "1995-03-10 00:00:00"),
      (101L, 1L, 20L, 50.0, 0.1, "1996-07-10 00:00:00"))
    val got = graft.gold.Geography.tradeMatrix(lines, orders, customers,
        suppliers, nations)
      .orderBy("cust_nation")
      .select("cust_nation", "supp_nation", "yr", "revenue")
      .as[(String, String, Int, Double)].collect()
    assert(got.toSeq == Seq(
      ("ALPHA", "BETA", 1995, 100.0),
      ("BETA", "ALPHA", 1996, 45.0)))
  }

  test("supplierMarketShare: target nation's slice of a region-year") {
    // WEST region 1995: supplier ALPHA ships 30 of 100 total
    val lines = li(
      (100L, 1L, 20L, 30.0, 0.0, "1995-03-10 00:00:00"),
      (100L, 1L, 21L, 70.0, 0.0, "1995-03-11 00:00:00"))
    val got = graft.gold.Geography.supplierMarketShare(lines, orders, customers,
        suppliers, nations, regions, targetNation = "ALPHA")
      .select("cust_region", "yr", "total_revenue", "target_revenue",
        "market_share")
      .as[(String, Int, Double, Double, Double)].collect()
    assert(got.toSeq == Seq(("WEST", 1995, 100.0, 30.0, 0.3)))
  }

  test("promoShare: promo-typed parts carry their month's share") {
    val parts = Seq((1L, "PROMO"), (2L, "STANDARD")).toDF("p_partkey", "p_type")
    val lines = li(
      (100L, 1L, 20L, 25.0, 0.0, "1995-03-10 00:00:00"),
      (100L, 2L, 20L, 75.0, 0.0, "1995-03-20 00:00:00"))
      .withColumn("l_quantity", lit(1.0))
    val got = Olap.promoShare(lines, parts)
      .select("total_revenue", "promo_revenue", "promo_share")
      .as[(Double, Double, Double)].collect()
    assert(got.toSeq == Seq((100.0, 25.0, 0.25)))
  }

  test("centroidConfusion: centroid gap is the exact L2 distance") {
    // label 0 centered at (0,0), label 1 at (3,4) → distance 5
    val vecs = Seq(
      (1L, 0, Array(1.0f, -1.0f)), (2L, 0, Array(-1.0f, 1.0f)),
      (3L, 1, Array(4.0f, 3.0f)), (4L, 1, Array(2.0f, 5.0f)))
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.centroidConfusion(vecs, "label", "embedding")
      .select("label_a", "label_b", "l2_dist")
      .as[(Int, Int, Double)].collect()
    assert(got.toSeq == Seq((0, 1, 5.0)))
  }

  test("shipLatency: exact interpolated percentiles and micro-unit mean") {
    val lines = li(
      (100L, 1L, 20L, 1.0, 0.0, "1995-03-02 00:00:00"),   // lat 1
      (100L, 1L, 20L, 1.0, 0.0, "1995-03-03 00:00:00"),   // lat 2
      (100L, 1L, 20L, 1.0, 0.0, "1995-03-11 00:00:00"))   // lat 10
    val got = graft.ext.Supply.shipLatency(lines, orders)
      .select("n_lines", "mean_days", "p50", "p90")
      .as[(Long, Double, Double, Double)].collect()
    assert(got.length == 1)
    val r = got.head
    assert(r._1 == 3L && r._3 == 2.0)
    assert(r._2 == 4.333333, s"mean 13/3 half-up micro: ${r._2}")
    assert(math.abs(r._4 - 8.4) < 1e-9, s"p90 = 2 + 0.8·8: ${r._4}")
  }
}
