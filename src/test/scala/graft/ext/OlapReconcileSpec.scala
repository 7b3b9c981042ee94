package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OlapReconcileSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private lazy val orders = Seq(
    (1L, 10L, "O", 100.0, ts("2023-01-05"), "1-URGENT"),
    (2L, 11L, "F", 200.0, ts("2023-06-10"), "2-HIGH"),
    (3L, 10L, "O", 300.0, ts("2024-02-01"), "1-URGENT"),
    (4L, 12L, "F", 400.0, ts("2024-08-20"), "2-HIGH")
  ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority")

  test("ordersCube emits all four grouping sets with consistent totals") {
    val rows = Olap.ordersCube(orders)
      .select($"gid", $"order_year", $"o_orderpriority", $"n_orders", $"revenue")
      .as[(Long, Option[Int], Option[String], Long, Double)].collect()
    val byGid = rows.groupBy(_._1)
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L))
    // grand total (both axes rolled up)
    val grand = byGid(3L).toSeq
    assert(grand == Seq((3L, None, None, 4L, 1000.0)))
    // per-year subtotals (priority rolled up → bit 1 set)
    assert(byGid(1L).map(r => r._2.get -> r._4).toMap == Map(2023 -> 2L, 2024 -> 2L))
    // per-priority subtotals (year rolled up → bit 2 set)
    assert(byGid(2L).map(r => r._3.get -> r._5).toMap ==
      Map("1-URGENT" -> 400.0, "2-HIGH" -> 600.0))
    // cells sum to the grand total
    assert(byGid(0L).map(_._4).sum == 4L)
  }

  private val keyCols = Seq(col("o_orderkey"))
  private val canonCols = Seq(col("o_orderkey"), col("o_custkey"),
    col("o_orderstatus"), round(col("o_totalprice") * 10000).cast("long"),
    col("o_orderdate").cast("date"), col("o_orderpriority"))

  test("fingerprint is order- and layout-independent") {
    val f1 = Reconcile.fingerprint(orders, keyCols, canonCols, buckets = 4)
    val f2 = Reconcile.fingerprint(
      orders.orderBy($"o_totalprice".desc).repartition(7),
      keyCols, canonCols, buckets = 4)
    assert(f1.except(f2).isEmpty && f2.except(f1).isEmpty)
  }

  test("fingerprint localizes a single-row difference to its key's bucket") {
    val mutated = orders.withColumn("o_totalprice",
      when($"o_orderkey" === 2L, 200.01).otherwise($"o_totalprice"))
    val f1 = Reconcile.fingerprint(orders, keyCols, canonCols, buckets = 4)
    val f2 = Reconcile.fingerprint(mutated, keyCols, canonCols, buckets = 4)
    val diff = f1.except(f2)
    assert(diff.count() == 1, "exactly one bucket must diverge")
    // key buckets are value-independent: row counts match everywhere,
    // only the changed key's bucket hashes moved
    assert(f1.select($"bucket", $"n_rows")
      .except(f2.select($"bucket", $"n_rows")).isEmpty)
  }

  test("fingerprint distinguishes NULL from its rendered marker position") {
    val a = Seq((1L, Option("x"), Option.empty[String])).toDF("k", "c1", "c2")
    val b = Seq((1L, Option.empty[String], Option("x"))).toDF("k", "c1", "c2")
    val cols = Seq(col("k"), col("c1"), col("c2"))
    val fa = Reconcile.fingerprint(a, Seq(col("k")), cols, buckets = 1)
    val fb = Reconcile.fingerprint(b, Seq(col("k")), cols, buckets = 1)
    assert(fa.except(fb).count() == 1, "NULL position must change the fingerprint")
  }

  test("theilDecomposition: equal-within nations -> T_within 0, identity holds") {
    val rev = Seq((11L, 100.0), (12L, 100.0), (21L, 300.0), (22L, 300.0))
      .toDF("restaurant_id", "total_revenue")
    val sup = Seq((11L, 1L), (12L, 1L), (21L, 2L), (22L, 2L))
      .toDF("s_suppkey", "s_nationkey")
    val nat = Seq((1L, "A"), (2L, "B")).toDF("n_nationkey", "n_name")
    val got = Olap.theilDecomposition(rev, sup, nat)
      .as[(String, Long, Double, Double, Double, Double, Double, Double)]
      .collect().toSeq
    // per-restaurant totals terms: 0.125*ln(0.5) and 0.375*ln(1.5)
    val ta = math.round(0.125 * math.log(0.5) * 1e9)
    val tb = math.round(0.375 * math.log(1.5) * 1e9)
    val ba = math.round(0.25 * math.log(0.5) * 1e9)
    val bb = math.round(0.75 * math.log(1.5) * 1e9)
    val tTot = (2 * ta + 2 * tb) / 1e9
    val tBet = (ba + bb) / 1e9
    assert(got == Seq(
      ("A", 2L, 0.25, 0.0, ba / 1e9, tTot, tBet, 0.0),
      ("B", 2L, 0.75, 0.0, bb / 1e9, tTot, tBet, 0.0)))
    // the decomposition identity holds to the quantization floor
    assert(math.abs(tTot - (tBet + 0.0)) < 1e-6)
  }

  test("priceIndex: matched-basket L/P/F at hand-computed values, new part excluded") {
    val li = Seq(
      // base month: A unit 10.0, B unit 10.0
      (1L, "2024-01-05", 20.0, 2.0), (2L, "2024-01-06", 30.0, 3.0),
      // month 2: A +20%, B -10%, same quantities; C is new (unmatched)
      (1L, "2024-02-05", 24.0, 2.0), (2L, "2024-02-06", 27.0, 3.0),
      (3L, "2024-02-07", 99.0, 1.0)
    ).toDF("l_partkey", "day", "l_extendedprice", "l_quantity")
      .withColumn("l_shipdate", col("day").cast("date"))
    val got = Olap.priceIndex(li)
      .as[(java.sql.Date, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      (java.sql.Date.valueOf("2024-01-01"), 2L, 1.0, 1.0, 1.0),
      // L = (120000*2 + 90000*3) / 500000 = 1.02; same quantities -> P = L
      (java.sql.Date.valueOf("2024-02-01"), 2L, 1.02, 1.02, 1.02)))
  }

  test("hillTailIndex: geometric tail gives the closed-form alpha per k") {
    val rev = Seq((1L, 8.0), (2L, 4.0), (3L, 2.0), (4L, 1.0), (5L, 0.5))
      .toDF("order_id", "total_revenue")
    val got = Olap.hillTailIndex(rev, ks = Seq(2, 3))
      .as[(Long, Double, Option[Double])].collect().toSeq
    def alpha(k: Long, ratios: Seq[Double]): Double = {
      val s = ratios.map(r => math.round(math.log(r) * 1e9)).sum
      (k * 1000000000L * 1000000L * 2 + s) / (s * 2) / 1e6
    }
    assert(got == Seq(
      // k=2: threshold 2.0, terms ln4 + ln2 -> alpha = 2/(3 ln2)
      (2L, 2.0, Some(alpha(2, Seq(4.0, 2.0)))),
      // k=3: threshold 1.0, terms ln8 + ln4 + ln2 -> alpha = 3/(6 ln2)
      (3L, 1.0, Some(alpha(3, Seq(8.0, 4.0, 2.0))))))
  }

  test("hillTailIndex: a k with too few orders still emits its row (NULL alpha)") {
    val rev = Seq((1L, 8.0), (2L, 4.0), (3L, 2.0))
      .toDF("order_id", "total_revenue")
    // k=5 needs 6 distinct orders; only 3 exist -> row present, alpha NULL
    val got = Olap.hillTailIndex(rev, ks = Seq(2, 5))
      .as[(Long, Option[Double], Option[Double])].collect().toSeq
    assert(got.map(_._1) == Seq(2L, 5L))
    assert(got(0)._3.isDefined)
    assert(got(1) == ((5L, None, None)))
  }
}
