package graft.gold

import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.ExplainMode

import graft.SparkSpec

class LogisticsSpec extends SparkSpec {
  import spark.implicits._

  private def planText(df: org.apache.spark.sql.DataFrame): String =
    df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  private val ts = (s: String) => java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("serviceLevelMatrix: band boundaries are inclusive-upper, negatives get pre-order, year filter applies") {
    val orders = Seq(
      (10L, ts("1997-01-01"), "1-URGENT"),
      (11L, ts("1997-01-01"), "5-LOW"),
      (12L, ts("1997-01-01"), "2-HIGH"),
    ).toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val lines = Seq(
      (10L, ts("1997-01-31")), // 30d -> 00-30d, critical
      (10L, ts("1997-02-01")), // 31d -> 31-60d, critical
      (11L, ts("1997-03-02")), // 60d -> 31-60d, routine
      (11L, ts("1997-04-01")), // 90d -> 61-90d, routine
      (12L, ts("1997-04-02")), // 91d -> 90d+, critical
      (12L, ts("1996-12-31")), // ship before order AND outside year -> dropped
      (12L, ts("1998-01-05")), // outside ship year -> dropped
    ).toDF("l_orderkey", "l_shipdate")
    val got = Logistics.serviceLevelMatrix(lines, orders, shipYear = 1997)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("00-30d", 1L, 0L), ("31-60d", 1L, 1L),
      ("61-90d", 0L, 1L), ("90d+", 1L, 0L)))
  }

  test("serviceLevelMatrix: a negative delay inside the ship year lands in pre-order") {
    val orders = Seq((10L, ts("1997-06-01"), "5-LOW"))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val lines = Seq((10L, ts("1997-05-01")))
      .toDF("l_orderkey", "l_shipdate")
    val got = Logistics.serviceLevelMatrix(lines, orders, 1997)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("pre-order", 0L, 1L)))
  }

  test("dominantSuppliers: exactly-half share fails the strict majority test; per-part totals restrict to the type and year") {
    val part = Seq((1L, "PROMO"), (2L, "PROMO"), (3L, "LARGE"))
      .toDF("p_partkey", "p_type")
    val supplier = Seq((100L, "S100", 0L), (200L, "S200", 0L))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val nation = Seq((0L, "FRANCE")).toDF("n_nationkey", "n_name")
    val lines = Seq(
      // part 1: supplier 100 has 6 of 10 -> dominates
      (1L, 100L, 6.0, ts("1997-02-01")),
      (1L, 200L, 4.0, ts("1997-03-01")),
      // part 2: exact 50/50 -> nobody dominates (strict >)
      (2L, 100L, 5.0, ts("1997-02-01")),
      (2L, 200L, 5.0, ts("1997-03-01")),
      // part 3 is non-PROMO: would dominate but filtered
      (3L, 200L, 9.0, ts("1997-02-01")),
      // part 1 out-of-year volume must not count toward totals
      (1L, 200L, 50.0, ts("1996-02-01")),
    ).toDF("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    val got = Logistics.dominantSuppliers(
        lines, part, supplier, nation, "PROMO", 1997)
      .as[(Long, String, String, Long, Long)].collect().toSeq
    assert(got == Seq((100L, "S100", "FRANCE", 1L, 6L)))
  }

  test("dominantSuppliers: per-part window reuses the aggregate partitioning — one shuffle on the fact side") {
    val part = Seq((1L, "PROMO")).toDF("p_partkey", "p_type")
    val supplier = Seq((100L, "S", 0L))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val nation = Seq((0L, "N")).toDF("n_nationkey", "n_name")
    val lines = Seq((1L, 100L, 6.0, ts("1997-02-01")))
      .toDF("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    val txt = planText(Logistics.dominantSuppliers(
      lines, part, supplier, nation, "PROMO", 1997))
    // fact path: grain agg shuffle, window re-exchange over the
    // aggregated grain, final supplier-grain agg shuffle — and no more;
    // dims must broadcast (shuffle-Exchange detail headers only, so
    // BroadcastExchange rows don't inflate the count)
    val exchanges = """\(\d+\) Exchange\b""".r.findAllIn(txt).size
    assert(txt.contains("BroadcastHashJoin"),
      s"dims must broadcast:\n$txt")
    assert(exchanges <= 3, s"fact path should not cascade shuffles:\n$txt")
  }

  test("soleBlameLateSuppliers: needs >=2 suppliers on the order and exactly one late; late is per-supplier max over lines") {
    val orders = Seq(
      (10L, ts("1997-01-01")), (11L, ts("1997-01-01")),
      (12L, ts("1997-01-01")),
    ).toDF("o_orderkey", "o_orderdate")
    val supplier = Seq((1L, "S1"), (2L, "S2"), (3L, "S3"))
      .toDF("s_suppkey", "s_name")
    val lines = Seq(
      // order 10: supplier 1 late, supplier 2 on time -> blame S1
      (10L, 1L, ts("1997-06-01")),
      (10L, 1L, ts("1997-01-05")), // same supplier also has an on-time line
      (10L, 2L, ts("1997-01-10")),
      // order 11: both late -> nobody is solely to blame
      (11L, 1L, ts("1997-06-01")),
      (11L, 2L, ts("1997-06-01")),
      // order 12: single-supplier order -> excluded by the EXISTS arm
      (12L, 3L, ts("1997-06-01")),
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val got = Logistics.soleBlameLateSuppliers(lines, orders, supplier)
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "S1", 1L)))
  }

  test("idleHighValueCustomers: threshold is the mean POSITIVE balance, anti-join only sees post-cutoff orders") {
    val customer = Seq(
      (1L, 0L, 300.0),  // above mean(100,300)=200, dormant -> kept
      (2L, 0L, 300.0),  // above mean but ordered after cutoff -> dropped
      (3L, 0L, 100.0),  // below threshold
      (4L, 0L, -500.0), // negative: excluded from the mean, never qualifies
    ).toDF("c_custkey", "c_nationkey", "c_acctbal")
    val orders = Seq(
      (20L, 2L, ts("1999-06-01")), // post-cutoff -> customer 2 active
      (21L, 1L, ts("1998-06-01")), // pre-cutoff -> does not save customer 1
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val nation = Seq((0L, "FRANCE")).toDF("n_nationkey", "n_name")
    val got = Logistics.idleHighValueCustomers(
        customer, orders, nation, "1999-01-01")
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("FRANCE", 1L, 300.0)))
  }
}
