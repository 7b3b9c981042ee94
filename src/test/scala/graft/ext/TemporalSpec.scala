package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks the latest prior right row per key, NULL when none") {
    val purchases = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00")),
      (11L, 1L, ts("2024-01-01 12:00:00")),
      (12L, 2L, ts("2024-01-01 09:00:00"))) // user 2 has no views
      .toDF("event_id", "user_id", "ts")
    val views = Seq(
      (100L, 1L, ts("2024-01-01 09:30:00")),
      (101L, 1L, ts("2024-01-01 11:00:00")),
      (102L, 3L, ts("2024-01-01 08:00:00"))) // other user only
      .toDF("event_id", "user_id", "ts")
    val got = Temporal.asofJoin(purchases, views, Seq("user_id"), "ts", "ts",
        rightPayload = Seq("event_id"))
      .select($"event_id", $"asof_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(10L -> Some(100L), 11L -> Some(101L), 12L -> None))
  }

  test("asofJoin equal instants: inclusive takes the right row, strict does not") {
    val l = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val r = Seq((2L, 7L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    def run(strict: Boolean) =
      Temporal.asofJoin(l, r, Seq("user_id"), "ts", "ts", Seq("event_id"),
          strict = strict)
        .select($"asof_event_id").as[Option[Long]].head()
    assert(run(strict = false) == Some(2L))
    assert(run(strict = true).isEmpty)
  }

  test("asofJoin equals the brute-force latest-prior lookup on random data") {
    val rnd = new scala.util.Random(42)
    // ts made globally unique (id folded into the millis) so the as-of
    // pick is total without relying on tie order among equal instants
    def randRows(n: Int, idBase: Long) = (1 to n).map { i =>
      (idBase + i,
        rnd.nextInt(8).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(100000) * 10000L + idBase + i))
    }
    val lefts = randRows(120, 0)
    val rights = randRows(150, 1000)
    val expected = lefts.map { case (id, u, t) =>
      val best = rights.filter(r => r._2 == u && !r._3.after(t))
        .sortBy(_._3.getTime).lastOption
      id -> best.map(_._1)
    }.toMap
    val got = Temporal.asofJoin(
        lefts.toDF("event_id", "user_id", "ts"),
        rights.toDF("event_id", "user_id", "ts"),
        Seq("user_id"), "ts", "ts", Seq("event_id"))
      .select($"event_id", $"asof_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got == expected)
  }

  test("bucketed range join equals the naive BETWEEN theta join") {
    val points = (1 to 60)
      .map(i => (i.toLong, java.sql.Date.valueOf(f"2024-01-${i % 28 + 1}%02d")))
      .toDF("point_id", "d")
    val intervals = (0 until 8)
      .map(i => (i.toLong,
        java.sql.Date.valueOf(f"2024-01-${i * 3 + 1}%02d"),
        java.sql.Date.valueOf(f"2024-01-${i * 3 + 1 + (i % 3) * 4}%02d")))
      .toDF("window_id", "ws", "we")
    for (bucketDays <- Seq(1, 3, 7, 30)) {
      val bucketed = Temporal.rangeJoinDates(points, intervals, "d", "ws", "we",
          bucketDays)
        .select($"point_id", $"window_id").as[(Long, Long)].collect().toSet
      val naive = points.join(intervals, $"d".between($"ws", $"we"))
        .select($"point_id", $"window_id").as[(Long, Long)].collect().toSet
      assert(bucketed == naive, s"bucketDays=$bucketDays")
    }
  }

  test("multiGrain grouping-sets pass equals the three independent marts") {
    val rev = graft.bindings.Conformed.orderRevenue(spark, "/root/testdata/sf0.001")
    val mg = graft.gold.SalesTrends.multiGrain(rev)
    val daily = mg.filter($"grain" === "daily")
      .select($"creation_date".cast("string"), $"restaurant_id", $"item_category",
        $"revenue")
      .as[(String, Long, String, Double)].collect().toSet
    val expected = graft.gold.SalesTrends.daily(rev)
      .select($"creation_date".cast("string"), $"restaurant_id", $"item_category",
        $"daily_revenue")
      .as[(String, Long, String, Double)].collect().toSet
    assert(daily == expected)
    val weekly = mg.filter($"grain" === "weekly")
      .select($"year_week", $"restaurant_id", $"item_category", $"revenue")
      .as[(String, Long, String, Double)].collect().toSet
    val expectedW = graft.gold.SalesTrends.weekly(rev)
      .select($"year_week", $"restaurant_id", $"item_category", $"weekly_revenue")
      .as[(String, Long, String, Double)].collect().toSet
    assert(weekly == expectedW)
  }

  test("multiGrainFromDaily equals multiGrain bit-for-bit, with no Expand") {
    val rev = graft.bindings.Conformed.orderRevenue(spark, "/root/testdata/sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"grain", $"creation_date".cast("string"), $"year_week",
        $"year_month", $"restaurant_id", $"item_category", $"revenue")
      .as[(String, String, String, String, Long, String, Double)].collect().toSet
    val fromDaily = graft.gold.SalesTrends.multiGrainFromDaily(rev)
    assert(rows(fromDaily) == rows(graft.gold.SalesTrends.multiGrain(rev)))
    val plan = fromDaily.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "rollup-from-daily must not Expand the fact")
  }

  test("char n-gram jaccard: exact dup scores 1.0, unrelated text never pairs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely unrelated catalyst optimizer content here")
    ).toDF("doc_id", "text")
    val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    assert(got.exists { case (a, b, j) => a == 1L && b == 2L && j == 1.0 })
    assert(!got.exists { case (a, b, _) => a == 3L || b == 3L })
  }
}
