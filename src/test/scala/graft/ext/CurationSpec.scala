package graft.ext

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")

  test("tokenBudgetPlan: largest-remainder shares sum exactly to budget") {
    // token masses 5 / 3 / 2, budget 7: floor shares 3/2/1 (Σ=6), one
    // extra token goes to the largest remainder (a: 35%10=5 beats
    // c: 14%10=4 beats b: 21%10=1) -> allocs 4/2/1
    val d = docs(
      (1L, "t t t t t", "a"),
      (2L, "t t t", "b"),
      (3L, "t t", "c"))
    val got = Curation.tokenBudgetPlan(d, "doc_id", "text", "source", budget = 7L)
      .orderBy("source")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("a", 5L, 4L, 4.0 / 5.0),
      ("b", 3L, 2L, 2.0 / 3.0),
      ("c", 2L, 1L, 1.0 / 2.0)))
    assert(got.map(_._3).sum == 7L)
  }

  test("tokenBudgetPlan: remainder ties break on source name ascending") {
    // equal masses, odd budget: both remainders equal -> 'a' wins the
    // extra token deterministically
    val d = docs((1L, "t", "a"), (2L, "t", "b"))
    val got = Curation.tokenBudgetPlan(d, "doc_id", "text", "source", budget = 3L)
      .orderBy("source")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._3)) == Seq(("a", 2L), ("b", 1L)))
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def events(rows: (Long, Long, String, java.sql.Timestamp)*) =
    rows.toDF("event_id", "user_id", "event_type", "ts")

  test("eventRateCap: keeps each entity's newest N per day, ties by id ASC; other entities untouched") {
    val e = events(
      // user 1, one day: five events, two sharing the latest timestamp
      (10L, 1L, "view", ts("2024-03-01 08:00:00")),
      (11L, 1L, "view", ts("2024-03-01 09:00:00")),
      (12L, 1L, "click", ts("2024-03-01 10:00:00")),
      (14L, 1L, "view", ts("2024-03-01 10:00:00")),
      (13L, 1L, "view", ts("2024-03-01 07:00:00")),
      // user 1, NEXT day: the cap is per day, both survive at N=3
      (20L, 1L, "view", ts("2024-03-02 01:00:00")),
      (21L, 1L, "view", ts("2024-03-02 02:00:00")),
      // user 2: below the cap
      (30L, 2L, "view", ts("2024-03-01 12:00:00")))
    val kept = Curation.eventRateCap(e, "user_id", "event_id", "ts", 3)
      .select("event_id").as[Long].collect().toSet
    // newest 3 for user-1-day-1 by (ts desc, id asc): 12 (10:00, id 12
    // beats 14 on the tie), 14, then 11 — ids 10 and 13 drop
    assert(kept == Set(12L, 14L, 11L, 20L, 21L, 30L))
  }

  test("eventRateCap law: a non-binding cap is the identity, so capped-then-join == join") {
    val e = events(
      (1L, 1L, "view", ts("2024-03-01 08:00:00")),
      (2L, 1L, "purchase", ts("2024-03-01 08:30:00")),
      (3L, 2L, "view", ts("2024-03-01 09:00:00")),
      (4L, 2L, "purchase", ts("2024-03-02 09:10:00")))
    val capped = Curation.eventRateCap(e, "user_id", "event_id", "ts", 100)
    assert(capped.orderBy("event_id").collect().toSeq ==
      e.orderBy("event_id").collect().toSeq)
    // downstream composition: the purchase<-view range join the soak
    // findings route through the cap — identical on capped input
    def rangeJoin(df: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.functions._
      val v = df.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("vts"))
      val p = df.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("pts"))
      p.join(v, Seq("user_id"))
        .filter(col("vts") <= col("pts") &&
          col("vts") >= col("pts") - expr("INTERVAL 1 HOUR"))
        .select("purchase_id", "view_id").orderBy("purchase_id", "view_id")
    }
    assert(rangeJoin(capped).collect().toSeq == rangeJoin(e).collect().toSeq)
  }

  test("eventRateCapManifest: dispositions reconcile to source totals and pin membership") {
    val e = events(
      (10L, 1L, "view", ts("2024-03-01 08:00:00")),
      (11L, 1L, "view", ts("2024-03-01 09:00:00")),
      (12L, 1L, "click", ts("2024-03-01 10:00:00")),
      (13L, 1L, "view", ts("2024-03-01 07:00:00")),
      (30L, 2L, "view", ts("2024-03-01 12:00:00")))
    val m = Curation.eventRateCapManifest(
        e, "user_id", "event_id", "ts", "event_type", 2)
      .select("class", "disposition", "n_events", "n_entities")
      .as[(String, String, Long, Long)].collect().toSeq
    // newest 2 for user 1: 12 (click), 11 (view); dropped: 10, 13 (view)
    assert(m.toSet == Set(
      ("click", "kept", 1L, 1L),
      ("view", "kept", 2L, 2L),
      ("view", "rate_capped", 2L, 1L)))
    // reconciliation: per class, n_events sums to the class total
    val perClass = m.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(perClass == Map("click" -> 1L, "view" -> 4L))
  }
}
