package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel: stage attribution follows strict event-time order") {
    val events = Seq(
      // u1 completes all three stages in order
      (1L, ts("2024-01-01 10:00:00"), "signup", 0.0),
      (1L, ts("2024-01-01 11:00:00"), "view", 0.0),
      (1L, ts("2024-01-01 12:00:00"), "purchase", 5.0),
      // u2: purchase BEFORE its first view after signup -> stage 2 only
      (2L, ts("2024-01-02 10:00:00"), "signup", 0.0),
      (2L, ts("2024-01-02 10:30:00"), "purchase", 9.0),
      (2L, ts("2024-01-02 11:00:00"), "view", 0.0),
      // u3: view precedes signup -> that view must not count; stage 1
      (3L, ts("2024-01-03 09:00:00"), "view", 0.0),
      (3L, ts("2024-01-03 10:00:00"), "signup", 0.0),
      // u4 never signs up -> not in the funnel at all
      (4L, ts("2024-01-04 10:00:00"), "view", 0.0)
    ).toDF("user_id", "ts", "event_type", "value")

    val got = Behavior.funnel(events)
      .select("user_id", "stage_reached").as[(Long, Int)]
      .collect().toMap
    assert(got === Map(1L -> 3, 2L -> 2, 3L -> 1))
  }

  test("funnelLatencyQuantiles: exact nearest-rank per transition") {
    def u(id: Long, base: String, viewAfterSec: Int,
        purchaseAfterSec: Option[Int]) = {
      val t0 = ts(base)
      Seq((id, t0, "signup", 0.0),
        (id, new Timestamp(t0.getTime + viewAfterSec * 1000L), "view", 0.0)) ++
        purchaseAfterSec.map(p => (id,
          new Timestamp(t0.getTime + (viewAfterSec + p) * 1000L),
          "purchase", 1.0))
    }
    val events = (
      u(1L, "2024-01-01 10:00:00", 10, Some(5)) ++
      u(2L, "2024-01-02 10:00:00", 20, Some(15)) ++
      u(3L, "2024-01-03 10:00:00", 30, None) ++
      u(4L, "2024-01-04 10:00:00", 40, None)
    ).toDF("user_id", "ts", "event_type", "value")
    val got = Behavior.funnelLatencyQuantiles(events)
      .orderBy(col("transition"), col("quantile"))
      .select("transition", "quantile", "n_pairs", "latency_sec")
      .as[(String, Long, Long, Long)].collect().toSeq
    // signup>view latencies {10,20,30,40}: ranks ⌈qn/100⌉ = 1,2,3,4
    // view>purchase latencies {5,15}: ranks 1,1,2,2
    assert(got == Seq(
      ("signup>view", 25L, 4L, 10L),
      ("signup>view", 50L, 4L, 20L),
      ("signup>view", 75L, 4L, 30L),
      ("signup>view", 90L, 4L, 40L),
      ("view>purchase", 25L, 2L, 5L),
      ("view>purchase", 50L, 2L, 5L),
      ("view>purchase", 75L, 2L, 15L),
      ("view>purchase", 90L, 2L, 15L)))
  }

  test("retentionWeekly: offsets count from each user's first week") {
    val events = Seq(
      // u1 active weeks 0 and 2 of cohort 2024-01-01 (a Monday)
      (1L, ts("2024-01-02 10:00:00"), "view", 0.0),
      (1L, ts("2024-01-16 10:00:00"), "view", 0.0),
      // u2 active only week 0 of the same cohort
      (2L, ts("2024-01-03 10:00:00"), "click", 0.0),
      // u3 cohort one week later, active weeks 0 and 1
      (3L, ts("2024-01-10 10:00:00"), "view", 0.0),
      (3L, ts("2024-01-15 10:00:00"), "view", 0.0)
    ).toDF("user_id", "ts", "event_type", "value")

    val got = Behavior.retentionWeekly(events)
      .select(col("cohort_week").cast("string"), col("week_offset"), col("n_users"))
      .as[(String, Int, Long)].collect().toSet
    assert(got === Set(
      ("2024-01-01", 0, 2L), ("2024-01-01", 2, 1L),
      ("2024-01-08", 0, 1L), ("2024-01-08", 1, 1L)))
  }

  test("sessionPaths: ordered first-k types per session, deterministic under repartition") {
    val events = Seq(
      // one session: three events within the gap, out-of-order ids
      (1L, ts("2024-01-01 10:00:00"), "view", 11L),
      (1L, ts("2024-01-01 10:05:00"), "click", 10L),
      (1L, ts("2024-01-01 10:10:00"), "purchase", 12L),
      // second session for the same user, 31 min later
      (1L, ts("2024-01-01 10:41:30"), "view", 13L),
      (2L, ts("2024-01-01 09:00:00"), "signup", 20L)
    ).map { case (u, t, ty, id) => (u, t, ty, id) }
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = Behavior.sessionPaths(events, gapMinutes = 30, k = 2)
      .orderBy(col("user_id"), col("session_start"))
      .select(col("user_id"), col("path"), col("n_events"))
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "view>click", 3L),   // k=2 truncates the purchase
      (1L, "view", 1L),
      (2L, "signup", 1L)))
    val got2 = Behavior.sessionPaths(events.repartition(5), gapMinutes = 30, k = 2)
      .orderBy(col("user_id"), col("session_start"))
      .select(col("user_id"), col("path"), col("n_events"))
      .as[(Long, String, Long)].collect().toSeq
    assert(got2 == got, "path must be layout-independent")
  }

  test("debounce: window restarts at each KEPT event, not each event") {
    val events = Seq(
      // u1/view: t=0 kept; t=50 suppressed; t=90 suppressed (only 40
      // after the last KEPT — a naive gap-to-previous-event would keep
      // it); t=100 kept; t=230 kept
      (1L, "view", 0L, 10L), (1L, "view", 50L, 11L), (1L, "view", 90L, 12L),
      (1L, "view", 100L, 13L), (1L, "view", 230L, 14L),
      // same user, other type: independent state
      (1L, "click", 55L, 20L),
      (2L, "view", 10L, 30L), (2L, "view", 200L, 31L)
    ).map { case (u, t, sec, id) =>
      (u, t, new java.sql.Timestamp(sec * 1000), id)
    }.toDF("user_id", "event_type", "ts", "event_id")
    val got = Behavior.debounce(events, deltaSeconds = 100)
      .select(col("event_id")).as[Long].collect().toSet
    assert(got == Set(10L, 13L, 14L, 20L, 30L, 31L))
  }

  test("debounce: equal-timestamp ties keep the lowest event_id, layout-stable") {
    val events = Seq(
      (1L, "view", 100L, 7L), (1L, "view", 100L, 5L), (1L, "view", 100L, 9L)
    ).map { case (u, t, sec, id) =>
      (u, t, new java.sql.Timestamp(sec * 1000), id)
    }.toDF("user_id", "event_type", "ts", "event_id")
    val got = Behavior.debounce(events, deltaSeconds = 10)
      .select(col("event_id")).as[Long].collect().toSeq
    assert(got == Seq(5L))
    val got2 = Behavior.debounce(events.repartition(5), deltaSeconds = 10)
      .select(col("event_id")).as[Long].collect().toSeq
    assert(got2 == Seq(5L))
  }
  test("attribution: first/last touch within lookback, nulls when none") {
    val ts = (sec: Long) => new java.sql.Timestamp(sec * 1000)
    // user 1: view(t=10,id=1) click(t=20,id=2) purchase(t=30,id=3)
    //         -> first=1, last=2 within 7d
    // user 2: purchase(t=50,id=4) with no touches -> null attribution
    // user 3: view 9 days before purchase -> outside window -> null
    val nineDays = 9L * 86400
    val events = Seq(
      (1L, "view", 10L, 1L), (1L, "click", 20L, 2L), (1L, "purchase", 30L, 3L),
      (2L, "purchase", 50L, 4L),
      (3L, "view", 100L, 5L), (3L, "purchase", 100L + nineDays, 6L)
    ).map { case (u, t, sec, id) => (u, t, ts(sec), id) }
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Behavior.attribution(events, lookbackDays = 7)
      .orderBy("purchase_id")
      .select($"purchase_id", $"first_touch_id", $"last_touch_id")
      .as[(Long, Option[Long], Option[Long])].collect().toSeq
    assert(got == Seq(
      (3L, Some(1L), Some(2L)),
      (4L, None, None),
      (6L, None, None)))
  }

  test("timeDecayAttribution: dyadic day-grain weights order recent touches first; out-of-window touches drop; untouched purchases go direct") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // user 1: purchase with three in-window touches at ages 0/1/7 days
      (1L, 100L, "purchase", ts("1997-01-10 12:00:00"), 10.0),
      (1L, 101L, "view",     ts("1997-01-10 08:00:00"), 0.0),
      (1L, 102L, "click",    ts("1997-01-09 12:00:00"), 0.0),
      (1L, 103L, "signup",   ts("1997-01-03 12:00:00"), 0.0), // age 7, w=1
      (1L, 104L, "view",     ts("1997-01-02 12:00:00"), 0.0), // 8d: outside
      // user 2: untouched purchase -> direct, full credit
      (2L, 200L, "purchase", ts("1997-01-10 12:00:00"), 5.0),
    ).toDF("user_id", "event_id", "event_type", "ts", "value")
    val got = graft.ext.Behavior.timeDecayAttribution(
        events, Seq("view", "click", "signup"))
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // weights 128 (view, age 0), 64 (click), 1 (signup); total 193
    assert(got("view")._3 > got("click")._3 &&
      got("click")._3 > got("signup")._3)
    assert(got("direct") == (("direct", 1L, 1.0, 5.0)))
    // per-purchase shares sum to 1 within truncation (<= 3 micro-units)
    val touchedCredit = got("view")._3 + got("click")._3 + got("signup")._3
    assert(touchedCredit <= 1.0 && touchedCredit > 1.0 - 3e-6)
    // revenue splits the 10.00 purchase in the same proportions
    val touchedRev = got("view")._4 + got("click")._4 + got("signup")._4
    assert(touchedRev <= 10.0 && touchedRev > 10.0 - 3e-6)
  }

  test("attribution revenue survives the 100 TB envelope: multi-billion purchases attribute exactly (decimal product, not wrapped int64)") {
    // pre-fix, positionAttribution's rev_mu product cents*1000*share_u
    // wrapped int64 at a single purchase >= ~$922k; these values would
    // have produced garbage (negative) attributed revenue
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, 100L, "purchase", ts("1997-01-10 12:00:00"), 2.0e9),
      (1L, 101L, "view",     ts("1997-01-10 08:00:00"), 0.0),
      (2L, 200L, "purchase", ts("1997-01-10 12:00:00"), 2.0e10),
      (2L, 201L, "click",    ts("1997-01-04 08:00:00"), 0.0), // age 6, w=2
    ).toDF("user_id", "event_id", "event_type", "ts", "value")
    val pos = graft.ext.Behavior.positionAttribution(
        events, Seq("view", "click", "signup"))
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(pos("view") == 2.0e9 && pos("click") == 2.0e10, s"pos: $pos")
    val td = graft.ext.Behavior.timeDecayAttribution(
        events, Seq("view", "click", "signup"))
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(td("view") == 2.0e9 && td("click") == 2.0e10, s"td: $td")
    val lin = graft.ext.Behavior.linearAttribution(
        events, Seq("view", "click", "signup"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(lin("view") == 2.0e9 && lin("click") == 2.0e10, s"lin: $lin")
  }

  test("positionAttribution: 40/20/40 with middles split; 2-touch is 50/50; 1-touch takes all; untouched goes direct") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // user 1: 4 touches -> first view .4, last view .4, two middles .1
      (1L, 100L, "purchase", ts("1997-01-10 12:00:00"), 10.0),
      (1L, 101L, "view",     ts("1997-01-07 08:00:00"), 0.0), // first
      (1L, 102L, "click",    ts("1997-01-08 08:00:00"), 0.0), // middle
      (1L, 103L, "signup",   ts("1997-01-09 08:00:00"), 0.0), // middle
      (1L, 104L, "view",     ts("1997-01-10 08:00:00"), 0.0), // last
      // user 2: two touches -> 50/50
      (2L, 200L, "purchase", ts("1997-01-10 12:00:00"), 4.0),
      (2L, 201L, "view",     ts("1997-01-09 12:00:00"), 0.0),
      (2L, 202L, "click",    ts("1997-01-10 08:00:00"), 0.0),
      // user 3: one touch -> 100%
      (3L, 300L, "purchase", ts("1997-01-10 12:00:00"), 2.0),
      (3L, 301L, "signup",   ts("1997-01-10 08:00:00"), 0.0),
      // user 4: untouched -> direct
      (4L, 400L, "purchase", ts("1997-01-10 12:00:00"), 1.0),
    ).toDF("user_id", "event_id", "event_type", "ts", "value")
    val got = graft.ext.Behavior.positionAttribution(
        events, Seq("view", "click", "signup"))
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // view: .8 (u1) + .5 (u2) = 1.3 credit; rev .8*10 + .5*4 = 10.0
    assert(got("view") == (("view", 2L, 1.3, 10.0)))
    // click: .1 (u1) + .5 (u2) = .6; rev 1.0 + 2.0 = 3.0
    assert(got("click") == (("click", 2L, 0.6, 3.0)))
    // signup: .1 (u1) + 1.0 (u3) = 1.1; rev 1.0 + 2.0 = 3.0
    assert(got("signup") == (("signup", 2L, 1.1, 3.0)))
    assert(got("direct") == (("direct", 1L, 1.0, 1.0)))
  }

  test("shapleyAttribution: hand-computed lattice, efficiency, direct baseline") {
    val events = Seq(
      // u1: view-only journey -> v({view}) = 10
      (1L, ts("2024-01-01 10:00:00"), "view", 0.0),
      (1L, ts("2024-01-01 12:00:00"), "purchase", 10.0),
      // u2: view+click journey -> v({view,click}) = 12
      (2L, ts("2024-01-02 10:00:00"), "view", 0.0),
      (2L, ts("2024-01-02 11:00:00"), "click", 0.0),
      (2L, ts("2024-01-02 12:00:00"), "purchase", 12.0),
      // u3: untouched purchase -> direct baseline v(empty) = 5
      (3L, ts("2024-01-03 12:00:00"), "purchase", 5.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val got = Behavior.shapleyAttribution(
        events, Seq("view", "click", "signup"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // V({v})=10, V({c})=0, V({v,c})=22, V(N)=22; 6·phi_view =
    // 2·10 + 1·22 + 1·10 + 2·22 = 96 -> 16; 6·phi_click =
    // 0 + 1·12 + 0 + 2·12 = 36 -> 6; signup never touches -> 0
    assert(got("view") == (("view", 2L, 16.0)))
    assert(got("click") == (("click", 1L, 6.0)))
    assert(got("signup") == (("signup", 0L, 0.0)))
    assert(got("direct") == (("direct", 1L, 5.0)))
    // Shapley efficiency: channel credits + direct = total revenue
    assert(math.abs(got.values.map(_._3).sum - 27.0) < 1e-9)
  }

  test("shapleyAttribution: symmetric channels split their joint revenue equally") {
    val events = Seq(
      // click and signup appear ONLY together -> symmetry axiom:
      // identical marginal contributions, equal credit (9/2 each)
      (1L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (1L, ts("2024-01-01 11:00:00"), "signup", 0.0),
      (1L, ts("2024-01-01 12:00:00"), "purchase", 9.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val got = Behavior.shapleyAttribution(
        events, Seq("view", "click", "signup"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got("click") == 4.5 && got("signup") == 4.5)
    assert(got("view") == 0.0 && got("direct") == 0.0)
  }
  test("positionAttributionCapped: uncapped equals positionAttribution on random events (lossless day-bucket cover); a binding cap keeps the most-recent N") {
    // deterministic pseudo-random fixture via the portable hash
    val base = java.sql.Timestamp.valueOf("1997-01-01 00:00:00").getTime
    def h(i: Int, what: String): Long =
      math.abs(graft.functions.Portable.h60Local(s"attr-$what-$i"))
    val types = Seq("view", "click", "signup", "purchase")
    val events = (0 until 400).map { i =>
      (h(i, "u") % 6L,
        1000L + i,
        types((h(i, "t") % 4L).toInt),
        new java.sql.Timestamp(base + h(i, "ts") % (20L * 86400000L)),
        (h(i, "v") % 10000L) / 100.0)
    }.toDF("user_id", "event_id", "event_type", "ts", "value")
    val touch = Seq("view", "click", "signup")
    val uncapped = graft.ext.Behavior
      .positionAttributionCapped(events, touch, 7, maxTouches = 1000000)
      .as[(String, Long, Double, Double)].collect().toSeq
    val ref = graft.ext.Behavior.positionAttribution(events, touch, 7)
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(uncapped == ref)
    // a binding cap: total credit stays 1.0 per touched purchase
    val capped = graft.ext.Behavior
      .positionAttributionCapped(events, touch, 7, maxTouches = 2)
      .as[(String, Long, Double, Double)].collect().toSeq
    val touched = ref.filter(_._1 != "direct")
    val cappedTouched = capped.filter(_._1 != "direct")
    val nTouchedPurchases = events.filter(col("event_type") === "purchase")
      .count() - ref.find(_._1 == "direct").map(_._2).getOrElse(0L)
    assert(math.abs(cappedTouched.map(_._3).sum - nTouchedPurchases) < 1e-3,
      "credit per touched purchase must still sum to 1 under the cap")
    assert(capped.find(_._1 == "direct") == ref.find(_._1 == "direct"),
      "the cap never changes which purchases are direct")
    assert(touched.map(_._3).sum > 0)
  }

  test("positionAttributionCapped: pre-cap tie-break follows the cap's total order (tt desc, tid ASC) — duplicate timestamps straddling a binding cap") {
    // Day D holds four touches with IDENTICAL timestamps: tids 1,2 are
    // views, tids 3,4 are clicks. The cap's total order (tt desc, tid
    // asc) keeps tids {1,2} for any later-day purchase — all credit to
    // "view". A pre-cap ordered by tid DESC would instead keep {4,3}
    // and credit "click": exactly the divergence this fixture pins.
    val events = Seq(
      (1L, 1L, "view", ts("2024-01-01 12:00:00"), 0.0),
      (1L, 2L, "view", ts("2024-01-01 12:00:00"), 0.0),
      (1L, 3L, "click", ts("2024-01-01 12:00:00"), 0.0),
      (1L, 4L, "click", ts("2024-01-01 12:00:00"), 0.0),
      (1L, 9L, "purchase", ts("2024-01-02 12:00:00"), 10.0)
    ).toDF("user_id", "event_id", "event_type", "ts", "value")
    val touch = Seq("view", "click")
    val got = graft.ext.Behavior
      .positionAttributionCapped(events, touch, 7, maxTouches = 2)
      .as[(String, Long, Double, Double)].collect().toSeq
    val truth = graft.ext.Behavior.positionAttributionCappedImpl(
        events, touch, 7, maxTouches = 2, preCap = false)
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got == truth)
    val byTy = got.map(r => r._1 -> r).toMap
    assert(byTy("view") == (("view", 1L, 1.0, 10.0)),
      "kept set must be the tid-ASC ties (1,2) — both views")
    assert(!byTy.contains("click") || byTy("click")._3 == 0.0)
  }

  test("positionAttributionCapped: pre-cap lossless-cover law on random events with duplicate timestamps and a binding cap") {
    // coarse timestamp grid (6 distinct instants per day) forces
    // same-(user,tt) ties; maxTouches=2 binds on most purchase windows
    def h(i: Int, what: String): Long =
      math.abs(graft.functions.Portable.h60Local(s"attrtie-$what-$i"))
    val base = java.sql.Timestamp.valueOf("1997-01-01 00:00:00").getTime
    val types = Seq("view", "click", "signup", "purchase")
    val events = (0 until 500).map { i =>
      (h(i, "u") % 4L,
        1000L + i,
        types((h(i, "t") % 4L).toInt),
        new java.sql.Timestamp(base +
          (h(i, "ts") % (10L * 6L)) * 4L * 3600000L),
        (h(i, "v") % 10000L) / 100.0)
    }.toDF("user_id", "event_id", "event_type", "ts", "value")
    val touch = Seq("view", "click", "signup")
    for (cap <- Seq(1, 2, 5)) {
      val withPreCap = graft.ext.Behavior
        .positionAttributionCapped(events, touch, 7, maxTouches = cap)
        .as[(String, Long, Double, Double)].collect().toSeq
      val truth = graft.ext.Behavior.positionAttributionCappedImpl(
          events, touch, 7, maxTouches = cap, preCap = false)
        .as[(String, Long, Double, Double)].collect().toSeq
      assert(withPreCap == truth, s"pre-cap must be lossless at cap=$cap")
    }
  }
}
