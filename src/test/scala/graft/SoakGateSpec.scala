package graft

import org.scalatest.funsuite.AnyFunSuite

class SoakGateSpec extends AnyFunSuite {
  import SoakGate.{SoakRow, evaluate}

  private val base = Map(
    "q01_order_revenue" -> 10.0,
    "q59_sessions_stream_replay" -> 17.4,
    "q327_capture_recapture" -> 131.3)

  test("a flood regression on a baselined query is a violation") {
    val (vio, _) = evaluate(
      Seq(SoakRow("q01_order_revenue", 200.0, ok = true, timedOut = false)),
      base)
    assert(vio.size == 1 && vio.head.contains("q01_order_revenue"))
  }

  test("the attention floor absorbs noise on small walls; headroom x2 holds above it") {
    // 10 s baseline: 25 s is under the 30 s floor -> pass even though >2x
    val (v1, _) = evaluate(
      Seq(SoakRow("q01_order_revenue", 25.0, ok = true, timedOut = false)), base)
    assert(v1.isEmpty)
    // 131 s baseline: 250 s is under 2x -> pass; 270 s is over -> fail
    val (v2, _) = evaluate(
      Seq(SoakRow("q327_capture_recapture", 250.0, ok = true, timedOut = false)), base)
    assert(v2.isEmpty)
    val (v3, _) = evaluate(
      Seq(SoakRow("q327_capture_recapture", 270.0, ok = true, timedOut = false)), base)
    assert(v3.size == 1)
  }

  test("spec forms and ingest-contract raw rows are skipped; their capped rows are not") {
    val rows = Seq(
      SoakRow("q128_bm25_search", 600.0, ok = false, timedOut = true),
      SoakRow("q184_linear_attribution", 450.0, ok = true, timedOut = false),
      SoakRow("q184_linear_attribution_on_rate_capped_ingest", 400.0,
        ok = true, timedOut = false))
    val (vio, _) = evaluate(rows, Map(
      "q184_linear_attribution_on_rate_capped_ingest" -> 2.1))
    assert(vio.size == 1, s"only the capped-leg regression may fire: $vio")
    assert(vio.head.contains("_on_rate_capped_ingest"))
  }

  test("non-ok rows outside the skip set are violations outright") {
    val (vio, _) = evaluate(
      Seq(SoakRow("q01_order_revenue", 600.0, ok = false, timedOut = true),
        SoakRow("q59_sessions_stream_replay", 1.0, ok = false, timedOut = false)),
      base)
    assert(vio.size == 2)
    assert(vio.exists(_.contains("TIMED OUT")) && vio.exists(_.contains("FAILED")))
  }

  test("new queries: noted under the floor, violation above it; missing sweep rows noted") {
    val rows = Seq(
      SoakRow("q999_new_fast", 12.0, ok = true, timedOut = false),
      SoakRow("q998_new_flood", 200.0, ok = true, timedOut = false))
    val (vio, notes) = evaluate(rows, base)
    assert(vio.size == 1 && vio.head.contains("q998_new_flood"))
    assert(notes.exists(_.contains("q999_new_fast")))
    assert(notes.count(_.contains("no sweep row")) == base.size)
  }

  test("fragment mode: present rows keep their bounds, absent baseline rows stop being noted") {
    // r15 (r14 verdict #6): a targeted repro sweep carries only the
    // queries it re-ran — gate those by the full discipline, but a
    // 2-row fragment must not page about 300 "missing" baseline rows.
    val frag = Seq(
      SoakRow("q01_order_revenue", 12.0, ok = true, timedOut = false))
    val (vioStrict, notesStrict) = evaluate(frag, base)
    assert(vioStrict.isEmpty &&
      notesStrict.count(_.contains("no sweep row")) == 2,
      "default mode must flag the absent baseline rows")
    val (vioFrag, notesFrag) = evaluate(frag, base, fragment = true)
    assert(vioFrag.isEmpty && notesFrag.isEmpty,
      s"fragment mode must not note absences: $notesFrag")
    // the bounds themselves are NOT relaxed: a flood in the fragment
    // still fails, and an in-fragment timeout is still a violation
    val (vioFlood, _) = evaluate(
      Seq(SoakRow("q01_order_revenue", 200.0, ok = true, timedOut = false)),
      base, fragment = true)
    assert(vioFlood.size == 1)
    val (vioDead, _) = evaluate(
      Seq(SoakRow("q01_order_revenue", 600.0, ok = false, timedOut = true)),
      base, fragment = true)
    assert(vioDead.size == 1 && vioDead.head.contains("TIMED OUT"))
  }

  test("harness rows (TOTAL, skew_probe, rate_cap_ingest) never enter the gate") {
    val (vio, notes) = evaluate(
      Seq(SoakRow("TOTAL", 9999.0, ok = true, timedOut = false),
        SoakRow("rate_cap_ingest", 500.0, ok = true, timedOut = false),
        SoakRow("hotkey_guard", 500.0, ok = false, timedOut = false)),
      Map.empty)
    assert(vio.isEmpty && notes.isEmpty)
  }

  test("replay-class bound breaches confirm isolated; everything else is untouched") {
    val rows = Seq(
      // replay row over bound in-sweep (17.4 x 2 = 34.8 < 42.2)
      SoakRow("q59_sessions_stream_replay", 42.2, ok = true, timedOut = false),
      // non-replay flood: must NOT get a second chance
      SoakRow("q01_order_revenue", 200.0, ok = true, timedOut = false),
      // replay row that FAILED: bound=None, no re-run can launder it
      SoakRow("q88_stream_dedup", 1.0, ok = false, timedOut = false))
    val (vio, _) = SoakGate.evaluateTyped(rows, base)
    assert(vio.size == 3)
    var reran = Seq.empty[String]
    // isolated wall 28.2 s: under the 34.8 s bound -> contention, pass
    val (v1, n1) = SoakGate.confirmReplay(vio, q => { reran :+= q; Some(28.2) })
    assert(reran == Seq("q59_sessions_stream_replay"),
      s"only the replay bound breach may re-run: $reran")
    assert(v1.size == 2, s"q59 must be confirmed away: $v1")
    assert(v1.exists(_.contains("q01_order_revenue")) &&
      v1.exists(_.contains("q88_stream_dedup")))
    assert(n1.size == 1 && n1.head.contains("ISOLATED") &&
      n1.head.contains("42.2") && n1.head.contains("28.2"))
    // isolated wall still over bound -> real regression, violation stands
    val (v2, n2) = SoakGate.confirmReplay(vio, _ => Some(40.0))
    assert(v2.size == 3 && n2.isEmpty)
    assert(v2.exists(v => v.contains("q59") && v.contains("real regression")))
    // re-run unavailable -> violation stands (unavailability never greens)
    val (v3, _) = SoakGate.confirmReplay(vio, _ => None)
    assert(v3.size == 3)
    assert(v3.exists(_.contains("re-run unavailable")))
  }

  test("replay class members are real gated/capped-leg names") {
    SoakGate.replayClass.foreach { q =>
      val base = q.stripSuffix("_on_rate_capped_ingest")
      assert(SparkEntry.queries.contains(base),
        s"replayClass entry $q has no registry query $base")
    }
    // spec forms are skipped before confirmation ever sees them
    assert(!SoakGate.replayClass.contains("q98_stream_stream_join"))
  }

  test("jsonl and baseline parsers round-trip the real formats") {
    val (rows, bad) = SoakGate.parseJsonl(Iterator(
      """{"q":"q59_sessions_stream_replay","sec":17.36,"rows":95393,"ok":true,"timed_out":false,"mem_spill_mb":0}""",
      """[soak] {"q":"q98_stream_stream_join","sec":388.24,"ok":true,"timed_out":false}""",
      """{"q":"rate_cap_ingest","sec":2.92,"rows_in":1000000}""",
      """{"q":"TOTAL","sec":100.0,"n":342}""",
      "not json at all"))
    assert(rows.map(_.q) ==
      Seq("q59_sessions_stream_replay", "q98_stream_stream_join",
        "rate_cap_ingest", "TOTAL"))
    assert(rows.head.sec == 17.36 && rows.head.ok && !rows.head.timedOut)
    assert(bad.isEmpty, "prose lines are not malformed rows")
  }

  test("a truncated sweep row is surfaced as malformed, not a crash") {
    // a JVM killed mid-println leaves a partial final line: it must be
    // reported (the gate fails the run on it), never a parser stack
    // trace, and never silently dropped
    val (rows, bad) = SoakGate.parseJsonl(Iterator(
      """{"q":"q01_order_revenue","sec":10.0,"ok":true,"timed_out":false}""",
      """{"q":"q184_linear_attr"""))
    assert(rows.map(_.q) == Seq("q01_order_revenue"))
    assert(bad.size == 1 && bad.head.contains("q184_linear_attr"))
    val b = SoakGate.parseBaseline(Iterator(
      "# comment", "", "q01_order_revenue\t10.5", "q02_ltv_daily\t0.58\tnote"))
    assert(b == Map("q01_order_revenue" -> 10.5, "q02_ltv_daily" -> 0.58))
  }
}
