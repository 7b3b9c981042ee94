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

  test("harness rows (TOTAL, skew_probe, rate_cap_ingest) never enter the gate") {
    val (vio, notes) = evaluate(
      Seq(SoakRow("TOTAL", 9999.0, ok = true, timedOut = false),
        SoakRow("rate_cap_ingest", 500.0, ok = true, timedOut = false),
        SoakRow("hotkey_guard", 500.0, ok = false, timedOut = false)),
      Map.empty)
    assert(vio.isEmpty && notes.isEmpty)
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
