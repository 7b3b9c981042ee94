package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingRateCapSpec extends SparkSpec {
  import spark.implicits._

  test("keepNewest merge law: incremental capping across any split equals one-shot") {
    val rnd = new scala.util.Random(7)
    // duplicate timestamps abound (10 distinct tsu over 50 events) so the
    // event_id-asc tie-break is load-bearing
    val entries = Vector.tabulate(50)(i =>
      StreamingRateCap.KeptEv(rnd.nextInt(10).toLong, i.toLong, "view", 1.0))
    val oneShot = StreamingRateCap.keepNewest(entries, 5)
    assert(oneShot.size == 5)
    (1 to 20).foreach { _ =>
      val shuffled = rnd.shuffle(entries)
      val (a, b) = shuffled.splitAt(rnd.nextInt(entries.size + 1))
      val incremental = StreamingRateCap.keepNewest(
        StreamingRateCap.keepNewest(a, 5) ++ b, 5)
      assert(incremental == oneShot,
        "selection under the total order must be split-invariant")
      // the operator's bounded in-task shape: chunked fold over an
      // arbitrary arrival order equals the one-shot selection for any
      // chunk size (memory stays ≤ cap + chunk even on a hot day)
      val chunk = 1 + rnd.nextInt(7)
      val folded = shuffled.grouped(chunk)
        .foldLeft(Vector.empty[StreamingRateCap.KeptEv]) {
          (acc, c) => StreamingRateCap.keepNewest(acc ++ c, 5)
        }
      assert(folded == oneShot,
        s"chunked fold (chunk=$chunk) must equal one-shot selection")
    }
  }

  test("file-stream replay equals the batch eventRateCap on the sf0.001 events table") {
    val dir = "/root/testdata/sf0.001"
    val (gotDf, metrics) = StreamingRateCap
      .cappedViaStreamWithMetrics(spark, dir, maxPerDay = 3)
    val got = gotDf
      .orderBy($"user_id", $"event_id")
      .as[(Long, Long, String, Long, Double)].collect().toSeq
    // observability contract: the run reports real telemetry, and the
    // state held never exceeds the max CONCURRENT open (entity, day)
    // keys under the replay's slice/watermark schedule. The former
    // entityDays×cap bound was vacuous (state rows are one per open
    // key, so maxStateRows ≤ entityDays always — advisor r13); this
    // bound fails if key eviction breaks (state would accumulate every
    // seen entity-day, well above the concurrent-open count).
    assert(metrics.batches > 0 && metrics.inputRows > 0)
    assert(metrics.maxStateBytes > 0, "state memory telemetry must report")
    val entityDays = graft.core.Tables.events(spark, dir)
      .select($"user_id", (unix_micros($"ts") / (86400L * 1000000L)).cast("long"))
      .distinct().count()
    val openBound = StreamingRateCap.openEntityDayBound(
      graft.core.Tables.events(spark, dir), "user_id", "ts", slices = 4)
    assert(openBound < entityDays,
      s"open bound $openBound must bind tighter than entityDays $entityDays")
    assert(metrics.maxStateRows <= openBound,
      s"state ${metrics.maxStateRows} above the $openBound open-key bound")
    val events = graft.core.Tables.events(spark, dir)
    val want = graft.ext.Curation.eventRateCap(
        events, "user_id", "event_id", "ts", maxPerDay = 3)
      .select($"user_id", $"event_id", $"event_type",
        unix_micros($"ts").as("tsu"), $"value")
      .orderBy($"user_id", $"event_id")
      .as[(Long, Long, String, Long, Double)].collect().toSeq
    assert(want.size < events.count(), "the cap must BIND at this SF")
    assert(got.size == want.size, s"${got.size} != ${want.size}")
    assert(got == want, "streaming kept set must equal the batch cap's")
  }
}
