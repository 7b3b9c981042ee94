package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CdcApplySpec extends SparkSpec {
  import spark.implicits._

  private def prev = Seq(
    (1L, "a", 10.0), // unchanged
    (2L, "b", 20.0), // updated → 25.0
    (3L, "c", 30.0), // deleted
    (5L, null.asInstanceOf[String], 50.0) // unchanged with a NULL column
  ).toDF("k", "name", "amt")

  private def cur = Seq(
    (1L, "a", 10.0),
    (2L, "b", 25.0),
    (4L, "d", 40.0), // inserted
    (5L, null.asInstanceOf[String], 50.0)
  ).toDF("k", "name", "amt")

  test("merge replays a SnapshotDiff changeset back to the current snapshot") {
    val changes = SnapshotDiff(cur, prev, pk = Seq("k"), cdcTimestamp = lit("t"))
    val merged = CdcApply.merge(prev, changes, pk = Seq("k"))
    assert(merged.columns.toSeq == Seq("k", "name", "amt"))
    val got = merged.orderBy("k").as[(Long, String, Double)].collect().toSeq
    val want = cur.orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == want)
  }

  test("merge handles a minimal one-row-per-key changeset too") {
    val minimal = Seq(
      (2L, "b", 25.0, "update"),
      (3L, "c", 30.0, "delete"),
      (4L, "d", 40.0, "insert")
    ).toDF("k", "name", "amt", "cdc_action")
    val got = CdcApply.merge(prev, minimal, pk = Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    val want = cur.orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == want)
  }

  test("merge: a NULL or unrecognized cdc_action never destroys a key") {
    // the compactLog rule applied to merge: a malformed change row is
    // IGNORED — the unfiltered variant anti-joined the key out of the
    // target while isin("insert","update") (NULL for a NULL action)
    // dropped its image, turning unknown action into silent delete
    val malformed = Seq(
      (1L, "a", 999.0, null.asInstanceOf[String]), // NULL action
      (2L, "b", 999.0, "UPSERT"),                  // unrecognized action
      (4L, "d", 40.0, "insert")                    // one real change
    ).toDF("k", "name", "amt", "cdc_action")
    val got = CdcApply.merge(prev, malformed, pk = Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    val want = prev.unionByName(Seq((4L, "d", 40.0)).toDF("k", "name", "amt"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == want,
      s"keys 1 and 2 must keep their target rows untouched: $got")
  }

  test("scd2 emits open/closed version rows per key") {
    val rows = CdcApply.scd2(cur, prev, pk = Seq("k"))
      .orderBy("k", "valid_from")
      .select($"k", $"amt", $"valid_from", $"valid_to", $"is_current")
      .as[(Long, Double, Long, Option[Long], Boolean)].collect().toSeq
    assert(rows == Seq(
      (1L, 10.0, 1L, None, true),          // unchanged → one open row
      (2L, 20.0, 1L, Some(2L), false),     // updated → closed old image
      (2L, 25.0, 2L, None, true),          //           + open new image
      (3L, 30.0, 1L, Some(2L), false),     // deleted → closed, nothing open
      (4L, 40.0, 2L, None, true),          // inserted → open new image
      (5L, 50.0, 1L, None, true)           // NULL column is null-safe unchanged
    ))
  }

  test("scd2 run numbers are injectable") {
    val rows = CdcApply.scd2(cur, prev, pk = Seq("k"), priorRun = 7L, currentRun = 9L)
      .filter($"k" === 2L).orderBy("valid_from")
      .select($"valid_from", $"valid_to").as[(Long, Option[Long])].collect().toSeq
    assert(rows == Seq((7L, Some(9L)), (9L, None)))
  }

  test("compactLog keeps the newest surviving state and drops delete-terminated keys") {
    val log = Seq(
      (1L, 1L, "insert", 10.0), (1L, 2L, "update", 11.0),   // live → seq 2 wins
      (2L, 1L, "insert", 20.0), (2L, 3L, "delete", 0.0),    // newest is delete → gone
      (3L, 5L, "delete", 0.0), (3L, 6L, "insert", 30.0),    // re-inserted after delete → live
      (4L, 1L, "insert", 40.0), (4L, 2L, null, 41.0)        // NULL action newest → upsert, kept
    ).toDF("k", "seq", "cdc_action", "amt")
    val got = CdcApply.compactLog(log, Seq("k"), Seq($"seq"))
      .orderBy("k").select($"k", $"seq", $"amt").as[(Long, Long, Double)]
      .collect().toSeq
    assert(got == Seq((1L, 2L, 11.0), (3L, 6L, 30.0), (4L, 2L, 41.0)))
  }

  test("compactLog ordering tiebreaker makes the winner deterministic") {
    val log = Seq((1L, 7L, 100L, "insert"), (1L, 7L, 101L, "update"))
      .toDF("k", "seq", "id", "cdc_action")
    val got = CdcApply.compactLog(log, Seq("k"), Seq($"seq", $"id"))
      .select($"id").as[Long].collect().toSeq
    assert(got == Seq(101L))
  }
}
