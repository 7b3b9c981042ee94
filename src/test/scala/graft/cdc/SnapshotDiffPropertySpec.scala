package graft.cdc

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-style invariants over randomized PK-unique snapshot pairs
  * (seeded — reproducible). SURVEY §5.2. */
class SnapshotDiffPropertySpec extends SparkSpec {
  import spark.implicits._

  private val ts = lit("2024-01-01 00:00:00").cast("timestamp")

  test("changeset reconstructs current: prev − deletes + inserts == current") {
    val rnd = new Random(42)
    for (round <- 1 to 8) {
      val keys = 0 until 40
      def randTable() = keys.flatMap { k =>
        if (rnd.nextDouble() < 0.8)
          Some((k, rnd.nextInt(3).toString, if (rnd.nextBoolean()) Some(rnd.nextInt(5)) else None))
        else None
      }
      val prev = randTable().toDF("id", "v", "w")
      val cur = randTable().toDF("id", "v", "w")
      val changes = SnapshotDiff(cur, prev, Seq("id"), ts)

      val inserts = changes.filter($"cdc_action" === "insert").select($"id", $"v", $"w")
      val deletes = changes.filter($"cdc_action" === "delete").select($"id", $"v", $"w")

      // reconstruction: rows(prev) minus deleted rows plus inserted rows == rows(cur)
      val reconstructed = prev.exceptAll(deletes).unionAll(inserts)
      assert(reconstructed.exceptAll(cur).isEmpty && cur.exceptAll(reconstructed).isEmpty,
        s"round $round reconstruction failed")

      // inserts and deletes never share a full row (an update changes the row)
      assert(inserts.intersect(deletes).isEmpty, s"round $round insert∩delete nonempty")

      // self-diff is always empty
      assert(SnapshotDiff(cur, cur, Seq("id"), ts).isEmpty, s"round $round self-diff nonempty")
    }
  }
}
