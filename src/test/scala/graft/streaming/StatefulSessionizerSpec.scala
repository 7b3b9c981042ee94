package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StatefulSessionizerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    StatefulSessionizer.Event(1L, ts("2024-01-01 00:05:00"), 1.0),
    StatefulSessionizer.Event(1L, ts("2024-01-01 00:45:00"), 2.0),
    StatefulSessionizer.Event(2L, ts("2024-01-01 01:10:00"), 3.0),
    StatefulSessionizer.Event(2L, ts("2024-01-01 01:20:00"), 4.0))

  test("flatMapGroupsWithState sessions match declarative session_window sessions") {
    val custom = StatefulSessionizer
      .sessions(events.toDS(), gapMs = 30 * 60 * 1000)
      .select($"user_id", $"session_start".cast("string"),
        $"session_end".cast("string"), $"n_events")
      .as[(Long, String, String, Long)].collect().toSet
    val declarative = EventMetrics
      .sessions(events.toDF(), "30 minutes")
      .select($"user_id", $"session_start".cast("string"),
        $"session_end".cast("string"), $"n_events")
      .as[(Long, String, String, Long)].collect().toSet
    assert(custom == declarative)
  }
}

class StreamingCdcIngestSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ingest lands micro-batches in the cdc zone layout") {
    val src = Files.createTempDirectory("graft-stream-src").toString
    val root = Files.createTempDirectory("graft-stream-lake").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val data = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "payload")
    data.write.mode("overwrite").parquet(src)

    val lake = graft.io.Lakehouse(s"file://$root")
    val stream = spark.readStream.schema(data.schema).parquet(src)
    val q = StreamingCdcIngest.start(
      stream, lake, "events", "2024-06-01",
      lit("2024-06-01 00:00:00").cast("timestamp"), ckpt)
    q.awaitTermination(60000)

    val landed = spark.read.parquet(lake.cdc("events", "2024-06-01"))
    assert(landed.count() == 3)
    assert(landed.select($"cdc_action").distinct().as[String].collect().toSeq == Seq("insert"))
  }
}
