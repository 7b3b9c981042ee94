package graft.streaming

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("stream replay equals batch DISTINCT; state bounded by distinct keys") {
    val dir = "/root/testdata/sf0.001"
    val maxStateRows = new AtomicLong(0)
    val nBatches = new AtomicInteger(0)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        nBatches.incrementAndGet()
        e.progress.stateOperators.foreach { so =>
          maxStateRows.getAndUpdate(m => math.max(m, so.numRowsTotal))
        }
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val streamed =
      try StreamingDedup.distinctKeysViaStream(spark, dir, slices = 3)
        .as[(Long, String)].collect().toSet
      finally spark.streams.removeListener(listener)
    val batch = graft.core.Tables.events(spark, dir)
      .select($"user_id".cast("long"), $"event_type").distinct()
      .as[(Long, String)].collect().toSet
    assert(streamed == batch)
    // keys recur across the 3 time slices, so suppression is cross-batch
    assert(nBatches.get() >= 3, s"expected >= 3 micro-batches, got ${nBatches.get()}")
    assert(maxStateRows.get() > 0 && maxStateRows.get() <= batch.size,
      s"state rows ${maxStateRows.get()} exceed the distinct-key bound (${batch.size})")
  }
}
