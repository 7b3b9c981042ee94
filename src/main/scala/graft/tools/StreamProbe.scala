package graft.tools

import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.SparkEntry

/** Per-micro-batch telemetry for the streaming replay gates (dev tool):
  * runs each named query and prints every StreamingQueryProgress JSON
  * (durationMs breakdown: addBatch / getBatch / queryPlanning /
  * walCommit / commitOffsets / triggerExecution, plus stateOperators
  * commit times) so the wall can be attributed to state-store
  * machinery vs compute vs harness prep.
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.StreamProbe [names…] */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-streamprobe")
    spark.sparkContext.setLogLevel("WARN")
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        buf.synchronized { buf += e.progress.json; () }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q59_sessions_stream_replay", "q88_stream_dedup",
      "q98_stream_stream_join", "q339_stream_join_bucketed",
      "q344_stream_rate_cap", "q83_watermark_replay")
    names.foreach { n =>
      buf.synchronized(buf.clear())
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // listener bus is async; let it drain
      println(f"===== $n: $sec%.2f s total ($cnt rows)")
      buf.synchronized(buf.toSeq).foreach(println)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
