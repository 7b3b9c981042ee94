package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.cdc.AppendOnlyCdc
import graft.io.{Lakehouse, ParquetSink}

/** Structured-Streaming CDC ingestion into the lakehouse — the streaming
  * counterpart of [[graft.pipeline.CdcPipeline.bronzeFact]] (the
  * reference is batch-only; SURVEY §2.9 marks this as the additive
  * extension).
  *
  * `readStream` source → append-only CDC tagging → `foreachBatch`
  * landing each micro-batch in the same bronze/cdc zone layout batch
  * consumers already read. foreachBatch (rather than a direct parquet
  * sink) keeps the partitioned-by-action layout and lets one micro-batch
  * write both zones atomically enough for this layout (the checkpoint
  * provides exactly-once per batch id).
  */
object StreamingCdcIngest {

  /** @param stream     streaming DataFrame (e.g. spark.readStream.parquet dir)
    * @param lake       target lakehouse
    * @param table      logical table name
    * @param runDate    partition date for the cdc zone
    * @param cdcTs      injected clock column
    * @param checkpoint checkpoint dir (exactly-once bookkeeping)
    * @param availableNow drain-available-then-stop (backfills/tests) vs
    *                     continuous micro-batches */
  def start(
      stream: DataFrame, lake: Lakehouse, table: String, runDate: String,
      cdcTs: Column, checkpoint: String, availableNow: Boolean = true): StreamingQuery = {
    val tagged = AppendOnlyCdc(stream, cdcTs)
    val writer = tagged.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // IDEMPOTENT landing keyed by batch id: foreachBatch is
        // at-least-once (a crash after the sink commit but before the
        // checkpoint records the batch re-runs it on restart), so a
        // blind Append would duplicate the batch's rows in bronze.
        // Overwriting the batch's OWN subdirectory makes the replay a
        // no-op; batch_id surfaces as a partition column downstream —
        // the provenance a landing zone wants anyway. The landing root
        // is cdcStream, NOT cdc: the batch pipeline's flat
        // cdc_action=X layout and this batch_id=N/cdc_action=X layout
        // must never share a discovery root (depth conflict).
        ParquetSink.partitioned(
          batch, s"${lake.cdcStream(table, runDate)}/batch_id=$batchId",
          Seq("cdc_action"), SaveMode.Overwrite)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
