package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamJoinSpec extends SparkSpec {

  test("stream-stream join replay equals the batch range join") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamJoin.purchaseViewJoinViaStream(spark, dir, slices = 3)

    val ev = graft.core.Tables.events(spark, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val batch = purchases.join(views, Seq("user_id"))
      .filter(col("view_ts") >= col("purchase_ts") - expr("INTERVAL 3600 SECONDS") &&
        col("view_ts") <= col("purchase_ts"))
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("view_id"), col("view_ts"))

    assert(streamed.count() > 0, "replay produced no joined rows")
    assert(streamed.except(batch).isEmpty, "streaming emitted rows batch does not have")
    assert(batch.except(streamed).isEmpty, "streaming lost rows across micro-batches")
  }
}
