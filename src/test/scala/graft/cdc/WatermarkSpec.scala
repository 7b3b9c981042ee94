package graft.cdc

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(): ControlStore = {
    val dir = Files.createTempDirectory("graft-control").toString
    new ControlStore(spark.sparkContext.hadoopConfiguration, s"file://$dir")
  }

  test("control store: default on miss, round-trip, overwrite") {
    val store = newStore()
    assert(store.get("silver/last_run.txt") == "2020-01-01")
    store.put("silver/last_run.txt", "2024-03-01")
    assert(store.get("silver/last_run.txt") == "2024-03-01")
    store.put("silver/last_run.txt", "2024-04-01")
    assert(store.get("silver/last_run.txt") == "2024-04-01")
  }

  test("exclusive vs inclusive watermark policies (late-data contract)") {
    val d = Seq("2024-01-01", "2024-01-02", "2024-01-03").toDF("d")
      .withColumn("d", to_date($"d"))
    assert(WatermarkIncrementalLoad.sinceExclusive(d, "d", "2024-01-02").count() == 1)
    assert(WatermarkIncrementalLoad.sinceInclusive(d, "d", "2024-01-02").count() == 2)
  }

  test("run(): processes fresh rows, advances watermark to max processed, no-ops when drained") {
    val store = newStore()
    val input = Seq(("2024-01-01", 1.0), ("2024-01-05", 2.0)).toDF("d", "v")
      .withColumn("d", to_date($"d"))
    var sunk = 0L
    val wm = WatermarkIncrementalLoad.run(store, "k", input, "d")(identity)(df => sunk = df.count())
    assert(wm.contains("2024-01-05") && sunk == 2)
    assert(store.get("k") == "2024-01-05")
    // second run: nothing newer than the watermark → None, watermark kept
    val wm2 = WatermarkIncrementalLoad.run(store, "k", input, "d")(identity)(_ => fail("sink must not run"))
    assert(wm2.isEmpty && store.get("k") == "2024-01-05")
  }

  test("append-only cdc tags inserts with the injected clock") {
    val ts = lit("2024-01-01 00:00:00").cast("timestamp")
    val out = AppendOnlyCdc(Seq(1, 2).toDF("id"), ts)
    assert(out.select($"cdc_action").distinct().as[String].collect().toSeq == Seq("insert"))
    assert(out.columns.toSeq == Seq("id", "cdc_action", "cdc_timestamp"))
  }
}
