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

  test("control store: put clears stale checksum sidecars left by a previous writer") {
    // simulate the pre-r13 writer: create(p, true) through the
    // CHECKSUMMED local FS leaves a .last_run.txt.crc sidecar. The NIO
    // atomic-move put bypasses ChecksumFileSystem, so unless put()
    // deletes the target's own sidecar too, the next checksummed read
    // raises ChecksumException instead of returning the new value.
    val dir = Files.createTempDirectory("graft-control-crc").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val store = new ControlStore(conf, s"file://$dir")
    val p = new org.apache.hadoop.fs.Path(s"file://$dir/silver/last_run.txt")
    val fs = p.getFileSystem(conf) // checksummed LocalFileSystem
    val out = fs.create(p, true)
    try out.write("2024-01-01".getBytes("UTF-8")) finally out.close()
    assert(fs.exists(new org.apache.hadoop.fs.Path(p.getParent, s".${p.getName}.crc")),
      "precondition: the checksummed FS should have written a sidecar")
    store.put("silver/last_run.txt", "2024-05-01")
    assert(store.get("silver/last_run.txt") == "2024-05-01")
    // verified read through the checksummed FS must not throw
    val in = fs.open(p)
    try assert(new String(org.apache.commons.io.IOUtils.toByteArray(in),
      "UTF-8").trim == "2024-05-01")
    finally in.close()
    // and no tmp/sidecar debris remains next to the watermark
    val left = fs.listStatus(p.getParent).map(_.getPath.getName).toSet
    assert(left == Set("last_run.txt"), s"debris left: $left")
  }

  test("control store: object-store schemes route to direct atomic PUT") {
    // the branch itself needs an object store to exercise; pin the
    // scheme table so a refactor can't silently route s3a back through
    // the delete+rename path (absent-file window → default-watermark
    // over-read → full-history reprocess), nor abfs/wasb back to direct
    // PUT (hierarchical namespace: create() is visible-empty-then-
    // filled, so direct overwrite opens the truncated/empty-read window
    // while ADLS rename is atomic — advisor r13)
    for (s <- Seq("s3a", "s3", "s3n", "gs", "oss", "cos", "swift"))
      assert(ControlStore.ObjectStoreSchemes(s), s"$s must use direct PUT")
    for (s <- Seq("file", "hdfs", "viewfs", "abfs", "abfss", "wasb", "wasbs"))
      assert(!ControlStore.ObjectStoreSchemes(s), s"$s must use tmp+rename")
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
