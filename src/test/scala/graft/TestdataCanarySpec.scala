package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Physical-schema canary over the driver-shipped testdata: loads every
  * table through [[graft.core.Tables]] at sf0.001 and touches the
  * timestamp/date columns, so the class of "driver regenerated testdata
  * with a new parquet physical type" fails in-repo before the driver's
  * verify run sees it. Would have caught both the round-5 TIMESTAMP(NANOS)
  * form (schema-inference refusal without nanosAsLong) and the round-6
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) → TimestampNTZType form (events
  * loader threw for every consumer). */
class TestdataCanarySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private val available = new java.io.File(dir).isDirectory

  test("every testdata table loads through Tables with rows > 0") {
    assume(available, s"$dir not present")
    val loaders: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "region"     -> (() => graft.core.Tables.region(spark, dir)),
      "nation"     -> (() => graft.core.Tables.nation(spark, dir)),
      "customer"   -> (() => graft.core.Tables.customer(spark, dir)),
      "supplier"   -> (() => graft.core.Tables.supplier(spark, dir)),
      "part"       -> (() => graft.core.Tables.part(spark, dir)),
      "orders"     -> (() => graft.core.Tables.orders(spark, dir)),
      "lineitem"   -> (() => graft.core.Tables.lineitem(spark, dir)),
      "events"     -> (() => graft.core.Tables.events(spark, dir)),
      "documents"  -> (() => graft.core.Tables.documents(spark, dir)),
      "embeddings" -> (() => graft.core.Tables.embeddings(spark, dir))
    )
    loaders.foreach { case (name, load) =>
      val n = load().count()
      assert(n > 0, s"$name is empty")
    }
  }

  test("events.ts normalizes to TimestampType and aggregates") {
    assume(available, s"$dir not present")
    val ev = graft.core.Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"events.ts must normalize to TimestampType, got ${ev.schema("ts").dataType}")
    // touch the column end-to-end: min/max must execute and be ordered
    val r = ev.agg(min("ts").as("lo"), max("ts").as("hi")).head()
    val (lo, hi) = (r.getTimestamp(0), r.getTimestamp(1))
    assert(lo != null && hi != null && !hi.before(lo))
    // windowing over ts is the dominant consumer shape — must plan + run
    val w = ev.groupBy(window(col("ts"), "1 day")).count().count()
    assert(w > 0)
  }

  test("orders/lineitem date columns parse and compare") {
    assume(available, s"$dir not present")
    // the driver currently ships these as TIMESTAMP(MICROS, tz-naive) →
    // TimestampNTZType; any of the three temporal forms is acceptable as
    // long as to_date + range comparison plan and run
    val temporal: Set[DataType] = Set(DateType, TimestampType, TimestampNTZType)
    val o = graft.core.Tables.orders(spark, dir)
    assert(temporal.contains(o.schema("o_orderdate").dataType),
      s"o_orderdate must be a temporal type, got ${o.schema("o_orderdate").dataType}")
    assert(o.filter(to_date(col("o_orderdate")) >= lit("1992-01-01").cast(DateType))
      .count() > 0)
    val l = graft.core.Tables.lineitem(spark, dir)
    assert(temporal.contains(l.schema("l_shipdate").dataType),
      s"l_shipdate must be a temporal type, got ${l.schema("l_shipdate").dataType}")
    val c = l.agg(max(to_date(col("l_shipdate")))).head()
    assert(!c.isNullAt(0))
  }

  test("documents text and embeddings vector columns keep their shapes") {
    assume(available, s"$dir not present")
    val d = graft.core.Tables.documents(spark, dir)
    assert(d.schema.fieldNames.contains("text"))
    assert(d.filter(length(col("text")) > 0).count() > 0)
    val e = graft.core.Tables.embeddings(spark, dir)
    val embField = e.schema.fields.find(_.dataType.isInstanceOf[ArrayType])
    assert(embField.nonEmpty, "embeddings must carry an array column")
    val dims = e.select(size(col(embField.get.name)).as("d")).agg(countDistinct("d")).head().getLong(0)
    assert(dims == 1L, "embedding dimensionality must be uniform")
  }
}
