package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextTablesSpec extends SparkSpec {
  import spark.implicits._

  test("JSON round-trip preserves unicode, embedded newlines, and nulls") {
    val df = Seq(
      (1L, Some("héllo wörld\nsecond line"), Some("en")),
      (2L, Some("中文 文本"), None),
      (3L, None, Some("de")),
    ).toDF("id", "text", "lang")
    val dir = Files.createTempDirectory("graft-json-spec").toString
    TextTables.writeJson(df, dir)
    val back = TextTables.readJson(spark, dir, df.schema)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("CSV round-trip preserves a numeric fact table with explicit schema") {
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_returnflag")
    val dir = Files.createTempDirectory("graft-csv-spec").toString
    TextTables.writeCsv(li, dir)
    val back = TextTables.readCsv(spark, dir, li.schema)
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
    // the read is schema-explicit: no inference job widened the types
    assert(back.schema == li.schema)
  }
}
