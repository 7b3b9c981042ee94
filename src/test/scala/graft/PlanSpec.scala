package graft

import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Physical-plan assertions: the scale properties the Scaladocs claim
  * (column pruning into the scan, broadcast of small dimensions,
  * bucketing eliminating the fact-fact shuffle) hold in the actual
  * plans — not just in comments. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planText(df: org.apache.spark.sql.DataFrame): String =
    df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("conformed scan prunes columns and broadcasts the part dimension") {
    val txt = planText(bindings.Conformed.orderRevenue(spark, sf))
    // lineitem has 11 columns; only the 6 consumed ones reach the scan
    val lineitemRead = txt.linesIterator
      .dropWhile(!_.contains("lineitem.parquet"))
      .find(_.startsWith("ReadSchema"))
      .getOrElse(fail("no lineitem ReadSchema found"))
    assert(!lineitemRead.contains("l_quantity") && !lineitemRead.contains("l_returnflag"),
      s"unpruned lineitem read: $lineitemRead")
    assert(lineitemRead.contains("l_extendedprice"))
    assert(txt.contains("BroadcastHashJoin"),
      "expected the part dimension join to broadcast")
  }

  test("bucketing both fact sides by the join key eliminates the shuffle") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val txt = planText(joined)
      assert(txt.contains("SortMergeJoin"), s"expected SMJ in:\n$txt")
      assert(!txt.contains("Exchange"),
        s"bucketed fact-fact join should be shuffle-free:\n$txt")
      assert(joined.count() > 0)
      // control: the same join over plain parquet DOES shuffle
      val unbucketed = planText(li.join(o, col("l_orderkey") === col("o_orderkey")))
      assert(unbucketed.contains("Exchange"))
    }
  }

  private def withSQLConf[A](pairs: (String, String)*)(f: => A): A = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
