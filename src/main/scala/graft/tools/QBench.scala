package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Time individual SparkEntry queries, N reps each (dev tool).
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.QBench q16_minhash_neardups [reps]
  * (a bare numeric arg is reps; SPARK_GRAFT_REPS is the fallback, default 2)
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (numArgs, names) = args.partition(a => a.nonEmpty && a.forall(_.isDigit))
    val reps = numArgs.lastOption.map(_.toInt)
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt)
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-qbench")
    spark.sparkContext.setLogLevel("WARN")
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => () }
    names.foreach { n =>
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val cnt = SparkEntry.queries(n)(spark, sfDir).count()
        println(f"[qbench] $n rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($cnt rows)")
      }
    }
    spark.stop()
  }
}
