package graft.tools

import org.apache.spark.sql.functions._

import graft.bindings.Conformed

/** Ad-hoc q01 stage profiler (dev tool, not part of the driver contract). */
object ProfileQ01 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(32, "graft-profile-q01")
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warmup lineitem count")(graft.core.Tables.lineitem(spark, sfDir).count())
    time("items")(Conformed.items(spark, sfDir).count())
    time("items again")(Conformed.items(spark, sfDir).count())
    time("optionsRaw")(Conformed.optionsRaw(spark, sfDir).count())
    time("options (dedup)")(Conformed.options(spark, sfDir).count())
    time("orderRevenue")(Conformed.orderRevenue(spark, sfDir).count())
    time("orderRevenue sorted")(
      Conformed.orderRevenue(spark, sfDir)
        .orderBy(col("order_id"), col("lineitem_id"), col("item_category"),
          col("item_price"), col("restaurant_id")).count())
    time("orderRevenue sorted again")(
      Conformed.orderRevenue(spark, sfDir)
        .orderBy(col("order_id"), col("lineitem_id"), col("item_category"),
          col("item_price"), col("restaurant_id")).count())
    spark.stop()
  }
}
