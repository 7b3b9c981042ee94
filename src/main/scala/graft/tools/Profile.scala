package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.Tables
import graft.ext.Dedup

/** Ad-hoc stage profiler (dev tool, not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    locally {
      import org.apache.spark.sql.functions._
      import graft.functions.Portable
      val toks = Portable.tokens(col("text"))
      time("tokens only")(docs.select(explode(toks)).count())
      time("shingles explode")(
        docs.select(explode(Portable.shingles(toks))).count())
      time("shingles+h31")(
        docs.select(Portable.h31(explode(Portable.shingles(toks)).as("s"))).count())
      time("shingles+h31+agg")(
        docs.select(col("doc_id"), explode(Portable.shingles(toks)).as("sh"))
          .select(col("doc_id"), Portable.h31(col("sh")).as("h"))
          .groupBy(col("doc_id"))
          .agg(min(col("h") * 3 % 7)).count())
    }
    val sig = time("signatures") {
      val s = Dedup.minhashSignatures(docs, "doc_id", "text")
      s.count(); s
    }
    val sigP = sig.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("signatures cached")(sigP.count())
    val pairs = time("lsh candidates") {
      val p = Dedup.lshCandidates(sigP, "doc_id")
      p.count(); p
    }
    time("estimated jaccard")(
      Dedup.estimatedJaccard(sigP, pairs, "doc_id").count())
    time("q16 cold end-to-end")(
      Dedup.minhashNearDups(Tables.documents(spark, sfDir), "doc_id", "text").count())
    spark.stop()
  }
}
