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
      import graft.functions.VectorFunctions.{dot, l2norm}
      val vecs = Tables.embeddings(spark, sfDir)
      val v = vecs.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("emb"))
        .withColumn("nrm", l2norm(col("emb")))
      val a = v.toDF("vec_id", "emb_a", "nrm_a")
      val b = v.toDF("neighbor_id", "emb_b", "nrm_b")
      val pairs = a.crossJoin(b).filter(col("vec_id") =!= col("neighbor_id"))
        .withColumn("cosine",
          round(dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")), 6))
        .select(col("vec_id"), col("neighbor_id"), col("cosine"))
      time("q20 warmup pairs+cosine")(pairs.count())
      time("q20 pairs+cosine")(pairs.count())
      time("q20 full topk")(
        graft.ext.Similarity.topKNeighbors(vecs, "vec_id", "embedding", 5).count())
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
