package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{dot, l2norm}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - [[topKNeighbors]] — brute-force blocked/unblocked cosine top-k: the
  *    correctness baseline. All-pairs is quadratic; at 100 TB use it only
  *    inside blocks/clusters.
  *  - [[ivfTopK]] — IVF-style: assign every vector to its nearest
  *    deterministic centroid (broadcast join — centroid set is tiny),
  *    then search only within the assigned cell. One shuffle on the cell
  *    id; recall < 1 by design (single-probe), which is the standard
  *    scale trade.
  *
  * Cosines run through the codegen'd [[graft.functions.DotProduct]]
  * expression; per-vector norms are computed ONCE before any join
  * (brute-force over n vectors does n norms + n² dots, not 3n² array
  * passes). Scores are rounded to 6 decimals before ranking so
  * cross-engine float noise cannot reorder results; ties break on
  * neighbor id.
  */
object Similarity {

  /** Cosine similarity of two array<double> columns (codegen'd). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  private def withNorm(vecs: DataFrame, idCol: String, vecCol: String): DataFrame =
    vecs.select(
      col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("emb"))
      .withColumn("nrm", l2norm(col("emb")))

  /** For every vector: top-k neighbors by cosine (excluding self),
    * deterministic ordering (rounded cosine desc, neighbor id asc). */
  def topKNeighbors(
      vecs: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val v = withNorm(vecs, idCol, vecCol)
    val a = v.toDF("vec_id", "emb_a", "nrm_a")
    val b = v.toDF("neighbor_id", "emb_b", "nrm_b")
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    a.crossJoin(b)
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** IVF single-probe approximate top-k. Centroids are the vectors whose
    * id ≡ 0 (mod centroidEvery) — deterministic, data-derived, no RNG. */
  def ivfTopK(
      vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      centroidEvery: Int = 100): DataFrame = {
    val v = withNorm(vecs, idCol, vecCol)
    val centroids = v.filter(col("id") % centroidEvery === 0)
      .select(col("id").as("centroid_id"), col("emb").as("cemb"), col("nrm").as("cnrm"))
    val wAssign = Window.partitionBy(col("id"))
      .orderBy(col("ccos").desc, col("centroid_id"))
    val assigned = v.crossJoin(broadcast(centroids))
      .withColumn("ccos",
        round(dot(col("emb"), col("cemb")) / (col("nrm") * col("cnrm")), 6))
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") === 1)
      .select(col("id"), col("emb"), col("nrm"), col("centroid_id").as("cell"))
    val a = assigned.toDF("vec_id", "emb_a", "nrm_a", "cell")
    val b = assigned.toDF("neighbor_id", "emb_b", "nrm_b", "cell")
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    a.join(b, Seq("cell"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("cell"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}
