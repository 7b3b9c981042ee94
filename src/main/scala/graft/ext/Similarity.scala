package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TopKAggregate.top_k
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

  /** Explode a `top_k` result array into (…group cols…, neighbor_id,
    * cosine, rank) rows. */
  private def explodeTopK(grouped: DataFrame): DataFrame = {
    val groupCols = grouped.columns.filterNot(_ == "topk").map(col).toSeq
    grouped
      .select(groupCols :+ explode(col("topk")).as("t"): _*)
      .select(groupCols ++ Seq(
        col("t.id").as("neighbor_id"),
        col("t.score").as("cosine"),
        col("t.rank").as("rank")): _*)
  }

  /** For every vector: top-k neighbors by cosine (excluding self),
    * deterministic ordering (rounded cosine desc, neighbor id asc).
    *
    * Ranking uses the bounded-heap [[TopKAggregate]] rather than a
    * row_number window: the window variant sorts every group's full
    * n−1 candidate rows (the dominant cost of this query at sf0.1);
    * the aggregate keeps k per group map-side and shuffles only those. */
  def topKNeighbors(
      vecs: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val v = withNorm(vecs, idCol, vecCol)
    val a = v.toDF("vec_id", "emb_a", "nrm_a")
    val b = v.toDF("neighbor_id", "emb_b", "nrm_b")
    val scored = a.crossJoin(b)
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")), 6))
    explodeTopK(
      scored.groupBy(col("vec_id"))
        .agg(top_k(col("cosine"), col("neighbor_id"), k).as("topk")))
  }

  /** IVF single-probe approximate top-k. Centroids are the vectors whose
    * id ≡ 0 (mod centroidEvery) — deterministic, data-derived, no RNG. */
  def ivfTopK(
      vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      centroidEvery: Int = 100): DataFrame = {
    val v = withNorm(vecs, idCol, vecCol)
    val centroids = v.filter(col("id") % centroidEvery === 0)
      .select(col("id").as("centroid_id"), col("emb").as("cemb"), col("nrm").as("cnrm"))
    // nearest centroid = top_k with k=1 (same tie-break as the window)
    val assigned = v.crossJoin(broadcast(centroids))
      .withColumn("ccos",
        round(dot(col("emb"), col("cemb")) / (col("nrm") * col("cnrm")), 6))
      .groupBy(col("id"))
      .agg(
        top_k(col("ccos"), col("centroid_id"), 1).as("topc"),
        first(col("emb")).as("emb"),
        first(col("nrm")).as("nrm"))
      .select(col("id"), col("emb"), col("nrm"),
        element_at(col("topc"), 1).getField("id").as("cell"))
    val a = assigned.toDF("vec_id", "emb_a", "nrm_a", "cell")
    val b = assigned.toDF("neighbor_id", "emb_b", "nrm_b", "cell")
    val scored = a.join(b, Seq("cell"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")), 6))
    explodeTopK(
      scored.groupBy(col("vec_id"), col("cell"))
        .agg(top_k(col("cosine"), col("neighbor_id"), k).as("topk")))
      .select(col("vec_id"), col("cell"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}
