package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed corpus-curation pipeline — the end-to-end workload the
  * individual extension operators exist for, as one operator:
  *
  *   quality gate → language gate → near-dup removal (keep each
  *   cluster's canonical doc) → deterministic train/val/test split
  *
  * Mirrors the shape of a production training-data pipeline: every stage
  * is one of the oracle-gated building blocks ([[TextAnalysis]],
  * [[Clusters]], [[Sampling]]), so the composition is itself exactly
  * mirrorable in SQL and hash-gated end-to-end.
  *
  * Scale: quality + split are shuffle-free projections; language ID is
  * a broadcast-lexicon join + per-doc argmax; dedup is the LSH
  * candidate→verify→cluster path whose shuffles are band-key- and
  * cluster-sized, never corpus²; the near-dup drop is a LEFT ANTI join
  * against the (tiny) non-canonical member list.
  */
object Curation {

  def curate(
      docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.3, lang: String = "en",
      minJaccard: Double = 0.5): DataFrame = {
    val quality = TextAnalysis.qualityScore(docs, idCol, textCol)
      .select(col(idCol), col("quality_score"))
    val langs = TextAnalysis.langId(docs, idCol, textCol)
      .select(col(idCol), col("detected_lang"))
    val dupLosers = Clusters.nearDupClusters(docs, idCol, textCol, minJaccard)
      .filter(!col("is_canonical"))
      .select(col(idCol))
    val curated = docs.select(col(idCol))
      .join(quality, Seq(idCol))
      .join(langs, Seq(idCol))
      .filter(col("quality_score") >= minQuality && col("detected_lang") === lang)
      .join(dupLosers, Seq(idCol), "left_anti")
    Sampling.hashSplit(curated, idCol)
      .select(col(idCol), col("detected_lang"), col("quality_score"),
        col("bucket"), col("split"))
  }
}
