package graft.bindings

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.ext.Retrieval

/** Session-scoped materializations over the `documents` corpus — the
  * retrieval analogue of [[Conformed.orderRevenueCached]]: a real
  * lexical-search system builds its scored inverted index ONCE and
  * probes it per query; deriving each gated retrieval query from raw
  * text would rebuild the identical tokenize→tf→df→score subtree per
  * query (and the hybrid fusion query would rebuild it per RANKER).
  *
  * The cached frame is [[Retrieval.scoredPostings]] at the engine's
  * default (k1=1.2, b=0.75): one row per (doc, term) posting with the
  * quantized per-term score plus df/n_docs, so every `maxDfFraction`
  * branch prunes the same index. Size is |postings| — bounded by
  * corpus tokens, far smaller than any doc×doc product; at 100 TB this
  * persist becomes a bucketed parquet index table (bucketed by term,
  * the probe key), which is exactly the shape the in-memory persist
  * rehearses. */
object Corpus {
  private val postingsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def scoredPostingsCached(spark: SparkSession, dir: String): DataFrame = {
    val df = postingsCache.getOrElseUpdate(
      (spark, dir),
      Retrieval.scoredPostings(Tables.documents(spark, dir), "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df
  }
}
