package graft.bindings

import graft.SparkSpec

/** The session-scoped ranker spines (round-13): build-once semantics,
  * eager materialization, and survival of the harness cache-isolation
  * discipline (Verify/Soak clearCache between queries). */
class CorpusSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("spines are persisted, reused by reference, and re-persist after clearCache") {
    val a = Corpus.truncatedBm25Cached(spark, sf)
    assert(a.storageLevel.useMemory, "spine must be persisted on build")
    val n = a.count()
    assert(n > 0)
    // same session+dir → the SAME cached frame (no per-call persist
    // accumulation — the r11 storage-pool leak class)
    val b = Corpus.truncatedBm25Cached(spark, sf)
    assert(a eq b, "repeat call must return the cached spine, not rebuild")
    // the Verify/Soak discipline: clearCache between queries unpersists
    // everything; the next call must REBUILD a fresh frame (r14: a
    // re-persisted old object re-executes its stale memoized plan over
    // the cleared relations and never fills the new cache entry — the
    // q141 in-sweep stall) that is persisted, eagerly materialized,
    // and row-identical
    spark.catalog.clearCache()
    assert(a.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    val c = Corpus.truncatedBm25Cached(spark, sf)
    assert(!(c eq a), "recovery must REBUILD, not re-persist the stale object")
    assert(c.storageLevel.useMemory, "rebuilt spine must be persisted")
    assert(c.count() == n, "rebuilt spine must carry identical rows")
    val d = Corpus.truncatedBm25Cached(spark, sf)
    assert(d eq c, "rebuilt spine must be the new cached entry")
  }

  test("dense and lexical spines carry the fusion schema") {
    val den = Corpus.denseTopKCached(spark, sf)
    assert(den.columns.toSeq == Seq("query_id", "doc_id", "rank"))
    val lex = Corpus.uncappedBm25Cached(spark, sf)
    assert(Seq("query_id", "doc_id", "rank").forall(lex.columns.contains),
      s"lexical spine missing fusion columns: ${lex.columns.toSeq}")
    assert(den.count() > 0 && lex.count() > 0)
  }
}
