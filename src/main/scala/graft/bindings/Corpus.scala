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
  // lifecycle-bounded (r14, advisor r13 #5): entries evict on session
  // stop and on access after a context dies — see [[SessionCache]]
  private val cache = new SessionCache[(String, String)]

  /** Build-once-per-session persist with EAGER materialization: the
    * count() inside the build (re-run on a FRESH rebuild after a
    * harness clearCache — see the clearCache recovery rule below)
    * means a consumer that fuses two spines never computes both arms
    * concurrently in one job — the serialized memory peak is
    * max(sides), not sum (the r11 q141 OOM fix), now a property of
    * the spine instead of per-query persist/unpersist choreography.
    * Ranker-output spines are queries·k rows — session-lifetime
    * residency is storage-pool-safe, unlike the r11 per-call persists
    * that accumulated one block set per invocation. The POSTINGS index
    * deliberately stays [[cachedLazy]]: eager counting it added a full
    * materialization pass per retrieval query under cache-isolated
    * harnesses (soak/Verify clearCache between queries) — +27% on the
    * q128/q136 10× floods, measured — with no serialization benefit
    * (an index feeds ONE probe at a time; the probe's own scan fills
    * the cache in the same pass). Recovery after clearCache REBUILDS
    * via [[SessionCache.getOrRebuild]] (the r14 q141-stall rule: a
    * re-persisted object's memoized plan scans the cleared relations,
    * caches nothing, and the fused consumer degrades to the
    * sum-peak shape — 333.6 s isolated vs a 900 s in-sweep stall,
    * measured; the rule's full rationale lives on getOrRebuild). */
  private def cachedEager(
      spark: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame =
    cache.getOrRebuild(spark, (dir, name)) {
      val d = build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      d.count()
      d
    }

  private def cachedLazy(
      spark: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame =
    cache.getOrRebuild(spark, (dir, name))(
      build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  def scoredPostingsCached(spark: SparkSession, dir: String): DataFrame =
    cachedLazy(spark, dir, "postings")(
      Retrieval.scoredPostings(Tables.documents(spark, dir), "doc_id", "text"))

  /** The DISK form of the index — [[Retrieval.writeBucketedIndex]]
    * built once per (session, dir), read back as a term-bucketed table:
    * the 100 TB shape this object's scaladoc promises, executed rather
    * than asserted (q345 gates probe-over-disk == probe-over-memory ==
    * the DuckDB oracle, hash-matched). Files land under the JVM temp
    * dir keyed by the corpus dir; the catalog entry is session-scoped,
    * so a new session re-registers (overwrite) rather than trusting
    * stale metadata. */
  private val diskIndexLock = new Object

  /** Collision-safe, content-stamped identity for a disk index built
    * from `<dir>/<dataset>` (r15, closing the r14 verdict #4 window):
    * 128 bits of SHA-256 over the corpus dir's canonical path PLUS
    * every source file's (path, length, mtime) — so (a) two distinct
    * dirs in one JVM cannot collide into one table the way a 32-bit
    * string hash could, and (b) contents MUTATED under an unchanged
    * path produce a new stamp and a fresh build instead of being
    * served stale from the catalog. The stamp is the harness-scale
    * stand-in for what a metastore's table version provides at cluster
    * scale; the per-SESSION frame cache above it still assumes
    * immutable testdata within one session, like every other cached
    * spine. */
  private[graft] def indexStamp(dir: String, dataset: String): String = {
    val root = new java.io.File(new java.io.File(dir), dataset)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.toSeq).getOrElse(Nil)
          .sortBy(_.getName).flatMap(walk)
      else Seq(f)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(new java.io.File(dir).getCanonicalPath.getBytes("UTF-8"))
    walk(root).foreach { f =>
      md.update(
        s"|${f.getCanonicalPath}:${f.length}:${f.lastModified}"
          .getBytes("UTF-8"))
    }
    md.digest().map("%02x".format(_)).mkString.take(32)
  }

  /** Shared build-once-per-JVM choreography for every disk index: the
    * catalog (and the files) are SHARED across sessions of one context
    * while the frame cache is per-session — a sibling session that
    * already wrote this stamp's index must be REUSED, not overwritten
    * (an overwrite would delete the parquet files out from under the
    * sibling's live frame mid-scan). Reuse is exact because the stamp
    * pins the source content; the lock serializes the one first build
    * per JVM. (An index is rebuilt only when no catalog entry exists —
    * a fresh JVM always rewrites, so external tmp cleanup between JVMs
    * is harmless.) */
  private def diskIndexTable(
      spark: SparkSession, prefix: String, stamp: String)
      (write: (String, String) => Unit): DataFrame =
    diskIndexLock.synchronized {
      val table = s"${prefix}_$stamp"
      if (!spark.catalog.tableExists(table)) {
        val path = new java.io.File(
          sys.props("java.io.tmpdir"), table).getAbsolutePath
        write(table, path)
      }
      spark.table(table)
    }

  def diskIndexCached(spark: SparkSession, dir: String): DataFrame =
    cache.getOrElseUpdate(spark, (dir, "lex_disk_index")) {
      diskIndexTable(spark, "graft_lexidx",
        indexStamp(dir, "documents.parquet")) { (table, path) =>
        Retrieval.writeBucketedIndex(
          Retrieval.scoredPostings(
            Tables.documents(spark, dir), "doc_id", "text"),
          table, path)
      }
    }

  /** The DISK form of the DENSE tier's IVF index — [[graft.ext
    * .Similarity.ivfAssign]]'s (id, emb, nrm, cell) assignment written
    * once per (JVM, content stamp) as a CELL-bucketed parquet table and
    * read back as the probe input: the 100 TB shape of "cells bound who
    * you score", executed rather than asserted (q346 gates
    * probe-over-disk == probe-over-memory == the q21 DuckDB oracle,
    * hash-matched; IvfDiskIndexSpec plan-asserts the zero-exchange
    * probe). Same identity/lifecycle discipline as the lexical
    * [[diskIndexCached]]. */
  def ivfIndexCached(spark: SparkSession, dir: String): DataFrame =
    cache.getOrElseUpdate(spark, (dir, "ivf_disk_index")) {
      diskIndexTable(spark, "graft_ivfidx",
        indexStamp(dir, "embeddings.parquet")) { (table, path) =>
        graft.ext.Similarity.writeIvfIndex(
          graft.ext.Similarity.ivfAssign(
            Tables.embeddings(spark, dir), "vec_id", "embedding",
            centroidEvery = 100),
          table, path)
      }
    }

  /** The DISK form of the full IVF-PQ layout (q192's index): ONE
    * training run writes `codes` (cell-bucketed — the only
    * corpus-scale frame), `book` and `cents` (model-sized) under one
    * content stamp; probes encode raw queries online against the
    * stored model frames ([[graft.ext.Similarity.ivfPqTopKFromIndex]]).
    * Returns (codes, book, cents). Frames are cheap catalog reads, so
    * only the build is guarded (same lock + reuse discipline as
    * [[diskIndexCached]]); a partially-written triple cannot be
    * observed because the build runs entirely inside the lock and the
    * existence check covers all three tables. */
  def ivfPqIndexCached(
      spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    val stamp = indexStamp(dir, "embeddings.parquet")
    def table(part: String) = s"graft_ivfpqidx_${part}_$stamp"
    diskIndexLock.synchronized {
      if (!Seq("codes", "book", "cents")
            .forall(p => spark.catalog.tableExists(table(p)))) {
        graft.ext.Similarity.writeIvfPqIndex(
          Tables.embeddings(spark, dir), "vec_id", "embedding",
          tableFor = table,
          pathFor = p => new java.io.File(
            sys.props("java.io.tmpdir"), table(p)).getAbsolutePath)
      }
      (spark.table(table("codes")), spark.table(table("book")),
        spark.table(table("cents")))
    }
  }

  /** The impact-truncated BM25 probe at the engine defaults
    * (queryModEvery=50, k=10, M=1000) — the shared lexical spine of
    * q341 (ranked output) and q342 (the fused hybrid's lexical arm).
    * At 100 TB this is the materialized ranker-output table a hybrid
    * retrieval system joins, built once per query set. */
  def truncatedBm25Cached(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    cachedEager(spark, dir, "lex_truncated")(
      Retrieval.bm25TruncatedFromPostings(
        scoredPostingsCached(spark, dir),
        queryModEvery = 50, k = 10, maxPostingsPerTerm = 1000))
  }

  /** The UNCAPPED BM25 probe (spec form's lexical output, same
    * defaults) — shared by q128 and the q141 spec hybrid. */
  def uncappedBm25Cached(spark: SparkSession, dir: String): DataFrame =
    cachedEager(spark, dir, "lex_uncapped")(
      Retrieval.bm25FromPostings(
        scoredPostingsCached(spark, dir),
        queryModEvery = 50, k = 10, maxDfFraction = 1.0))

  /** The dense ranker output — exact cosine top-k over the embeddings
    * with the engine's standard mod-50 probe anchors, renamed to the
    * fusion schema. Shared by both hybrid queries (q141/q342). */
  def denseTopKCached(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    cachedEager(spark, dir, "dense_topk")(
      graft.ext.Similarity.topKNeighbors(
          Tables.embeddings(spark, dir), "vec_id", "embedding", k = 10,
          probeFilter = Some(pmod(col("id"), lit(50L)) === 0))
        .select(col("vec_id").as("query_id"),
          col("neighbor_id").as("doc_id"), col("rank")))
  }
}
