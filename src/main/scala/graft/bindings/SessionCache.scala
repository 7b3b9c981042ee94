package graft.bindings

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped frame cache with a BOUNDED lifecycle — the shared
  * store behind [[Corpus]] and [[Conformed]]'s build-once spines.
  *
  * The r13 shape (a bare TrieMap keyed by `SparkSession`) never
  * evicted: fine for a one-session harness, but a long-lived JVM that
  * stops a session would keep that session's analyzed plans (and
  * through them the whole session state) reachable forever. Weak keys
  * don't work here — the cached `DataFrame` strongly references its
  * own `SparkSession`, so a WeakHashMap's value would pin its key and
  * nothing could ever be collected. Instead the lifecycle is tied to
  * the thing that actually ends a session's life:
  *
  *  - on `SparkSession.stop()` (which stops the SparkContext) an
  *    application-end listener — registered once per context on first
  *    use — drops every entry of every session on that context;
  *  - each access also purges entries whose context is already
  *    stopped, covering sessions cached before the listener existed
  *    and contexts stopped without delivering the event;
  *  - `invalidate(spark)` drops one session's entries explicitly —
  *    the escape hatch for the one case with no signal to hook: a
  *    session ABANDONED (unreferenced, never stopped) on a context
  *    that keeps running. There is no event for that by design.
  *
  * Eviction only drops map entries; persisted blocks are unpersisted
  * by the context teardown itself (stop clears the block manager). */
private[graft] final class SessionCache[K] {
  private val map =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, K), DataFrame]
  // per-key monitors for getOrRebuild: rebuilds persist (and eagerly
  // materialize) frames, so a lost race doesn't just waste work — the
  // loser's persisted blocks would sit untracked in the block manager
  // until context teardown (r14 advisor / verdict #3-4). Monitors are
  // tiny and evicted with their entries, so the map stays bounded by
  // the same lifecycle as the cache itself.
  private val locks = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, K), Object]()
  private val hooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def hookContext(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    if (!sc.isStopped && hooked.add(sc.applicationId)) {
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          purgeWhere(s => s.sparkContext eq sc)
          hooked.remove(sc.applicationId)
        }
      })
    }
  }

  def getOrElseUpdate(spark: SparkSession, key: K)
      (build: => DataFrame): DataFrame = {
    purgeWhere(_.sparkContext.isStopped)
    hookContext(spark)
    map.getOrElseUpdate((spark, key), build)
  }

  /** Drop one session's entries (the abandoned-session escape hatch). */
  def invalidate(spark: SparkSession): Int = purgeWhere(_ eq spark)

  /** Replace an entry (the rebuild-after-clearCache path). */
  def put(spark: SparkSession, key: K, df: DataFrame): Unit =
    map.put((spark, key), df)

  /** The clearCache recovery rule in ONE place (r14, the q141 stall
    * root cause): if the cached frame has been unpersisted by a
    * harness `spark.catalog.clearCache()`, REBUILD it from `fresh` —
    * a re-persisted old object would re-execute its memoized physical
    * plan over the cleared InMemoryRelations, caching nothing and
    * leaving the newly registered entry cold. `fresh` must persist
    * (and, for eager spines, materialize) the frame it returns; it is
    * re-evaluated verbatim on recovery so nested cached builders
    * recover too. Kept as the single entry point so no cache user can
    * fork the re-persist variant back into existence.
    *
    * Build and rebuild are serialized PER KEY (r15, closing the r14
    * concurrent-rebuild window): without the monitor, two callers
    * observing `storageLevel == NONE` would both evaluate `fresh` —
    * both persisting, one losing the `put` — and the loser's blocks
    * would stay in the block manager untracked until context teardown.
    * Distinct keys still build concurrently; nested cached builders
    * (a spine whose `fresh` pulls another cached spine) take their
    * monitors in builder-DAG order, so no cycle — and therefore no
    * deadlock — is possible. */
  def getOrRebuild(spark: SparkSession, key: K)
      (fresh: => DataFrame): DataFrame = {
    purgeWhere(_.sparkContext.isStopped)
    hookContext(spark)
    val k = (spark, key)
    val lock = locks.computeIfAbsent(k, _ => new Object)
    lock.synchronized {
      map.get(k) match {
        case Some(df)
            if df.storageLevel != org.apache.spark.storage.StorageLevel.NONE =>
          df
        case _ =>
          val d = fresh
          map.put(k, d)
          d
      }
    }
  }

  private[bindings] def purgeWhere(dead: SparkSession => Boolean): Int = {
    val victims = map.keys.filter(k => dead(k._1)).toList
    victims.foreach { k => map.remove(k); locks.remove(k) }
    // monitors created by getOrRebuild for keys whose build FAILED (no
    // map entry ever landed) die with the session too
    locks.keySet.removeIf(k => dead(k._1))
    victims.size
  }

  private[bindings] def size: Int = map.size
}

private[graft] object SessionCache {
  /** Persist + materialize a session spine at a layout wide enough to
    * feed every core. The spine plans are tiny-byte shuffles (a
    * conformed fact is tens of MB), so AQE's coalescing lands them on
    * a HANDFUL of partitions (measured: 3 on a 32-core session) — and
    * because an InMemoryRelation's layout IS the first-stage task
    * count of every consumer, every one of the ~200 spine-fed queries
    * then opened on ≤3 tasks. Rebuilding the cache one level wider is
    * a one-time, in-memory shuffle per session; at scale the
    * materialized layout already carries ≥ parallelism partitions and
    * the probe (plan-only on the persisted frame) short-circuits.
    * `keys` choose hash layout (high-cardinality grain columns — no
    * round-robin pre-sort, deterministic placement); empty → round
    * robin. Callers pass the frame ALREADY persisted (the getOrRebuild
    * `fresh` contract); this materializes it, probes, and if needed
    * swaps the entry for the wider persisted copy. */
  private[bindings] def persistSpread(
      df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    df.count()
    val n = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= n) df
    else {
      val wide =
        (if (keys.isEmpty) df.repartition(n) else df.repartition(n, keys: _*))
          .persist(df.storageLevel)
      wide.count()
      df.unpersist(blocking = false)
      wide
    }
  }
}
