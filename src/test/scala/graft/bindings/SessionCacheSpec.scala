package graft.bindings

import graft.SparkSpec

/** Lifecycle bounds of the session-scoped spine store (r14): entries
  * must not outlive their session — the r13 TrieMaps never evicted, so
  * a long-lived multi-session JVM pinned dead sessions' plans. */
class SessionCacheSpec extends SparkSpec {

  test("entries are per-session, purgeable per-session, and rebuilt after invalidate") {
    val cache = new SessionCache[String]
    val s2 = spark.newSession()
    var builds = 0
    def get(s: org.apache.spark.sql.SparkSession) =
      cache.getOrElseUpdate(s, "k") { builds += 1; s.range(3).toDF("n") }
    val a = get(spark)
    val b = get(s2)
    assert(builds == 2, "distinct sessions must build distinct entries")
    assert((a eq get(spark)) && (b eq get(s2)), "repeat access must hit")
    assert(cache.size == 2)
    // the abandoned-session path: invalidate drops ONLY that session's
    // entries; the surviving session keeps its cached frame by reference
    assert(cache.invalidate(s2) == 1)
    assert(cache.size == 1)
    assert(get(spark) eq a, "surviving session's entry must be untouched")
    assert(builds == 2)
    val b2 = get(s2)
    assert(builds == 3 && !(b2 eq b), "invalidated entry must rebuild")
  }

  test("getOrRebuild: persisted entry is reused; unpersisted entry is rebuilt") {
    val cache = new SessionCache[String]
    var builds = 0
    def get() = cache.getOrRebuild(spark, "k") {
      builds += 1
      spark.range(3).toDF("n")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val a = get()
    assert(builds == 1 && (get() eq a), "live persist must be reused")
    a.unpersist() // what spark.catalog.clearCache() does to every frame
    val b = get()
    assert(builds == 2 && !(b eq a),
      "recovery must rebuild a fresh frame, never re-persist the stale one")
    assert(b.storageLevel.useMemory && (get() eq b))
  }

  test("purge predicate drives eviction (the stopped-context path)") {
    val cache = new SessionCache[String]
    val s2 = spark.newSession()
    cache.getOrElseUpdate(spark, "k")(spark.range(1).toDF("n"))
    cache.getOrElseUpdate(s2, "k")(s2.range(1).toDF("n"))
    // production purges on `_.sparkContext.isStopped`; the predicate is
    // injectable so the eviction path is testable without killing the
    // suite's shared context
    assert(cache.purgeWhere(_ eq s2) == 1)
    assert(cache.size == 1)
    assert(cache.purgeWhere(_.sparkContext.isStopped) == 0,
      "live context must purge nothing")
  }
}
