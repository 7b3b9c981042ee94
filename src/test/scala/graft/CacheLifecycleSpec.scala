package graft

import org.apache.spark.storage.StorageLevel

class CacheLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def eventually(timeoutMs: Long = 20000L)(cond: => Boolean): Boolean = {
    val t0 = System.currentTimeMillis()
    while (!cond && System.currentTimeMillis() - t0 < timeoutMs) Thread.sleep(50)
    cond
  }

  test("unpersistAfterNextAction frees the cache after the consuming " +
      "action and leaves other persists alone") {
    val victim = (1 to 100).toDF("x").persist(StorageLevel.MEMORY_AND_DISK)
    val bystander = (1 to 50).toDF("y").persist(StorageLevel.MEMORY_AND_DISK)
    bystander.count() // materialize the bystander's blocks
    graft.core.CacheLifecycle.unpersistAfterNextAction(victim)
    // before any action the persist must still be live (an inline
    // unpersist here would defeat the cache before it is ever read)
    assert(victim.storageLevel != StorageLevel.NONE)
    assert(victim.count() == 100L) // the consuming action
    // the one-shot listener fires asynchronously on the listener bus
    assert(eventually()(victim.storageLevel == StorageLevel.NONE),
      "victim cache not freed after its consuming action")
    assert(bystander.storageLevel != StorageLevel.NONE,
      "bystander persist must not be touched")
    bystander.unpersist(blocking = true)
  }

  test("frames never consumed are freed as a no-op without error") {
    val unused = (1 to 10).toDF("z").persist(StorageLevel.MEMORY_AND_DISK)
    graft.core.CacheLifecycle.unpersistAfterNextAction(unused)
    // some unrelated execution fires the listener
    assert((1 to 5).toDF("w").count() == 5L)
    assert(eventually()(unused.storageLevel == StorageLevel.NONE))
  }
}
