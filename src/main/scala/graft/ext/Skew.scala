package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY §7.4 risk 5: salting for skewed
  * user/restaurant keys at the 100 TB tier).
  *
  * AQE's skew-join handling covers sort-merge joins; these helpers cover
  * the cases it does not: a single hot grouping key whose partial
  * aggregate state itself overwhelms one task, and broadcast-impossible
  * skewed equi-joins. Salts are DETERMINISTIC (hashed from caller-chosen
  * columns) — no rand(), so results stay reproducible.
  */
object Skew {

  /** Two-phase salted sum: groupBy(keys + salt) partial, then groupBy
    * (keys) final. Equivalent to a direct groupBy(keys).sum for
    * associative integer-unit sums; the salt fans the hot key's partial
    * state across `numSalts` tasks. */
  def saltedSum(
      df: DataFrame, keys: Seq[String], valueCol: String,
      numSalts: Int, saltSource: Column): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltSource), lit(numSalts)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Key-skew profile: the top-K heaviest keys of a prospective
    * join/group key with their row share and skew ratio (share ×
    * distinct-key count — 1.0 means perfectly uniform, N means one key
    * owns everything). The measurement that DECIDES between the plain
    * plan, [[saltedSum]]/[[saltedJoin]], and a broadcast — run it
    * before committing a 100 TB shuffle, not after it straggles.
    *
    * Shape: one hash aggregate to key grain (map-side combined), a
    * broadcast scalar frame for the totals, and the global top-K is
    * orderBy+limit — Spark's TakeOrdered (per-partition heap + driver
    * merge of K rows), never a full sort; the rank window runs on the
    * K-row result. The emitted doubles are single divisions of
    * identical longs — no rounding surface. */
  def skewProfile(df: DataFrame, keyCol: Column, topK: Int = 50): DataFrame = {
    val k = df.groupBy(keyCol.as("key")).agg(count(lit(1)).as("n_rows"))
    val t = k.agg(sum(col("n_rows")).as("n_total"), count(lit(1)).as("n_keys"))
    val top = k.orderBy(col("n_rows").desc, col("key")).limit(topK)
    top
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n_rows").desc, col("key"))))
      .crossJoin(broadcast(t))
      .select(col("key"), col("n_rows"), col("rank"),
        (col("n_rows").cast("double") / col("n_total")).as("share"),
        ((col("n_rows").cast("double") * col("n_keys")) / col("n_total"))
          .as("skew"))
  }

  /** Salted equi-join for a skewed big side vs a non-broadcastable but
    * replicable right side: the big side gets a deterministic salt, the
    * right side is exploded across all salts, and the join key becomes
    * (keys, salt) — splitting each hot key's rows over numSalts tasks. */
  def saltedJoin(
      big: DataFrame, right: DataFrame, keys: Seq[String],
      numSalts: Int, saltSource: Column, joinType: String = "inner"): DataFrame = {
    // right/full outer would surface each unmatched replicated right row
    // numSalts times — only join types that never emit unmatched RIGHT
    // rows are sound with a replicated right side
    require(Set("inner", "left", "left_outer", "left_semi", "left_anti", "cross")
        .contains(joinType),
      s"saltedJoin does not support '$joinType': unmatched right rows are replicated")
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(saltSource), lit(numSalts)))
    val replicated = right.withColumn(
      "__salt", explode(array((0 until numSalts).map(i => lit(i.toLong)): _*)))
    saltedBig.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Count-min-sketch frequency estimates, audited against the exact
    * counts: a depth×width counter grid built with the portable salted
    * hash family, evaluated on the exact top-K keys. The fixed-size
    * (depth·width counters) sibling of [[skewProfile]]: at 100 TB the
    * exact key histogram may itself be too large to hold, while the CMS
    * is a constant-memory mergeable summary a monitor keeps per
    * partition/stream — this operator measures what that summary would
    * report (`n_est`), the one-sided error (`overcount` ≥ 0 always, by
    * construction), and whether the classic ε = 2/width envelope held
    * (`within_eps`).
    *
    * Everything is exact integer arithmetic on BOTH engines — counters
    * are plain hash-bucket sums with [[graft.functions.Portable.h60]]
    * buckets, so the oracle rebuilds the IDENTICAL sketch in SQL; no
    * randomness, no float. Shape: one hash aggregate to key grain, a
    * depth-way explode to (row, bucket) grain (depth·width rows), a
    * TakeOrdered top-K, and a broadcast-join probe of K·depth rows. */
  def cmsHeavyHitters(
      df: DataFrame, keyCol: Column,
      depth: Int = 4, width: Int = 1024, topK: Int = 20): DataFrame = {
    require(depth >= 1 && width >= 2 && topK >= 1, "bad CMS parameters")
    val counts = df.groupBy(keyCol.cast("long").as("key"))
      .agg(count(lit(1)).as("n_exact"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.CacheLifecycle.unpersistAfterNextAction(counts)
    def bucket(c: Column): Column =
      pmod(graft.functions.Portable.h60(
        concat(lit("cms"), col("i").cast("string"), lit(":"), c.cast("string"))),
        lit(width.toLong))
    val depthIdx = explode(array((0 until depth).map(i => lit(i)): _*)).as("i")
    val counters = counts.select(col("key"), col("n_exact"), depthIdx)
      .withColumn("bucket", bucket(col("key")))
      .groupBy(col("i"), col("bucket"))
      .agg(sum(col("n_exact")).as("c"))
    val total = counts.agg(sum(col("n_exact")).as("n_total"))
    val top = counts.orderBy(col("n_exact").desc, col("key")).limit(topK)
    top.select(col("key"), col("n_exact"), depthIdx)
      .withColumn("bucket", bucket(col("key")))
      .join(broadcast(counters), Seq("i", "bucket"))
      .groupBy(col("key"), col("n_exact"))
      .agg(min(col("c")).as("n_est"))
      .crossJoin(broadcast(total))
      .select(
        col("key"), col("n_exact"), col("n_est"),
        (col("n_est") - col("n_exact")).as("overcount"),
        (col("n_est") <= col("n_exact")
          + expr(s"(2 * n_total + ${width - 1}) div $width")).as("within_eps"))
  }
}
