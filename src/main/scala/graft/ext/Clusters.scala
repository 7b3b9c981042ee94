package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a pair list — the clustering stage that
  * turns pairwise near-dup hits (MinHash/LSH, SimHash, embedding cosine)
  * into dedup groups with one canonical representative each.
  *
  * Pairwise output alone cannot drive deduplication: if A~B and B~C the
  * pipeline must keep exactly one of {A,B,C}, which requires the
  * transitive closure. The reference has no analogue (its dedup is keyed
  * `dropDuplicates`, `scripts/cdc_metrics_job_silver.py:66,90`); this is
  * the corpus-scale completion of that capability.
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with itself; each round every node takes the minimum label in
  * its closed neighborhood; converged when no label changes. Rounds are
  * bounded by the longest shortest-path to a component's minimum — for
  * near-dup graphs (tiny dense clusters, the LSH banding model) that is
  * 2–3 rounds. Each round is one shuffle (join on `src` + min-agg on
  * `dst`); lineage is truncated per round with `localCheckpoint` so the
  * plan stays O(1) deep regardless of iteration count.
  *
  * At extreme diameters (adversarial chains) swap the propagation loop
  * for the large-star/small-star contraction of Kiveris et al.,
  * "Connected Components in MapReduce and Beyond" (SoCC '14) — same
  * join-shape per round, O(log²) rounds. The API is unchanged; near-dup
  * workloads never get there.
  */
object Clusters {

  /** Transitive closure of an undirected pair list.
    *
    * @param pairs two id columns (e.g. `id_a`, `id_b`), one row per edge
    * @return one row per node appearing in any pair:
    *         (id, cluster_id = min node id of its component)
    */
  def connectedComponents(
      pairs: DataFrame, aCol: String = "id_a", bCol: String = "id_b",
      maxRounds: Int = 25): DataFrame = {
    val fwd = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster_id", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      // min label over the closed neighborhood: each edge carries its
      // src's label to dst; a node keeps min(own, incoming)
      val incoming = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("cluster_id")).as("nbr_min"))
      val next = labels
        .join(incoming, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"),
          (col("nbr_min") < col("cluster_id")).as("shrunk"))
        .localCheckpoint(true)
      changed = next.filter(col("shrunk")).count()
      labels = next.drop("shrunk")
      round += 1
    }
    edges.unpersist()
    // exiting on maxRounds with changed > 0 would silently return SPLIT
    // components (labels short of the fixpoint) — wrong dedup keeps, and
    // an oracle mismatch with no pointer at the cause; fail loudly instead
    require(changed == 0,
      s"connectedComponents did not converge in $maxRounds rounds " +
        "(component diameter exceeds maxRounds; raise it or switch to the " +
        "large-star/small-star decomposition for high-diameter graphs)")
    labels
  }

  /** Near-dup clusters of a document corpus: LSH-verified pairs at
    * `minJaccard` or above → connected components → cluster membership
    * with size and a canonical-keeper flag (the component's min id — the
    * row a dedup pipeline keeps). Singletons (docs with no near-dup) are
    * not emitted; they are trivially their own keeper. */
  def nearDupClusters(
      docs: DataFrame, idCol: String, textCol: String,
      minJaccard: Double = 0.5): DataFrame = {
    val pairs = Dedup.lshVerifiedPairs(docs, idCol, textCol)
      .filter(col("jaccard") >= minJaccard)
    val cc = connectedComponents(pairs)
    val sizes = cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, Seq("cluster_id"))
      .select(col("id").as(idCol), col("cluster_id"), col("cluster_size"),
        (col("id") === col("cluster_id")).as("is_canonical"))
  }
}
