package graft.core

import org.apache.spark.sql.DataFrame

/** Physical-layout helpers for scan inputs. */
object Scans {

  /** Widen a thin scan before CPU-bound narrow compute (per-shingle
    * hashing, signature builds, cosine kernels).
    *
    * A small parquet file arrives as ONE scan partition, and a narrow
    * projection keeps the computation in that scan stage — so a
    * compute-heavy expression (md5 per shingle × permutations) runs on a
    * single core while the rest of the cluster idles. Repartitioning
    * first costs one shuffle of the thin input and spreads the compute
    * across `defaultParallelism` cores. At real scale the scan already
    * has at least that many partitions and this is an exact no-op — the
    * check is on the PLANNED partition count, so a 100 TB input never
    * pays a pointless full-corpus shuffle. */
  def spread(df: DataFrame): DataFrame = {
    // SCAN-ONLY contract: the df.rdd probe finalizes the adaptive plan,
    // which EXECUTES any upstream exchange just to read a partition
    // count (then the real action re-runs it — no cross-execution
    // shuffle reuse). Every in-repo caller passes a bare table scan,
    // where the probe is plan-only; don't route shuffled frames here.
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }
}
