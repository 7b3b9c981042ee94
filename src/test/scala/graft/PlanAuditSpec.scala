package graft

import org.apache.spark.sql.classic.{Dataset => ClassicDataset}

/** Universal physical-plan audit over the ENTIRE gated surface — the
  * backstop behind PlanSpec's per-operator assertions: every one of
  * `SparkEntry.queries` is planned at sf0.001 and must contain NO
  * `CartesianProduct` operator, anywhere, ever.
  *
  * Why this one node is an absolute ban while BroadcastNestedLoopJoin
  * is not: a BNLJ exists only when Catalyst could BROADCAST one side —
  * the build side is bounded by the broadcast threshold by
  * construction (graft uses it solely for the crossJoin(broadcast(
  * scalar-or-model-frame)) attach idiom). `CartesianProduct` is the
  * opposite decision: NEITHER side was broadcastable, so the executor
  * pairs two at-scale partitions quadratically — the exact plan shape
  * that works at sf0.1 and detonates at 100 TB. A query that needs
  * pairwise semantics must either block/bucket the pair space (the
  * LSH/cell/prefix-filter tiers) or broadcast the bounded side; a
  * CartesianProduct in any gated plan is therefore always a bug, never
  * a strategy.
  *
  * The audit plans every query (fn builds the frame; streaming-replay
  * entries execute their micro-batches at sf0.001 first, which is what
  * Verify does per round anyway) and reads the FINAL batch plan. Cache
  * is cleared per query, mirroring Verify, so memoized spines cannot
  * mask a query's own join strategy. */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("no gated query plans a CartesianProduct at any point") {
    // the SQL front-door entries (q214) resolve the engine's registered
    // functions — same registration Verify/Bench get from GraftSession
    graft.GraftExtensions.register(spark)
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, sf).asInstanceOf[ClassicDataset[
              org.apache.spark.sql.Row]]
            .queryExecution.executedPlan.toString
          catch {
            case e: Throwable =>
              fail(s"$name failed to plan at sf0.001: ${e.getMessage}")
          }
        spark.catalog.clearCache()
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"CartesianProduct found in: ${offenders.mkString(", ")}")
  }
}
