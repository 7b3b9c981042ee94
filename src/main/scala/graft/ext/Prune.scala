package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim

/** Bloom-pruned joins: the explicit form of Spark's own runtime-filter
  * optimization (`InjectRuntimeFilter`), for when the planner cannot
  * inject it (non-equi pipelines, pre-shuffle pruning across stages, or
  * a dim computed in a separate job).
  *
  * Shape: build ONE fixed-size Bloom filter over the dim keys (Spark's
  * own `BloomFilterAggregate` — map-side partials merge bitwise), ship
  * it to the driver (same materialization point as the planner's scalar
  * subquery — the bloom is O(numBits), independent of data size), and
  * prune the fact scan with `might_contain` BEFORE the shuffle. The
  * exact join afterwards removes the bloom's false positives, so the
  * composite is exactly the plain join at a fraction of the shuffle
  * volume — the gate proves bloom∘join == join.
  */
object Prune {

  private def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    ColumnShim.column(new BloomFilterAggregate(
      ColumnShim.expression(xxhash64(key)),
      ColumnShim.expression(lit(expectedItems)),
      ColumnShim.expression(lit(numBits))).toAggregateExpression())

  private def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    ColumnShim.column(BloomFilterMightContain(
      ColumnShim.expression(lit(bloomBytes)),
      ColumnShim.expression(xxhash64(key))))

  /** Exact left-semi join of `fact` against `dim`'s key set, with a
    * Bloom pre-filter on the fact side. Builds the bloom EAGERLY (one
    * small job) — the driver holds numBits/8 bytes, never the key set. */
  def bloomPrunedSemiJoin(
      fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
      expectedItems: Long = 1000000L, numBits: Long = 8L * 1024 * 1024): DataFrame = {
    val bloomBytes = dim
      .agg(bloomAgg(col(dimKey), expectedItems, numBits).as("b"))
      .head().getAs[Array[Byte]]("b")
    // bloom == null only when dim is empty → nothing can match
    if (bloomBytes == null) fact.limit(0)
    else fact
      .filter(mightContain(bloomBytes, col(factKey)))
      .join(dim.select(col(dimKey).as(factKey)).distinct(),
        Seq(factKey), "left_semi")
  }
}
