package graft

/** Driver-contract smoke: entry() returns rows; every query name has an
  * oracle entry or is knowingly rows-only; oracle/query keys line up. */
class SparkEntrySpec extends SparkSpec {

  test("entry flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has a DuckDB oracle (full-strength t2 gate)") {
    // Engine-specific sketches (Spark HLL++ buffers) have no cross-engine
    // SQL mirror; the driver records the weaker rows-only check for them.
    val rowsOnly = Set("q51_location_hll", "q52_segments_approx")
    val q = SparkEntry.queries.keySet -- rowsOnly
    val o = SparkEntry.oracleSql.keySet
    assert(q == o, s"mismatch: only-in-queries=${q -- o}, only-in-oracle=${o -- q}")
    assert(rowsOnly.subsetOf(SparkEntry.queries.keySet))
    assert((SparkEntry.oracleSql.keySet & rowsOnly).isEmpty)
  }
}
