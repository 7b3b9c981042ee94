package graft

/** Driver-contract smoke: entry() returns rows; every query name has an
  * oracle entry or is knowingly rows-only; oracle/query keys line up. */
class SparkEntrySpec extends SparkSpec {

  test("entry flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has a DuckDB oracle (full-strength t2 gate)") {
    // Since round 3 even the sketch tier is gated: q51/q52 emit exact
    // values plus error-bound booleans the oracle pins TRUE, so there are
    // NO rows-only queries left.
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o, s"mismatch: only-in-queries=${q -- o}, only-in-oracle=${o -- q}")
  }
}
