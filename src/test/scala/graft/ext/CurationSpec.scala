package graft.ext

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")

  test("tokenBudgetPlan: largest-remainder shares sum exactly to budget") {
    // token masses 5 / 3 / 2, budget 7: floor shares 3/2/1 (Σ=6), one
    // extra token goes to the largest remainder (a: 35%10=5 beats
    // c: 14%10=4 beats b: 21%10=1) -> allocs 4/2/1
    val d = docs(
      (1L, "t t t t t", "a"),
      (2L, "t t t", "b"),
      (3L, "t t", "c"))
    val got = Curation.tokenBudgetPlan(d, "doc_id", "text", "source", budget = 7L)
      .orderBy("source")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("a", 5L, 4L, 4.0 / 5.0),
      ("b", 3L, 2L, 2.0 / 3.0),
      ("c", 2L, 1L, 1.0 / 2.0)))
    assert(got.map(_._3).sum == 7L)
  }

  test("tokenBudgetPlan: remainder ties break on source name ascending") {
    // equal masses, odd budget: both remainders equal -> 'a' wins the
    // extra token deterministically
    val d = docs((1L, "t", "a"), (2L, "t", "b"))
    val got = Curation.tokenBudgetPlan(d, "doc_id", "text", "source", budget = 3L)
      .orderBy("source")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._3)) == Seq(("a", 2L), ("b", 1L)))
  }
}
