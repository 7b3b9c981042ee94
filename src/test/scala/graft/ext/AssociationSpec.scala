package graft.ext

import graft.SparkSpec

class AssociationSpec extends SparkSpec {
  import spark.implicits._

  test("categoryLift: pair counts, totals, and lift over distinct baskets") {
    // 4 orders: {A,B}, {A,B}, {A}, {B,C}; duplicate items collapse
    val rows = Seq(
      (1L, "A"), (1L, "B"), (1L, "B"),   // dup line in order 1
      (2L, "A"), (2L, "B"),
      (3L, "A"),
      (4L, "B"), (4L, "C")
    ).toDF("order_id", "item_category")
    val got = Association.categoryLift(rows, minSupport = 1)
      .orderBy($"cat_a", $"cat_b")
      .select($"cat_a", $"cat_b", $"n_both", $"n_a", $"n_b", $"lift")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    // N=4, n_A=3, n_B=3, n_C=1; AB together 2 → lift 2·4/(3·3)=0.888889
    // BC together 1 → lift 1·4/(3·1)=1.333333
    assert(got == Seq(
      ("A", "B", 2L, 3L, 3L, 0.888889),
      ("B", "C", 1L, 3L, 1L, 1.333333)))
  }
}
