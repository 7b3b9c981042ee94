package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit pins for q234–q236 (Matryoshka recall, decayed value,
  * wallet-share deciles). */
class ValueTierSpec extends SparkSpec {
  import spark.implicits._

  test("matryoshkaRecall: prefix-complete vectors give recall 1.0") {
    // all information lives in the first 8 dims; dims 9..16 are zero →
    // the truncated top-k must equal the full top-k for every vector
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 12).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat()) ++ Array.fill(8)(0.0f))
    }.toDF("vec_id", "embedding")
    val got = Similarity.matryoshkaRecall(vecs, "vec_id", "embedding",
        dims = 8, k = 3)
      .select("recall_at_k").as[Double].collect()
    assert(got.length == 12 && got.forall(_ == 1.0))
  }

  test("decayedCustomerValue: one half-life halves the contribution") {
    val df = Seq(
      (1L, "2024-03-01", 10.0),  // anchor day, k = 0 → full weight
      (1L, "2024-01-31", 10.0))  // 30 days back, k = 1 → half weight
      .toDF("user_id", "day", "total_revenue")
      .withColumn("creation_date", col("day").cast("date"))
    val got = Olap.decayedCustomerValue(df, halfLifeDays = 30)
      .select("user_id", "n_lines", "revenue", "decayed_value")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.toSeq == Seq((1L, 2L, 20.0, 15.0)))
  }

  test("walletShareDeciles: concentration lands in the right bucket") {
    val df = Seq(
      (1L, 10L, 90.0), (1L, 11L, 10.0),   // 90% at top venue → bucket 9
      (2L, 10L, 50.0), (2L, 11L, 50.0))   // 50% → bucket 5
      .toDF("user_id", "restaurant_id", "total_revenue")
    val got = Olap.walletShareDeciles(df)
      .orderBy("bucket")
      .select("bucket", "n_users", "pooled_share", "avg_venues")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.toSeq == Seq(
      (5L, 1L, 0.5, 2.0),
      (9L, 1L, 0.9, 2.0)))
  }
}
