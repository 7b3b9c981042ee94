package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit pins for q256–q259 (RCA, share-of-parent, norm audit, PQ code
  * balance). */
class GeometryAuditSpec extends SparkSpec {
  import spark.implicits._

  private val suppliers = Seq((1L, 10), (2L, 20)).toDF("s_suppkey", "s_nationkey")
  private val nations = Seq((10, "GAUL", 0), (20, "IBERIA", 0))
    .toDF("n_nationkey", "n_name", "n_regionkey")
  private val regions = Seq((0, "EUROPE")).toDF("r_regionkey", "r_name")

  test("rcaIndex: specialization shows where a nation over-indexes") {
    // GAUL sells only pizza; IBERIA sells pizza and sushi evenly
    val rev = Seq(
      (1L, "pizza", 100.0),
      (2L, "pizza", 100.0), (2L, "sushi", 100.0))
      .toDF("restaurant_id", "item_category", "total_revenue")
    val got = graft.gold.Geography.rcaIndex(rev, suppliers, nations)
      .orderBy("nation", "item_category")
      .select("nation", "item_category", "rca", "specialized")
      .as[(String, String, Double, Boolean)].collect()
    // pizza global share 2/3: GAUL 1/(2/3) = 1.5 specialized
    assert(got.toSeq == Seq(
      ("GAUL", "pizza", 1.5, true),
      ("IBERIA", "pizza", 0.75, false),
      ("IBERIA", "sushi", 1.5, true)))
  }

  test("shareOfParent: three share levels multiply back to the market") {
    val rev = Seq(
      (1L, "x", 30.0), (2L, "x", 70.0))
      .toDF("restaurant_id", "item_category", "total_revenue")
    val got = graft.gold.Geography.shareOfParent(rev, suppliers, nations, regions)
      .orderBy("restaurant_id")
      .select("restaurant_id", "share_of_nation", "nation_share_of_region",
        "region_share_of_market")
      .as[(Long, Double, Double, Double)].collect()
    assert(got.toSeq == Seq(
      (1L, 1.0, 0.3, 1.0),
      (2L, 1.0, 0.7, 1.0)))
  }

  test("embeddingNormAudit: a huge-norm vector is flagged") {
    val vecs = ((1 to 9).map(i => (i.toLong, 0, Array(3.0f, 4.0f))) :+
      (10L, 0, Array(30.0f, 40.0f)))
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.embeddingNormAudit(vecs, "vec_id", "embedding", "label")
      .select("n_vecs", "p50_norm", "n_outliers", "outlier_share")
      .as[(Long, Double, Long, Double)].collect()
    assert(got.toSeq == Seq((10L, 5.0, 1L, 0.1)))
  }

  test("pqCodeBalance: per-block usage accounts for every vector") {
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 200).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val got = Similarity.pqCodeBalance(vecs, "vec_id", "embedding",
        blocks = 2, iters = 1, seedEvery = 100)
      .select("blk", "n_codes_used", "n_vecs", "top_code_share")
      .as[(Int, Long, Long, Double)].collect()
    assert(got.length == 2)
    assert(got.forall(_._3 == 200L), "every vector coded in every block")
    assert(got.forall(r => r._2 >= 1L && r._2 <= 2L), "2 seeds at 200/100")
    assert(got.forall(r => r._4 > 0.0 && r._4 <= 1.0))
  }
}
