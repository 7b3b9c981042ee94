package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit pins for q260–q262 (PR curve, t-closeness, CF backtest). */
class EvalTierSpec extends SparkSpec {
  import spark.implicits._

  test("prCurve: a perfect scorer pins precision 1 at every threshold") {
    // positives score 0.95, negatives 0.05 → every threshold separates
    val df = (Seq.fill(4)((0.95, true)) ++ Seq.fill(6)((0.05, false)))
      .toDF("score", "lab")
    val got = Profiling.prCurve(df, col("score"), col("lab"))
      .select("threshold", "n_pred", "tp", "precision", "recall")
      .as[(Double, Long, Long, Double, Double)].collect()
    assert(got.length == 9)
    assert(got.forall(r => r._4 == 1.0 && r._5 == 1.0),
      s"perfect separation: ${got.toSeq}")
  }

  test("tCloseness: a class matching the global mix scores 0") {
    // qi=1 mirrors the global 50/50 mix → t=0; qi=2 is all-A → t=0.5
    val df = (Seq.fill(2)((1, "A")) ++ Seq.fill(2)((1, "B")) ++
      Seq.fill(4)((2, "A")))
      .toDF("qi_in", "sv_in")
    val got = Profiling.tCloseness(df, col("qi_in"), col("sv_in"))
      .orderBy("qi").select("qi", "class_size", "t_closeness")
      .as[(Int, Long, Double)].collect()
    // global: A=6/8, B=2/8. qi=1: A=.5,B=.5 → t=.5*(|.5-.75|+|.5-.25|)=.25
    // qi=2: A=1,B=0 → t=.5*(|1-.75|+|0-.25|)=.25
    assert(got.toSeq == Seq((1, 4L, 0.25), (2, 4L, 0.25)))
  }

  test("cfBacktest: co-purchase structure predicts the held-out order") {
    // users 1..4 train on {a,b} together (strong a-b cooc) plus c;
    // user 5 trains on {a} then holds out an order with b → CF should
    // recommend b (cooc with a) and score a hit
    val rows = (for (u <- 1 to 4; (o, cs) <- Seq(
        (u * 10L, Seq("a", "b")), (u * 10L + 1, Seq("c", "a", "b"))))
      yield cs.map(c => (u.toLong, o, f"2024-01-0$u", c))).flatten ++
      Seq((5L, 900L, "2024-01-01", "a"), (5L, 901L, "2024-02-01", "b"))
    val df = rows.toDF("user_id", "order_id", "day", "item_category")
      .withColumn("creation_date", col("day").cast("date"))
    val got = Association.cfBacktest(df, k = 3)
      .agg(sum(col("n_users")), sum(col("n_hits")))
      .as[(Long, Long)].collect().head
    assert(got._1 == 5L, s"five users evaluated: $got")
    assert(got._2 >= 1L, s"user 5's b-from-a hit must land: $got")
  }
}
