package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit pins for the round-8 ML-audit additions: calibration bins,
  * categorical mutual information, IVF cell–label purity, and
  * temperature mixture weights. */
class MixCalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("calibrationBins: edge scores bin by integer division, 1.0 clamps into the top bin, gap is |mean - rate|") {
    val rows = Seq(
      (0.05, true), (0.05, false),  // bin 0: mean .05, rate .5
      (0.10, false),                // exactly 0.1 -> bin 1, not bin 0
      (1.00, true),                 // clamps to bin 9
    ).toDF("s", "y")
    val got = Profiling.calibrationBins(rows, col("s"), col("y"))
      .select("bin", "n", "n_pos", "mean_score", "pos_rate", "gap")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 1L, 0.05, 0.5, 0.45),
      (1L, 1L, 0L, 0.1, 0.0, 0.1),
      (9L, 1L, 1L, 1.0, 1.0, 0.0)))
  }

  test("categoricalMutualInfo: identical columns give MI = H and NMI = 1; independent uniform columns give MI = 0") {
    val dep = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"))
      .toDF("x", "y")
    val gd = Profiling.categoricalMutualInfo(dep, col("x"), col("y"))
      .select("h_a", "mi_nats", "nmi").as[(Double, Double, Double)]
      .collect().head
    assert(gd._1 == math.rint(math.log(2) * 1e6) / 1e6)
    assert(gd._2 == gd._1 && gd._3 == 1.0)
    // 2x2 uniform grid: knowing x says nothing about y
    val ind = Seq(("a", "p"), ("a", "q"), ("b", "p"), ("b", "q"))
      .toDF("x", "y")
    val gi = Profiling.categoricalMutualInfo(ind, col("x"), col("y"))
      .select("mi_nats", "nmi").as[(Double, Double)].collect().head
    assert(gi._1 == 0.0 && gi._2 == 0.0)
  }

  test("categoricalMutualInfo: a single-valued column has zero entropy and a NULL (guarded) nmi") {
    val one = Seq(("a", "p"), ("a", "q")).toDF("x", "y")
    val g = Profiling.categoricalMutualInfo(one, col("x"), col("y"))
      .select(col("h_a"), col("mi_nats"), col("nmi").isNull)
      .as[(Double, Double, Boolean)].collect().head
    assert(g == ((0.0, 0.0, true)))
  }

  test("cellLabelPurity: vectors join their nearest deterministic centroid; majority label ties break label-ascending") {
    // centroids are ids 0 and 100 (centroidEvery = 100); vectors cluster
    // on two orthogonal axes
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), "red"),
      (1L, Array(0.9f, 0.1f), "red"),
      (2L, Array(0.8f, 0.0f), "blue"),
      (100L, Array(0.0f, 1.0f), "green"),
      (101L, Array(0.1f, 0.9f), "green"),
      (102L, Array(0.0f, 0.8f), "blue"),
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.cellLabelPurity(vecs, "vec_id", "embedding", "label")
      .as[(Long, Long, Long, String, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 3L, 2L, "red", 0.666667),
      (100L, 3L, 2L, "green", 0.666667)))
    // exact 50/50 cell: the label tie breaks ascending
    val tied = Seq(
      (0L, Array(1.0f, 0.0f), "zz"),
      (1L, Array(0.9f, 0.1f), "aa"),
    ).toDF("vec_id", "embedding", "label")
    val t = Similarity.cellLabelPurity(tied, "vec_id", "embedding", "label")
      .as[(Long, Long, Long, String, Double)].collect().toSeq
    assert(t == Seq((0L, 2L, 2L, "aa", 0.5)))
  }

  test("temperatureWeights: sqrt-scaled shares upweight the small group; shares are half-up micro ratios") {
    val docs = (Seq.fill(1)("small") ++ Seq.fill(4)("large")).toDF("src")
    val got = Sampling.temperatureWeights(docs, col("src"))
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    // weights: sqrt(4)=2e6, sqrt(1)=1e6 -> temp shares 2/3 and 1/3
    assert(got == Seq(
      ("large", 4L, 0.8, 0.666667, 0.833334),
      ("small", 1L, 0.2, 0.333333, 1.666665)))
  }

  test("brierDecomposition: the Murphy identity BS = REL - RES + UNC holds exactly on bin-pure cases") {
    // perfectly calibrated: REL 0, RES = UNC, BS 0
    val perfect = Seq((1.0, true), (1.0, true), (0.0, false), (0.0, false))
      .toDF("s", "y")
    val gp = Profiling.brierDecomposition(perfect, col("s"), col("y"))
      .select("brier", "reliability", "resolution", "uncertainty",
        "within_bin")
      .as[(Double, Double, Double, Double, Double)].collect().head
    assert(gp == ((0.0, 0.0, 0.25, 0.25, 0.0)))
    // anti-calibrated: REL 1, RES 0.25, BS 1
    val anti = Seq((1.0, false), (1.0, false), (0.0, true), (0.0, true))
      .toDF("s", "y")
    val ga = Profiling.brierDecomposition(anti, col("s"), col("y"))
      .select("brier", "reliability", "resolution", "uncertainty",
        "within_bin")
      .as[(Double, Double, Double, Double, Double)].collect().head
    assert(ga == ((1.0, 1.0, 0.25, 0.25, 0.0)))
    // uninformative constant 0.5: BS = UNC alone
    val flat = Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false))
      .toDF("s", "y")
    val gf = Profiling.brierDecomposition(flat, col("s"), col("y"))
      .select("brier", "reliability", "resolution", "uncertainty",
        "within_bin")
      .as[(Double, Double, Double, Double, Double)].collect().head
    assert(gf == ((0.25, 0.0, 0.0, 0.25, 0.0)))
  }
}
