package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of known vectors") {
    val df = Seq((Array(1.0, 0.0), Array(0.0, 1.0)), (Array(1.0, 1.0), Array(1.0, 1.0)))
      .toDF("a", "b")
    val got = df.select(Similarity.cosine($"a", $"b")).as[Double].collect()
    assert(math.abs(got(0)) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
  }

  test("brute-force top-k ranks by cosine with id tie-break, excludes self") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)),
    ).toDF("vec_id", "embedding")
    val got = Similarity.topKNeighbors(vecs, "vec_id", "embedding", k = 2)
      .filter($"vec_id" === 1L)
      .select($"neighbor_id", $"rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(got.toSeq == Seq((2L, 1), (3L, 2)))
  }

  test("blocked broadcast kernel matches the cross-join spec, incl. multi-block merge") {
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 60L).map { i =>
      (i, Array.fill(8)(rnd.nextFloat() - 0.5f))
    }.toDF("vec_id", "embedding")
    val spec = Similarity.topKNeighborsCrossJoin(vecs, "vec_id", "embedding", k = 3)
      .select($"vec_id", $"neighbor_id", $"cosine", $"rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val single = Similarity.topKNeighbors(vecs, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    // blockRows=17 forces 4 corpus blocks and the top-k merge path
    val blocked = Similarity.topKNeighbors(vecs, "vec_id", "embedding", k = 3,
        blockRows = 17)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(single == spec)
    assert(blocked == spec)
  }

  test("topKNeighbors driver residency is bounded by blockRows, not corpus size") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    // The design ships ONE packed block at a time driver→broadcast (the
    // broadcast-join build-side pattern), so the invariant is bounded
    // PEAK: no single stage may ship more than ~one block of result
    // bytes. The round-2 regression (whole-corpus collect in one job)
    // would ship the full ~2 MB in one stage and trip the cap.
    val perStage = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          perStage.computeIfAbsent(te.stageId, _ => new java.util.concurrent.atomic.AtomicLong)
            .addAndGet(te.taskMetrics.resultSize)
    }
    // ~2 MB of embeddings in 8 blocks of 500 rows (~260 KB data each)
    val rnd = new scala.util.Random(11)
    val vecs = (1L to 4000L).map(i => (i, Array.fill(64)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    spark.sparkContext.addSparkListener(listener)
    try {
      Similarity.topKNeighbors(vecs, "vec_id", "embedding", k = 2, blockRows = 500)
      // listener bus is async: poll until the byte counts stop moving
      var last = -1L; var stable = 0; var waited = 0
      while (stable < 3 && waited < 10000) {
        Thread.sleep(200); waited += 200
        val cur = perStage.values().stream().mapToLong(_.get()).sum()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      val worst = perStage.values().stream().mapToLong(_.get()).max().orElse(0L)
      assert(worst < 1024 * 1024,
        s"a single stage shipped $worst bytes to the driver — corpus-sized collect regression")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("SRP buckets put identical vectors together; topk searches only the bucket") {
    val vecs = Seq(
      (1L, Array.fill(64)(1.0f)),
      (2L, Array.fill(64)(1.0f)),                    // identical to 1
      (3L, Array.fill(64)(-1.0f)),                   // antipodal: different bucket
    ).toDF("vec_id", "embedding")
    val got = Similarity.srpTopK(vecs, "vec_id", "embedding", k = 2)
    val buckets = got.select($"vec_id", $"bucket").distinct()
      .as[(Long, Long)].collect().toMap
    assert(buckets(1L) == buckets(2L))
    val n1 = got.filter($"vec_id" === 1L).select($"neighbor_id").as[Long]
      .collect().toSet
    assert(n1 == Set(2L), s"antipodal vector must be outside the bucket: $n1")
  }

  test("kmeans converges to seed-descended clusters; empty seed set fails fast") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),   // seed -> cluster 0
      (100L, Array(0.0f, 1.0f)), // seed -> cluster 100
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.1f, 0.9f)),
    ).toDF("vec_id", "embedding")
    val got = Similarity.kmeans(vecs, "vec_id", "embedding", iters = 2, seedEvery = 100)
      .select($"vec_id", $"cluster").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 100L -> 100L, 2L -> 100L))
    val noSeeds = Seq((7L, Array(1.0f)), (9L, Array(0.5f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.kmeans(noSeeds, "vec_id", "embedding", seedEvery = 100)
    }
  }

  test("simplifiedSilhouette: identical-vector cells score exactly 1; mixed cell scores lower") {
    val tight = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f)),
      (100L, Array(0.0f, 1.0f)), (101L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    // every point sits ON its centroid: a = 0, b = 1 -> s = 1 exactly
    val got = Similarity
      .simplifiedSilhouette(tight, "vec_id", "embedding")
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((0L, 3L, 1.0), (100L, 2L, 1.0)))

    // pull one member of cell 0 toward cell 100: its a grows, b shrinks,
    // so cell 0's mean drops strictly below 1 while staying positive
    val smeared = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.8f, 0.6f)),
      (100L, Array(0.0f, 1.0f)), (101L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val m = Similarity.simplifiedSilhouette(smeared, "vec_id", "embedding")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(m(0L) < 1.0 && m(0L) > 0.0)
    assert(m(100L) > 0.9)
  }

  test("IVF assigns to nearest centroid and searches only the cell") {
    // centroids: ids 0 and 100 (centroidEvery=100)
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),    // centroid A
      (100L, Array(0.0f, 1.0f)),  // centroid B
      (1L, Array(0.95f, 0.05f)),  // cell A
      (2L, Array(0.05f, 0.95f)),  // cell B
    ).toDF("vec_id", "embedding")
    val got = Similarity.ivfTopK(vecs, "vec_id", "embedding", k = 3, centroidEvery = 100)
    val cells = got.select($"vec_id", $"cell").distinct().as[(Long, Long)].collect().toMap
    assert(cells(1L) == 0L && cells(2L) == 100L)
    // vec 1's neighbors are all within cell A — vec 2 never appears
    val n1 = got.filter($"vec_id" === 1L).select($"neighbor_id").as[Long].collect().toSet
    assert(n1 == Set(0L))
  }
  test("semanticDedup: within-cell dup groups keep min id, distinct vectors survive") {
    // seeds (id % 100 == 0): 0 -> cell around (1,0), 100 -> cell around (0,1)
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.99f, 0.01f)),   // ~0 and ~2: one dup group {0,1,2}
      (2L, Array(0.98f, 0.02f)),
      (3L, Array(0.8f, 0.6f)),     // same cell, cos < tau to all: kept
      (100L, Array(0.0f, 1.0f)),
      (101L, Array(0.1f, 0.995f))  // dups 100 -> group {100,101}
    ).toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(vecs, "vec_id", "embedding", tau = 0.9)
      .orderBy("vec_id")
      .select($"vec_id", $"dup_group", $"is_kept")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, true), (1L, 0L, false), (2L, 0L, false), (3L, 3L, true),
      (100L, 100L, true), (101L, 100L, false)))
  }

  test("hardNegatives: only different-label neighbors, ranked by cosine") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), "x"),
      (2L, Array(0.9f, 0.1f), "x"),
      (3L, Array(0.0f, 1.0f), "y"),
      (4L, Array(0.7f, 0.7f), "y")
    ).toDF("vec_id", "embedding", "label")
    val all = Similarity.hardNegatives(vecs, "vec_id", "embedding", "label", k = 5)
    // no neighbor ever shares the anchor's label
    val labels = Map(1L -> "x", 2L -> "x", 3L -> "y", 4L -> "y")
    val pairs = all.select($"vec_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(pairs.nonEmpty && pairs.forall { case (a, n) => labels(a) != labels(n) })
    // k=1 picks the closest opposite-label vector for every anchor
    val top1 = Similarity.hardNegatives(vecs, "vec_id", "embedding", "label", k = 1)
      .select($"vec_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    assert(top1 == Map(1L -> 4L, 2L -> 4L, 3L -> 2L, 4L -> 2L))
  }

  test("hardNegativesInCells: single cell reproduces the exhaustive spec") {
    // seedEvery larger than any id -> only id 0 seeds -> ONE cell: the
    // cell-blocked scorer must then equal hardNegatives row for row
    val vecs = (0L to 15L).map { i =>
      (i, Array((math.cos(i * 0.4)).toFloat, (math.sin(i * 0.4)).toFloat),
        if (i % 2 == 0) "x" else "y")
    }.toDF("vec_id", "embedding", "label")
    val exhaustive = Similarity
      .hardNegatives(vecs, "vec_id", "embedding", "label", k = 3)
      .select($"vec_id", $"neighbor_id", $"cosine", $"rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val cellBlocked = Similarity
      .hardNegativesInCells(vecs, "vec_id", "embedding", "label", k = 3,
        iters = 2, seedEvery = 1000)
      .select($"vec_id", $"neighbor_id", $"cosine", $"rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(cellBlocked == exhaustive)
    // with several cells, every emitted negative shares the anchor's cell
    // and never its label — and each anchor's list is still dense-ranked
    val multi = Similarity.hardNegativesInCells(
        vecs, "vec_id", "embedding", "label", k = 3, iters = 2, seedEvery = 5)
      .select($"vec_id", $"anchor_label", $"neighbor_id", $"rank")
      .as[(Long, String, Long, Int)].collect()
    val lab = (0L to 15L).map(i => i -> (if (i % 2 == 0) "x" else "y")).toMap
    assert(multi.nonEmpty && multi.forall { case (a, al, n, _) =>
      al == lab(a) && lab(n) != al })
    multi.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length))
    }
  }

  test("annRecall: single-cell IVF scores perfect recall, split cells lose cross-cell hits") {
    // one centroid (only id 0 seeds) -> IVF == exact -> recall 1 for all
    val one = (0L to 5L).map { i =>
      (i, Array(math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat))
    }.toDF("vec_id", "embedding")
    val perfect = Similarity.annRecall(one, "vec_id", "embedding", k = 2,
        centroidEvery = 1000)
      .select($"vec_id", $"hits", $"recall_at_k").as[(Long, Long, Double)]
      .collect()
    assert(perfect.length == 6 && perfect.forall { case (_, h, r) => h == 2L && r == 1.0 })
    // two tight cells (centroids 0 and 100): every probe's exact top-2
    // includes the opposite cell's near-axis vector, which single-probe
    // IVF can never return -> hits 1, recall 0.5, and EVERY probe is a
    // row (the audit must not drop the misses)
    val split = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.95f, 0.05f)),
      (100L, Array(0.0f, 1.0f)), (101L, Array(0.05f, 0.95f)),
    ).toDF("vec_id", "embedding")
    val got = Similarity.annRecall(split, "vec_id", "embedding", k = 2,
        centroidEvery = 100)
      .select($"vec_id", $"hits", $"recall_at_k").as[(Long, Long, Double)]
      .collect().toSet
    assert(got == Set((0L, 1L, 0.5), (1L, 1L, 0.5), (100L, 1L, 0.5), (101L, 1L, 0.5)))
  }

  test("ivfProbeSweep: mean recall climbs with probes and reaches 1.0 when every cell is probed") {
    // two tight cells (centroids 0 and 100): single-probe misses the
    // cross-cell neighbor every exact top-2 contains; two probes cover
    // both cells and recover the exact list
    val split = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.95f, 0.05f)),
      (100L, Array(0.0f, 1.0f)), (101L, Array(0.05f, 0.95f)),
    ).toDF("vec_id", "embedding")
    val got = Similarity.ivfProbeSweep(split, "vec_id", "embedding", k = 2,
        centroidEvery = 100, probesList = Seq(1, 2))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 4L, 4L, 0.5), (2L, 4L, 8L, 1.0)))
  }

  test("rankedRetrievalEval: IVF==exact scores NDCG/MRR 1; cross-cell misses discount; empty probes surface as 0s") {
    // one centroid -> IVF returns the exact list -> DCG == IDCG exactly
    // (gains quantize through the same integer units as the normalizer)
    val one = (0L to 5L).map { i =>
      (i, Array(math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat))
    }.toDF("vec_id", "embedding")
    val perfect = Similarity.rankedRetrievalEval(one, "vec_id", "embedding",
        k = 2, centroidEvery = 1000)
      .select($"vec_id", $"hits", $"ndcg", $"rr")
      .as[(Long, Long, Double, Double)].collect()
    assert(perfect.length == 6 &&
      perfect.forall { case (_, h, n, r) => h == 2L && n == 1.0 && r == 1.0 })
    // two tight cells + one singleton: cross-cell true neighbors are
    // unreachable (ndcg < 1), and the singleton-cell probe has NO IVF
    // answer at all — it must still surface, as all-zeros, not vanish
    val split = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.95f, 0.05f)),
      (100L, Array(0.0f, 1.0f)),
    ).toDF("vec_id", "embedding")
    val got = Similarity.rankedRetrievalEval(split, "vec_id", "embedding",
        k = 2, centroidEvery = 100)
      .select($"vec_id", $"hits", $"ndcg", $"rr")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set(0L, 1L, 100L))
    assert(got(100L) == ((100L, 0L, 0.0, 0.0)))
    // probes 0 and 1 each find their same-cell rank-1 neighbor at p=1:
    // rel=k, gain k*disc(1)=2e9 units; ndcg = 2e9/idcgUnits(2), rr=1
    val expected = math.rint(
      2e9 / Similarity.idcgUnits(2) * 1e6) / 1e6
    Seq(0L, 1L).foreach { id =>
      val (_, h, n, r) = got(id)
      assert(h == 1L && r == 1.0 && math.abs(n - expected) < 1e-9)
    }
  }

  test("ivfTopKMultiProbe: nProbe=1 equals single-probe IVF; probing 2 cells recovers cross-cell neighbors") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.95f, 0.05f)),
      (100L, Array(0.0f, 1.0f)), (101L, Array(0.05f, 0.95f)),
    ).toDF("vec_id", "embedding")
    val single = Similarity.ivfTopK(vecs, "vec_id", "embedding", k = 2,
        centroidEvery = 100)
      .select($"vec_id", $"neighbor_id", $"cosine", $"rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val probe1 = Similarity.ivfTopKMultiProbe(vecs, "vec_id", "embedding",
        k = 2, centroidEvery = 100, nProbe = 1)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(probe1 == single)
    // with both cells probed, vec 1's list now reaches 101 across cells
    val probe2 = Similarity.ivfTopKMultiProbe(vecs, "vec_id", "embedding",
        k = 2, centroidEvery = 100, nProbe = 2)
      .as[(Long, Long, Double, Int)].collect()
    val n1 = probe2.filter(_._1 == 1L).map(_._2).toSet
    assert(n1 == Set(0L, 101L))
    // candidate superset can only improve the list: every probe keeps k rows
    assert(probe2.groupBy(_._1).forall(_._2.length == 2))
  }

  test("centroidDrift: symmetric labels drift equally from the pooled centroid") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 1), (4L, Array(0.0f, 1.0f), 1),
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidDrift(vecs, "label", "embedding")
      .orderBy("label")
      .as[(Int, Long, Double)].collect().toSeq
    // pooled centroid (0.5, 0.5): cos to each axis centroid = 1/sqrt(2)
    assert(got == Seq((0, 2L, 0.707107), (1, 2L, 0.707107)))
  }

  test("labelNoise: majority-disagreeing neighbors flag the suspect label") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.01f), 0),
      (3L, Array(0.98f, 0.02f), 1), // nearest two neighbors are both label 0
      (4L, Array(0.0f, 1.0f), 1),
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.labelNoise(vecs, "vec_id", "embedding", "label", k = 2)
      .select($"vec_id", $"label", $"n_disagree", $"suspect")
      .as[(Long, Int, Long, Boolean)].collect().toSet
    assert(got == Set(
      (1L, 0, 1L, false), (2L, 0, 1L, false), (3L, 1, 2L, true), (4L, 1, 1L, false)))
  }

  test("hubnessAudit: a tie-broken star hub yields the hand-computed skew") {
    // v0 = (1,1,1,1) with orthogonal spokes e1..e3: every spoke's 1-NN
    // is v0 (cos 0.5 vs 0); v0's 1-NN tie-breaks to the smallest id.
    // k-occurrences [3,1,0,0]: mu=1, m2=1.5, m3=1.5 -> skew m3/m2^1.5
    val vecs = Seq(
      (0L, Array(1f, 1f, 1f, 1f)), (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)), (3L, Array(0f, 0f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.hubnessAudit(vecs, "vec_id", "embedding", k = 1)
      .as[(Long, Long, Option[Double], Long, Long, Long)].collect().head
    val skew = math.round(1.5 / math.pow(1.5, 1.5) * 1e6) / 1e6
    assert(got == ((4L, 1L, Some(skew), 3L, 2L, 1L)))
  }
}
