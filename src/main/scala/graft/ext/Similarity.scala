package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKAggregate.top_k
import graft.functions.VectorFunctions.{dot, l2dist, l2norm}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - [[topKNeighbors]] — brute-force blocked/unblocked cosine top-k: the
  *    correctness baseline. All-pairs is quadratic; at 100 TB use it only
  *    inside blocks/clusters.
  *  - [[ivfTopK]] — IVF-style: assign every vector to its nearest
  *    deterministic centroid (broadcast join — centroid set is tiny),
  *    then search only within the assigned cell. One shuffle on the cell
  *    id; recall < 1 by design (single-probe), which is the standard
  *    scale trade.
  *
  * Cosines run through the codegen'd [[graft.functions.DotProduct]]
  * expression; per-vector norms are computed ONCE before any join
  * (brute-force over n vectors does n norms + n² dots, not 3n² array
  * passes). Scores are rounded to 6 decimals before ranking so
  * cross-engine float noise cannot reorder results; ties break on
  * neighbor id.
  */
object Similarity {

  /** Cosine similarity of two array<double> columns (codegen'd).
    * Cosine against a zero-norm vector is DEFINED as 0.0 — the
    * scoreBlock kernel's convention; a bare division would emit NaN,
    * which Spark's round() passes through and [[graft.functions
    * .TopKAggregate]]'s total ordering ranks LAST (opposite to a SQL
    * ORDER BY DESC, which puts NaN first). */
  def cosine(a: Column, b: Column): Column = {
    val den = l2norm(a) * l2norm(b)
    when(den === 0.0, lit(0.0)).otherwise(dot(a, b) / den)
  }

  private def withNorm(vecs: DataFrame, idCol: String, vecCol: String): DataFrame =
    vecs.select(
      col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("emb"))
      .withColumn("nrm", l2norm(col("emb")))

  /** Explode a `top_k` result array into (…group cols…, neighbor_id,
    * cosine, rank) rows. */
  private def explodeTopK(grouped: DataFrame): DataFrame = {
    val groupCols = grouped.columns.filterNot(_ == "topk").map(col).toSeq
    grouped
      .select(groupCols :+ explode(col("topk")).as("t"): _*)
      .select(groupCols ++ Seq(
        col("t.id").as("neighbor_id"),
        col("t.score").as("cosine"),
        col("t.rank").as("rank")): _*)
  }

  /** For every vector: top-k neighbors by cosine (excluding self),
    * deterministic ordering (rounded cosine desc, neighbor id asc).
    *
    * Execution is a broadcast block-nested-loop sweep, the same shape a
    * broadcast hash join uses, not a row-level cross join: candidates are
    * hash-assigned to `ceil(n / blockRows)` blocks, each block is packed
    * by ONE codegen'd DataFrame aggregation (`collect_list` sorted by id
    * → parallel primitive arrays: ids, norms, one flat row-major matrix
    * of `blockRows · dim · 8` bytes), and then — exactly like a
    * broadcast-join build side — each packed block travels driver →
    * torrent broadcast ONE AT A TIME, so driver residency is bounded by
    * `blockRows`, never by the corpus (the bounded-peak spec pins this).
    * Each probe partition then streams once per block through a tight
    * primitive loop against the broadcast image, keeping a bounded
    * k-list per probe: only `k` candidates per probe per block ever
    * leave the scan stage, and per-block winners are merged by the
    * bounded-heap [[TopKAggregate]] (top-k is mergeable), so the merge
    * shuffle is `blocks · k` rows per probe. Versus alternatives: a
    * cross-join shuffle would materialize n² rows each dragging two full
    * embedding copies through row machinery, and an RDD
    * `groupByKey.cartesian` (the round-3 formulation) re-shuffles raw
    * Java-object vector rows outside codegen — the DataFrame packing
    * aggregation keeps map-side partials and Tungsten encoding up to the
    * kernel. The probe side is re-scanned once per block (recompute
    * beats caching 100 TB of rows). Brute force stays O(n²·d) compute by
    * definition — at 100 TB use [[ivfTopK]]/[[srpTopK]] to cut the
    * scored set; this kernel is then the intra-cell scorer. */
  def topKNeighbors(
      vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      blockRows: Int = 1 << 20,
      probeFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val v = withNorm(vecs, idCol, vecCol)
      .select(col("id").cast("long"), col("emb"), col("nrm"))
      .as[(Long, Array[Double], Double)]
    // size + shape probe in ONE corpus scan: row count, and min/max
    // embedding width. Ragged widths would silently misalign the flat
    // block images (vector j's components read from vector i's slot) —
    // fail fast here instead, where the check costs nothing extra.
    val probeRow = v.toDF("id", "emb", "nrm")
      .agg(count(lit(1)), min(size(col("emb"))), max(size(col("emb"))))
      .collect().head
    val n = probeRow.getLong(0)
    if (n > 0) require(probeRow.getInt(1) == probeRow.getInt(2),
      s"ragged embedding dims: ${probeRow.getInt(1)}..${probeRow.getInt(2)} " +
        "— topKNeighbors requires a uniform-width embedding column")
    val nBlocks = math.max(1, math.ceil(n.toDouble / blockRows).toInt)
    // `probeFilter` (a predicate over the renamed `id` column) restricts
    // WHICH vectors get a neighbor list; the candidate/block side always
    // stays the full corpus, so surviving probes score identically to an
    // unfiltered run. The asymmetric-retrieval shape: q queries against
    // an n-vector corpus costs q·n·d, not n²·d.
    val probeSet = probeFilter.map(v.filter(_)).getOrElse(v)
    // a small corpus file can arrive in 1-2 scan partitions, which would
    // serialize the O(n²·d) kernel on one core; spread probes first (the
    // shuffle materializes once and is re-read by every block pass)
    val probes =
      if (probeSet.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism) probeSet
      else probeSet.repartition(spark.sparkContext.defaultParallelism)
    def probePass(bIds: Array[Long], bNorms: Array[Double],
        bFlat: Array[Double], bDim: Int): DataFrame = {
      val bc = spark.sparkContext.broadcast((bIds, bNorms, bFlat, bDim))
      probes.mapPartitions { it =>
        val (ids, nrms, flat, dim) = bc.value
        it.flatMap { case (pid, pEmb, pNrm) =>
          scoreBlock(ids, nrms, flat, dim, pid, pEmb, pNrm, k)
        }
      }.toDF("vec_id", "neighbor_id", "cosine", "rank")
    }
    if (nBlocks == 1) {
      // corpus fits one block: the bounded (≤ blockRows rows) collect IS
      // the broadcast-join build-side collect — no pack shuffle needed
      val block = v.collect().sortBy(_._1)
      val bn = block.length
      val dim = if (bn > 0) block(0)._2.length else 0
      val flat = new Array[Double](bn * dim)
      var j = 0
      while (j < bn) {
        System.arraycopy(block(j)._2, 0, flat, j * dim,
          math.min(dim, block(j)._2.length))
        j += 1
      }
      probePass(block.map(_._1), block.map(_._3), flat, dim)
    } else {
      // pack each block with one hash aggregation (map-side partials,
      // codegen); sort_array on (id, nrm, emb) structs orders by id so
      // candidate iteration — and thus tie-breaking — is deterministic
      // HASH the id before the mod: raw pmod(id, nBlocks) would let any
      // id-space structure (all-even ids from a strided snapshot, a
      // filtered range) pile the whole corpus into one block and blow
      // the bounded-driver-residency contract; xxhash64 makes block
      // sizes uniform for ANY id distribution (assignment is arbitrary
      // for correctness — every block is scored against every probe)
      val packed = v.toDF("id", "emb", "nrm")
        .groupBy(pmod(xxhash64(col("id")), lit(nBlocks.toLong)).cast("int").as("blk"))
        .agg(array_sort(collect_list(struct(col("id"), col("nrm"), col("emb"))))
          .as("rows"))
        .select(col("blk"),
          transform(col("rows"), r => r.getField("id")).as("ids"),
          transform(col("rows"), r => r.getField("nrm")).as("nrms"),
          flatten(transform(col("rows"), r => r.getField("emb"))).as("flat"))
        .as[(Int, Array[Long], Array[Double], Array[Double])]
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val partials = (0 until nBlocks).map { b =>
          // one bounded block (≤ blockRows·dim·8 B — the broadcast-join
          // build-side envelope) to the driver, then out as a broadcast
          val (bIds, bNorms, bFlat) = packed.filter(col("blk") === b).collect()
            .headOption.map { case (_, ids, nrms, flat) => (ids, nrms, flat) }
            .getOrElse((Array.empty[Long], Array.empty[Double], Array.empty[Double]))
          val bDim = if (bIds.isEmpty) 0 else bFlat.length / bIds.length
          require(bFlat.length == bIds.length * bDim,
            s"ragged embedding dims in block $b (${bFlat.length} values for ${bIds.length} rows)")
          probePass(bIds, bNorms, bFlat, bDim)
        }
        explodeTopK(
          partials.reduce(_.unionByName(_))
            .groupBy(col("vec_id"))
            .agg(top_k(col("cosine"), col("neighbor_id"), k).as("topk")))
      } finally packed.unpersist(blocking = false) // block images already broadcast
    }
  }

  /** Score one probe against a packed block image, keeping a (score
    * desc, id asc)-sorted bounded k-list — the brute-force kernel shared
    * by every block pass of [[topKNeighbors]]. */
  private def scoreBlock(
      bIds: Array[Long], bNorms: Array[Double], bFlat: Array[Double], bDim: Int,
      pid: Long, pEmb: Array[Double], pNrm: Double, k: Int): Seq[(Long, Long, Double, Int)] = {
    val topIds = new Array[Long](k)
    val topScores = new Array[Double](k)
    var kept = 0
    var c = 0
    while (c < bIds.length) {
      if (bIds(c) != pid) {
        var s = 0.0
        val base = c * bDim
        val dLim = math.min(bDim, pEmb.length)
        var d = 0
        while (d < dLim) { s += pEmb(d) * bFlat(base + d); d += 1 }
        // zero-norm guard: cosine against the zero vector is DEFINED as
        // 0.0 (a NaN here would crash roundHalfUp6's BigDecimal path —
        // and Matryoshka prefix-slices of valid vectors CAN be all-zero)
        val den = pNrm * bNorms(c)
        val raw = if (den == 0.0) 0.0 else s / den
        // The exact HALF_UP rounding ([[roundHalfUp6]]) costs ~0.5 µs per
        // call (Double.toString inside BigDecimal.valueOf); gate it on a
        // conservative raw-score test — rounding moves a value by at most
        // 5e-7 (+ half an ulp), so a candidate more than 1e-6 below the
        // kth ROUNDED score cannot round into the k-list. The list logic
        // below still compares rounded values only.
        if (kept < k || raw >= topScores(k - 1) - 1e-6) {
          val cos = roundHalfUp6(raw)
          // insertion into the (score desc, id asc)-sorted k-list
          if (kept < k || cos > topScores(k - 1) ||
              (cos == topScores(k - 1) && bIds(c) < topIds(k - 1))) {
            var pos = math.min(kept, k - 1)
            while (pos > 0 && (cos > topScores(pos - 1) ||
                (cos == topScores(pos - 1) && bIds(c) < topIds(pos - 1)))) {
              topScores(pos) = topScores(pos - 1); topIds(pos) = topIds(pos - 1)
              pos -= 1
            }
            topScores(pos) = cos; topIds(pos) = bIds(c)
            if (kept < k) kept += 1
          }
        }
      }
      c += 1
    }
    (0 until kept).map(r => (pid, topIds(r), topScores(r), r + 1))
  }

  /** Spark's `round(_, 6)` semantics (HALF_UP over the decimal
    * rendering), so kernel scores are bit-identical to the Column
    * expression path and the DuckDB oracle. */
  private def roundHalfUp6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** The row-level cross-join + bounded-heap-aggregate formulation of
    * [[topKNeighbors]] — the declarative executable spec it is tested
    * against (identical output, far heavier execution). */
  def topKNeighborsCrossJoin(
      vecs: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val v = withNorm(vecs, idCol, vecCol)
    val a = v.toDF("vec_id", "emb_a", "nrm_a")
    val b = v.toDF("neighbor_id", "emb_b", "nrm_b")
    val scored = a.crossJoin(b)
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")), 6))
    explodeTopK(
      scored.groupBy(col("vec_id"))
        .agg(top_k(col("cosine"), col("neighbor_id"), k).as("topk")))
  }

  /** Deterministic ±1 random-hyperplane components for SRP-LSH, derived
    * from the portable md5 hash of "srp-<bit>-<component>" so the DuckDB
    * oracle regenerates the identical planes. ±1 components keep every
    * projection term exact in IEEE doubles (no rounding in `x · ±1`), so
    * the SIGN of the projection — all the bucketing uses — is bit-stable
    * across engines as long as both sum components in index order. */
  private[ext] def srpSigns(bit: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { j =>
      if (graft.functions.Portable.h60Local(s"srp-$bit-$j") % 2 == 0) 1.0 else -1.0
    }

  /** Signed-random-projection bucket id: bit i of the result is
    * [projection of the vector onto plane i] > 0. */
  def srpBucket(emb: Column, nBits: Int, dim: Int): Column =
    (0 until nBits).map { i =>
      when(dot(emb, typedlit(srpSigns(i, dim).toSeq)) > 0, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** SRP-LSH-bucketed approximate top-k: vectors are bucketed by
    * `nBits` hyperplane signs, and each vector searches ONLY its bucket
    * — the third scale tier beside brute force ([[topKNeighbors]]) and
    * [[ivfTopK]]. One narrow projection computes buckets (no training
    * pass at all, unlike IVF's centroid assignment), one shuffle on the
    * bucket id joins same-bucket vectors, and the bounded-heap top-k
    * keeps k per vector. Recall < 1 by design: cross-bucket neighbors
    * are unseen (mitigate with fewer bits or multiple tables). */
  def srpTopK(
      vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      nBits: Int = 6, dim: Int = 64): DataFrame = {
    val v = withNorm(vecs, idCol, vecCol)
      .withColumn("bucket", srpBucket(col("emb"), nBits, dim))
    val a = v.toDF("vec_id", "emb_a", "nrm_a", "bucket")
    val b = v.toDF("neighbor_id", "emb_b", "nrm_b", "bucket")
    val scored = a.join(b, Seq("bucket"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")), 6))
    explodeTopK(
      scored.groupBy(col("vec_id"), col("bucket"))
        .agg(top_k(col("cosine"), col("neighbor_id"), k).as("topk")))
      .select(col("vec_id"), col("bucket"), col("neighbor_id"), col("cosine"),
        col("rank"))
  }

  /** Hard-negative mining for contrastive training: for every anchor,
    * the `k` most-similar vectors carrying a DIFFERENT label — the
    * near-boundary negatives that make a contrastive batch informative
    * (easy negatives saturate the loss at zero gradient).
    *
    * The label-inequality predicate rides INSIDE the pair scorer, so
    * pruning happens before the bounded top-k heap — never a full
    * neighbor list post-filtered (which would need k·(max label share)
    * neighbors to survive a filter-after-rank).
    *
    * EXECUTABLE SPEC — this is the exhaustive within-block scorer:
    * quadratic in the block, exact (the 10× soak measured 393 s and
    * 24 GB of spill where the cell-blocked sibling took 43 s with
    * zero spill). At 100 TB run [[hardNegativesInCells]] (q137), the
    * cell-blocked composition of this operator (oracle-gated as a
    * sibling query; see [[graft.ScaleRouting]]). Same contract as
    * [[topKNeighbors]]: cosine rounds to 6dp, ties break on neighbor
    * id, so ranks are engine-stable. */
  def hardNegatives(
      vecs: DataFrame, idCol: String, vecCol: String, labelCol: String,
      k: Int): DataFrame = {
    graft.ScaleRouting.advise(
      "q122_hard_negatives", "q137_hard_negatives_cells")
    // spread the stream side: the label-inequality theta-join plans as
    // a broadcast nested-loop whose parallelism is the probe scan's —
    // ONE task on a one-row-group input (cpu_share 1.2 measured), with
    // the whole O(n²·d) dot-product wall inside it
    val v = graft.core.Scans.spread(vecs).select(
      col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("emb"),
      col(labelCol).as("label"))
      .withColumn("nrm", l2norm(col("emb")))
    val a = v.select(col("id").as("vec_id"), col("label").as("anchor_label"),
      col("emb").as("emb_a"), col("nrm").as("nrm_a"))
    val b = v.select(col("id").as("neighbor_id"), col("label").as("neighbor_label"),
      col("emb").as("emb_b"), col("nrm").as("nrm_b"))
    val scored = a.join(b, col("anchor_label") =!= col("neighbor_label"))
      .withColumn("cosine",
        round(dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")), 6))
    explodeTopK(
      scored.groupBy(col("vec_id"), col("anchor_label"))
        .agg(top_k(col("cosine"), col("neighbor_id"), k).as("topk")))
      .select(col("vec_id"), col("anchor_label"), col("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** Cell-blocked hard-negative mining — [[hardNegatives]]'s different-
    * label top-k scorer bounded by [[kmeans]] cells: the 100 TB
    * composition the exhaustive form is the spec for. Pair work drops
    * from corpus² to Σ cellsize² (the SemDeDup trade), and the result
    * stays EXACT WITHIN cells: each anchor's negatives come from its
    * own cell, which is where the near-boundary (hardest) negatives
    * live by construction — what's forgone are cross-cell candidates
    * that the very metric defining "hard" already placed farther away.
    *
    * Shape: one persist of the cell-assigned labeled corpus feeding
    * both self-join sides ([[semanticDedup]]'s materialize cut), a
    * cell-keyed self-join (one shuffle on cell id), label predicate
    * BEFORE the bounded top-k heap. Anchors in singleton or
    * single-label cells emit nothing — at scale, widen `seedEvery`
    * (fewer, larger cells) rather than post-patching with the
    * exhaustive scorer. */
  def hardNegativesInCells(
      vecs: DataFrame, idCol: String, vecCol: String, labelCol: String,
      k: Int, iters: Int = 2, seedEvery: Int = 100): DataFrame = {
    val assigned = kmeans(vecs, idCol, vecCol, iters, seedEvery)
      .select(col("vec_id").as("id"), col("cluster").as("cell"))
    val v = vecs.select(
        col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("emb"),
        col(labelCol).as("label"))
      .withColumn("nrm", l2norm(col("emb")))
      .join(assigned, Seq("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-call persist, freed after the consuming action (r16, guide §5)
    graft.core.CacheLifecycle.unpersistAfterNextAction(v)
    val a = v.select(col("cell"), col("id").as("vec_id"),
      col("label").as("anchor_label"), col("emb").as("emb_a"), col("nrm").as("nrm_a"))
    val b = v.select(col("cell"), col("id").as("neighbor_id"),
      col("label").as("neighbor_label"), col("emb").as("emb_b"), col("nrm").as("nrm_b"))
    // pinned cell-key repartition (r16): the pre-join cell shuffle is
    // byte-tiny, so AQE coalesces it to a few tasks and the quadratic
    // within-cell fan-out serializes AFTER the exchange (invisible to
    // AQE's byte stats — the q168/q171/Association class). Pinning one
    // side sets both sides' count; the input is the persisted `v`, so
    // the pin is one cheap in-memory shuffle, never a subtree re-run.
    val nPart = vecs.sparkSession.sparkContext.defaultParallelism
    val scored = a.repartition(nPart, col("cell")).join(b, Seq("cell"))
      .filter(col("anchor_label") =!= col("neighbor_label"))
      .withColumn("cosine",
        round(dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")), 6))
    explodeTopK(
      scored.groupBy(col("vec_id"), col("cell"), col("anchor_label"))
        .agg(top_k(col("cosine"), col("neighbor_id"), k).as("topk")))
      .select(col("vec_id"), col("cell"), col("anchor_label"),
        col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Per-label embedding centroids (element-wise mean), EXACTLY: float
    * sums are order-dependent in IEEE doubles, so naive `avg` cannot
    * hash-match across engines — instead each component (a float32,
    * exact in double) quantizes to integral 1e-6 units, sums as
    * order-independent integers, and divides back with one fixed
    * formula. Shape: posexplode to (label, pos) grain + one hash
    * aggregate — dim × rows intermediate, partial-agg'd map-side, the
    * standard distributed centroid shape (k-means update step). */
  def labelCentroids(
      vecs: DataFrame, labelCol: String, vecCol: String): DataFrame =
    vecs
      .select(col(labelCol).as("label"),
        posexplode(col(vecCol).cast("array<double>")))
      .toDF("label", "pos", "x")
      .groupBy(col("label"), col("pos"))
      .agg(sum(round(col("x") * 1000000)).as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        ((col("s") / col("n")) / 1000000.0).as("centroid_component"))

  /** [[labelCentroids]] packed into one 6dp-rounded centroid ARRAY per
    * label (pos-sorted) — the consumer-side shape of the Lloyd chain.
    * One body shared by the k-means update step and the silhouette's
    * centroid table, so a rounding or ordering change cannot desync
    * them. */
  private def packedCentroids(
      pts: DataFrame, labelCol: String, vecCol: String,
      outLabel: String): DataFrame =
    labelCentroids(pts, labelCol, vecCol)
      .groupBy(col("label").as(outLabel))
      .agg(array_sort(collect_list(struct(col("pos"),
        round(col("centroid_component"), 6).as("c")))).as("ps"))
      .select(col(outLabel),
        transform(col("ps"), p => p.getField("c")).as("cemb"))

  /** Label confusability matrix: pairwise L2 distance between the
    * exact per-label centroids — which classes sit close enough in
    * embedding space to confuse a classifier (the geometry companion
    * to [[graft.ext.Profiling.fisherSeparability]]'s per-dimension
    * screen). Centroid components come from [[labelCentroids]]'s
    * integer-unit sums; per-dimension squared gaps quantize to 1e-12
    * units BEFORE the sum, so the distance is assembled from exact
    * longs. Pair join runs at (labels × dims) grain — trivially small
    * at any corpus size. */
  def centroidConfusion(
      vecs: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val c = labelCentroids(vecs, labelCol, vecCol)
    val a = c.select(col("label").as("label_a"), col("pos"),
      col("centroid_component").as("ca"))
    val b = c.select(col("label").as("label_b"), col("pos"),
      col("centroid_component").as("cb"))
    a.join(b, Seq("pos")).filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum(round((col("ca") - col("cb")) * (col("ca") - col("cb"))
        * lit(1.0e12)).cast("long")).as("q"))
      .select(col("label_a"), col("label_b"),
        round(sqrt(col("q") / lit(1.0e12)), 6).as("l2_dist"))
  }

  /** Embedding-norm distribution audit per label: exact interpolated
    * norm percentiles and the share of vectors whose norm falls outside
    * [p50/2, 2·p50] — the pre-flight QC before any cosine/ANN tier
    * (a few huge-norm vectors dominate dot products; near-zero norms
    * make cosine meaningless). Norms quantize to integer micro-units
    * from per-component 1e-9-unit squared sums (order-free), so every
    * compare is engine-stable. */
  def embeddingNormAudit(
      vecs: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val emb = col(vecCol).cast("array<double>")
    val sq = aggregate(
      transform(emb, x => round(x * x * lit(1.0e9)).cast("long")),
      lit(0L), (acc, t) => acc + t)
    val normq = round(sqrt(sq / lit(1.0e9)) * lit(1000000)).cast("long")
    val perVec = vecs.select(col(labelCol).as("label"), normq.as("nq"))
    val stats = perVec.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        expr("percentile(nq, 0.5)").as("q50"),
        expr("percentile(nq, 0.95)").as("q95"))
    perVec.join(broadcast(stats), Seq("label"))
      .groupBy(col("label"), col("n_vecs"), col("q50"), col("q95"))
      .agg(sum((col("nq") * 2 < col("q50") ||
          col("nq").cast("double") > col("q50") * 2).cast("long"))
        .as("n_outliers"))
      .select(col("label"), col("n_vecs"),
        round(col("q50") / lit(1000000.0), 6).as("p50_norm"),
        round(col("q95") / lit(1000000.0), 6).as("p95_norm"),
        col("n_outliers"),
        expr("((n_outliers * 1000000 * 2 + n_vecs) div (n_vecs * 2)) " +
          "/ cast(1000000 as double)").as("outlier_share"))
  }

  /** PQ codebook balance audit: per subvector block, how evenly the
    * corpus spreads over the learned codewords — codes used, the top
    * codeword's share, and the usage entropy in nats (a block whose
    * codes collapse onto a few centroids quantizes poorly; the health
    * check next to [[pqErrorByLabel]]'s reconstruction audit).
    * Reads [[pqEncode]]'s assignments; counts are exact longs; entropy
    * uses the 1e-9-unit Σc·ln c discipline. */
  def pqCodeBalance(
      vecs: DataFrame, idCol: String, vecCol: String,
      blocks: Int = 4, iters: Int = 2, seedEvery: Int = 100): DataFrame =
    pqEncode(vecs, idCol, vecCol, blocks, iters, seedEvery)
      .groupBy(col("blk"), col("code"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("blk"))
      .agg(count(lit(1)).as("n_codes_used"), sum(col("c")).as("n_vecs"),
        max(col("c")).as("top_c"),
        sum(round(col("c") * log(col("c")) * 1e9).cast("long")).as("sn"))
      .select(col("blk"), col("n_codes_used"), col("n_vecs"),
        expr("((top_c * 1000000 * 2 + n_vecs) div (n_vecs * 2)) " +
          "/ cast(1000000 as double)").as("top_code_share"),
        round(log(col("n_vecs")) - (col("sn") / 1e9) / col("n_vecs"), 6)
          .as("code_entropy"))

  /** K-means (Lloyd) over the embedding column: `iters` full
    * assign→update rounds from deterministic seeds (the vectors whose id
    * ≡ 0 mod `seedEvery` — data-derived, no RNG), returning each
    * vector's final cluster and its cosine to that cluster's final
    * centroid. The corpus-clustering layer under diversity sampling and
    * cluster-balanced mixture weighting.
    *
    * Per iteration: assignment is a broadcast cross join against the
    * (tiny) centroid set + a per-vector argmax — one shuffle on the
    * vector id for the bounded top-1 aggregate; the update is the
    * [[labelCentroids]] shape — posexplode to (cluster, pos) grain with
    * map-side partial aggregation, so the shuffle is k·dim rows
    * regardless of corpus size. Driver holds only k·dim doubles.
    *
    * Cross-engine exactness: centroid components accumulate as integral
    * 1e-6 units (order-independent), means round to 6 decimals before
    * the next iteration, and cosines round to 6 before every argmax with
    * cluster-id tie-breaks — both engines walk identical Lloyd paths. */
  def kmeans(
      vecs: DataFrame, idCol: String, vecCol: String,
      iters: Int = 2, seedEvery: Int = 100): DataFrame = {
    require(iters >= 1, "kmeans needs at least one iteration")
    // measured, NOT spread (r15): widening the scan here reads as the
    // assignNearest cross-join's textbook fix, but kmeans re-executes
    // its input subtree once per iteration (plus once under the
    // broadcast centroid arm), so a spread exchange multiplies into
    // 2·iters shuffle stages while the per-iteration assignment is only
    // n·(n/seedEvery)·d flops — every kmeans-family query got 0.2-0.6 s
    // SLOWER with the spread (q57 0.86→1.21, q121 3.44→4.00,
    // q304 0.64→0.86); the heavy single-pass kernels (hardNegatives,
    // covariancePairs) keep theirs
    val v = vecs.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("emb"))
    val seeds = v.filter(col("id") % seedEvery === 0)
      .select(col("id").as("cluster"), col("emb").as("cemb"))
    // fail fast instead of silently returning an empty result when no id
    // is ≡ 0 (mod seedEvery) — small corpora / offset id ranges
    require(!seeds.isEmpty,
      s"kmeans found no seed vectors (no id divisible by $seedEvery)")
    val finalAssign = (1 to iters).foldLeft(seeds) { (cents, it) =>
      val assigned = assignNearest(v, cents)
      if (it == iters) assigned
      else // update step: exact integer-unit means, re-quantized to 6dp
        packedCentroids(
          assigned.select(col("cluster"), col("emb")), "cluster", "emb",
          "cluster")
    }
    finalAssign.select(col("id").as("vec_id"), col("cluster"),
      col("cos").as("cosine"))
  }

  /** SemDeDup-style semantic deduplication (SemDeDup, Abbas et al.
    * 2023): embedding-space near-duplicates removed cluster-locally —
    * [[kmeans]] cells bound the quadratic, pairwise cosine ≥ `tau`
    * within a cell marks duplicate pairs, the pair graph closes
    * transitively ([[Clusters.connectedComponents]]), and each group
    * keeps exactly one representative (its min vec_id — deterministic,
    * unlike the paper's random keep).
    *
    * The missing tier between exact/MinHash dedup (surface overlap) and
    * nothing: paraphrases and re-renderings that share no n-grams but
    * embed together. Cells make it tractable — pair work is
    * Σ cellsize², never corpus², the exact trade the paper runs at
    * billion-doc scale (their k ≈ n/10k keeps cells ~10⁴ → 10⁸ dots per
    * cell, embarrassingly parallel across cells).
    *
    * Shape: one persist of the assigned corpus (it feeds both self-join
    * sides and the final projection — at 100 TB this is the
    * materialize-to-lakehouse cut between the cluster job and the dedup
    * job), a cell-keyed self-join (shuffle on cell id), then min-label
    * propagation over the (tiny) duplicate-pair list.
    *
    * Cross-engine exactness: cosines round to 6dp before the threshold
    * (the [[topKNeighbors]] convention), so both engines see identical
    * edge sets; everything after is integer ids. */
  def semanticDedup(
      vecs: DataFrame, idCol: String, vecCol: String,
      tau: Double, iters: Int = 2, seedEvery: Int = 100): DataFrame = {
    val assigned = kmeans(vecs, idCol, vecCol, iters, seedEvery)
      .select(col("vec_id").as("id"), col("cluster").as("cell"))
    val v = withNorm(vecs, idCol, vecCol)
      .join(assigned, Seq("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = v.select(col("cell"), col("id").as("id_a"),
      col("emb").as("emb_a"), col("nrm").as("nrm_a"))
    val b = v.select(col("cell"), col("id").as("id_b"),
      col("emb").as("emb_b"), col("nrm").as("nrm_b"))
    // pinned cell-key repartition (r16): same rationale as
    // [[hardNegativesInCells]] — the within-cell pair fan-out is the
    // cost and AQE cannot see it; `v` is persisted, so the pin reads
    // the cache, never re-runs the Lloyd chain.
    val nPart = vecs.sparkSession.sparkContext.defaultParallelism
    val dupPairs = a.repartition(nPart, col("cell")).join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(
        round(dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")), 6)
          >= tau)
      .select(col("id_a"), col("id_b"))
    val groups = Clusters.connectedComponents(dupPairs)
      .select(col("id"), col("cluster_id").as("dup_group"))
    // per-call persist, freed after the consuming action (r16, guide
    // §5). Registered AFTER the CC pass: CC runs eager actions of its
    // own during construction, and the one-shot listener must fire on
    // the FINAL projection's action — the last consumer of v — not on
    // CC's first internal round.
    graft.core.CacheLifecycle.unpersistAfterNextAction(v)
    v.join(groups, Seq("id"), "left")
      .select(
        col("id").as("vec_id"), col("cell"),
        coalesce(col("dup_group"), col("id")).as("dup_group"),
        (coalesce(col("dup_group"), col("id")) === col("id")).as("is_kept"))
  }

  /** Simplified silhouette per [[kmeans]] cell (Hruschka et al.'s
    * centroid-based variant: distances to CENTROIDS, not all points —
    * the form that stays linear and is how silhouette is actually run
    * at corpus scale; the classic all-pairs silhouette is O(n²) by
    * definition). For each point, a = cosine distance to its own
    * cell's mean, b = min distance to any other cell's mean,
    * s = (b − a)∕max(a, b) ∈ [−1, 1]; the readout is each cell's mean
    * s — the clustering-quality companion to [[cellLabelPurity]]
    * (label agreement) and [[graft.ext.Clusters]]' size histogram
    * (balance): purity says cells match labels, silhouette says the
    * geometry itself is tight vs smeared.
    *
    * Exactness: centroids are [[labelCentroids]]' integer-unit means
    * rounded to 6dp; every cosine rounds to 6dp before the distance;
    * s quantizes to 1e-6 units BEFORE the per-cell sum (order-free
    * longs), and the final mean is one shared double chain.
    *
    * Scale shape: one Lloyd chain (the [[semanticDedup]] cost), one
    * centroid aggregate, one broadcast-centroid scoring pass (points ×
    * cells, the [[assignNearest]] shape), one cell-grain aggregate —
    * nothing quadratic in points. */
  def simplifiedSilhouette(
      vecs: DataFrame, idCol: String, vecCol: String,
      iters: Int = 2, seedEvery: Int = 100): DataFrame = {
    val assigned = kmeans(vecs, idCol, vecCol, iters, seedEvery)
      .select(col("vec_id").as("id"), col("cluster"))
    val v = vecs
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("emb"))
      .join(assigned, Seq("id"))
      // feeds both the centroid aggregate and the scoring pass
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-call persist, freed after the consuming action (r16, guide §5)
    graft.core.CacheLifecycle.unpersistAfterNextAction(v)
    val cents = packedCentroids(
      v.select(col("cluster"), col("emb")), "cluster", "emb", "mcluster")
    val sab = v.crossJoin(broadcast(cents))
      .withColumn("d", lit(1.0) - round(cosine(col("emb"), col("cemb")), 6))
      .groupBy(col("id"), col("cluster"))
      .agg(
        min(when(col("mcluster") === col("cluster"), col("d"))).as("a_d"),
        min(when(col("mcluster") =!= col("cluster"), col("d"))).as("b_d"))
    // single-cell corpora have no b: s is undefined (NULL both engines)
    val s = when(col("b_d").isNull, lit(null).cast("double"))
      .when(greatest(col("a_d"), col("b_d")) === 0.0, lit(0.0))
      .otherwise((col("b_d") - col("a_d")) / greatest(col("a_d"), col("b_d")))
    sab.withColumn("su", round(s * 1e6).cast("long"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_points"), sum(col("su")).as("ssu"))
      .select(col("cluster").as("cell"), col("n_points"),
        round(col("ssu").cast("double") / col("n_points").cast("double")
          / 1e6, 6).as("mean_silhouette"))
      .orderBy(col("cell"))
  }

  /** Nearest-centroid assignment (the Lloyd E-step): rounded-cosine
    * argmax with cluster-id tie-break, via the bounded top-1 aggregate. */
  private def assignNearest(v: DataFrame, cents: DataFrame): DataFrame =
    v.crossJoin(broadcast(cents))
      .withColumn("c", round(cosine(col("emb"), col("cemb")), 6))
      .groupBy(col("id"))
      .agg(top_k(col("c"), col("cluster"), 1).as("topc"),
        first(col("emb")).as("emb"))
      .select(col("id"), col("emb"),
        element_at(col("topc"), 1).getField("id").as("cluster"),
        element_at(col("topc"), 1).getField("score").as("cos"))

  /** The IVF index BUILD side, exposed on its own: every vector with
    * its norm and its nearest-centroid cell — (id, emb, nrm, cell).
    * Centroids are the vectors whose id ≡ 0 (mod centroidEvery) —
    * deterministic, data-derived, no RNG. This frame IS the index: at
    * 100 TB it is persisted as a cell-bucketed parquet table
    * ([[writeIvfIndex]]) built once, and every probe
    * ([[ivfTopKFromAssigned]]) consumes it co-located on the cell key
    * with no index-side shuffle — the dense analogue of
    * [[graft.ext.Retrieval.writeBucketedIndex]]'s term bucketing. */
  def ivfAssign(
      vecs: DataFrame, idCol: String, vecCol: String,
      centroidEvery: Int = 100): DataFrame = {
    // not spread — the kmeans measurement (one broadcast pass, tiny
    // per-row work; the exchange costs more than it parallelizes)
    val v = withNorm(vecs, idCol, vecCol)
    val centroids = v.filter(col("id") % centroidEvery === 0)
      .select(col("id").as("centroid_id"), col("emb").as("cemb"), col("nrm").as("cnrm"))
    // nearest centroid = top_k with k=1 (same tie-break as the window)
    v.crossJoin(broadcast(centroids))
      .withColumn("ccos",
        round(dot(col("emb"), col("cemb")) / (col("nrm") * col("cnrm")), 6))
      .groupBy(col("id"))
      .agg(
        top_k(col("ccos"), col("centroid_id"), 1).as("topc"),
        first(col("emb")).as("emb"),
        first(col("nrm")).as("nrm"))
      .select(col("id"), col("emb"), col("nrm"),
        element_at(col("topc"), 1).getField("id").as("cell"))
  }

  /** The IVF PROBE over an already-assigned index frame — the tail of
    * [[ivfTopK]] split out so the same probe runs over the in-memory
    * assignment and its disk form ([[writeIvfIndex]] read back). Both
    * join sides derive from `assigned` keyed on `cell`, so a
    * cell-bucketed index scan feeds the join AND the per-(vec, cell)
    * top-k aggregate with zero shuffles (hash(cell) co-locates every
    * (vec_id, cell) group); column names, not positions, bind the
    * contract — (id, emb, nrm, cell). */
  def ivfTopKFromAssigned(assigned: DataFrame, k: Int): DataFrame = {
    val a = assigned.select(col("id").as("vec_id"), col("emb").as("emb_a"),
      col("nrm").as("nrm_a"), col("cell"))
    val b = assigned.select(col("id").as("neighbor_id"), col("emb").as("emb_b"),
      col("nrm").as("nrm_b"), col("cell"))
    val scored = a.join(b, Seq("cell"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")), 6))
    explodeTopK(
      scored.groupBy(col("vec_id"), col("cell"))
        .agg(top_k(col("cosine"), col("neighbor_id"), k).as("topk")))
      .select(col("vec_id"), col("cell"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** IVF single-probe approximate top-k: [[ivfAssign]] composed with
    * [[ivfTopKFromAssigned]].
    *
    * The pinned cell repartition lives HERE, not in
    * [[ivfTopKFromAssigned]]: the in-memory assignment exits its
    * groupBy hashed on `id`, so the cell join needs an exchange anyway
    * — pinning it stops AQE coalescing the byte-tiny shuffle under the
    * quadratic within-cell fan-out (the q168/q171 class), and both
    * join sides derive from the pinned frame so no second exchange
    * appears. The disk path (q346) must NOT pass through this: its
    * cell-BUCKETED scan already satisfies the join's distribution with
    * ZERO exchanges (IvfDiskIndexSpec asserts that plan), and a pin
    * would bolt a pointless full-index shuffle onto every probe. */
  def ivfTopK(
      vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      centroidEvery: Int = 100): DataFrame = {
    val nPart = vecs.sparkSession.sparkContext.defaultParallelism
    ivfTopKFromAssigned(
      ivfAssign(vecs, idCol, vecCol, centroidEvery)
        .repartition(nPart, col("cell")), k)
  }

  /** Persist an [[ivfAssign]] index as a parquet table BUCKETED BY
    * CELL — the disk shape of the "cells bound who you score" claim:
    * cell is the probe key, so a cell-bucketed scan reports
    * `hashpartitioning(cell)` and the intra-cell self-join plus the
    * per-(vec, cell) top-k aggregate downstream run WITHOUT an
    * exchange — at corpus scale the index shuffle happens once at
    * build/write time, never per probe (the dense sibling of
    * [[graft.ext.Retrieval.writeBucketedIndex]]). `sortBy(cell)`
    * orders each bucket file for cell run-length locality. Written as
    * an EXTERNAL table (explicit path): the catalog entry is
    * session-scoped metadata, the files are the durable artifact. */
  def writeIvfIndex(
      assigned: DataFrame, table: String, path: String,
      buckets: Int = 32): Unit =
    assigned.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, "cell")
      .sortBy("cell")
      .option("path", path)
      .saveAsTable(table)

  /** Multi-probe IVF top-k: corpus vectors stay indexed in their single
    * nearest cell (the [[ivfTopK]] build side), but each QUERY probes
    * its `nProbe` nearest cells and merges one bounded top-k over the
    * union — the standard recall lever when single-probe recall (as
    * measured by [[annRecall]]) is not good enough: probe work scales
    * linearly in `nProbe` while the index is untouched, so recall is a
    * per-query knob, not a rebuild.
    *
    * Shape: the centroid cross join stays broadcast; the probe side
    * explodes to `nProbe` rows per query before the one shuffle on the
    * cell id, and the per-query top-k merges across probed cells with
    * the bounded heap ([[TopKAggregate]] is mergeable — exactly why the
    * union needs no second ranking pass). Each neighbor lives in one
    * cell, so the union is duplicate-free by construction. The assigned
    * corpus is persisted once and consumed by both the index side and
    * the probe side ([[semanticDedup]]'s materialize cut — Catalyst
    * would otherwise recompute the centroid argmax per consumer). */
  def ivfTopKMultiProbe(
      vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      centroidEvery: Int = 100, nProbe: Int = 2): DataFrame = {
    val v = withNorm(vecs, idCol, vecCol)
    val centroids = v.filter(col("id") % centroidEvery === 0)
      .select(col("id").as("centroid_id"), col("emb").as("cemb"), col("nrm").as("cnrm"))
    val agged = v.crossJoin(broadcast(centroids))
      .withColumn("ccos",
        round(dot(col("emb"), col("cemb")) / (col("nrm") * col("cnrm")), 6))
      .groupBy(col("id"))
      .agg(
        top_k(col("ccos"), col("centroid_id"), nProbe).as("topc"),
        first(col("emb")).as("emb"),
        first(col("nrm")).as("nrm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-call persist, freed after the consuming action (r16, guide §5)
    graft.core.CacheLifecycle.unpersistAfterNextAction(agged)
    val indexed = agged.select(col("id").as("neighbor_id"),
      col("emb").as("emb_b"), col("nrm").as("nrm_b"),
      element_at(col("topc"), 1).getField("id").as("cell"))
    val probes = agged.select(col("id").as("vec_id"),
      col("emb").as("emb_a"), col("nrm").as("nrm_a"),
      explode(transform(col("topc"), t => t.getField("id"))).as("cell"))
    // pinned cell-key repartition (r16, the ivfTopK rationale): both
    // sides read the persisted `agged`, so the pin is one cheap
    // in-memory shuffle that keeps the within-cell scoring fan-out on
    // defaultParallelism tasks instead of AQE's byte-coalesced few.
    val nPart = vecs.sparkSession.sparkContext.defaultParallelism
    val scored = probes.repartition(nPart, col("cell")).join(indexed, Seq("cell"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")), 6))
    explodeTopK(
      scored.groupBy(col("vec_id"))
        .agg(top_k(col("cosine"), col("neighbor_id"), k).as("topk")))
      .select(col("vec_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** IVF probe-sweep design readout: corpus-level mean recall@k of
    * [[ivfTopKMultiProbe]] at each probe count in `probesList`, against
    * ONE shared exact side — the "how many probes buy how much recall"
    * curve an index design reads before a 100 TB retrieval pipeline
    * commits to nProbe (the [[graft.ext.Dedup.lshCalibrationCurve]]
    * sibling for the ANN tier; [[annRecall]] gives the per-probe
    * detail at a single setting).
    *
    * Exactness: hits are exact longs (both sides share the 6dp-cosine
    * + id-tie-break contract, so the intersection is engine-stable);
    * mean recall is the half-up micro ratio hits∕(n_queries·k).
    *
    * Scale shape: the exact side is computed ONCE and persisted
    * (probes·k rows); each sweep arm reuses the production-shaped IVF
    * chain (cell-bounded scoring). At 100 TB the sweep runs on a
    * hash-sampled probe set — corpus side complete, the [[annRecall]]
    * sampling rule. */
  def ivfProbeSweep(
      vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      centroidEvery: Int = 100,
      probesList: Seq[Int] = Seq(1, 2, 4)): DataFrame = {
    val exact = topKNeighbors(vecs, idCol, vecCol, k)
      .select(col("vec_id"), col("neighbor_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-call persist, freed after the consuming action (r16, guide §5)
    graft.core.CacheLifecycle.unpersistAfterNextAction(exact)
    val arms = probesList.map { p =>
      val approx = ivfTopKMultiProbe(vecs, idCol, vecCol, k, centroidEvery, p)
        .select(col("vec_id"), col("neighbor_id"))
      exact.join(approx, Seq("vec_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .select(lit(p.toLong).as("n_probes"), col("hits"))
    }
    val tot = exact.agg(countDistinct(col("vec_id")).as("n_queries"))
    arms.reduce(_ unionByName _)
      .crossJoin(broadcast(tot))
      .select(col("n_probes"), col("n_queries"), col("hits"),
        (expr(s"((hits * 1000000 * 2) + (n_queries * $k)) " +
          s"div (n_queries * $k * 2)") / 1e6).as("mean_recall"))
      .orderBy(col("n_probes"))
  }

  /** Hubness audit of the embedding space — the ANN pathology screen
    * (Radovanović et al., JMLR 2010) next to the recall gates
    * (q144/q312): in high dimensions some points become HUBS that
    * appear in a disproportionate share of other points' k-NN lists
    * while antihubs appear in none, which silently degrades ANN
    * recall, kNN label quality (q145), and hard-negative mining
    * (q122). Reported as the skewness of the k-occurrence
    * distribution N_k(x) = #{y : x ∈ kNN(y)} — near 0 for
    * well-behaved spaces, strongly positive under hubness — plus the
    * max, antihub count, and hub count (N_k ≥ 2k).
    *
    * Exactness: N_k counts are exact (the q20 exact top-k contract:
    * 6dp cosine, id tie-break); moment sums are exact
    * longs∕decimal(38,0); skewness is one fixed double chain
    * (m₃∕m₂^1.5) quantized 1e-6.
    *
    * Scale shape: [[topKNeighbors]] is the scorer (block-broadcast,
    * bounded residency — quadratic compute by spec of EXACT kNN; at
    * 100 TB feed the IVF/SRP candidate lists instead); everything
    * after is a count aggregate and one scalar row. */
  def hubnessAudit(
      vecs: DataFrame, idCol: String, vecCol: String,
      k: Int = 10): DataFrame = {
    val dec = "decimal(38,0)"
    val occ = topKNeighbors(vecs, idCol, vecCol, k)
      .groupBy(col("neighbor_id")).agg(count(lit(1)).as("c"))
    vecs.select(col(idCol).cast("long").as("neighbor_id"))
      .join(occ, Seq("neighbor_id"), "left")
      .select(coalesce(col("c"), lit(0L)).as("c"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s1"),
        sum(col("c").cast(dec) * col("c")).as("s2"),
        sum(col("c").cast(dec) * col("c") * col("c")).as("s3"),
        max(col("c")).as("max_k_occ"),
        sum(when(col("c") === 0L, 1L).otherwise(0L)).as("n_antihubs"),
        sum(when(col("c") >= 2L * k, 1L).otherwise(0L)).as("n_hubs"))
      .withColumn("mu", col("s1").cast("double") / col("n"))
      .withColumn("m2",
        col("s2").cast("double") / col("n") - col("mu") * col("mu"))
      .withColumn("m3", col("s3").cast("double") / col("n")
        - lit(3.0) * col("mu") * (col("s2").cast("double") / col("n"))
        + lit(2.0) * col("mu") * col("mu") * col("mu"))
      .select(col("n").as("n_vecs"), lit(k.toLong).as("k"),
        when(col("m2") > 0,
          round(col("m3") / pow(col("m2"), lit(1.5)) * 1e6).cast("long")
            / 1e6).as("k_occurrence_skew"),
        col("max_k_occ"), col("n_antihubs"), col("n_hubs"))
  }

  /** Per-label embedding-centroid drift vs the pooled centroid: the
    * training-mix audit in EMBEDDING space ([[graft.ext.Drift.jsdPerGroup]]
    * is its lexical sibling) — a label/source whose centroid swings away
    * from the pooled mean is over- or under-represented semantically,
    * not just lexically. Emits per label the vector count and the
    * cosine between its centroid and the pooled centroid.
    *
    * Exactness: centroid components accumulate as integral 1e-6 units
    * (the [[labelCentroids]] contract — order-free), both centroids are
    * assembled pos-sorted, and the cosine is the engine-shared
    * left-to-right fold rounded to 6dp. Pooled sums derive from the
    * same per-label aggregate (integer partials re-aggregate exactly).
    *
    * Shape: one posexplode into a (label, pos)-keyed aggregate with
    * map-side partials (shuffle is labels·dim rows regardless of corpus
    * size), a labels-sized array roll-up, and a broadcast single-row
    * pooled array. Nothing here grows with the corpus. */
  def centroidDrift(
      vecs: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val lc = vecs
      .select(col(labelCol).as("label"),
        posexplode(col(vecCol).cast("array<double>")))
      .toDF("label", "pos", "x")
      .groupBy(col("label"), col("pos"))
      .agg(sum(round(col("x") * 1000000)).as("s"), count(lit(1)).as("n"))
      .withColumn("c", (col("s") / col("n")) / 1000000.0)
    def packed(c: Column) =
      transform(array_sort(collect_list(struct(col("pos"), c.as("c")))),
        t => t.getField("c"))
    val la = lc.groupBy(col("label"))
      .agg(max(col("n")).as("n_vecs"), packed(col("c")).as("arr"))
    val pa = lc.groupBy(col("pos"))
      .agg(sum(col("s")).as("sp"), sum(col("n")).as("np"))
      .withColumn("c", (col("sp") / col("np")) / 1000000.0)
      .agg(packed(col("c")).as("parr"))
    la.crossJoin(broadcast(pa))
      .select(col("label"), col("n_vecs"),
        round(dot(col("arr"), col("parr"))
          / (l2norm(col("arr")) * l2norm(col("parr"))), 6)
          .as("cosine_to_pooled"))
  }

  /** Symmetric int8 quantization quality report, per vector: the
    * absmax/127 scale plus mean/max absolute reconstruction error —
    * the storage-tier decision data for embedding compression (4× over
    * float32 before ANN indexing).
    *
    * A pure projection (zero shuffles). Exactness across engines: the
    * scale is one IEEE division of an exactly-representable float; each
    * element's |dequantized − original| is a fixed op sequence; the MEAN
    * sums per-element errors as integral 1e-9 units (order-independent
    * integers — float addition order would differ between engines),
    * and MAX is order-free by nature. */
  def quantizeInt8Report(
      vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val emb = col(vecCol).cast("array<double>")
    val scale = greatest(array_max(transform(emb, x => abs(x))), lit(1e-12)) / 127.0
    // per-element |round(x/scale)*scale − x|, in integral nanos
    val errNanos = transform(emb,
      x => round(abs(round(x / col("q_scale")) * col("q_scale") - x) * 1e9).cast("long"))
    vecs
      .withColumn("q_scale", scale)
      .withColumn("err_nanos", errNanos)
      .select(
        col(idCol),
        col("q_scale"),
        ((aggregate(col("err_nanos"), lit(0L), (acc, e) => acc + e)
          / size(col("err_nanos"))) / 1e9).as("mean_abs_err"),
        (array_max(col("err_nanos")) / 1e9).as("max_abs_err"))
  }

  /** ANN index-quality audit: per-probe recall@k of the IVF index
    * ([[ivfTopK]]) against the exact scorer ([[topKNeighbors]]) — the
    * measurement that decides whether a single-probe cell search is
    * good enough or the index needs more probes / finer cells before a
    * retrieval pipeline trusts it.
    *
    * Both sides share one determinism contract (6dp-rounded cosine,
    * neighbor-id tie-break), so the intersection is engine-stable —
    * recall is a property of the INDEX, not of float noise. Probes with
    * no IVF output (singleton cells) surface as recall 0, not as
    * missing rows: an audit that silently drops the worst cases is
    * wrong.
    *
    * Scale shape: the exact side is the expensive one (O(probes·n·d));
    * at 100 TB run the audit over a SAMPLED probe set (hash-sample the
    * probe side — the corpus side must stay complete or recall is
    * biased upward) while the IVF side reuses the production index.
    * The intersection join and count are one shuffle at probes·k rows. */
  def annRecall(
      vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      centroidEvery: Int = 100): DataFrame = {
    val exact = topKNeighbors(vecs, idCol, vecCol, k)
      .select(col("vec_id"), col("neighbor_id"))
    val approx = ivfTopK(vecs, idCol, vecCol, k, centroidEvery)
      .select(col("vec_id"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("vec_id", "neighbor_id"), "left_semi")
      .groupBy(col("vec_id")).agg(count(lit(1)).as("hits"))
    exact.select(col("vec_id")).distinct()
      .join(hits, Seq("vec_id"), "left")
      .select(
        col("vec_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") / k).as("recall_at_k"))
  }

  /** Matryoshka truncation audit: recall@k of exact cosine top-k run
    * on only the FIRST `dims` dimensions against the full-dimension
    * exact top-k — "how much neighbor structure survives if we store
    * an 8-float prefix per vector". The decision input for
    * prefix-truncated storage tiers (the same question [[annRecall]]
    * answers for IVF and [[pqAdcRecall]] for PQ, here for MRL-style
    * dimension truncation).
    *
    * Both neighbor lists come from [[topKNeighbors]] (6dp-rounded
    * cosine, id tie-break, block-bounded driver residency), so the
    * audit inherits its scale shape; the truncated pass scans
    * `dims/d`-sized vectors — the point of the tier. */
  def matryoshkaRecall(
      vecs: DataFrame, idCol: String, vecCol: String,
      dims: Int, k: Int): DataFrame = {
    val exact = topKNeighbors(vecs, idCol, vecCol, k)
      .select(col("vec_id"), col("neighbor_id"))
    val truncated = vecs.select(col(idCol), slice(col(vecCol), 1, dims).as(vecCol))
    val trunc = topKNeighbors(truncated, idCol, vecCol, k)
      .select(col("vec_id"), col("neighbor_id"))
    val hits = exact.join(trunc, Seq("vec_id", "neighbor_id"), "left_semi")
      .groupBy(col("vec_id")).agg(count(lit(1)).as("hits"))
    exact.select(col("vec_id")).distinct()
      .join(hits, Seq("vec_id"), "left")
      .select(
        col("vec_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") / k).as("recall_at_k"))
  }

  /** Cluster–label agreement audit: per IVF cell (the [[ivfTopK]]
    * deterministic id≡0 (mod centroidEvery) centroids and 6dp-cosine
    * argmax assignment), how concentrated are the supervised labels —
    * cell size, distinct labels, the majority label and its share
    * (purity). High purity means the unsupervised cells recover the
    * label structure, so cell-blocked ops ([[semanticDedup]],
    * [[hardNegatives]]' cell-blocked sibling) approximate label-aware
    * ones; low purity says cosine geometry and labels disagree and a
    * cell-blocked pipeline will mix classes.
    *
    * Exactness: assignment is the exact ivfTopK chain (6dp-rounded
    * centroid cosine, centroid-id tie-break); counts are longs; purity
    * is an integer half-up micro ratio; the majority label ties break
    * label-ascending via an explicit (count desc, label asc) window
    * over the cells×labels table — mart-grain, never data-grain.
    *
    * Shape: broadcast centroid cross join + top-1 aggregate (the
    * assignment), one (cell,label) hash aggregate, then windows over
    * the mart-sized joint table. */
  def cellLabelPurity(
      vecs: DataFrame, idCol: String, vecCol: String, labelCol: String,
      centroidEvery: Int = 100): DataFrame = {
    val v = withNorm(vecs, idCol, vecCol)
    val labels = vecs.select(col(idCol).as("id"), col(labelCol).as("label"))
    val centroids = v.filter(col("id") % centroidEvery === 0)
      .select(col("id").as("centroid_id"), col("emb").as("cemb"),
        col("nrm").as("cnrm"))
    val assigned = v.crossJoin(broadcast(centroids))
      .withColumn("ccos",
        round(dot(col("emb"), col("cemb")) / (col("nrm") * col("cnrm")), 6))
      .groupBy(col("id"))
      .agg(graft.functions.TopKAggregate
        .top_k(col("ccos"), col("centroid_id"), 1).as("topc"))
      .select(col("id"),
        element_at(col("topc"), 1).getField("id").as("cell"))
    val joint = assigned.join(labels, Seq("id"))
      .groupBy(col("cell"), col("label")).agg(count(lit(1)).as("c"))
    val byShare = Window.partitionBy(col("cell"))
      .orderBy(col("c").desc, col("label"))
    joint
      .withColumn("n_vecs", sum(col("c")).over(Window.partitionBy(col("cell"))))
      .withColumn("n_labels",
        count(lit(1)).over(Window.partitionBy(col("cell"))))
      .withColumn("rn", row_number().over(byShare))
      .filter(col("rn") === 1)
      .select(col("cell"), col("n_vecs"), col("n_labels"),
        col("label").as("top_label"),
        expr("((c * 1000000 * 2 + n_vecs) div (n_vecs * 2)) " +
          "/ cast(1000000 as double)").as("purity"))
      .orderBy(col("cell"))
  }

  /** DCG position discounts 1∕log₂(p+1), p = 1..10 — 17-significant-
    * digit literals shared with the SQL mirror (the
    * [[Profiling.benfordP]] device: each engine's own log2 need not
    * agree in the last bit; a decimal→double parse is correctly
    * rounded in both). */
  val dcgDiscounts: Seq[(Int, Double)] = Seq(
    1 -> 1.0, 2 -> 0.6309297535714575, 3 -> 0.5,
    4 -> 0.43067655807339306, 5 -> 0.38685280723454163,
    6 -> 0.3562071871080222, 7 -> 0.3333333333333333,
    8 -> 0.31546487678572877, 9 -> 0.3010299956639812,
    10 -> 0.2890648263178879)

  /** SQL VALUES list mirroring [[dcgDiscounts]] — generated from the
    * same literals so the two engines cannot drift. */
  def dcgDiscountsSqlValues(k: Int): String =
    dcgDiscounts.take(k).map { case (p, d) => s"($p, $d)" }.mkString(", ")

  /** Ideal-DCG in integer 1e-9 units for graded relevance k, k−1, …, 1
    * at positions 1..k — ONE Scala computation feeds both the plan and
    * the generated oracle, so the normalizer cannot drift. */
  def idcgUnits(k: Int): Long =
    dcgDiscounts.take(k).map { case (p, d) =>
      math.round((k - p + 1) * d * 1e9) }.sum

  /** Ranked-retrieval quality of the IVF index beyond [[annRecall]]'s
    * set overlap: per probe, NDCG@k and the reciprocal rank of the
    * first relevant hit — recall says WHETHER the true neighbors
    * surfaced; NDCG/MRR say WHERE, which is what a retrieval-augmented
    * consumer that reads results top-down actually experiences.
    *
    * Relevance is graded by the EXACT ranking (rel of the exact rank-r
    * neighbor is k−r+1, non-members 0) — ground truth is the exact
    * scorer, the same contract as [[annRecall]]. Per-position gains
    * quantize to integer 1e-9 units BEFORE the per-probe sum (k
    * doubles summed in engine order would differ), so DCG is an exact
    * long and NDCG one division by the shared [[idcgUnits]] constant.
    * Probes the IVF never answers (singleton cells) surface as 0s.
    *
    * Scale shape: inherits [[topKNeighbors]]' block-bounded exact side
    * (sample the probe set at 100 TB — corpus side stays complete) and
    * [[ivfTopK]]'s cell-bounded approx side; everything downstream is
    * probes·k rows. */
  def rankedRetrievalEval(
      vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      centroidEvery: Int = 100): DataFrame = {
    require(k <= dcgDiscounts.size, s"k=$k beyond the discount table")
    val spark = vecs.sparkSession
    import spark.implicits._
    val exact = topKNeighbors(vecs, idCol, vecCol, k)
      .select(col("vec_id"), col("neighbor_id"), col("rank").as("ex_rank"))
    val approx = ivfTopK(vecs, idCol, vecCol, k, centroidEvery)
      .select(col("vec_id"), col("neighbor_id"), col("rank").as("p"))
    val disc = dcgDiscounts.take(k).toDF("p", "disc")
    val scored = approx
      .join(exact, Seq("vec_id", "neighbor_id"), "left")
      .join(broadcast(disc), Seq("p"))
      .withColumn("rel",
        when(col("ex_rank").isNotNull, lit(k) + 1 - col("ex_rank"))
          .otherwise(lit(0)))
      .withColumn("gain_units",
        round(col("rel").cast("double") * col("disc") * 1e9).cast("long"))
    val perProbe = scored.groupBy(col("vec_id"))
      .agg(sum(col("gain_units")).as("dcg_units"),
        sum(when(col("rel") > 0, 1L).otherwise(0L)).as("hits"),
        min(when(col("rel") > 0, col("p"))).as("first_hit"))
    exact.select(col("vec_id")).distinct()
      .join(perProbe, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("dcg_units"), lit(0L)).cast("double")
          / idcgUnits(k), 6).as("ndcg"),
        when(col("first_hit").isNotNull,
          round(lit(1.0) / col("first_hit"), 6)).otherwise(lit(0.0))
          .as("rr"))
  }

  /** Label-noise audit via k-NN disagreement (the deep-kNN /
    * confident-learning signal): for every vector, how many of its `k`
    * exact nearest neighbors carry a DIFFERENT label, and a `suspect`
    * flag when disagreers form a strict majority — the shortlist a
    * relabeling pass reviews before the labels train anything.
    *
    * The neighbor list comes from [[topKNeighbors]] (6dp-rounded
    * cosine, id tie-break), so the flagged set is engine-stable. The
    * disagreement count is one hash aggregate over probes·k rows after
    * two label lookups (broadcast-sized when labels ride a dim table;
    * here a self-join on the id — Spark picks the sort-merge it
    * shuffles anyway for the top-k merge).
    *
    * At 100 TB: neighbor lists are the expensive input — reuse the
    * retrieval tier's cells ([[hardNegativesInCells]]'s composition)
    * or audit a stratified sample per label; the aggregate itself is
    * linear in probes·k. */
  def labelNoise(
      vecs: DataFrame, idCol: String, vecCol: String, labelCol: String,
      k: Int): DataFrame = {
    val labels = vecs.select(col(idCol).cast("long").as("vec_id"),
      col(labelCol).as("label"))
    val nbrs = topKNeighbors(vecs, idCol, vecCol, k)
      .select(col("vec_id"), col("neighbor_id"))
    nbrs
      .join(labels, Seq("vec_id"))
      .join(labels.select(col("vec_id").as("neighbor_id"),
        col("label").as("neighbor_label")), Seq("neighbor_id"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(when(col("neighbor_label") =!= col("label"), 1L)
        .otherwise(0L)).as("n_disagree"))
      .select(col("vec_id"), col("label"), col("n_disagree"),
        (col("n_disagree") * 2 > k).as("suspect"))
  }

  /** L2 normalization via higher-order array functions — the embedding
    * prep step before cosine retrieval (unit vectors turn cosine into a
    * dot product). Emits the norm plus probe values of the normalized
    * vector; all floats are 6-decimal-rounded under the same
    * cross-engine contract as the cosine operators (identical fold
    * order → identical IEEE results, rounding as the shared rendering).
    *
    * Pure per-row projection: transform/aggregate/zip_with all run
    * inside codegen, no shuffle, no UDF. */
  def l2NormalizeReport(
      vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val emb = col(vecCol).cast("array<double>")
    val norm = sqrt(aggregate(emb, lit(0.0), (acc, x) => acc + x * x))
    vecs
      .withColumn("__norm", norm)
      .withColumn("__unit", transform(emb, x => x / col("__norm")))
      .select(
        col(idCol),
        round(col("__norm"), 6).as("norm_l2"),
        round(element_at(col("__unit"), 1), 6).as("u1"),
        round(element_at(col("__unit"), 2), 6).as("u2"),
        // zip_with self dot of the unit vector — 1 up to rounding; the
        // oracle recomputes it rather than pinning the constant
        round(aggregate(
          zip_with(col("__unit"), col("__unit"), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x), 6).as("unit_dot"))
  }

  /** Product quantization (Jégou et al., PAMI 2011) — the compression
    * tier of the ANN stack: the embedding splits into `blocks`
    * contiguous subvectors, each subspace learns its own Lloyd codebook
    * (same deterministic seeding/iteration discipline as [[kmeans]]:
    * seeds are the vectors with id ≡ 0 mod `seedEvery`, `iters` fixed
    * E/M rounds, integer-quantized centroid means), and every vector
    * encodes as one code per block. A d-dim float vector becomes
    * `blocks` small ints — the 100 TB memory story (×100-ish
    * compression) that lets the IVF probe ([[ivfTopK]]) hold its
    * candidate lists in RAM and score by ADC table lookups.
    *
    * Distances are Euclidean per subspace — [[l2dist]]'s strict
    * left-to-right accumulation matches DuckDB's `list_distance`, so
    * the 6dp-rounded assignment (distance ASC, code ASC tie-break) is
    * identical cross-engine. Output grain: (vec_id, blk) with the
    * assigned code and the rounded subspace distance (the
    * reconstruction-error witness the oracle re-derives).
    *
    * Shape: one explode to (vector, block) grain — ×`blocks`, a small
    * constant; codebooks are (blocks · seeds)-sized and BROADCAST to
    * both Lloyd steps; the M-step is a (blk, cluster, pos) hash
    * aggregate. Nothing shuffles at corpus grain except the one
    * explode-aggregate cycle per iteration, all map-side combinable. */
  /** (id, blk, semb) subvector rows — the shared PQ working grain. */
  private def pqSub(vecs: DataFrame, idCol: String, vecCol: String,
      blocks: Int): DataFrame =
    vecs.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("emb"))
      .withColumn("blk", explode(sequence(lit(0), lit(blocks - 1))))
      // the guard lives INSIDE the slice expression (a dropped check
      // column would be pruned away): a dim not divisible by `blocks`
      // would silently drop the trailing dim%blocks components from
      // every code — two vectors differing only there would collide,
      // and the published ADC recall would be measured against an
      // index that never saw those dims. Fail fast instead (the FAISS
      // PQ contract: d % M == 0).
      .select(col("id"), col("blk"),
        expr(s"CASE WHEN size(emb) % $blocks = 0 THEN " +
          s"slice(emb, blk * (size(emb) div $blocks) + 1, " +
          s"size(emb) div $blocks) ELSE raise_error(concat(" +
          s"'pqSub: embedding dim ', size(emb), ' not divisible by " +
          s"blocks=$blocks - trailing dims would be silently dropped')) " +
          "END").as("semb"))

  /** Nearest-codeword assignment per (vector, block): 6dp-rounded L2
    * argmin, code-asc tie-break. Keeps `semb` so the M-step can reuse
    * the frame. */
  private def pqAssign(sub: DataFrame, cents: DataFrame): DataFrame =
    sub.join(broadcast(cents), Seq("blk"))
      .withColumn("nd", -round(l2dist(col("semb"), col("cemb")), 6))
      .groupBy(col("id"), col("blk"))
      .agg(top_k(col("nd"), col("code"), 1).as("top1"),
        first(col("semb")).as("semb"))
      .select(col("id"), col("blk"), col("semb"),
        element_at(col("top1"), 1).getField("id").as("code"),
        (-element_at(col("top1"), 1).getField("score")).as("dist"))

  /** The per-subspace codebook the FINAL assignment uses: seeds (id ≡ 0
    * mod `seedEvery`) refined by `iters − 1` integer-quantized-mean
    * update steps. (blk, code, cemb) rows — blocks·seeds-sized, the
    * broadcast side of every PQ consumer. */
  def pqCodebook(
      vecs: DataFrame, idCol: String, vecCol: String,
      blocks: Int = 4, iters: Int = 2, seedEvery: Int = 100): DataFrame = {
    require(iters >= 1, "pqCodebook needs at least one iteration")
    require(blocks >= 1, "pqCodebook needs at least one block")
    val sub = pqSub(vecs, idCol, vecCol, blocks)
    val seeds = sub.filter(col("id") % seedEvery === 0)
      .select(col("blk"), col("id").as("code"), col("semb").as("cemb"))
    require(!seeds.isEmpty,
      s"pqCodebook found no seed vectors (no id divisible by $seedEvery)")
    (1 until iters).foldLeft(seeds) { (cents, _) =>
      pqAssign(sub, cents)
        .select(col("blk"), col("code"), posexplode(col("semb")).as(Seq("pos", "x")))
        .groupBy(col("blk"), col("code"), col("pos"))
        .agg(round(
          (sum(round(col("x") * 1000000)) / count(lit(1))) / 1000000.0, 6)
          .as("c"))
        .groupBy(col("blk"), col("code"))
        .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("ps"))
        .select(col("blk"), col("code"),
          transform(col("ps"), p => p.getField("c")).as("cemb"))
    }
  }

  def pqEncode(
      vecs: DataFrame, idCol: String, vecCol: String,
      blocks: Int = 4, iters: Int = 2, seedEvery: Int = 100): DataFrame =
    pqAssign(
      pqSub(vecs, idCol, vecCol, blocks),
      pqCodebook(vecs, idCol, vecCol, blocks, iters, seedEvery))
      .select(col("id").as("vec_id"), col("blk"), col("code"), col("dist"))

  /** Asymmetric-distance (ADC) top-k search over PQ codes — how an
    * IVF-PQ index actually answers queries at 100 TB: the database side
    * is CODES ONLY (`blocks` small ints per vector), each query keeps
    * its full subvectors, and the per-(query, block, codeword) distance
    * table — queries · codes · blocks rows, tiny — BROADCASTS onto the
    * code table. approx_dist²(q, x) = Σ_blk d²(q_blk, codeword(x, blk));
    * no full vector is ever touched on the database side.
    *
    * Exactness: the per-block d is the 6dp-rounded [[l2dist]] (identical
    * cross-engine); its square is a deterministic double; partials
    * quantize to integral 1e-9 units BEFORE the per-pair sum (float
    * addition order differs between engines; long addition is
    * order-free — the BM25 discipline), and the emitted distance rounds
    * in the integer domain. Ranking: quantized distance asc, vec id asc.
    *
    * Shape: one hash aggregate per (query, vec) pair over blocks·|hits|
    * rows, bounded top-k heap per query; database-side cost scales with
    * |codes| = n·blocks, never n·d. */
  def pqAdcTopK(
      vecs: DataFrame, idCol: String, vecCol: String,
      queryModEvery: Int = 50, k: Int = 5,
      blocks: Int = 4, iters: Int = 2, seedEvery: Int = 100): DataFrame = {
    val sub = pqSub(vecs, idCol, vecCol, blocks)
    val book = pqCodebook(vecs, idCol, vecCol, blocks, iters, seedEvery)
    // encode against the ALREADY-trained book (pqEncode would re-run
    // the full Lloyd chain — identical result, twice the training cost)
    val codes = pqAssign(sub, book)
      .select(col("id").as("vec_id"), col("blk"), col("code"))
    val qsub = sub
      .filter(col("id") % queryModEvery === 0)
      .select(col("id").as("query_id"), col("blk"), col("semb"))
    val table = qsub.join(broadcast(book), Seq("blk"))
      .withColumn("d6", round(l2dist(col("semb"), col("cemb")), 6))
      .select(col("query_id"), col("blk"), col("code"),
        round(col("d6") * col("d6") * lit(1e9)).cast("long").as("pn"))
    pqAdcRanked(codes, table, k)
  }

  /** The full-ADC scoring tail (every query × every code row — the
    * un-IVF'd exhaustive variant). The broadcast join amplifies the
    * codes frame ×|queries| — an amplification AQE cannot see: it
    * observes only the tiny pre-join codes shuffle (a few MB at 10×)
    * and coalesces it toward one partition, which then serializes the
    * ~1e8-row scoring loop on one core (measured at 10×: one task
    * carried 92 of 105 shuffle-MB and the wall swung 22-42 s with
    * scheduling luck). Parallelism across the scoring loop is
    * therefore pinned EXPLICITLY with repartition(n, vec_id) — a
    * numPartitions-specified shuffle AQE is forbidden to coalesce —
    * and hashing on vec_id co-locates a vector's block rows so each
    * (query, vec) pair partial-aggregates exactly once per partition
    * (measured at 10×: shuffle 105→12 MB, peak task 92→9 MB, wall
    * stable at ~26 s vs 33-42 s). The extra shuffle moves only the
    * small codes frame, never the amplified pair stream. */
  private def pqAdcRanked(
      codes: DataFrame, table: DataFrame, k: Int): DataFrame = {
    val n = codes.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    adcRank(
      codes.repartition(n, col("vec_id"))
        .join(broadcast(table), Seq("blk", "code"))
        .filter(col("vec_id") =!= col("query_id")),
      k)
  }

  /** The shared ADC ranking tail: (query_id, vec_id, pn) block partials
    * → per-pair order-free long sums → bounded per-query heap.
    * Rank on -sn (distance asc, id-asc tie-break via the heap); sn is
    * exact in double far below 2^53, so the emitted distance re-derives
    * from the heap's score — no second pass over the pair sums. */
  private def adcRank(pairs: DataFrame, k: Int): DataFrame =
    pairs
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("pn")).as("sn"))
      .select(col("query_id"), col("vec_id"), (-col("sn").cast("double")).as("negsn"))
      .groupBy(col("query_id"))
      .agg(top_k(col("negsn"), col("vec_id"), k).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("t"))
      .select(col("query_id"), col("t.id").as("vec_id"),
        (expr("(cast(-t.score as bigint) + 500) div 1000").cast("double") / lit(1e6))
          .as("adc_dist"),
        col("t.rank").as("rank"))

  /** IVF-PQ top-k — the full at-scale ANN layout (Jégou et al., the
    * FAISS `IVFx,PQy` index): vectors live in their nearest-centroid
    * CELL and are stored as PQ CODES; a query probes its `nProbe`
    * nearest cells and ADC-scores only the codes inside them. Search
    * cost = probed-cell codes · blocks, never n·d — [[ivfTopKMultiProbe]]
    * bounds WHO you score, [[pqAdcTopK]] bounds WHAT scoring touches;
    * this operator composes both bounds.
    *
    * Metric consistency: cells are assigned by the same 6dp-rounded L2
    * distance ADC approximates (not cosine — one metric end to end).
    * Exactness: cell argmins are rounded-double comparisons with
    * centroid-id tie-breaks; scoring inherits [[pqAdcTopK]]'s quantized
    * 1e-9-unit partial sums and the bounded heap's deterministic
    * ranking.
    *
    * Shape: centroids broadcast onto one corpus pass (the assignment is
    * persisted — probe and index sides both read it); the probe list and
    * distance tables are query-sized broadcasts; the only shuffled
    * frame is the cell-restricted (code × probing-query) pair stream,
    * bounded by Σ_cell |cell|·|queries probing it|. */
  /** The IVF-PQ index BUILD side on its own — (codes, book, cents):
    * `codes` is the big frame — (vec_id, blk, code, cell), one row per
    * (vector, subspace) with the vector's top-1 cell — and the only one
    * that scales with the corpus; `book` (blk, code, cemb) and `cents`
    * (centroid_id, cemb) are the model-sized broadcast sides every
    * probe needs. ONE training run feeds all three (the pqAdcTopK
    * rule); at 100 TB `codes` persists as a CELL-bucketed parquet
    * table ([[writeIvfPqIndex]]) and queries are encoded online
    * against the stored book/cents ([[ivfPqTopKFromIndex]]). */
  def ivfPqIndex(
      vecs: DataFrame, idCol: String, vecCol: String,
      blocks: Int = 4, iters: Int = 2, seedEvery: Int = 100,
      centroidEvery: Int = 100): (DataFrame, DataFrame, DataFrame) = {
    val v = vecs.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("emb"))
    val cents = v.filter(col("id") % centroidEvery === 0)
      .select(col("id").as("centroid_id"), col("emb").as("cemb"))
    val cellOf = v.crossJoin(broadcast(cents))
      .withColumn("nd", -round(l2dist(col("emb"), col("cemb")), 6))
      .groupBy(col("id"))
      .agg(top_k(col("nd"), col("centroid_id"), 1).as("topc"))
      .select(col("id").as("vec_id"),
        element_at(col("topc"), 1).getField("id").as("cell"))
    val book = pqCodebook(vecs, idCol, vecCol, blocks, iters, seedEvery)
    val codes = pqAssign(pqSub(vecs, idCol, vecCol, blocks), book)
      .select(col("id").as("vec_id"), col("blk"), col("code"))
      .join(cellOf, Seq("vec_id"))
    (codes, book, cents)
  }

  /** Persist an [[ivfPqIndex]] as three parquet tables —
    * `<prefix>_codes` BUCKETED BY CELL (cell is the probe key: the
    * candidate-generation join consumes the bucketed scan with no
    * index-side exchange, the [[writeIvfIndex]] argument — only the
    * query side, bounded by probes · nProbe, ever shuffles), plus the
    * model-sized `<prefix>_book` and `<prefix>_cents` written plain
    * (they ride broadcasts, partitioning buys nothing). External
    * tables at explicit paths, like every graft disk index. */
  def writeIvfPqIndex(
      vecs: DataFrame, idCol: String, vecCol: String,
      tableFor: String => String, pathFor: String => String,
      blocks: Int = 4, iters: Int = 2, seedEvery: Int = 100,
      centroidEvery: Int = 100, buckets: Int = 32): Unit = {
    val (codes, book, cents) =
      ivfPqIndex(vecs, idCol, vecCol, blocks, iters, seedEvery, centroidEvery)
    codes.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "cell").sortBy("cell")
      .option("path", pathFor("codes")).saveAsTable(tableFor("codes"))
    book.write.mode("overwrite").format("parquet")
      .option("path", pathFor("book")).saveAsTable(tableFor("book"))
    cents.write.mode("overwrite").format("parquet")
      .option("path", pathFor("cents")).saveAsTable(tableFor("cents"))
  }

  /** The IVF-PQ PROBE over a stored index: queries come in as RAW
    * vectors (`queries`/`idCol`/`vecCol`, thinned by `queryModEvery`)
    * and are encoded ONLINE — cell probes against the stored `cents`,
    * per-(query, block, codeword) distance tables against the stored
    * `book` — while the database side touches only the stored `codes`.
    * `blocks`/`nProbe` must match the index build; the training knobs
    * (`iters`/`seedEvery`) live in the stored book and are not needed
    * here — exactly the asymmetry a production ANN service has (model
    * artifacts at build time, raw queries at serve time). Results are
    * bit-identical to [[ivfPqTopK]] over the same corpus: the stored
    * frames round-trip doubles exactly, and both paths share the
    * 6dp-rounding + integer-quantized ADC contract. */
  def ivfPqTopKFromIndex(
      queries: DataFrame, idCol: String, vecCol: String,
      codes: DataFrame, book: DataFrame, cents: DataFrame,
      queryModEvery: Int = 50, k: Int = 5,
      blocks: Int = 4, nProbe: Int = 2): DataFrame = {
    val qv = queries.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("emb"))
      .filter(col("id") % queryModEvery === 0)
    val probes = qv.crossJoin(broadcast(cents))
      .withColumn("nd", -round(l2dist(col("emb"), col("cemb")), 6))
      .groupBy(col("id"))
      .agg(top_k(col("nd"), col("centroid_id"), nProbe).as("topc"))
      .select(col("id").as("query_id"),
        explode(transform(col("topc"), t => t.getField("id"))).as("cell"))
    val table = pqSub(qv, "id", "emb", blocks)
      .select(col("id").as("query_id"), col("blk"), col("semb"))
      .join(broadcast(book), Seq("blk"))
      .withColumn("d6", round(l2dist(col("semb"), col("cemb")), 6))
      .select(col("query_id"), col("blk"), col("code"),
        round(col("d6") * col("d6") * lit(1e9)).cast("long").as("pn"))
    adcRank(
      codes.join(broadcast(probes), Seq("cell"))
        .join(broadcast(table), Seq("query_id", "blk", "code"))
        .filter(col("vec_id") =!= col("query_id")),
      k)
  }

  def ivfPqTopK(
      vecs: DataFrame, idCol: String, vecCol: String,
      queryModEvery: Int = 50, k: Int = 5,
      blocks: Int = 4, iters: Int = 2, seedEvery: Int = 100,
      centroidEvery: Int = 100, nProbe: Int = 2): DataFrame = {
    val v = vecs.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("emb"))
    val cents = v.filter(col("id") % centroidEvery === 0)
      .select(col("id").as("centroid_id"), col("emb").as("cemb"))
    val assigned = v.crossJoin(broadcast(cents))
      .withColumn("nd", -round(l2dist(col("emb"), col("cemb")), 6))
      .groupBy(col("id"))
      .agg(top_k(col("nd"), col("centroid_id"), nProbe).as("topc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cellOf = assigned.select(col("id").as("vec_id"),
      element_at(col("topc"), 1).getField("id").as("cell"))
    val sub = pqSub(vecs, idCol, vecCol, blocks)
    val book = pqCodebook(vecs, idCol, vecCol, blocks, iters, seedEvery)
    // the pqAdcTopK rule: one trained book feeds both the index codes
    // and the query distance tables — never train twice
    val codes = pqAssign(sub, book)
      .select(col("id").as("vec_id"), col("blk"), col("code"))
      .join(cellOf, Seq("vec_id"))
    val table = sub
      .filter(col("id") % queryModEvery === 0)
      .select(col("id").as("query_id"), col("blk"), col("semb"))
      .join(broadcast(book), Seq("blk"))
      .withColumn("d6", round(l2dist(col("semb"), col("cemb")), 6))
      .select(col("query_id"), col("blk"), col("code"),
        round(col("d6") * col("d6") * lit(1e9)).cast("long").as("pn"))
    val probes = assigned.filter(col("id") % queryModEvery === 0)
      .select(col("id").as("query_id"),
        explode(transform(col("topc"), t => t.getField("id"))).as("cell"))
    adcRank(
      codes.join(broadcast(probes), Seq("cell"))
        .join(broadcast(table), Seq("query_id", "blk", "code"))
        .filter(col("vec_id") =!= col("query_id")),
      k)
  }

  /** PQ-code blocking dedup: vectors whose ENTIRE code word (one code
    * per subspace) collides are near-duplicate candidates, verified
    * with the exact distance — embedding-side dedup without an LSH
    * family: the codebook IS the hash, and at 100 TB the code table
    * already exists for search ([[pqEncode]]), so candidate generation
    * is a groupBy on it. Collision groups are quantization cells —
    * tight by construction — so the within-group verify is bounded by
    * cell occupancy, never corpus².
    *
    * Emits every collision pair with its exact 6dp distance and the
    * `is_near` verdict at `maxDist` (pairs above it are kept — they
    * measure the blocker's false-positive rate, which a dedup run
    * tunes the codebook against). */
  def pqCodeDedupPairs(
      vecs: DataFrame, idCol: String, vecCol: String,
      maxDist: Double = 2.0,
      blocks: Int = 4, iters: Int = 2, seedEvery: Int = 100): DataFrame = {
    val v = vecs.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("emb"))
    val keys = pqEncode(vecs, idCol, vecCol, blocks, iters, seedEvery)
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("blk"), col("code"))))
        .as("ck"))
    val a = keys.toDF("id_a", "ck")
    val b = keys.toDF("id_b", "ck")
    a.join(b, Seq("ck"))
      .filter(col("id_a") < col("id_b"))
      .join(v.toDF("id_a", "emb_a"), Seq("id_a"))
      .join(v.toDF("id_b", "emb_b"), Seq("id_b"))
      .withColumn("dist", round(l2dist(col("emb_a"), col("emb_b")), 6))
      .select(col("id_a"), col("id_b"), col("dist"),
        (col("dist") <= maxDist).as("is_near"))
  }

  /** PQ quantization-error fairness audit: mean per-block assignment
    * distance by LABEL — a label whose vectors sit systematically
    * farther from their codewords is under-served by the codebook
    * (trained on the majority), and its ADC search quality silently
    * degrades: the compression-bias companion to [[pqAdcRecall]]'s
    * aggregate recall.
    *
    * Exactness: [[pqEncode]]'s `dist` is already 6dp-rounded, so
    * `dist·1e6` is an exact integer — per-label sums are order-free
    * longs and the means are single divisions. One join to the label
    * column + one hash aggregate over the codes table. */
  def pqErrorByLabel(
      vecs: DataFrame, idCol: String, vecCol: String, labelCol: String,
      blocks: Int = 4, iters: Int = 2, seedEvery: Int = 100): DataFrame = {
    val labels = vecs.select(col(idCol).cast("long").as("vec_id"),
      col(labelCol).as("label"))
    pqEncode(vecs, idCol, vecCol, blocks, iters, seedEvery)
      .join(labels, Seq("vec_id"))
      .groupBy(col("label"))
      .agg(
        countDistinct(col("vec_id")).as("n_vecs"),
        count(lit(1)).as("n_assignments"),
        sum(round(col("dist") * 1e6).cast("long")).as("su"))
      .select(col("label"), col("n_vecs"),
        round(col("su") / 1e6 / col("n_assignments"), 6)
          .as("mean_block_dist"))
  }

  /** Per-source semantic diversity: the trace of each source's
    * within-source covariance (Σ_d var_d — equivalently half the
    * expected squared pairwise distance), from the same integer-unit
    * moment machinery as [[graft.ext.Profiling.covariancePairs]] but
    * diagonal-only, so the aggregate is sources·dim, not sources·dim².
    * A source at low dispersion is semantically repetitive however
    * clean its text metrics look — the embedding-space reading of
    * [[graft.ext.TextAnalysis.vocabGrowth]].
    *
    * Exactness: per-(source, dim) moments are exact longs; each dim's
    * variance term quantizes to an integer unit BEFORE the cross-dim
    * sum (order-free), and the two outputs are single divisions. */
  def sourceDispersion(
      vecs: DataFrame, vecCol: String, sourceCol: Column,
      unitsPerValue: Int = 1000): DataFrame = {
    val q = vecs.select(sourceCol.as("source"),
      transform(col(vecCol), x =>
        round(x.cast("double") * unitsPerValue).cast("long")).as("qv"))
    val u2 = unitsPerValue.toDouble * unitsPerValue.toDouble
    q.select(col("source"), posexplode(col("qv")).as(Seq("pos", "x")))
      .groupBy(col("source"), col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("q2"))
      .withColumn("var_units",
        round((col("q2").cast("double") / col("n")
          - (col("s").cast("double") / col("n"))
            * (col("s").cast("double") / col("n"))) * lit(1e3)).cast("long"))
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_vecs"), sum(col("var_units")).as("vu"))
      .select(col("source"), col("n_vecs"),
        round(col("vu") / 1e3 / lit(u2), 6).as("dispersion"),
        round(col("vu") / 1e3 / lit(u2) * 2.0, 6)
          .as("mean_pairwise_sq"))
  }

  /** Recall@k of the compressed ([[pqAdcTopK]]) search against the
    * exact Euclidean top-k on the same query set — the acceptance gate
    * a PQ deployment publishes next to its compression ratio (the
    * [[annRecall]] pattern for the ADC tier). The exact side scores
    * query × corpus with the full vectors — queries are 1/`queryModEvery`
    * of the corpus, so the reference pass is q·n·d by definition, the
    * cost the audit exists to spend; the broadcast side is the bounded
    * query subset. */
  def pqAdcRecall(
      vecs: DataFrame, idCol: String, vecCol: String,
      queryModEvery: Int = 50, k: Int = 5,
      blocks: Int = 4, iters: Int = 2, seedEvery: Int = 100): DataFrame = {
    val v = vecs.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("emb"))
    val q = v.filter(col("id") % queryModEvery === 0)
      .select(col("id").as("query_id"), col("emb").as("qemb"))
    val exact = v.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .withColumn("nd", -round(l2dist(col("emb"), col("qemb")), 6))
      .groupBy(col("query_id"))
      .agg(top_k(col("nd"), col("id"), k).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("t"))
      .select(col("query_id"), col("t.id").as("vec_id"))
    val approx = pqAdcTopK(vecs, idCol, vecCol, queryModEvery, k,
        blocks, iters, seedEvery)
      .select(col("query_id"), col("vec_id"))
    val hits = exact.join(approx, Seq("query_id", "vec_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    exact.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") / k).as("recall_at_k"))
  }
}
