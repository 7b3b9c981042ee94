package graft

import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Physical-plan assertions: the scale properties the Scaladocs claim
  * (column pruning into the scan, broadcast of small dimensions,
  * bucketing eliminating the fact-fact shuffle) hold in the actual
  * plans — not just in comments. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planText(df: org.apache.spark.sql.DataFrame): String =
    df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("conformed scan prunes columns and broadcasts the part dimension") {
    val txt = planText(bindings.Conformed.orderRevenue(spark, sf))
    // lineitem has 11 columns; only the 6 consumed ones reach the scan
    val lineitemRead = txt.linesIterator
      .dropWhile(!_.contains("lineitem.parquet"))
      .find(_.startsWith("ReadSchema"))
      .getOrElse(fail("no lineitem ReadSchema found"))
    assert(!lineitemRead.contains("l_quantity") && !lineitemRead.contains("l_returnflag"),
      s"unpruned lineitem read: $lineitemRead")
    assert(lineitemRead.contains("l_extendedprice"))
    assert(txt.contains("BroadcastHashJoin"),
      "expected the part dimension join to broadcast")
  }

  test("asofJoin runs as ONE shuffle + window, never a theta join") {
    import org.apache.spark.sql.functions.to_timestamp
    val ev = core.Tables.events(spark, sf)
    val plan = planText(ext.Temporal.asofJoin(
      ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts")),
      ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id")),
      Seq("user_id"), "ts", "ts", Seq("event_id")))
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"as-of must not plan a theta join:\n$plan")
    assert(plan.contains("Window"), s"expected a window plan:\n$plan")
    // formatted explain lists each node once as "(N) Exchange"
    val exchanges = plan.linesIterator.count(_.matches("""\(\d+\) Exchange.*"""))
    assert(exchanges == 1, s"expected exactly one shuffle, got $exchanges:\n$plan")
    // silence unused-import lint paths
    val _ = to_timestamp(lit("2024-01-01"))
  }

  test("SRP top-k shuffles on the bucket id — no cross join in the plan") {
    val plan = planText(ext.Similarity.srpTopK(
      core.Tables.embeddings(spark, sf), "vec_id", "embedding", k = 3))
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"bucketed ANN must not cross-join:\n$plan")
  }

  test("bucketing both fact sides by the join key eliminates the shuffle") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val txt = planText(joined)
      assert(txt.contains("SortMergeJoin"), s"expected SMJ in:\n$txt")
      assert(!txt.contains("Exchange"),
        s"bucketed fact-fact join should be shuffle-free:\n$txt")
      assert(joined.count() > 0)
      // control: the same join over plain parquet DOES shuffle
      val unbucketed = planText(li.join(o, col("l_orderkey") === col("o_orderkey")))
      assert(unbucketed.contains("Exchange"))
    }
  }

  test("hash split, PII scrub, and int8 quantization are shuffle-free projections") {
    val docs = core.Tables.documents(spark, sf)
    for ((name, df) <- Seq(
        "hashSplit" -> ext.Sampling.hashSplit(docs, "doc_id"),
        "piiScrub" -> ext.TextAnalysis.piiScrub(docs, "doc_id", "text"),
        "quantizeInt8" -> ext.Similarity.quantizeInt8Report(
          core.Tables.embeddings(spark, sf), "vec_id", "embedding"))) {
      val plan = planText(df)
      val exchanges = plan.linesIterator.count(_.matches("""\(\d+\) Exchange.*"""))
      assert(exchanges == 0, s"$name must be a pure projection:\n$plan")
    }
  }

  test("chunking is shuffle-free; decontaminate probes a broadcast; salted agg is two-phase") {
    val docs = core.Tables.documents(spark, sf)
    val chunkPlan = planText(ext.TextAnalysis.chunk(docs, "doc_id", "text"))
    assert(chunkPlan.linesIterator.count(_.matches("""\(\d+\) Exchange.*""")) == 0,
      s"chunking must not shuffle:\n$chunkPlan")
    val deconPlan = planText(ext.Dedup.decontaminate(
      docs, "doc_id", "text", col("doc_id") % 20 === 0))
    assert(deconPlan.contains("BroadcastHashJoin"),
      s"the benchmark shingle set must broadcast:\n$deconPlan")
    assert(!deconPlan.contains("SortMergeJoin"),
      s"the 100 TB corpus side must never sort-merge against the bench set:\n$deconPlan")
    val saltedPlan = planText(ext.Skew.saltedSum(
      core.Tables.lineitem(spark, sf), Seq("l_returnflag"), "l_quantity",
      numSalts = 8, saltSource = col("l_orderkey")))
    val exchanges = saltedPlan.linesIterator.count(_.matches("""\(\d+\) Exchange.*"""))
    assert(exchanges == 2,
      s"salted sum is exactly two exchanges (keys+salt, then keys), got $exchanges:\n$saltedPlan")
  }

  test("mixture sample is a scan-time filter; packed corpus plans no theta join") {
    val docs = core.Tables.documents(spark, sf)
    val mixPlan = planText(ext.Sampling.mixtureSample(
      docs, "source", "doc_id", Map("src0" -> 1.0), defaultRate = 0.25))
    assert(mixPlan.linesIterator.count(_.matches("""\(\d+\) Exchange.*""")) == 0,
      s"mixture sampling must not shuffle:\n$mixPlan")
    val packPlan = planText(ext.Curation.packCorpus(docs, "doc_id", "text"))
    assert(!packPlan.contains("CartesianProduct") && !packPlan.contains("NestedLoop"),
      s"curate->chunk->pack must never theta-join:\n$packPlan")
  }

  test("funnel plans only per-user hash aggregates — no windows, no theta joins") {
    val plan = planText(ext.Behavior.funnel(core.Tables.events(spark, sf)))
    assert(!plan.contains("Window"), s"funnel must not sort-window:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"funnel must not theta-join:\n$plan")
    assert(plan.contains("HashAggregate"))
  }

  test("fingerprint is one aggregate exchange; l2-normalize is shuffle-free") {
    val fpPlan = planText(ext.Reconcile.fingerprint(
      core.Tables.orders(spark, sf), Seq(col("o_orderkey")),
      Seq(col("o_orderkey"), col("o_orderstatus"))))
    val fpEx = fpPlan.linesIterator.count(_.matches("""\(\d+\) Exchange.*"""))
    assert(fpEx == 1,
      s"fingerprint is one hash-agg exchange on the bucket id, got $fpEx:\n$fpPlan")
    val nPlan = planText(ext.Similarity.l2NormalizeReport(
      core.Tables.embeddings(spark, sf), "vec_id", "embedding"))
    assert(nPlan.linesIterator.count(_.matches("""\(\d+\) Exchange.*""")) == 0,
      s"l2 normalize must be a pure projection:\n$nPlan")
  }

  test("debounce plans one hash-partition exchange and a partition-local sort") {
    val plan = planText(ext.Behavior.debounce(
      core.Tables.events(spark, sf), deltaSeconds = 3600))
    val exchanges = plan.linesIterator.count(_.matches("""\(\d+\) Exchange.*"""))
    assert(exchanges == 1,
      s"debounce is exactly the secondary-sort shuffle, got $exchanges:\n$plan")
    assert(!plan.contains("Window"),
      s"debounce must not plan a window (sortWithinPartitions only):\n$plan")
  }

  test("fuzzy match hash-joins on the block key — never a nested loop") {
    val plan = planText(ext.Dedup.fuzzyNamePairs(
      core.Tables.part(spark, sf), "p_partkey", "p_name", "p_brand", maxDist = 2))
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"blocked fuzzy matching must not theta-join:\n$plan")
  }

  test("category lift broadcasts totals onto the pair mart") {
    val plan = planText(ext.Association.categoryLift(
      bindings.Conformed.orderRevenue(spark, sf), minSupport = 1))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"category totals and the grand total must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no unbroadcast cartesian allowed:\n$plan")
  }

  test("triangle counting hash-joins degree-oriented edges — no theta join") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val plan = planText(ext.Clusters.triangleCounts(edges))
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"triangle counting must stay hash joins:\n$plan")
  }

  test("BM25 probes broadcast query terms; corpus scalars broadcast too") {
    val plan = planText(ext.Retrieval.bm25Search(
      core.Tables.documents(spark, sf), "doc_id", "text",
      queryModEvery = 50, k = 5))
    assert(!plan.contains("CartesianProduct"),
      s"BM25 must never plan a doc-by-doc product:\n$plan")
    // the query-term probe and the corpus-scalar row both broadcast
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the query-term probe to broadcast:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected the single-row scalar frame to broadcast:\n$plan")
  }

  test("CUSUM plans one hash-partition exchange and a partition-local sort") {
    import spark.implicits._
    val d = (i: Int) => java.sql.Date.valueOf(f"2024-01-$i%02d")
    val rows = (1 to 6).map(i => (1L, d(i), 10.0))
      .toDF("restaurant_id", "creation_date", "total_revenue")
    val plan = planText(ext.Anomaly.cusumShift(rows))
    // the recurrence input: repartition(rid) + sortWithinPartitions —
    // hashpartitioning exchange, sort with global=false
    assert(plan.contains("hashpartitioning(rid"),
      s"expected the per-restaurant repartition:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"a global sort would be a second shuffle:\n$plan")
  }

  test("round-6 additions keep their claimed shapes: equi-joins, partitioned windows, persisted reuse") {
    import spark.implicits._
    // dupNgramShare: inverted-index shape — gram-keyed equi joins only
    val docs = core.Tables.documents(spark, sf)
    val dupPlan = planText(ext.Dedup.dupNgramShare(docs, "doc_id", "text"))
    assert(!dupPlan.contains("CartesianProduct") &&
      !dupPlan.contains("BroadcastNestedLoopJoin"),
      s"dupNgramShare must stay on gram-keyed equi joins:\n$dupPlan")
    // calibrationBins: every ranking window is group-partitioned
    val scored = Seq(("a", 1L, 0.5, true), ("a", 2L, 0.7, false))
      .toDF("src", "id", "score", "gold")
    val calib = ext.Profiling.calibrationBins(
      scored, "src", "id", "score", $"gold", bins = 2)
    val wins = calib.asInstanceOf[org.apache.spark.sql.classic.Dataset[
      org.apache.spark.sql.Row]].queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      "calibration ranking must never run an unpartitioned window")
    // cupedReadout: the per-user frame is persisted — both the pooled
    // and per-variant consumers read the cache, not the event log
    val events = core.Tables.events(spark, sf)
    val cupedDf = ext.Experiment.cupedReadout(
      events, "user_id", "ts", "value", splitTs = "2024-01-16")
    val cupedPlan = planText(cupedDf)
    assert(cupedPlan.contains("InMemoryTableScan"),
      s"cuped consumers must read the persisted per-user frame:\n$cupedPlan")
    // multi-probe IVF: centroids broadcast; the cell join is equi
    val vecs = core.Tables.embeddings(spark, sf)
    val mpPlan = planText(ext.Similarity.ivfTopKMultiProbe(
      vecs, "vec_id", "embedding", k = 2, centroidEvery = 100, nProbe = 2))
    assert(!mpPlan.contains("CartesianProduct"),
      s"multi-probe IVF must never plan a cartesian:\n$mpPlan")
  }

  test("q155-q163 additions keep their claimed shapes") {
    import spark.implicits._
    def windowsPartitioned(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
      val wins = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[
        org.apache.spark.sql.Row]].queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.forall(_.partitionSpec.nonEmpty),
        s"$what must never run an unpartitioned window")
    }
    val d = (i: Int) => java.sql.Date.valueOf(f"2024-01-$i%02d")
    val rev = (1 to 6).map(i => (i.toLong % 2, d(i), 10.0))
      .toDF("restaurant_id", "creation_date", "total_revenue")
    // EWMA + Kaplan-Meier: per-key repartition + partition-local sort,
    // never a global (range) sort; KM's at-risk window is key-partitioned
    val ewmaPlan = planText(ext.Timeseries.ewmaForecast(rev))
    assert(ewmaPlan.contains("hashpartitioning(rid") &&
      !ewmaPlan.contains("rangepartitioning"),
      s"EWMA recurrence must sort within hash partitions:\n$ewmaPlan")
    val km = ext.Survival.kaplanMeier(
      rev.withColumn("user_id", col("restaurant_id") + 10L))
    windowsPartitioned(km, "kaplanMeier")
    val kmPlan = planText(km)
    // the at-risk window's exchange already hash-partitions on the key,
    // so the recurrence's repartition(rid) may be elided as redundant —
    // either way the only partitioning in the plan is by restaurant
    assert((kmPlan.contains("hashpartitioning(rid") ||
        kmPlan.contains("hashpartitioning(restaurant_id")) &&
      !kmPlan.contains("rangepartitioning"),
      s"KM recurrence must stay hash-partitioned by key:\n$kmPlan")
    // funnel latency: the cumulative histogram window is partitioned by
    // transition, quantile targets broadcast onto it
    val ev = core.Tables.events(spark, sf)
    val fl = ext.Behavior.funnelLatencyQuantiles(ev)
    windowsPartitioned(fl, "funnelLatencyQuantiles")
    assert(planText(fl).contains("BroadcastHashJoin"),
      "quantile targets must broadcast onto the histogram")
    // CMS: the probe joins the (depth x width) counter grid via broadcast
    val li = core.Tables.lineitem(spark, sf)
    val cmsPlan = planText(ext.Skew.cmsHeavyHitters(li, col("l_partkey")))
    assert(cmsPlan.contains("BroadcastHashJoin") &&
      !cmsPlan.contains("CartesianProduct"),
      s"CMS probe must broadcast-join the counter grid:\n$cmsPlan")
    assert(cmsPlan.contains("TakeOrderedAndProject"),
      "CMS top-K must be TakeOrdered, not a global sort")
    // covariance: pair sums are generate+hashAggregate — no cartesian
    val vecs = core.Tables.embeddings(spark, sf)
    val covPlan = planText(ext.Profiling.covariancePairs(vecs, "vec_id", "embedding"))
    assert(!covPlan.contains("CartesianProduct"),
      s"covariance must never plan a cartesian:\n$covPlan")
    // stump sweep + AUC: every window partitioned by the group key
    windowsPartitioned(ext.Profiling.bestStumpSplit(
      rev.withColumn("c", lit("x")), "c",
      gold.Money.cents(col("total_revenue")), lit(true)), "bestStumpSplit")
    windowsPartitioned(ext.Profiling.rankAuc(
      Seq(("s", 0.5, true)).toDF("src", "score", "y"),
      "src", col("score"), col("y")), "rankAuc")
  }

  test("sliding distinct plans no explode and no distinct-aggregate expand") {
    import spark.implicits._
    val d = (i: Int) => java.sql.Date.valueOf(f"2024-01-$i%02d")
    val rows = Seq(
      (1L, 10L, d(1)), (1L, 10L, d(3)), (1L, 11L, d(2)), (2L, 10L, d(5)))
      .toDF("restaurant_id", "user_id", "creation_date")
    val plan = planText(gold.Location.slidingDistinctUsers(rows))
    // the round-6 formulation exploded each triple ×windowDays
    // (Generate) and re-deduped inside countDistinct (Expand); the
    // interval-delta rewrite must plan neither
    assert(!plan.contains("Generate"),
      s"delta formulation must not explode window offsets:\n$plan")
    assert(!plan.contains("Expand"),
      s"delta formulation must not carry a distinct-aggregate expand:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"no theta join:\n$plan")
    // both windows are partitioned — never a global ORDER BY window
    assert(!plan.contains("rangepartitioning"),
      s"windows must stay partition-local:\n$plan")
  }

  test("shared scored-postings index: q128/q136/q141 probe ONE cached frame") {
    val scored = bindings.Corpus.scoredPostingsCached(spark, sf)
    val capped = planText(
      ext.Retrieval.bm25FromPostings(scored, queryModEvery = 50, k = 5,
        maxDfFraction = 0.78))
    // both the probe side and the postings side must read the
    // InMemoryRelation, not re-derive tokenize→tf→df from the file scan
    // (the `Scan parquet` nodes inside the InMemoryRelation description
    // are the cache's OWN lineage, not live scans)
    val imts = capped.linesIterator.count(_.contains("InMemoryTableScan"))
    assert(imts >= 2,
      s"expected the probe AND postings sides to read the cached index, got $imts InMemoryTableScan:\n$capped")
    // every parquet scan in the tree must sit INSIDE an InMemoryRelation
    // description (the cache's own lineage, drawn with the node id
    // trailing: `+- Scan parquet  (3)`) — a live scan would appear as a
    // first-class tree node `+- Scan parquet ` with its id in the detail
    // section header instead
    val treeLiveScans = capped.linesIterator
      .takeWhile(l => !l.startsWith("(1)"))
      .count(l => l.contains("+- Scan parquet") && !l.matches(""".*Scan parquet\s+\(\d+\)\s*$"""))
    assert(treeLiveScans == 0,
      s"probe must not rebuild the index from the corpus files ($treeLiveScans live scans):\n$capped")
  }

  test("topKNeighbors probeFilter restricts probes without changing scores") {
    val vecs = core.Tables.embeddings(spark, sf)
    val full = ext.Similarity
      .topKNeighbors(vecs, "vec_id", "embedding", k = 3)
      .filter(pmod(col("vec_id"), lit(50L)) === 0)
    val probed = ext.Similarity.topKNeighbors(vecs, "vec_id", "embedding", k = 3,
      probeFilter = Some(pmod(col("id"), lit(50L)) === 0))
    assert(probed.unionByName(full).except(probed.intersect(full)).isEmpty,
      "probe-filtered neighbor lists must equal the filtered full run")
  }

  test("PQ tier: codebooks broadcast, no theta join anywhere") {
    val vecs = core.Tables.embeddings(spark, sf)
    val enc = planText(ext.Similarity.pqEncode(vecs, "vec_id", "embedding"))
    assert(!enc.contains("NestedLoop") && !enc.contains("CartesianProduct"),
      s"PQ assignment must be a broadcast join, not a product:\n$enc")
    assert(enc.contains("BroadcastHashJoin"),
      s"expected the codebook to broadcast onto the subvectors:\n$enc")
    val adc = planText(ext.Similarity.pqAdcTopK(vecs, "vec_id", "embedding"))
    assert(!adc.contains("NestedLoop") && !adc.contains("CartesianProduct"),
      s"ADC must probe codes via broadcast, never a product:\n$adc")
    assert(adc.contains("BroadcastHashJoin"),
      s"expected the distance table to broadcast onto the code table:\n$adc")
  }

  test("gap fill joins at mart grain with the fact reduced first") {
    val plan = planText(ext.Timeseries.gapFillDaily(
      bindings.Conformed.orderRevenue(spark, sf)))
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"spine join must be equi:\n$plan")
    assert(plan.contains("Generate"), s"expected the sequence explode:\n$plan")
  }

  test("q177-q192 additions keep their claimed shapes") {
    def windowsPartitioned(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
      val wins = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
        .queryExecution.sparkPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }
      assert(wins.forall(_.partitionSpec.nonEmpty),
        s"$what must never run an unpartitioned window")
    }
    val rev = bindings.Conformed.orderRevenue(spark, sf)
    val ev = core.Tables.events(spark, sf)
    // Gini / cohort LTV / sessionization / burstiness / attribution /
    // backtest: every window is key-partitioned
    windowsPartitioned(ext.Olap.revenueGini(rev), "revenueGini")
    windowsPartitioned(ext.Timeseries.cohortLtvCurve(rev), "cohortLtvCurve")
    windowsPartitioned(ext.Behavior.sessionStats(ev), "sessionStats")
    windowsPartitioned(ext.Behavior.interArrivalStats(ev), "interArrivalStats")
    windowsPartitioned(
      ext.Behavior.linearAttribution(ev, Seq("click", "signup", "view")),
      "linearAttribution")
    windowsPartitioned(ext.Timeseries.seasonalNaiveBacktest(rev),
      "seasonalNaiveBacktest")
    // attribution counts every touch type on ONE window sort — a single
    // WindowExec node carries all the conditional sums
    val attr = ext.Behavior.linearAttribution(ev, Seq("click", "signup", "view"))
    val attrWins = attr.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
      .queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
    assert(attrWins.size == 1,
      s"per-type touch counts must share one window, got ${attrWins.size}")
    // FK audit: ALL of a child's checks ride one child scan
    val fk = ext.Quality.fkOrphans(core.Tables.lineitem(spark, sf), "lineitem",
      Seq(("l_orderkey", core.Tables.orders(spark, sf), "o_orderkey", "orders"),
        ("l_partkey", core.Tables.part(spark, sf), "p_partkey", "part"),
        ("l_suppkey", core.Tables.supplier(spark, sf), "s_suppkey", "supplier")))
    val fkPlan = planText(fk)
    val childScans = fkPlan.linesIterator.count(_.contains("lineitem.parquet"))
    assert(childScans == 1,
      s"three FK checks must share one lineitem scan, got $childScans:\n$fkPlan")
    // item CF / association rules: pruned self-join is equi, counts broadcast
    val li = core.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
    for ((df, what) <- Seq(
        (ext.Association.itemSimilarityTopK(li, "basket", "item"), "itemSimilarityTopK"),
        (ext.Association.associationRules(li, "basket", "item"), "associationRules"))) {
      val p = planText(df)
      assert(!p.contains("CartesianProduct"), s"$what must not cross-join:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"$what counts must broadcast:\n$p")
    }
    // keyness: per-label ranking window partitioned; grand total broadcast
    val docs = core.Tables.documents(spark, sf)
    val key = ext.TextAnalysis.tokenKeyness(docs, "text", "lang")
    windowsPartitioned(key, "tokenKeyness")
    // bigram LM: no CartesianProduct (the |V| scalar rides a broadcast NL)
    val blm = planText(ext.TextAnalysis.bigramLmScore(docs, "doc_id", "text"))
    assert(!blm.contains("CartesianProduct"),
      s"bigram LM must not plan a cartesian:\n$blm")
    // elasticity: dim join broadcasts, single hash aggregate, no window
    val pe = planText(ext.Timeseries.priceElasticity(
      core.Tables.lineitem(spark, sf), core.Tables.part(spark, sf)))
    assert(pe.contains("BroadcastHashJoin") && !pe.contains("Window"),
      s"elasticity is one broadcast join + aggregates:\n$pe")
  }

  test("q193-q213 additions keep their claimed shapes") {
    def windowsPartitioned(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
      val wins = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
        .queryExecution.sparkPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }
      assert(wins.forall(_.partitionSpec.nonEmpty),
        s"$what must never run an unpartitioned window")
    }
    val rev = bindings.Conformed.orderRevenue(spark, sf)
    val ev = core.Tables.events(spark, sf)
    // Holt: the recurrence stays hash-partitioned by key (the EWMA rule)
    val holt = planText(ext.Timeseries.holtForecast(rev))
    assert(holt.contains("hashpartitioning(rid") &&
      !holt.contains("rangepartitioning"),
      s"Holt recurrence must sort within hash partitions:\n$holt")
    // sequence support: user-grain equi self-join, no theta join
    val seq = planText(ext.Behavior.sequenceSupport(ev))
    assert(!seq.contains("CartesianProduct") && !seq.contains("NestedLoop")
      || seq.contains("BroadcastNestedLoop"), // the scalar totals ride a broadcast NL
      s"sequence support must join user-grain equi:\n$seq")
    // session marts: one window sort each, partitioned
    windowsPartitioned(ext.Behavior.sessionConversion(ev), "sessionConversion")
    // Zipf / elasticity / fisher: no cartesian anywhere
    val docs = core.Tables.documents(spark, sf)
    for ((p, what) <- Seq(
        (planText(ext.TextAnalysis.zipfFit(docs, "source", "text")), "zipfFit"),
        (planText(ext.Profiling.fisherSeparability(
          core.Tables.embeddings(spark, sf), "embedding", "label")),
          "fisherSeparability")))
      assert(!p.contains("CartesianProduct"), s"$what plans a cartesian:\n$p")
    // IVF-PQ: probe list and distance tables broadcast; no cartesian
    val ivfpq = planText(ext.Similarity.ivfPqTopK(
      core.Tables.embeddings(spark, sf), "vec_id", "embedding"))
    assert(!ivfpq.contains("CartesianProduct"),
      s"IVF-PQ must not plan a cartesian:\n$ivfpq")
    assert(ivfpq.contains("BroadcastHashJoin"),
      "IVF-PQ probe/table joins must broadcast")
    // incremental covariance: the merge is a union of partial aggregates
    val inc = planText(ext.Profiling.covariancePairsIncremental(
      core.Tables.embeddings(spark, sf), "vec_id", "embedding",
      isDelta = col("vec_id") % 10 === 0))
    assert(inc.contains("Union") && !inc.contains("CartesianProduct"),
      s"incremental covariance must merge partial unions:\n$inc")
    // regional league: every dim join broadcasts
    val league = planText(gold.Geography.regionalLeague(
      rev, core.Tables.supplier(spark, sf),
      core.Tables.nation(spark, sf), core.Tables.region(spark, sf)))
    assert(league.contains("BroadcastHashJoin"),
      s"dim chain must broadcast:\n$league")
    windowsPartitioned(gold.Geography.regionalLeague(
      rev, core.Tables.supplier(spark, sf),
      core.Tables.nation(spark, sf), core.Tables.region(spark, sf)),
      "regionalLeague")
  }

  test("q224-q236 additions keep their claimed shapes") {
    def windowsPartitioned(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
      val wins = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
        .queryExecution.sparkPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }
      assert(wins.forall(_.partitionSpec.nonEmpty),
        s"$what must never run an unpartitioned window")
    }
    val li = core.Tables.lineitem(spark, sf)
    val ord = core.Tables.orders(spark, sf)
    val sup = core.Tables.supplier(spark, sf)
    val nat = core.Tables.nation(spark, sf)
    val reg = core.Tables.region(spark, sf)
    val rev = bindings.Conformed.orderRevenue(spark, sf)
    // supply tier: dim chains broadcast, fact joins are equi (no theta)
    val mcs = ext.Supply.minCostSupplier(li, sup, nat, reg)
    val mcsPlan = planText(mcs)
    assert(mcsPlan.contains("BroadcastHashJoin"),
      s"supplier/nation/region chain must broadcast:\n$mcsPlan")
    assert(!mcsPlan.contains("CartesianProduct"))
    windowsPartitioned(mcs, "minCostSupplier")
    for ((p, what) <- Seq(
        (planText(ext.Supply.latePriorityAudit(ord, li, 21)), "latePriorityAudit"),
        (planText(ext.Supply.supplierReliability(li, ord, sup, 21)),
          "supplierReliability"),
        (planText(ext.Supply.smallQuantityRevenue(li, core.Tables.part(spark, sf))),
          "smallQuantityRevenue")))
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
        s"$what must stay equi-join only:\n$p")
    // dormant sweep: the recent-orders exclusion is a real anti join
    val dorm = planText(ext.Supply.dormantHighValue(
      core.Tables.customer(spark, sf), ord, 90))
    assert(dorm.contains("LeftAnti"), s"expected an anti join:\n$dorm")
    // stats tier: windows stay partitioned; xcorr has no window at all
    windowsPartitioned(ext.Experiment.loyaltyMannWhitney(rev), "mannWhitney")
    windowsPartitioned(ext.Timeseries.hampelOutliers(rev), "hampelOutliers")
    val ev = core.Tables.events(spark, sf)
    val xc = ext.Behavior.eventXcorr(ev, "view", "purchase")
    assert(xc.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
        .queryExecution.sparkPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }.isEmpty,
      "eventXcorr pairs via time-shifted equi-join, not a window")
    // value tier: one user aggregate, no cartesian beyond the 1-row
    // scalar broadcast; wallet deciles plan no window
    val dv = planText(ext.Olap.decayedCustomerValue(rev))
    assert(!dv.contains("CartesianProduct"), s"decayed value:\n$dv")
    windowsPartitioned(ext.Olap.walletShareDeciles(rev), "walletShareDeciles")
  }

  test("rankedRetrievalEval broadcasts the discount table; every window stays probe-partitioned") {
    val df = ext.Similarity.rankedRetrievalEval(
      core.Tables.embeddings(spark, sf), "vec_id", "embedding",
      k = 5, centroidEvery = 100)
    // the k-row position-discount join must broadcast, never shuffle
    assert(planText(df).contains("BroadcastHashJoin"),
      "expected the discount join to broadcast")
    // everything after the (by-spec exact + cell-bounded IVF) scorers is
    // probes*k-row hash aggregation; the scorers' own rank windows are
    // per-probe — nothing in the plan may funnel into one partition
    val wins = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
      .queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "rankedRetrievalEval must never run an unpartitioned window")
  }

  test("oovRate's vocab cut is a distributed partial top-V, and no window funnels to one partition") {
    val df = ext.TextAnalysis.oovRate(
      core.Tables.documents(spark, sf), "doc_id", "text", "lang")
    val txt = planText(df)
    assert(txt.contains("TakeOrderedAndProject"),
      s"top-V vocab must be a partial sort, not a global one:\n$txt")
    val wins = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
      .queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
    assert(wins.isEmpty, "oovRate must not use windows at all")
    assert(txt.contains("BroadcastHashJoin"),
      "the V-row vocab must broadcast onto the test tokens")
  }

  test("changepoint and holtWintersForecast keep every window key-partitioned") {
    val rev = core.Tables.lineitem(spark, sf)
      .select(col("l_suppkey").as("restaurant_id"),
        col("l_shipdate").cast("date").as("creation_date"),
        col("l_extendedprice").as("total_revenue"))
    Seq(
      ext.Timeseries.changepoint(rev),
      ext.Timeseries.holtWintersForecast(rev)
    ).foreach { df =>
      val wins = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
        .queryExecution.sparkPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }
      assert(wins.forall(_.partitionSpec.nonEmpty),
        "series operators must never run an unpartitioned window")
    }
  }

  test("pricingSummary pushes the ship-date filter to the scan and aggregates in one exchange") {
    val df = gold.Fulfillment.pricingSummary(
      core.Tables.lineitem(spark, sf), "1998-09-02")
    val txt = planText(df)
    assert(txt.contains("PushedFilters: [IsNotNull(l_shipdate)")
      || txt.contains("LessThanOrEqual(l_shipdate"),
      s"cutoff must reach the parquet scan:\n$txt")
    val exchanges = """\(\d+\) Exchange\b""".r.findAllIn(txt).size
    assert(exchanges <= 2,
      s"Q1 is one partial+final aggregate plus the sort:\n$txt")
  }

  test("every remaining unpartitioned window sits above an aggregate (mix/bin-grain mart, never raw facts)") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    Seq("q71_psi_drift", "q72_ks_drift", "q157_token_plan",
        "q172_temperature_mix").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      val wins = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
        .queryExecution.sparkPlan.collect { case w: WindowExec => w }
      wins.filter(_.partitionSpec.isEmpty).foreach { w =>
        assert(w.child.collectFirst { case a: BaseAggregateExec => a }.nonEmpty,
          s"$name: an empty-partition window must consume a post-aggregate " +
            s"mart (bins/sources grain), never raw rows:\n$w")
      }
    }
  }

  test("exactSubstringDedup: every coverage window is doc-partitioned and no join is a cartesian") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = ext.Dedup.exactSubstringDedup(
      core.Tables.documents(spark, sf), "doc_id", "text")
    val txt = planText(df)
    assert(!txt.contains("CartesianProduct") && !txt.contains("NestedLoop"),
      s"span dedup must never plan a cartesian:\n$txt")
    val wins = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
      .queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      "coverage/flag windows must stay doc-partitioned")
  }

  test("shareOfParent broadcasts the market total — no unpartitioned window in the plan") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = SparkEntry.queries("q257_share_of_parent")(spark, sf)
    val wins = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
      .queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      "the market-total window must be the scalar-broadcast crossJoin")
    assert(planText(df).contains("BroadcastNestedLoopJoin"),
      "the one-row market total must broadcast onto the mart")
  }

  test("localSupplierVolume pushes the order-year range to the orders scan") {
    val df = gold.Fulfillment.localSupplierVolume(
      core.Tables.lineitem(spark, sf), core.Tables.orders(spark, sf),
      core.Tables.customer(spark, sf), core.Tables.supplier(spark, sf),
      core.Tables.nation(spark, sf), core.Tables.region(spark, sf),
      regionName = "ASIA", orderYear = 1997)
    val txt = planText(df)
    // the half-open range (not year(col)) reaches the parquet scan and
    // prunes row groups; year(col)==y would read every order
    assert(txt.contains("GreaterThanOrEqual(o_orderdate")
      && txt.contains("LessThan(o_orderdate"),
      s"order-year range must reach the orders scan:\n$txt")
  }

  test("q102 set-ops push the half-open year ranges to the orders scans") {
    val df = SparkEntry.queries("q102_set_ops")(spark, sf)
    val txt = planText(df)
    assert(txt.contains("GreaterThanOrEqual(o_orderdate")
      && txt.contains("LessThan(o_orderdate"),
      s"year ranges must reach the orders scans:\n$txt")
  }

  test("q313-q315 additions keep their claimed shapes") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.window.WindowExec
    // a .persist() hides its subtree behind InMemoryTableScan — recurse
    // into cached plans so windows under the cache cut are still seen
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def planWindows(p: SparkPlan): Seq[WindowExec] =
      p.collect {
        case w: WindowExec => Seq(w)
        case s: InMemoryTableScanExec => planWindows(s.relation.cachedPlan)
        case a: AdaptiveSparkPlanExec => planWindows(a.inputPlan)
      }.flatten
    def windows(df: org.apache.spark.sql.DataFrame): Seq[WindowExec] =
      planWindows(df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
        .queryExecution.sparkPlan)
    // bootstrap: replicate ranking stays arm-partitioned; nothing cartesian
    val boot = SparkEntry.queries("q313_bootstrap_ci")(spark, sf)
    val bw = windows(boot)
    assert(bw.nonEmpty && bw.forall(_.partitionSpec.nonEmpty),
      "replicate ranking must stay arm-partitioned")
    assert(!planText(boot).contains("CartesianProduct"),
      "the bootstrap must never plan a cartesian")
    // shapley: ONE user-partitioned window carries all channel counts
    // (the linearAttribution device); the lattice above it is 2^n-sized
    val shap = SparkEntry.queries("q314_shapley_attribution")(spark, sf)
    // the cached mask aggregate is consumed by several branches, so the
    // one window subtree surfaces once per cache reference — distinct it
    val sw = windows(shap).distinct
    assert(sw.size == 1 && sw.head.partitionSpec.nonEmpty,
      "all per-type counts must ride ONE user-partitioned window")
    // silhouette: centroids broadcast onto points; no window anywhere
    val sil = SparkEntry.queries("q315_silhouette")(spark, sf)
    val txt = planText(sil)
    assert(txt.contains("BroadcastNestedLoopJoin"),
      "the bounded centroid table must broadcast onto the points")
    assert(!txt.contains("CartesianProduct"),
      s"silhouette must never plan a shuffle cartesian:\n$txt")
  }

  test("q317-q333 statistics/linkage tier keeps its claimed shapes") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    import org.apache.spark.sql.execution.window.WindowExec
    // recurse through persist() cache cuts so hidden subtrees count too
    def ops(p: SparkPlan): Seq[SparkPlan] = p.collect {
      case s: InMemoryTableScanExec => s +: ops(s.relation.cachedPlan)
      case a: AdaptiveSparkPlanExec => a +: ops(a.inputPlan)
      case x => Seq(x)
    }.flatten
    def shapes(name: String): (Seq[WindowExec], Boolean) = {
      val all = ops(SparkEntry.queries(name)(spark, sf)
        .asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
        .queryExecution.sparkPlan)
      (all.collect { case w: WindowExec => w },
        all.exists(_.isInstanceOf[CartesianProductExec]))
    }
    val tier = Seq("q317_isotonic", "q318_bh_fdr", "q319_good_turing",
      "q320_prefix_jaccard", "q321_mann_kendall", "q322_cmh",
      "q323_fellegi_sunter", "q324_overdispersion", "q325_ljung_box",
      "q326_lexical_richness", "q327_capture_recapture", "q328_runs_test",
      "q329_theil", "q330_hubness", "q331_price_index", "q332_mcnemar",
      "q333_burstiness", "q335_entropy_rate", "q336_ks_two_sample")
    tier.foreach { name =>
      val (wins, cartesian) = shapes(name)
      assert(!cartesian, s"$name must never plan a shuffle cartesian")
      // any unpartitioned window must sit on a post-aggregate mart
      // (recurse through persist() cuts: the mart may be cached)
      wins.filter(_.partitionSpec.isEmpty).foreach { w =>
        assert(ops(w.child).exists(_.isInstanceOf[BaseAggregateExec]),
          s"$name: empty-partition window over raw rows:\n$w")
      }
    }
    // the per-restaurant lag windows stay restaurant-partitioned
    Seq("q320_prefix_jaccard", "q325_ljung_box", "q328_runs_test")
      .foreach { name =>
        val (wins, _) = shapes(name)
        assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
          s"$name: windows must stay entity-partitioned")
      }
    // the pure-aggregate operators plan no window at all
    Seq("q319_good_turing", "q321_mann_kendall", "q322_cmh",
        "q324_overdispersion", "q326_lexical_richness", "q329_theil",
        "q330_hubness", "q331_price_index", "q332_mcnemar",
        "q333_burstiness").foreach { name =>
      val (wins, _) = shapes(name)
      assert(wins.isEmpty, s"$name must plan no window at all")
    }
    // round-10 additions (q339 is a streaming replay — building its
    // frame EXECUTES the stream, so it is gated by the oracle, not
    // plan-asserted here; q334's rank window runs on the <= kmax+1
    // TakeOrdered mart, which is persist()-cached, hence the
    // post-aggregate check recursing through cache cuts)
    Seq("q334_hill_tail", "q337_audio_decode", "q338_attribution_capped")
      .foreach { name =>
        val (wins, cartesian) = shapes(name)
        assert(!cartesian, s"$name must never plan a shuffle cartesian")
        wins.filter(_.partitionSpec.isEmpty).foreach { w =>
          assert(ops(w.child).exists(_.isInstanceOf[BaseAggregateExec]),
            s"$name: empty-partition window over raw rows:\n$w")
        }
      }
    // q338's day-rank pre-cap window must stay entity-partitioned
    // (user, day) — the whole point of the hot-key mitigation
    locally {
      val (wins, _) = shapes("q338_attribution_capped")
      assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
        "q338: the pre-cap window must stay (user, day)-partitioned")
    }
    // q337 is a straight mapPartitions decode: no window, no join
    locally {
      val (wins, _) = shapes("q337_audio_decode")
      assert(wins.isEmpty, "q337 must plan no window at all")
    }
  }

  test("q316 EB shrinkage: broadcast scalar prior, no window, no cartesian") {
    val df = SparkEntry.queries("q316_eb_shrinkage")(spark, sf)
    val txt = planText(df)
    // the 1-row moment aggregate returns to the restaurant mart via a
    // broadcast nested-loop (the scalar-broadcast crossJoin idiom) —
    // never a shuffle cartesian, and no window anywhere in the plan
    assert(txt.contains("BroadcastNestedLoopJoin"),
      s"the moment aggregate must broadcast onto the restaurant mart:\n$txt")
    assert(!txt.contains("CartesianProduct"),
      s"EB shrinkage must never plan a shuffle cartesian:\n$txt")
    assert(!txt.contains("Window"),
      s"EB shrinkage needs no window (two hash aggregates only):\n$txt")
  }

  test("q340 rate cap: the ranking window stays (entity, day)-partitioned; no join, no cartesian") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    // both faces: the kept-frame operator and the gated manifest
    val ev = core.Tables.events(spark, sf)
    Seq(
      ext.Curation.eventRateCap(ev, "user_id", "event_id", "ts", 3),
      SparkEntry.queries("q340_event_rate_cap")(spark, sf)
    ).foreach { df =>
      val plan = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
        .queryExecution.sparkPlan
      val wins = plan.collect { case w: WindowExec => w }
      assert(wins.nonEmpty, s"expected a ranking window:\n$plan")
      // the row_number windows must stay entity-partitioned (the
      // hot-key dilution grain); the manifest's share window is
      // class-partitioned — also non-empty. NO empty partitionSpec.
      assert(wins.forall(_.partitionSpec.nonEmpty),
        s"rate-cap windows must never be global:\n$plan")
      assert(plan.collect { case j: BaseJoinExec => j }.isEmpty &&
        !plan.toString.contains("CartesianProduct"),
        s"the rate cap is window-only — no join:\n$plan")
    }
  }

  test("impactTruncate: stage-1 window partitions on (term, salt), stage-2 on term alone") {
    import org.apache.spark.sql.execution.window.WindowExec
    // the hot-term funnel fix: the first (inner) row_number must rank
    // inside (term, doc_id mod salts) slices — bounding any partition's
    // sort by df/salts — and only the bounded survivors (≤ salts·M per
    // term) reach the bare per-term window
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val scored = ext.Retrieval.scoredPostings(docs, "doc_id", "text")
    val plan = ext.Retrieval.impactTruncate(scored, 5)
      .asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
      .queryExecution.sparkPlan
    val wins = plan.collect { case w: WindowExec => w }
    assert(wins.size == 2, s"expected the two-stage window pair:\n$plan")
    // collect order is outer-first: wins.head is the per-term re-rank,
    // wins.last the salted stage
    assert(wins.last.partitionSpec.size == 2,
      s"stage 1 must partition on (term, salt):\n$plan")
    assert(wins.head.partitionSpec.size == 1,
      s"stage 2 must re-rank per term alone:\n$plan")
  }

  test("jaroWinklerPairs: the join condition's And tree keeps the cheap conjuncts before JaroWinklerGte") {
    // The 1.8x constant cut relies on the cheap prefilters (id order,
    // length band, char-mask intersection) evaluating BEFORE the
    // O(len*window) JW predicate inside ONE join condition. That order
    // was OBSERVED to survive optimization on the pinned Spark version
    // but is not a cross-version guarantee — this assertion turns a
    // silent perf regression on upgrade into a red test.
    import org.apache.spark.sql.catalyst.expressions.{And, Expression => CExpr}
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"),
        substring(col("text"), 0, 24).as("nm"))
    val df = ext.Dedup.jaroWinklerPairs(docs, "doc_id", "nm", "lang", 0.9)
    val plan = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
      .queryExecution.sparkPlan
    def conjuncts(e: CExpr): Seq[CExpr] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val joins = plan.collect {
      case j: BaseJoinExec if j.condition.exists(
        _.exists(_.isInstanceOf[graft.functions.JaroWinklerGte])) => j
    }
    assert(joins.nonEmpty, s"no join carries the JW predicate:\n$plan")
    joins.foreach { j =>
      val cs = conjuncts(j.condition.get)
      val jwIdx = cs.indexWhere(
        _.exists(_.isInstanceOf[graft.functions.JaroWinklerGte]))
      assert(jwIdx == cs.length - 1,
        s"JaroWinklerGte must be the LAST conjunct, found at $jwIdx of ${cs.length}:\n${cs.mkString("\n")}")
      assert(jwIdx >= 1, "the cheap prefilter conjuncts must precede JW")
    }
  }

  private def withSQLConf[A](pairs: (String, String)*)(f: => A): A = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
