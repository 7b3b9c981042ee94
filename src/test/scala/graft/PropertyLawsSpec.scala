package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based pins for the engine's cross-cutting invariants —
  * the laws every gated query leans on, checked over RANDOM inputs
  * rather than the hand-picked cases the unit specs carry. Spark work
  * is batched: each law generates its whole case set up front and
  * evaluates it in O(1) jobs, so a hundred random cases cost one scan.
  */
class PropertyLawsSpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(60)

  private def check(prop: Prop, label: String): Unit = {
    val r = SCTest.check(params, prop)
    assert(r.passed, s"$label: ${r.status}")
  }

  test("the half-up micro-ratio idiom equals BigDecimal HALF_UP division at 6dp for any non-negative a/b") {
    val gen = for {
      a <- Gen.chooseNum(0L, 4000000000L)
      b <- Gen.chooseNum(1L, 4000000L)
    } yield (a, b)
    check(Prop.forAll(gen) { case (a, b) =>
      val idiom = (a * 1000000L * 2 + b) / (b * 2)
      val ref = BigDecimal(a).bigDecimal
        .divide(java.math.BigDecimal.valueOf(b), 6,
          java.math.RoundingMode.HALF_UP)
        .movePointRight(6).longValueExact()
      idiom == ref
    }, "micro-ratio")
  }

  test("TopKAggregate equals the sort-based reference (score desc, id asc) on random groups — one Spark job for all cases") {
    val gen = Gen.listOfN(400,
      for {
        g <- Gen.chooseNum(0, 25)
        s <- Gen.chooseNum(-100, 100)
        id <- Gen.chooseNum(0L, 30L)
      } yield (g, s.toDouble, id))
    // one row per (group, id): the law compares against a reference
    // ranking keyed on ids, so duplicate ids would make both sides
    // ambiguous in the same way and prove nothing
    val rows = gen.sample.get
      .groupBy(r => (r._1, r._3)).map(_._2.head).toSeq
    val k = 4
    val df = rows.toDF("g", "s", "id")
    val got = df.groupBy(col("g"))
      .agg(graft.functions.TopKAggregate.top_k(col("s"), col("id"), k)
        .as("topk"))
      .select(col("g"), expr("transform(topk, e -> struct(e.id, e.score))")
        .as("kept"))
      .as[(Int, Seq[(Long, Double)])].collect().toMap
    val ref = rows.groupBy(_._1).map { case (g, rs) =>
      // the aggregate's contract: ties on score break id-ASC, and a
      // (score, id) pair appearing twice is kept twice
      g -> rs.map(r => (r._3, r._2)).sortBy { case (id, s) => (-s, id) }
        .take(k)
    }
    assert(got.keySet == ref.keySet)
    got.foreach { case (g, kept) =>
      assert(kept == ref(g), s"group $g: $kept vs ${ref(g)}")
    }
  }

  test("integer-unit money sums are layout-independent: any repartitioning yields the identical cent total") {
    val amounts = Gen.listOfN(500, Gen.chooseNum(-100000.0, 100000.0))
      .sample.get.map(a => math.rint(a * 100) / 100)
    val df = amounts.toDF("v")
    def total(d: org.apache.spark.sql.DataFrame): Long =
      d.agg(sum(graft.gold.Money.cents(col("v")).cast("long")))
        .as[Long].collect().head
    val base = total(df)
    assert(total(df.repartition(17)) == base)
    assert(total(df.repartition(1)) == base)
    assert(total(df.orderBy(col("v").desc)) == base)
  }

  test("Portable.h60Local equals the column-side h60 for arbitrary printable strings — one job") {
    val strs = Gen.listOfN(200, Gen.asciiPrintableStr.map(_.take(40)))
      .sample.get.distinct
    val df = strs.toDF("s")
      .select(col("s"), graft.functions.Portable.h60(col("s")).as("h"))
      .as[(String, Long)].collect().toMap
    strs.foreach { s =>
      assert(df(s) == graft.functions.Portable.h60Local(s),
        s"h60 mismatch for '$s'")
    }
  }

  test("CDC roundtrip law: merge(prev, diff(cur, prev)) reproduces cur, for random keyed tables") {
    val tableGen = Gen.listOfN(30, for {
      k <- Gen.chooseNum(0L, 14L)
      a <- Gen.chooseNum(0, 5)
      b <- Gen.alphaStr.map(_.take(3))
    } yield (k, a, b)).map(_.groupBy(_._1).map(_._2.head).toSeq)
    val cases = Gen.listOfN(6, Gen.zip(tableGen, tableGen)).sample.get
    cases.zipWithIndex.foreach { case ((prevRows, curRows), i) =>
      val prev = prevRows.toDF("k", "a", "b")
      val cur = curRows.toDF("k", "a", "b")
      val changes = graft.cdc.SnapshotDiff(cur, prev, Seq("k"))
      val rebuilt = graft.cdc.CdcApply.merge(prev, changes, Seq("k"))
        .select("k", "a", "b")
      val missing = cur.except(rebuilt).count()
      val extra = rebuilt.except(cur).count()
      assert(missing == 0 && extra == 0,
        s"case $i: roundtrip lost $missing / invented $extra rows")
    }
  }

  test("canonicalization law: Spark round(x*U) quantization equals the BigDecimal HALF_UP reference on adversarial doubles (-0.0, halves, 17-digit) — one job") {
    val edge = Seq(-0.0, 0.0, 0.5e-9, -0.5e-9, 1.5e-9, 2.5e-9, -1.5e-9,
      0.1234567890123456, -0.9999999999999999, 1.7976931348623157,
      123456789.12345678)
    val rnd = Seq.tabulate(300)(i =>
      (graft.functions.Portable.h60Local(s"canon-$i") % 20000001L - 10000000L) / 1e6)
    val xs = edge ++ rnd
    val got = xs.toDF("x")
      .select(round(col("x") * 1e9).cast("long").as("q"))
      .as[Long].collect().toSeq
    val want = xs.map(x => BigDecimal(x * 1e9)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    assert(got == want)
  }

  test("canonicalization law: the A&S 7.1.26 erfc chain as a Spark Column equals the driver-side double chain (1e-9 quantized) — one job") {
    // identical literals, identical operation order — the law pins that
    // Catalyst codegen neither reassociates nor constant-folds the
    // floating chain differently from plain JVM evaluation
    val zs = Seq(0L, 1L, 500000L, 1000000L, 1234567L, 1959964L, 2575829L,
      3890592L) ++ Seq.tabulate(200)(i =>
      math.abs(graft.functions.Portable.h60Local(s"erfc-$i")) % 5000001L)
    val df = zs.toDF("zq").select((col("zq") / 1e6).as("z"))
      .withColumn("tt", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("z")))
      .select(round(((((lit(1.061405429) * col("tt") - lit(1.453152027)) * col("tt")
          + lit(1.421413741)) * col("tt") - lit(0.284496736)) * col("tt")
          + lit(0.254829592)) * col("tt")
        * exp(-(col("z") * col("z"))) * 1e9).cast("long").as("pu"))
    val got = df.as[Long].collect().toSeq
    val want = zs.map { zq =>
      val z = zq / 1e6
      val t = 1.0 / (1.0 + 0.3275911 * z)
      val poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
        - 0.284496736) * t + 0.254829592) * t
      BigDecimal(poly * math.exp(-(z * z)) * 1e9)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    assert(got == want)
  }

  test("canonicalization law: embedding quantization transform(round(x*1000)) equals the float->double reference incl. -0.0 and exact halves — one job") {
    val edge = Seq(-0.0f, 0.0005f, -0.0005f, 0.0015f, 1.5f, -2.5f)
    val rnd = Seq.tabulate(100)(i =>
      (graft.functions.Portable.h60Local(s"vec-$i") % 2000001L - 1000000L) / 1e6f)
    val vec = (edge ++ rnd).toArray
    val got = Seq(vec).toDF("v")
      .select(transform(col("v"),
        x => round(x.cast("double") * 1000).cast("long")).as("q"))
      .as[Seq[Long]].collect().head
    val want = vec.toSeq.map(x => BigDecimal(x.toDouble * 1000)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    assert(got == want)
  }

  test("JW prefilter law: round(jw,6) >= 0.9 implies the length-ratio floor AND char-mask overlap — the filter rejects nothing above threshold") {
    import graft.functions.{CharMaskAlgo, JaroWinklerAlgo, StringSimilarity}
    import org.apache.spark.unsafe.types.UTF8String
    val floor = StringSimilarity.jaroFloor(0.9)
    // near-identical pairs (perturbed copies) so the >= 0.9 region is
    // actually exercised, plus fully random pairs for the reject side
    val charGen = Gen.oneOf('a', 'b', 'c', 'd', ' ')
    val strGen = Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))
    val perturbed = for {
      s <- strGen
      drop <- Gen.chooseNum(0, 1)
      add <- Gen.listOfN(1, charGen).map(_.mkString)
      t = (if (drop == 1 && s.nonEmpty) s.tail else s) + add
    } yield (s, t)
    val pairGen = Gen.oneOf(perturbed, Gen.zip(strGen, strGen))
    check(Prop.forAll(pairGen) { case (s, t) =>
      val jw = JaroWinklerAlgo.similarity(
        UTF8String.fromString(s), UTF8String.fromString(t))
      val above = BigDecimal(jw).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble >= 0.9
      val lenOk = math.min(s.length, t.length).toDouble >=
        floor * math.max(s.length, t.length) - 1e-9
      val maskOk = (CharMaskAlgo.mask(UTF8String.fromString(s)) &
        CharMaskAlgo.mask(UTF8String.fromString(t))) != 0L
      !above || (lenOk && maskOk)
    }, "jw-prefilter-lossless")
  }

  test("JaroWinklerGte law: gte(a,b,t) equals round(similarity(a,b),6) >= t for random thresholds — the early aborts change nothing") {
    import graft.functions.{JaroWinklerAlgo, JaroWinklerGteAlgo}
    import org.apache.spark.unsafe.types.UTF8String
    val charGen = Gen.oneOf('a', 'b', 'c', 'd', ' ')
    val strGen = Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))
    val perturbed = for {
      s <- strGen
      drop <- Gen.chooseNum(0, 1)
      add <- Gen.listOfN(1, charGen).map(_.mkString)
      t = (if (drop == 1 && s.nonEmpty) s.tail else s) + add
    } yield (s, t)
    val caseGen = for {
      p <- Gen.oneOf(perturbed, Gen.zip(strGen, strGen))
      thr <- Gen.oneOf(Gen.chooseNum(0.0, 1.0),
        Gen.oneOf(0.0, 0.7, 0.8, 0.9, 0.95, 1.0))
    } yield (p._1, p._2, thr)
    check(Prop.forAll(caseGen) { case (s, t, thr) =>
      val ua = UTF8String.fromString(s)
      val ub = UTF8String.fromString(t)
      val ref = BigDecimal(JaroWinklerAlgo.similarity(ua, ub))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble >= thr
      JaroWinklerGteAlgo.gte(ua, ub, thr) == ref
    }, "jw-gte-equivalence")
  }

  test("jaroWinklerPairs equals the unfiltered brute-force pair scan on random blocked names — the prefilter changes nothing") {
    val names = Gen.listOfN(40, for {
      blk <- Gen.chooseNum(0, 2)
      s <- Gen.chooseNum(1, 10).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('x', 'y', 'z')).map(_.mkString))
    } yield (blk, s)).sample.get
      .zipWithIndex.map { case ((blk, s), i) => (i.toLong, s, blk) }
    val df = names.toDF("id", "name", "block")
    val got = graft.ext.Dedup.jaroWinklerPairs(df, "id", "name", "block", 0.9)
      .select("id_a", "id_b", "jw")
      .as[(Long, Long, Double)].collect().toSet
    val slim = df.select(col("block"), col("id").as("id_a"), col("name").as("name_a"))
      .join(df.select(col("block"), col("id").as("id_b"), col("name").as("name_b")), Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jw", round(
        graft.functions.StringSimilarity.jaroWinkler(col("name_a"), col("name_b")), 6))
      .filter(col("jw") >= 0.9)
      .select("id_a", "id_b", "jw")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == slim)
    assert(slim.nonEmpty, "generator must exercise the >= 0.9 region")
  }
}
