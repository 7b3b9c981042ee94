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
}
