package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit pins for the demand-pattern quadrants and the Coleman–Liau
  * readability audit. */
class DemandReadabilitySpec extends SparkSpec {
  import spark.implicits._

  private val ts = (s: String) => java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("demandClasses: each Syntetos-Boylan quadrant and the one-shot class land where the integer boundaries say") {
    val part = Seq((1L, "B"), (2L, "B"), (3L, "B"), (4L, "B"), (5L, "B"))
      .toDF("p_partkey", "p_brand")
    val lines = Seq(
      // part 1: 4 consecutive days, equal sizes -> ADI=1, CV2=0 -> smooth
      (1L, 5.0, ts("1997-01-01")), (1L, 5.0, ts("1997-01-02")),
      (1L, 5.0, ts("1997-01-03")), (1L, 5.0, ts("1997-01-04")),
      // part 2: 2 demand days over a 10-day span, equal sizes ->
      // ADI=5, CV2=0 -> intermittent
      (2L, 5.0, ts("1997-01-01")), (2L, 5.0, ts("1997-01-10")),
      // part 3: dense days, wildly varying sizes -> erratic
      (3L, 1.0, ts("1997-01-01")), (3L, 100.0, ts("1997-01-02")),
      // part 4: sparse days AND varying sizes -> lumpy
      (4L, 1.0, ts("1997-01-01")), (4L, 100.0, ts("1997-01-20")),
      // part 5: single demand day -> one-shot
      (5L, 7.0, ts("1997-01-01")),
    ).toDF("l_partkey", "l_quantity", "l_shipdate")
    val got = Supply.demandClasses(lines, part)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("B", "erratic", 1L, 101L),
      ("B", "intermittent", 1L, 10L),
      ("B", "lumpy", 1L, 101L),
      ("B", "one-shot", 1L, 7L),
      ("B", "smooth", 1L, 20L)))
  }

  test("demandClasses: the ADI boundary itself (1.32 exactly) classifies as high — span*100 >= nd*132") {
    val part = Seq((1L, "B")).toDF("p_partkey", "p_brand")
    // 25 demand days over a 33-day span: ADI = 33/25 = 1.32 exactly
    val days = (1 to 24) :+ 33
    val lines = days.map { d =>
      (1L, 5.0, java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(1997, 1, 1).plusDays(d - 1).atStartOfDay()))
    }.toDF("l_partkey", "l_quantity", "l_shipdate")
    val got = Supply.demandClasses(lines, part)
      .select("demand_class").as[String].collect().toSeq
    assert(got == Seq("intermittent"),
      "ADI exactly 1.32 must be the high side of the boundary")
  }

  test("readability: hand-computed CLI for a one-doc source; whitespace-only text floors at the formula constant") {
    val docs = Seq(
      ("s1", "Hi there."),   // chars 8, words 2, sentences 1 -> CLI -7.08
      ("s2", "   "),         // splits to empty tokens: c=0, s=0 -> -15.8
    ).toDF("source", "text")
    val got = TextAnalysis.readability(docs, "text", "source")
      .as[(String, Long, Double, Double)].collect().toSeq
    // sign-aware half-up: a negative single value round-trips exactly
    // (the old positive-only (2a+b) div 2b trick truncated -7.08 to
    // -7.079999 — biased toward zero)
    assert(got == Seq(
      ("s1", 1L, -7.08, 0.0),
      ("s2", 1L, -15.8, 0.0)))
  }

  test("readability: negative mean rounds half AWAY from zero (the HALF_UP contract)") {
    // two docs with an exact integer micro mean (-11.44): the old
    // positive-only trick truncated the half-shifted quotient toward
    // zero and emitted -11.439999; HALF_UP must return -11.44
    val docs = Seq(
      ("s1", "Hi there."), // CLI -7.08
      ("s1", "   "))       // CLI -15.8 -> mean -11.44 exactly
    .toDF("source", "text")
    val got = TextAnalysis.readability(docs, "text", "source")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got == Seq(("s1", 2L, -11.44, 0.0)), s"got $got")
  }

  test("crostonForecast: hand-computed size/interval levels; single-event parts give NULL forecast; layout-stable") {
    val lines = Seq(
      (1L, 10.0, ts("1997-01-01")), (1L, 20.0, ts("1997-01-03")),
      (1L, 10.0, ts("1997-01-07")),
      (2L, 7.0, ts("1997-01-01")), // one event -> no interval
    ).toDF("l_partkey", "l_quantity", "l_shipdate")
    val got = Supply.crostonForecast(lines)
      .as[(Long, Long, Double, Option[Double], Option[Double])]
      .collect().toSeq
    // part 1: z = 10 -> 11.25 -> 11.09375; p = 2 -> 2.25;
    // forecast 11.09375/2.25 = 4.930556
    assert(got == Seq(
      (1L, 3L, 11.09375, Some(2.25), Some(4.930556)),
      (2L, 1L, 7.0, None, None)))
    val re = Supply.crostonForecast(lines.repartition(5))
      .as[(Long, Long, Double, Option[Double], Option[Double])]
      .collect().toSeq
    assert(re == got)
  }

  test("readability: long formal text crosses the college threshold") {
    val formal = Array.fill(20)("Undoubtedly, the infrastructural " +
      "considerations predominate.").mkString(" ")
    val got = TextAnalysis.readability(
        Seq(("s", formal)).toDF("source", "text"), "text", "source")
      .as[(String, Long, Double, Double)].collect().head
    assert(got._3 > 12.0 && got._4 == 1.0)
  }
}
