package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native Catalyst expression.
  *
  * Spark ships levenshtein but no Jaro-Winkler; the usual fallback is a
  * Scala UDF, which breaks whole-stage codegen and serializes row
  * values through Scala boxing on the record-linkage hot path. This
  * expression evaluates via one static JVM call from generated code —
  * the same shape as Spark's own `levenshtein` (a UTF8String method
  * call) — so the blocked fuzzy-join stage stays inside codegen.
  *
  * Semantics pin the rapidfuzz/DuckDB convention (the oracle engine):
  *  - match window `max(|s|,|t|)/2 − 1` (floor, min 0), greedy
  *    left-to-right matching, transpositions/2;
  *  - Winkler prefix boost (`ℓ·0.1·(1−jaro)`, prefix capped at 4)
  *    applied ONLY when jaro > 0.7 (the rapidfuzz boost threshold —
  *    verified against DuckDB: jw('aaaaaa','aaxxxxxxxxxx') = 0.5 = its
  *    plain jaro, vs 0.6 if the boost were unconditional);
  *  - zero matches → 0.0, and an empty side (even both empty) → 0.0
  *    (DuckDB: jaro_winkler_similarity('','') = 0.0, not 1.0).
  *
  * Comparison runs on UTF-16 code units (String chars) — identical to
  * DuckDB's per-code-unit walk for the ASCII corpus this gates; exotic
  * astral-plane text could differ and is out of contract. */
object JaroWinklerAlgo {
  /** Static entry point the generated code calls. */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    if (s.isEmpty || t.isEmpty) return 0.0
    core(s, t, 0)
  }

  /** The ONE greedy match/transposition/prefix-boost scan both entry
    * points ([[similarity]] and [[JaroWinklerGteAlgo.gte]]) call, so a
    * tweak to the boost threshold or window formula cannot silently
    * diverge between them. `mMin` is an optional abort floor on the
    * match count (0 = never abort): when the remaining positions can
    * no longer reach it, returns `Double.NaN` — the caller treats NaN
    * as "provably below the threshold". Callers must pre-handle empty
    * strings. */
  private[functions] def core(s: String, t: String, mMin: Int): Double = {
    val n = s.length
    val m = t.length
    if (mMin > 0 && math.min(n, m) < mMin) return Double.NaN
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val sMatched = new Array[Boolean](n)
    val tMatched = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      if (mMin > 0 && matches + (n - i) < mMin) return Double.NaN
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatched(j) && s.charAt(i) == t.charAt(j)) {
          sMatched(i) = true; tMatched(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatched(i)) {
        while (!tMatched(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val jaro =
      (mm / n + mm / m + (mm - transpositions / 2) / mm) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val pMax = math.min(4, math.min(n, m))
    while (prefix < pMax && s.charAt(prefix) == t.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerAlgo.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Threshold-specialized Jaro-Winkler predicate:
  * `gte(a, b, t)  ⟺  round(similarity(a, b), 6) ≥ t` — bit-identical to
  * the two-step form (the 6-dp HALF_UP round is replicated via the same
  * BigDecimal path Spark's Round uses), but with two lossless aborts
  * that skip most of the O(n·window) match scan on non-matching pairs:
  *
  *  - a match-count floor: jw ≥ t implies jaro ≥ (t − 5e-7 − 0.4)∕0.6
  *    (prefix boost ℓ ≤ 4 ⟹ jw ≤ 0.6·jaro + 0.4; boost only fires above
  *    jaro 0.7, and for t > 0.7 the no-boost case needs jaro ≥ t which
  *    is stronger), and jaro = (m∕n + m∕m' + (m−tr)∕m)∕3 with the last
  *    term ≤ 1 gives m ≥ (3·jaro − 1)·n·m'∕(n + m') — checked up front
  *    against min(n, m') and re-checked as the scan proceeds (remaining
  *    positions can no longer reach the floor → the pair can never hit
  *    the threshold, return false without finishing);
  *  - the transposition pass and prefix boost run only for survivors.
  *
  * For thresholds ≤ 0.7 + 5e-7 the floor degenerates; the predicate then
  * simply evaluates the full similarity (still one expression, no second
  * round trip). The equivalence is property-law-tested against the
  * two-step form over random and near-identical pairs. */
object JaroWinklerGteAlgo {
  def gte(a: UTF8String, b: UTF8String, minSim: Double): Boolean = {
    val s = a.toString
    val t = b.toString
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return minSim <= 0.0
    // lossless floor on the match count (see scaladoc); slack 5e-7 for
    // the 6-dp round in the predicate, 1e-6 for double evaluation
    val thr = minSim - 5e-7
    val jaroMin = math.max((thr - 0.4) / 0.6, math.min(thr, 0.7))
    val mMin =
      if (3.0 * jaroMin - 1.0 <= 0) 0
      else math.ceil((3.0 * jaroMin - 1.0) * n.toDouble * m / (n + m) - 1e-6).toInt
    // the scan itself is JaroWinklerAlgo.core — the SAME code path as
    // similarity(), with the abort floor passed in; NaN = proven below
    val jw = JaroWinklerAlgo.core(s, t, mMin)
    if (jw.isNaN) return false
    // identical rounding semantics to Spark's round(col, 6) on DOUBLE
    java.math.BigDecimal.valueOf(jw)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() >= minSim
  }
}

case class JaroWinklerGte(left: Expression, right: Expression, minSim: Double)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerGteAlgo.gte(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], minSim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerGteAlgo.gte($a, $b, $minSim);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 61-bit character-occupancy bitmask, the cheap side of the lossless
  * Jaro-Winkler prefilter: bit `charAt(i) % 61` is set for every UTF-16
  * code unit in the string. Two strings whose masks do not intersect
  * share NO character, so their Jaro match count is 0 and JW = 0 — the
  * mask test can only reject pairs a JW threshold > 2/3 would reject
  * anyway. O(len) once per ROW (precomputed before the pair join), vs
  * JW's O(len·window) per PAIR. 61 is prime, so consecutive ASCII codes
  * spread over distinct bits with no harmonic collisions. */
object CharMaskAlgo {
  def mask(s: UTF8String): Long = {
    val str = s.toString
    var m = 0L
    var i = 0
    while (i < str.length) { m |= 1L << (str.charAt(i) % 61); i += 1 }
    m
  }
}

case class CharMask(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    CharMaskAlgo.mask(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.CharMaskAlgo.mask($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringSimilarity {
  import org.apache.spark.sql.graftshim.ColumnShim

  /** Jaro-Winkler similarity of two string columns (codegen'd). */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnShim.column(
      JaroWinkler(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Character-occupancy bitmask of a string column (codegen'd) — see
    * [[CharMaskAlgo]]. */
  def charMask(a: Column): Column =
    ColumnShim.column(CharMask(ColumnShim.expression(a)))

  /** `round(jaroWinkler(a, b), 6) >= minSim` as ONE codegen'd predicate
    * with lossless early aborts — see [[JaroWinklerGteAlgo]]. */
  def jaroWinklerGte(a: Column, b: Column, minSim: Double): Column =
    ColumnShim.column(JaroWinklerGte(
      ColumnShim.expression(a), ColumnShim.expression(b), minSim))

  /** Lossless min∕max length-ratio floor implied by
    * `round(jw, 6) ≥ jwMin`.
    *
    * Derivation: the boost is applied only when jaro > 0.7 and equals
    * `jaro + ℓ·0.1·(1−jaro)` with ℓ ≤ 4, so jw ≤ 0.6·jaro + 0.4 always,
    * giving jaro ≥ (jw − 0.4)∕0.6. Writing jaro = (m∕|a| + m∕|b| +
    * (m−t)∕m)∕3 with every term ≤ 1 yields m∕max(|a|,|b|) ≥ 3·jaro − 2,
    * and m ≤ min(|a|,|b|), hence min ≥ (3·jaro − 2)·max. The 5e-7 slack
    * accounts for the 6-dp round in the gate predicate. A floor ≤ 0
    * (jwMin ≤ 0.8) bounds nothing — callers skip the prefilter then.
    * The same `floor > 0` condition certifies m ≥ 1, which is what makes
    * the [[charMask]] intersection test lossless. */
  def jaroFloor(jwMin: Double): Double =
    3.0 * ((jwMin - 5e-7 - 0.4) / 0.6) - 2.0
}
