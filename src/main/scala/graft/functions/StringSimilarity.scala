package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}
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
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val sMatched = new Array[Boolean](n)
    val tMatched = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
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

object StringSimilarity {
  import org.apache.spark.sql.graftshim.ColumnShim

  /** Jaro-Winkler similarity of two string columns (codegen'd). */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnShim.column(
      JaroWinkler(ColumnShim.expression(a), ColumnShim.expression(b)))
}
