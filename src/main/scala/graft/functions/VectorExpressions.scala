package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for embedding dot products.
  *
  * The built-in way to express a dot product over `array<double>` is
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, v) -> s + v)` —
  * correct, but higher-order-function lambdas are interpreted per
  * element, which made the brute-force top-k bench ~60× slower than the
  * rest of the suite. This expression participates in whole-stage
  * codegen: the generated Java is a tight primitive loop over the two
  * `ArrayData` buffers.
  *
  * Summation order is left-to-right — identical to the interpreted
  * `aggregate` version and to DuckDB's list_cosine_similarity — so the
  * t2 oracle results are bit-for-bit unchanged.
  *
  * INPUT CONTRACT (deliberately unchecked in this kernel — it is the
  * innermost 100 TB loop): both arrays must be the same length with no
  * null elements. Mismatched lengths min-truncate and null slots read
  * as 0.0 here, where the composed `zip_with` form would return NULL
  * and DuckDB raises — callers own the validation, and the blocked
  * kernel path ([[graft.ext.Similarity.topKNeighbors]]) fail-fasts on
  * ragged widths before this expression ever runs.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ − bᵢ)² accumulated left-to-right — the squared Euclidean
  * distance kernel. Same codegen rationale as [[DotProduct]]; the
  * strict element order matches DuckDB's `list_distance` accumulation,
  * so `sqrt` of this value 6dp-rounds identically in both engines. */
case class SquaredL2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  import org.apache.spark.sql.graftshim.ColumnShim

  /** Dot product of two array<double> columns (codegen'd). */
  def dot(a: Column, b: Column): Column =
    ColumnShim.column(
      DotProduct(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** L2 norm of an array<double> column. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Euclidean distance of two array<double> columns (codegen'd sum of
    * squared diffs, then sqrt — DuckDB list_distance parity). */
  def l2dist(a: Column, b: Column): Column =
    sqrt(ColumnShim.column(
      SquaredL2(ColumnShim.expression(a), ColumnShim.expression(b))))
}
