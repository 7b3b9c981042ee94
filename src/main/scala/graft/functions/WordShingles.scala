package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a whitespace-tokenized string.
  *
  * Semantically identical to the composed built-ins
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ', ...)))`
  * over `split(s, '\\s+')` — but that chain is a non-codegen
  * higher-order-function tree whose per-shingle interpretation dominated
  * the MinHash bench (~5s of an 11s query at sf0.1). One compact eval
  * with direct string ops removes the expression-tree overhead;
  * CodegenFallback is fine because the surrounding explode/aggregate
  * stages carry the loop.
  *
  * Matches the DuckDB oracle fragment [[Portable.shinglesSql]] exactly:
  * regex-`\s+` split (trailing empties kept, like Spark's `split`),
  * shingle = n tokens joined by one space, distinct, and a whole-text
  * fallback for documents shorter than n tokens.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression
    with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val ws = Pattern.compile("\\s+")

  override protected def nullSafeEval(v: Any): Any = {
    val toks = ws.split(v.asInstanceOf[UTF8String].toString, -1)
    val out =
      if (toks.length >= n) {
        val seen = new java.util.LinkedHashSet[String]()
        var i = 0
        while (i + n <= toks.length) {
          val sb = new java.lang.StringBuilder(toks(i))
          var k = 1
          while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
          seen.add(sb.toString)
          i += 1
        }
        val arr = new Array[Any](seen.size())
        val it = seen.iterator()
        var j = 0
        while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
        arr
      } else {
        Array[Any](UTF8String.fromString(toks.mkString(" ")))
      }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  /** Distinct word n-gram shingles of a string column. */
  def shingles(c: Column, n: Int = 3): Column =
    ColumnShim.column(WordShingles(ColumnShim.expression(c), n))
}

/** Distinct CHARACTER n-grams of a string (the other standard dedup
  * shingling unit — robust to tokenization differences where
  * [[WordShingles]] is robust to small edits). Strings shorter than n
  * collapse to one whole-string gram. Positions are Unicode code points
  * on both engines (Spark `UTF8String.substring` and DuckDB `substr`
  * are both character-based), mirrored by
  * [[Portable.charShinglesSql]]. */
case class CharShingles(child: Expression, n: Int) extends UnaryExpression
    with CodegenFallback {

  require(n >= 1, "char-gram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val len = s.numChars()
    val out =
      if (len >= n) {
        val seen = new java.util.LinkedHashSet[UTF8String]()
        var i = 0
        while (i + n <= len) {
          seen.add(s.substring(i, i + n))
          i += 1
        }
        val arr = new Array[Any](seen.size())
        val it = seen.iterator()
        var j = 0
        while (it.hasNext) { arr(j) = it.next(); j += 1 }
        arr
      } else {
        Array[Any](s)
      }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharShingles {
  /** Distinct character n-gram shingles of a string column. */
  def charShingles(c: Column, n: Int = 5): Column =
    ColumnShim.column(CharShingles(ColumnShim.expression(c), n))
}
