package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CharShingles, DotProduct, MinHashSig, SimHashPack, WordShingles}

/** SQL-surface registration for the engine's native expressions, so
  * `spark.sql("SELECT vec_dot(a, b)")` works alongside the Column API.
  *
  * Install at session build time:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  * or on a live session via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot",
      info("vec_dot", "vec_dot(a, b) - dot product of two array<double>"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("word_shingles",
      info("word_shingles", "word_shingles(text[, n]) - distinct word n-gram shingles"),
      (es: Seq[Expression]) => es match {
        case Seq(c) => WordShingles(c, 3)
        case Seq(c, n) if n.foldable && n.eval() != null =>
          WordShingles(c, n.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException(
          "word_shingles expects (text) or (text, <integer literal n>)")
      }),
    ("char_shingles",
      info("char_shingles", "char_shingles(text[, n]) - distinct character n-grams"),
      (es: Seq[Expression]) => es match {
        case Seq(c) => CharShingles(c, 5)
        case Seq(c, n) if n.foldable && n.eval() != null =>
          CharShingles(c, n.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException(
          "char_shingles expects (text) or (text, <integer literal n>)")
      }),
    ("minhash_sig",
      info("minhash_sig",
        "minhash_sig(shingles[, p]) - p-permutation MinHash signature of a string array"),
      (es: Seq[Expression]) => es match {
        case Seq(c) => MinHashSig(c, 16)
        case Seq(c, n) if n.foldable && n.eval() != null =>
          MinHashSig(c, n.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException(
          "minhash_sig expects (shingles) or (shingles, <integer literal p>)")
      }),
    ("simhash_pack",
      info("simhash_pack",
        "simhash_pack(tokens[, bits]) - SimHash of a (distinct) token array"),
      (es: Seq[Expression]) => es match {
        case Seq(c) => SimHashPack(c, 32)
        case Seq(c, n) if n.foldable && n.eval() != null =>
          SimHashPack(c, n.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException(
          "simhash_pack expects (tokens) or (tokens, <integer literal bits>)")
      }),
  )

  /** Register on an already-built session (tests, spark-shell). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, i, builder) =>
      org.apache.spark.sql.graftshim.ColumnShim.registerFunction(spark, name, i, builder)
    }
}
