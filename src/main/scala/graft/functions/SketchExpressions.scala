package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass document-sketch expressions (MinHash signature, SimHash).
  *
  * The composed form of MinHash — `explode(shingles)` → portable md5 hash
  * → `groupBy(doc).agg(min((h·a_i + b_i) % P) …)` — is semantically the
  * spec (kept in [[graft.ext.Dedup.minhashSignaturesComposed]] and
  * property-tested equal), but it pays a shingle-grain row explosion plus
  * a 16-column hash aggregate SHUFFLE just to get back to doc grain.
  * A signature is a per-document pure function, so these expressions
  * compute it in a single narrow projection: no explosion, no shuffle,
  * embarrassingly parallel over the corpus — the shape that matters when
  * the corpus is 100 TB (signature build becomes a pure scan stage).
  *
  * Hashing is the same portable md5-prefix integer as [[Portable.h60]]
  * (= first 15 hex chars of md5 as a 60-bit integer — here computed
  * directly from the digest bytes), so the DuckDB oracle reproduces every
  * value bit-for-bit via [[Portable.h60Sql]].
  */
object Sketches {

  /** First 60 bits of md5(bytes) as a non-negative long — identical to
    * `conv(substring(md5(c), 1, 15), 16, 10)`: 15 hex chars = the top
    * 60 bits of the first 8 digest bytes. */
  private[functions] def md5h60(md: MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(bytes)
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  /** MinHash signature over a shingle array: `array<long>` of
    * `numPerms` values, element i = min over shingles of
    * `(h60(s) % P31 · a_i + b_i) % P31`. */
  def minhash_sig(shingles: Column, numPerms: Int = 16): Column =
    ColumnShim.column(MinHashSig(ColumnShim.expression(shingles), numPerms))

  /** SimHash over a (distinct) token array: bit b of the result is the
    * sign of Σ_tokens (((h60(t) >> b) & 1)·2 − 1). */
  def simhash_pack(tokens: Column, bits: Int = 32): Column =
    ColumnShim.column(SimHashPack(ColumnShim.expression(tokens), bits))
}

/** `minhash_sig(shingles)` — see [[Sketches]]. */
case class MinHashSig(child: Expression, numPerms: Int) extends UnaryExpression
    with CodegenFallback {

  // upper bound 2048: h (< 2^31) x aCoef(i) = 1 + i*1000003 stays under
  // 2^62 only while i < ~2148 — beyond that the multiply wraps and the
  // Spark side silently emits negative "signatures" while the DuckDB
  // mirror raises on BIGINT overflow
  require(numPerms >= 1 && numPerms <= 2048,
    "numPerms must be in [1, 2048] (coefficient overflow above)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // a doc whose shingle set is empty (or all-null) has NO signature:
  // the composed spec (explode + md5 + min-agg) emits zero rows for it,
  // so it drops out — an all-MaxValue sentinel signature would instead
  // band every such doc as a mutual near-dup candidate
  override def nullable: Boolean = true

  private val aCoefs: Array[Long] = Array.tabulate(numPerms)(Portable.aCoef)
  private val bCoefs: Array[Long] = Array.tabulate(numPerms)(Portable.bCoef)

  // per-instance digest: expression trees deserialize per task (single
  // threaded), so one JCA lookup serves every row instead of one per doc
  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < arr.numElements()) {
      // null elements hash to null in the composed spec and fall out of
      // the min aggregate — skip them here for the same result
      if (!arr.isNullAt(i)) {
        seen = true
        val h = Sketches.md5h60(md, arr.getUTF8String(i).getBytes) % Portable.P31
        var p = 0
        while (p < numPerms) {
          val hv = (h * aCoefs(p) + bCoefs(p)) % Portable.P31
          if (hv < mins(p)) mins(p) = hv
          p += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash_pack(tokens)` — see [[Sketches]]. */
case class SimHashPack(child: Expression, bits: Int) extends UnaryExpression
    with CodegenFallback {

  // cap 60: the underlying md5h60 hash carries 60 bits — bits 60..62
  // would read constant 0 for every token, a silently degenerate
  // sketch with zero entropy in its top bits
  require(bits >= 1 && bits <= 60, "bits must be in [1, 60] (60-bit hash)")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  // the MinHashSig digest-reuse rule
  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = new Array[Long](bits)
    var i = 0
    while (i < arr.numElements()) {
      // the MinHashSig null-element rule
      if (!arr.isNullAt(i)) {
        val h = Sketches.md5h60(md, arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < bits) {
          counts(b) += ((h >>> b) & 1L) * 2L - 1L
          b += 1
        }
      }
      i += 1
    }
    var packed = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) packed |= 1L << b
      b += 1
    }
    packed
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
