package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Cross-engine-portable primitives shared by the dedup / text-analysis
  * extension operators.
  *
  * The t2 gate re-computes every query in DuckDB, so hash-based operators
  * (MinHash, SimHash, fingerprints) cannot use engine-specific hashes
  * (`xxhash64`, DuckDB `hash()`). Instead we derive a 60-bit integer from
  * the md5 hex prefix — md5 is identical everywhere, and 15 hex chars fit
  * a signed 64-bit integer on both engines:
  *
  *   Spark:  conv(substring(md5(c), 1, 15), 16, 10) :: long
  *   DuckDB: CAST(('0x' || substr(md5(c), 1, 15)) AS BIGINT)
  *
  * All downstream MinHash arithmetic stays below 2^62 so BIGINT never
  * overflows in either engine (DuckDB raises on overflow; Spark wraps —
  * both are avoided).
  */
object Portable {

  /** 2^31 - 1, the Mersenne prime used as MinHash modulus. Keeping the
    * hash space at 31 bits bounds `a * h + b` far below 2^63. */
  val P31: Long = 2147483647L

  /** Portable 60-bit content hash (md5-prefix based). */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Driver-side mirror of [[h60]] for deriving deterministic constants
    * (e.g. LSH hyperplane signs) that both engines must agree on. */
  def h60Local(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .take(8).map("%02x".format(_)).mkString.take(15), 16)

  /** Portable 31-bit hash for MinHash permutations. */
  def h31(c: Column): Column = h60(c) % P31

  /** Lowercased whitespace tokens. */
  def tokens(c: Column): Column = split(lower(c), "\\s+")

  /** MinHash permutation coefficients — fixed, engine-independent. */
  def aCoef(i: Int): Long = 1L + i.toLong * 1000003L
  def bCoef(i: Int): Long = (i.toLong * 777767777L) % P31

  /** Fold a band's signature values into one int64 key by hashing their
    * joined decimal rendering through [[h60]]. An arithmetic fold like
    * `acc·31 + s` is far from injective over ~31-bit values ((s0, s1)
    * collides with (s0−1, s1+31)), which admits spurious LSH candidates
    * from unrelated signatures; a 60-bit md5-derived key makes
    * cross-band collisions vanishingly rare, is identically computable
    * in DuckDB ([[bandKeySql]]), and keeps the band self-join shuffling
    * 8-byte keys. */
  def bandKey(sigs: Seq[Column]): Column = {
    // NULL-propagating: a doc with no signature (empty shingle set →
    // minhash_sig = NULL → every element NULL) must get a NULL band
    // key, which equi-joins and band-bucket groupings then drop. Bare
    // concat_ws would SKIP the nulls and emit the constant h60("") in
    // every band, banding all empty-shingle docs together as mutual
    // near-dup candidates — the quadratic hot-bucket shape LSH exists
    // to avoid. The SQL mirror needs no guard: `||` propagates NULL.
    val anyNull = sigs.map(_.isNull).reduce(_ || _)
    when(anyNull, lit(null).cast("long"))
      .otherwise(h60(concat_ws("-", sigs.map(_.cast("string")): _*)))
  }

  /** SQL fragment mirroring [[bandKey]] over signature column names
    * (NULL-propagating like the Column form: `||` maps NULL to NULL). */
  def bandKeySql(sigs: Seq[String]): String =
    h60Sql(sigs.map(s => s"CAST($s AS VARCHAR)").mkString(" || '-' || "))

  /** Distinct word n-gram shingles of a token array; documents shorter
    * than n collapse to a single whole-text shingle. */
  def shingles(toks: Column, n: Int = 3): Column = {
    val grams = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*))
    when(size(toks) >= n, array_distinct(grams))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** SQL fragment mirroring [[h60]] for a DuckDB expression `e`. */
  def h60Sql(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 15)) AS BIGINT)"

  /** SQL fragment mirroring [[tokens]]. The whitespace class is spelled
    * out: Java's `\s` (the Spark side) is `[ \t\n\x0B\f\r]`, but RE2's
    * `\s` (DuckDB) omits vertical tab — a `\s+` here would tokenize
    * VT-containing text differently per engine. */
  def tokensSql(e: String): String =
    s"string_split_regex(lower($e), '[ \\t\\n\\x0B\\f\\r]+')"

  /** SQL fragment mirroring [[shingles]] over a token-list expression. */
  def shinglesSql(t: String, n: Int = 3): String = {
    val parts = (0 until n).map(k => s"$t[i + $k]").mkString(" || ' ' || ")
    s"CASE WHEN len($t) >= $n THEN list_distinct([$parts FOR i IN range(1, len($t) - ${n - 2})]) " +
      s"ELSE [array_to_string($t, ' ')] END"
  }

  /** SQL fragment mirroring [[graft.functions.CharShingles]] over a
    * string expression `s` (both engines index characters 1-based in
    * `substr` and count code points in `length`). */
  def charShinglesSql(s: String, n: Int = 5): String =
    s"CASE WHEN length($s) >= $n " +
      s"THEN list_distinct([substr($s, i, $n) FOR i IN range(1, length($s) - ${n - 2})]) " +
      s"ELSE [$s] END"
}
