package graft

class GraftExtensionsSpec extends SparkSpec {

  test("native expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val dot = spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(dot == 11.0)
    val sh = spark.sql("SELECT word_shingles('a b c d') AS s")
      .collect().head.getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    val sh2 = spark.sql("SELECT word_shingles('a b c d', 2) AS s")
      .collect().head.getSeq[String](0)
    assert(sh2 == Seq("a b", "b c", "c d"))
    val cs = spark.sql("SELECT char_shingles('abcd', 3) AS s")
      .collect().head.getSeq[String](0)
    assert(cs == Seq("abc", "bcd"))
    // SQL sketch functions agree with the Column-API operators
    val sig = spark.sql(
      "SELECT minhash_sig(word_shingles(lower('the quick brown fox jumps'))) AS s")
      .collect().head.getSeq[Long](0)
    assert(sig.length == 16 && sig.forall(v => v >= 0 && v < graft.functions.Portable.P31))
    val sim = spark.sql(
      "SELECT simhash_pack(array_distinct(split(lower('a b a'), '\\\\s+'))) AS h")
      .collect().head.getLong(0)
    assert(sim >= 0)
  }
}
