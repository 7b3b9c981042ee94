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
  }
}
