package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary plumbing: features are deterministic functions of the bytes") {
    val docs = Seq((1L, "hello"), (2L, "a longer media payload")).toDF("doc_id", "text")
    val got = Multimodal.featurize(Multimodal.toMedia(docs, "doc_id", "text"))
    val r = got.collect().map(f => f.doc_id -> f).toMap
    assert(r(1L).n_bytes == 5)
    // stub decode must agree with the engine's own md5 (and thus the oracle's)
    val expectMd5 = docs.select($"doc_id", md5($"text")).as[(Long, String)].collect().toMap
    assert(r(1L).content_md5 == expectMd5(1L) && r(2L).content_md5 == expectMd5(2L))
    assert(r(2L).width == r(2L).n_bytes % 640 && r(2L).channels == 3)
  }
}
