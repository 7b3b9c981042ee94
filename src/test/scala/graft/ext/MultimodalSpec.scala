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

  test("frameSample: evenly-spaced byte windows, bounded fan-out, md5 of the window") {
    val docs = Seq(
      (1L, "x" * 100),  // 100 bytes -> min(4, 100/32)=3 frames at offsets 0,33,66
      (2L, "tiny"),     // 4 bytes  -> 1 whole-payload frame
    ).toDF("doc_id", "text")
    val frames = Multimodal.frameSample(
        Multimodal.toMedia(docs, "doc_id", "text"), maxFrames = 4, frameBytes = 32)
      .collect().groupBy(_.doc_id)
    val f1 = frames(1L).sortBy(_.frame_idx)
    assert(f1.map(f => (f.frame_idx, f.byte_offset, f.frame_bytes)).toSeq ==
      Seq((0L, 0L, 32L), (1L, 33L, 32L), (2L, 66L, 32L)))
    val f2 = frames(2L)
    assert(f2.length == 1 && f2.head.byte_offset == 0 && f2.head.frame_bytes == 4)
    // stub decode = md5 of exactly the sampled window
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = md.digest("tiny".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(f2.head.frame_md5 == want)
  }
}
