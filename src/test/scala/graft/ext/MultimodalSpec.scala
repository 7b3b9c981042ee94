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
  test("featurizeImages: REAL PNG/JPEG decode via JDK ImageIO, corrupt quarantine") {
    import java.awt.image.BufferedImage
    def bytes(w: Int, h: Int, kind: Int, fmt: String): Array[Byte] = {
      val img = new BufferedImage(w, h, kind)
      img.setRGB(0, 0, 0xff00ff)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt codec")
      out.toByteArray
    }
    val rows = Seq(
      Multimodal.MediaRecord(1L, bytes(3, 2, BufferedImage.TYPE_INT_RGB, "png"), "image/png"),
      Multimodal.MediaRecord(2L, bytes(5, 4, BufferedImage.TYPE_INT_ARGB, "png"), "image/png"),
      Multimodal.MediaRecord(3L, bytes(2, 2, BufferedImage.TYPE_INT_RGB, "jpg"), "image/jpeg"),
      Multimodal.MediaRecord(4L, "definitely not an image".getBytes("UTF-8"), "image/png"))
    val media = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord])
    val got = Multimodal.featurizeImages(media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(got(1L).decoded && got(1L).width == 3 && got(1L).height == 2
      && got(1L).channels == 3)
    assert(got(2L).decoded && got(2L).width == 5 && got(2L).height == 4
      && got(2L).channels == 4, "ARGB PNG keeps its alpha channel")
    assert(got(3L).decoded && got(3L).width == 2 && got(3L).height == 2)
    assert(!got(4L).decoded && got(4L).width == -1
      && got(4L).n_bytes == 23 && got(4L).content_md5.length == 32,
      "undecodable payloads quarantine with length+md5 intact")
  }

  test("featurizeAudio: REAL WAV decode via JDK javax.sound — u8 via our writer, s16 via the JDK writer, corrupt quarantine") {
    import javax.sound.sampled._
    // u8 mono via graft's own canonical header
    val u8data = Array[Byte](0, 100, -128, 127) // unsigned: 0,100,128,127
    val u8wav = Multimodal.wavBytes(u8data, sampleRate = 8000)
    // s16 stereo via the JDK's OWN writer (cross-checks our reader
    // against an independent encoder)
    val s16samples = Array[Short](1000, -2000, 30000, -30000)
    val s16bytes = {
      val bb = java.nio.ByteBuffer.allocate(s16samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      s16samples.foreach(bb.putShort)
      bb.array()
    }
    val s16fmt = new AudioFormat(16000f, 16, 2, true, false)
    val s16wav = {
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(s16bytes), s16fmt,
        s16samples.length / 2), AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val rows = Seq(
      Multimodal.MediaRecord(1L, u8wav, "audio/wav"),
      Multimodal.MediaRecord(2L, s16wav, "audio/wav"),
      Multimodal.MediaRecord(3L, "not audio at all".getBytes("UTF-8"), "audio/wav"))
    val media = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord])
    val got = Multimodal.featurizeAudio(media).collect()
      .map(f => f.doc_id -> f).toMap
    val u8 = got(1L)
    // centered u8: -128, -28, 0, -1
    assert(u8.decoded && u8.sample_rate == 8000 && u8.channels == 1
      && u8.bits == 8 && u8.n_frames == 4 && u8.n_bytes == 48
      && u8.duration_ms == 0
      && u8.sum_sq == 128L*128 + 28L*28 + 0 + 1L && u8.peak == 128)
    val s16 = got(2L)
    assert(s16.decoded && s16.sample_rate == 16000 && s16.channels == 2
      && s16.bits == 16 && s16.n_frames == 2
      && s16.sum_sq == s16samples.map(v => v.toLong * v).sum
      && s16.peak == 30000)
    assert(!got(3L).decoded && got(3L).sample_rate == -1
      && got(3L).n_bytes == 16,
      "undecodable payloads quarantine with length intact")
  }

  test("wavBytes+featurizeAudio roundtrip: geometry is an exact integer function of the data length") {
    val data = ("x" * 12345).getBytes("UTF-8")
    val media = spark.createDataset(Seq(
      Multimodal.MediaRecord(7L, Multimodal.wavBytes(data), "audio/wav")))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord])
    val f = Multimodal.featurizeAudio(media).collect().head
    assert(f.decoded && f.n_bytes == 12345 + 44 && f.n_frames == 12345
      && f.duration_ms == 12345L * 1000 / 8000)
  }

  test("toWavMedia: a NULL text row degrades to an empty 0-frame payload, not an NPE") {
    val docs = Seq((1L, "ok"), (2L, null: String))
      .toDF("doc_id", "text")
    val got = Multimodal.featurizeAudio(
      Multimodal.toWavMedia(docs, "doc_id", "text"))
      .collect().map(f => f.doc_id -> f).toMap
    assert(got(1L).decoded && got(1L).n_frames == 2)
    assert(got(2L).decoded && got(2L).n_frames == 0
      && got(2L).n_bytes == 44 && got(2L).sum_sq == 0L,
      "null text must become the 44-byte empty WAV header")
  }
}
