package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, processed per-partition.
  *
  * Image decode ([[featurizeImages]], JDK ImageIO) and audio decode
  * ([[featurizeAudio]], JDK javax.sound WAV/PCM) are REAL. Only VIDEO
  * remains a clearly-marked stub — the JDK ships no video codecs — so
  * [[featurize]]/[[frameSample]] derive deterministic fake "features"
  * (byte length, md5, modular width/height) from the raw bytes there.
  * The Spark-side plumbing is real and what the tests pin down:
  * binary-typed column, case-class schema via Encoders, one
  * `mapPartitions` pass (per-partition iterator = the batch shape a real
  * decoder would amortize model/codec setup over), and an exact SQL
  * oracle over the same bytes.
  *
  * Scale: decode is embarrassingly parallel; partition count controls
  * batch size. Real decoders would also want
  * `spark.sql.files.maxPartitionBytes` tuned down so a partition of
  * media fits executor memory.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, media: Array[Byte], media_type: String)

  case class MediaFeatures(
      doc_id: Long, n_bytes: Int, content_md5: String,
      width: Int, height: Int, channels: Int)

  /** Bind a text table into a binary media column (UTF-8 bytes stand in
    * for image payloads in the testdata). */
  def toMedia(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("media"),
        lit("image/stub").as("media_type"))
      .as[MediaRecord]
  }

  /** Per-partition feature extraction. STUB decode: real deployments
    * replace the body of the `map` with an actual codec call; the
    * partition-iterator shape (setup once per partition, stream records)
    * is the production pattern. */
  def featurize(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition setup (a real decoder initializes its codec here)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        md.reset()
        val hex = md.digest(r.media).map("%02x".format(_)).mkString
        val n = r.media.length
        MediaFeatures(r.doc_id, n, hex, n % 640, (n * 7) % 480, 3)
      }
    }
  }

  case class ImageFeatures(
      doc_id: Long, n_bytes: Int, content_md5: String, decoded: Boolean,
      width: Int, height: Int, channels: Int)

  /** REAL image decode — not a stub: the JDK ships PNG/JPEG/GIF/BMP
    * codecs in `javax.imageio`, so actual pixel-dimension extraction
    * needs no external libraries. Payloads the codec rejects degrade
    * gracefully to `decoded = false` with (−1, −1, −1) geometry and
    * still carry length + md5 — a corrupt image must quarantine, not
    * kill a 100 TB media scan (the [[graft.io.Formats]] PERMISSIVE
    * discipline applied to binaries).
    *
    * Same per-partition batch shape as [[featurize]]; `ImageIO`'s
    * disk-cache is disabled per partition (decoding through executor
    * tmp files would turn a CPU-bound scan into an IO-bound one). */
  def featurizeImages(media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        md.reset()
        val hex = md.digest(r.media).map("%02x".format(_)).mkString
        val img =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.media)))
          catch { case _: Exception => None }
        img match {
          case Some(b) => ImageFeatures(r.doc_id, r.media.length, hex,
            decoded = true, b.getWidth, b.getHeight,
            b.getColorModel.getNumComponents)
          case None => ImageFeatures(r.doc_id, r.media.length, hex,
            decoded = false, -1, -1, -1)
        }
      }
    }
  }

  /** Canonical 44-byte PCM WAV container around raw sample bytes —
    * the deterministic generator that lets the REAL audio decoder
    * ([[featurizeAudio]]) gate against a byte-level SQL oracle: the
    * testdata has no media column, so each document's UTF-8 bytes
    * become its unsigned-8-bit mono PCM samples (1 byte = 1 frame),
    * making every geometry field (n_bytes, frames, duration) an exact
    * integer function of `octet_length(text)` both engines compute. */
  def wavBytes(data: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate) // byte rate = rate (u8 mono)
      .putShort(1).putShort(8) // block align, bits per sample
      .put("data".getBytes("US-ASCII")).putInt(data.length)
      .put(data)
    bb.array()
  }

  /** Bind a text table into a decodable WAV media column (u8 mono PCM
    * at 8 kHz over the UTF-8 bytes — see [[wavBytes]]). */
  def toWavMedia(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // NULL text → empty payload (a 0-frame WAV), not an NPE: the
    // binder must quarantine-or-degrade like the rest of the decode
    // tier rather than kill the task on a single null row.
    docs.select(col(idCol).cast("long").as("doc_id"),
        encode(coalesce(col(textCol), lit("")), "UTF-8").as("data"))
      .as[(Long, Array[Byte])]
      .map { case (id, data) => MediaRecord(id, wavBytes(data), "audio/wav") }
  }

  case class AudioFeatures(
      doc_id: Long, n_bytes: Int, decoded: Boolean, sample_rate: Int,
      channels: Int, bits: Int, n_frames: Long, duration_ms: Long,
      sum_sq: Long, peak: Long)

  /** REAL audio decode — not a stub: WAV/PCM parsing ships in the JDK
    * (`javax.sound.sampled`), so container + format extraction and a
    * full sample scan need no external libraries. Per payload:
    * geometry (sample rate, channels, bits, frame count, duration in
    * exact integer ms = frames·1000 ∕ rate) plus signal stats in exact
    * integer units — `sum_sq` = Σ(centered sample)² and `peak` =
    * max |centered sample| (u8 samples center at 128; s16 read at the
    * container's declared endianness) — order-free exact longs, the
    * audio analogue of the image tier's pixel geometry. Payloads the
    * codec rejects, and PCM widths beyond 8∕16-bit, quarantine to
    * `decoded = false` with −1 fields rather than kill the scan (the
    * [[featurizeImages]] discipline). Same per-partition batch shape;
    * streams the frames, never buffers a whole payload's samples. */
  def featurizeAudio(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.media))
          try {
            val fmt = in.getFormat
            val enc = fmt.getEncoding
            val bits = fmt.getSampleSizeInBits
            val pcm8u = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED && bits == 8
            val pcm16s = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED && bits == 16
            if (!pcm8u && !pcm16s) {
              AudioFeatures(r.doc_id, r.media.length, decoded = false,
                -1, -1, -1, -1L, -1L, -1L, -1L)
            } else {
              val rate = math.round(fmt.getSampleRate)
              val frameBytes = fmt.getFrameSize
              var sumSq = 0L
              var peak = 0L
              var nFrames = 0L
              val buf = new Array[Byte](frameBytes * 1024)
              var read = in.read(buf)
              while (read > 0) {
                var i = 0
                while (i + (bits / 8) <= read) {
                  val v =
                    if (pcm8u) (buf(i) & 0xff) - 128L
                    else {
                      val lo = if (fmt.isBigEndian) buf(i + 1) else buf(i)
                      val hi = if (fmt.isBigEndian) buf(i) else buf(i + 1)
                      ((hi.toLong << 8) | (lo & 0xffL)).toShort.toLong
                    }
                  sumSq += v * v
                  if (math.abs(v) > peak) peak = math.abs(v)
                  i += bits / 8
                }
                nFrames += read / frameBytes
                read = in.read(buf)
              }
              AudioFeatures(r.doc_id, r.media.length, decoded = true,
                rate, fmt.getChannels, bits, nFrames,
                nFrames * 1000L / rate, sumSq, peak)
            }
          } finally in.close()
        } catch {
          case _: Exception =>
            AudioFeatures(r.doc_id, r.media.length, decoded = false,
              -1, -1, -1, -1L, -1L, -1L, -1L)
        }
      }
    }
  }

  case class Frame(
      doc_id: Long, frame_idx: Long, byte_offset: Long,
      frame_md5: String, frame_bytes: Long)

  /** Frame sampling over a binary "video" column: emit `maxFrames`
    * evenly-spaced frames per media payload — the video-to-training-
    * examples step of a multimodal pipeline. Decode is the same honest
    * STUB as [[featurize]] (no codecs in this container): a "frame" is a
    * fixed-size byte window at the sampled offset, its md5 standing in
    * for decoded pixels. The plumbing under it is the real deliverable:
    * per-record fan-out bounded by `maxFrames` (never a data-dependent
    * explosion), per-partition decoder setup, typed frame schema — and
    * the byte-window semantics are exactly mirrorable in SQL, so the
    * whole path hash-gates cross-engine.
    *
    * Scale: one narrow pass, output rows = `maxFrames · |media|`;
    * sampling offsets derive from the payload length alone, so the
    * operator never buffers a whole partition of video. */
  def frameSample(
      media: Dataset[MediaRecord], maxFrames: Int = 4,
      frameBytes: Int = 32): Dataset[Frame] = {
    require(maxFrames >= 1 && frameBytes >= 1, "need positive frame params")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        val n = r.media.length
        val frames = math.min(maxFrames.toLong, math.max(1L, n.toLong / frameBytes))
        (0L until frames).map { k =>
          val off = (n.toLong * k) / frames
          val end = math.min(n.toLong, off + frameBytes).toInt
          md.reset()
          val hex = md.digest(java.util.Arrays.copyOfRange(r.media, off.toInt, end))
            .map("%02x".format(_)).mkString
          Frame(r.doc_id, k, off, hex, (end - off.toInt).toLong)
        }
      }
    }
  }
}
