package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, processed per-partition.
  *
  * The decode step is a clearly-marked STUB — this container has no
  * image/audio codecs, so [[featurize]] derives deterministic fake
  * "features" (byte length, md5, modular width/height) from the raw
  * bytes. The Spark-side plumbing is real and what the tests pin down:
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
