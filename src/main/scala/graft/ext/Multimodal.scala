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
}
