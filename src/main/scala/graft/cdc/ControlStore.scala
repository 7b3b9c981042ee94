package graft.cdc

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Watermark control-file store.
  *
  * Reference capability: last-run strings in S3 text objects via boto3
  * (`scripts/cdc_metrics_job_bronze.py:31-39`,
  * `scripts/cdc_metrics_job_silver.py:43-51`), defaulting to
  * `"2020-01-01"` when the object is missing.
  *
  * Implemented on the Hadoop FileSystem API so the same code serves
  * `file://` in tests and `s3a://`/`hdfs://` on a cluster — no AWS SDK
  * dependency and no driver-process-external client. Values are tiny
  * (one line), so a whole-file read/overwrite is the right consistency
  * model (matches the reference's PUT-overwrite).
  */
final class ControlStore(hadoopConf: Configuration, basePath: String) {

  val DefaultWatermark = "2020-01-01"

  private def pathFor(key: String): Path = new Path(s"$basePath/$key")

  private def fs(p: Path): FileSystem = p.getFileSystem(hadoopConf)

  /** Read a watermark; absent file → reference default. */
  def get(key: String, default: String = DefaultWatermark): String = {
    val p = pathFor(key)
    val f = fs(p)
    if (!f.exists(p)) default
    else {
      val in = f.open(p)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8).trim
      finally in.close()
    }
  }

  /** Overwrite a watermark. */
  def put(key: String, value: String): Unit = {
    val p = pathFor(key)
    val out = fs(p).create(p, true)
    try out.write(value.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }
}
