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

  /** Overwrite a watermark via temp-file-then-replace. The reference's
    * S3 PUT is atomic (a reader sees the old or the new value, never a
    * truncated one); a bare create(overwrite=true) truncates first, so
    * a concurrent get() — or a crash mid-write — would observe "" and
    * the incremental loader would reprocess the entire history into
    * its sink. On a local/posix store the replace is a true ATOMIC_MOVE;
    * on rename-no-overwrite filesystems it degrades to delete+rename,
    * whose absent-file window a reader resolves to the DEFAULT
    * watermark (a visible over-read, never a truncated value — and a
    * real deployment of this control file sits on an object store with
    * atomic PUT, the reference's own layout). */
  def put(key: String, value: String): Unit = {
    val p = pathFor(key)
    // dot the FILENAME, not the key (keys carry slashes — the reference
    // layout is "silver/last_run.txt"); same directory as the target so
    // the move is a same-filesystem rename
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val f = fs(p)
    val out = f.create(tmp, true)
    try out.write(value.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val scheme = p.toUri.getScheme
    if (scheme == null || scheme == "file") {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(p.toUri.getPath),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      // drop the checksum sidecar the Hadoop local FS wrote for tmp —
      // the moved data file carries no crc, so reads skip verification
      val crc = new Path(p.getParent, s"..${p.getName}.tmp.crc")
      if (f.exists(crc)) f.delete(crc, false)
    } else {
      if (f.exists(p)) f.delete(p, false)
      if (!f.rename(tmp, p))
        throw new java.io.IOException(s"watermark rename failed: $tmp -> $p")
    }
  }
}
