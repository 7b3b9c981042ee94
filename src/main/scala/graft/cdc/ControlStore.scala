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
object ControlStore {
  /** Stores where `create(path, overwrite=true)` is an atomic
    * whole-object PUT (visible only at close), so direct overwrite is
    * safer than any rename dance. TRUE object stores only. ABFS/ADLS
    * Gen2 and the legacy wasb driver both create() a zero-length file
    * visible IMMEDIATELY with data landing at flush/close, so a direct
    * overwrite there opens exactly the truncated-read window put()
    * exists to prevent (a concurrent get() reads "" → trim → empty
    * watermark; a crash mid-write leaves it empty permanently) — both
    * take the tmp+rename branch, but for different reasons: abfs/abfss
    * (hierarchical namespace) rename IS atomic, while wasb/wasbs sits
    * on FLAT blob storage whose rename is a client-driven copy+delete
    * — there the branch trades the truncated-read hazard for a
    * crash-window where the target is ABSENT and the next get()
    * resolves to the DEFAULT watermark (a full-history reprocess:
    * costly but correct, never a silently empty value). */
  val ObjectStoreSchemes: Set[String] =
    Set("s3a", "s3", "s3n", "gs", "oss", "cos", "swift")
}

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

  /** Overwrite a watermark. Strategy is picked per store capability:
    *
    *  - TRUE object stores (s3a/gs/oss/…): write the target directly
    *    with `create(p, overwrite=true)`. On these stores create() is a
    *    whole-object PUT that becomes visible only at close() — the
    *    reference's own boto3 put_object semantics — so a reader sees
    *    the old or the new value, never a truncated one. A tmp+rename
    *    here would REGRESS atomicity: object-store "rename" is
    *    copy+delete with a window where the target is absent, which a
    *    concurrent get() resolves to the DEFAULT watermark and the
    *    incremental loader reprocesses full history; a crash between
    *    delete and rename loses the watermark permanently.
    *  - local/posix: `create` truncates in place, so stage to a dotted
    *    tmp in the same directory and NIO ATOMIC_MOVE over the target.
    *  - hdfs and abfs/abfss (create() is visible-empty-then-filled
    *    but rename IS atomic — POSIX-style namespaces), plus other
    *    truncating rename-capable stores: tmp, then delete+rename
    *    (Hadoop rename won't overwrite); the absent-file window
    *    resolves to the default — a visible over-read, never a
    *    truncated or empty value.
    *  - wasb/wasbs (flat blob namespace): create() is ALSO
    *    visible-empty-then-filled, but rename is a client-driven
    *    copy+delete — NOT atomic. tmp+delete+rename remains the
    *    lesser evil: its crash window leaves the target ABSENT
    *    (→ default watermark → full-history reprocess, costly but
    *    correct), where a direct overwrite's window leaves it EMPTY
    *    (→ silently wrong watermark). The loss window is real and
    *    documented, not renamed away. */
  def put(key: String, value: String): Unit = {
    val p = pathFor(key)
    val f = fs(p)
    val scheme = Option(p.toUri.getScheme).getOrElse("file")
    def write(target: Path): Unit = {
      val out = f.create(target, true)
      try out.write(value.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
    if (ControlStore.ObjectStoreSchemes(scheme)) {
      write(p) // atomic PUT, visible only at close()
    } else {
      // dot the FILENAME, not the key (keys carry slashes — the
      // reference layout is "silver/last_run.txt"); same directory as
      // the target so the move is a same-filesystem rename
      val tmp = new Path(p.getParent, s".${p.getName}.tmp")
      write(tmp)
      if (scheme == "file") {
        java.nio.file.Files.move(
          java.nio.file.Paths.get(tmp.toUri.getPath),
          java.nio.file.Paths.get(p.toUri.getPath),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        // The NIO move bypasses ChecksumFileSystem, so drop BOTH
        // sidecars: the tmp's (written by the checksummed local FS
        // just now) and the target's own (left by any earlier
        // create(p, true) writer) — a stale target sidecar makes the
        // next checksummed read raise ChecksumException.
        Seq(s"..${p.getName}.tmp.crc", s".${p.getName}.crc").foreach { n =>
          val crc = new Path(p.getParent, n)
          if (f.exists(crc)) f.delete(crc, false)
        }
      } else {
        if (f.exists(p)) f.delete(p, false)
        if (!f.rename(tmp, p))
          throw new java.io.IOException(s"watermark rename failed: $tmp -> $p")
      }
    }
  }
}
