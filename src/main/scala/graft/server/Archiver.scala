package graft.server

import java.security.MessageDigest
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cold-storage archival sink (S17 — the reference's gstorage plugin,
  * `tdb-server-core/src/plugins/gstorage/run.rs:20-131`): on an interval,
  * data files over a size threshold are tiered out of the live folder to an
  * archive destination, their metadata recorded, and the local copy
  * optionally removed; a shutdown hook archives everything regardless of
  * size (`run_exit_hook`, run.rs:134-137).
  *
  * Spark-native re-expression of the WHAT:
  *  - the destination is ANY Hadoop-compatible filesystem URI — `file://`
  *    in tests, `hdfs://` / `s3a://` / `gs://` in production — via the
  *    `FileSystem` API Spark already ships, instead of a hand-rolled
  *    Google REST client (upload.rs);
  *  - the reference's DCB metadata post (metadata.rs: name, bucket, size,
  *    md5Hash, start/finish/response_time) becomes a JSON-lines metadata
  *    log at `<dest>/_archive_meta/`, directly queryable as a DataFrame
  *    ([[metadata]]) — the queryable catalog a 100 TB archive needs. One
  *    catalog row per ARCHIVAL (the durable copy), written after the
  *    verified rename and BEFORE any local delete, and never duplicated
  *    on re-sweeps of already-archived files;
  *  - archive unit is a closed parquet flush file; relative paths (book
  *    dirs) are preserved at the destination, so `spark.read.parquet(dest)`
  *    over the archive keeps working per book. In-flight staging paths
  *    (`*.compact`, `*.old` swap dirs, Spark `_temporary`) are NEVER
  *    swept — archiving those would race Compaction/flush and delete
  *    files mid-swap.
  *
  * Durability order per file (upload.rs uploads then deletes): copy to a
  * temporary name at the destination, close, verify length, atomic rename
  * into place, append the catalog record, and only then delete the local
  * file (when `removeLocal`) — a crash at any point leaves either the
  * local file, or both copies plus a catalog row, never an unrecorded
  * deletion. Re-running after a crash between rename and delete verifies
  * the dest checksum against the local bytes, skips the copy when they
  * match, repairs the catalog row, and completes the delete. A local
  * file MODIFIED after its archival (even at identical size) is detected
  * by mtime-vs-catalog-row comparison and re-archived — size equality
  * alone is not an identity check (r5 ADVICE).
  * The local delete (the only reader-visible mutation) runs under
  * `swapLock` — pass the Engine when archiving a live folder, same
  * reader-exclusion contract as [[graft.sources.Compaction]].
  */
final class Archiver(spark: SparkSession, srcDir: String, destUri: String,
    minFileSize: Long = 1L << 20, removeLocal: Boolean = true,
    swapLock: java.util.concurrent.locks.Lock =
      new java.util.concurrent.locks.ReentrantLock()) {

  /** `copied` = the bytes moved THIS sweep (false: dest already had
    * them, md5 not recomputed); `removed` = local delete performed. */
  case class ArchiveRecord(name: String, size: Long, md5: String,
      dest: String, startMs: Long, finishMs: Long, copied: Boolean,
      removed: Boolean)

  private val conf: Configuration = spark.sessionState.newHadoopConf()
  private val stopped = new AtomicBoolean(false)

  private def destFs: FileSystem = new HPath(destUri).getFileSystem(conf)

  /** One archival sweep: every parquet file under `srcDir` (recursive,
    * book subdirs preserved, staging dirs excluded) with size ≥
    * `threshold` is copied to the destination, verified, cataloged, and
    * (optionally) removed locally. Returns records for every eligible
    * file this sweep — already-archived files get `copied = false`. */
  def scanOnce(threshold: Long = minFileSize): Seq[ArchiveRecord] = {
    val src = new java.io.File(srcDir)
    def stagingDir(d: java.io.File): Boolean =
      d.getName.endsWith(".compact") || d.getName.endsWith(".old") ||
        d.getName == "_temporary"
    def walk(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
        if (f.isDirectory) { if (stagingDir(f)) Seq.empty else walk(f) }
        else if (f.getName.endsWith(".parquet") && f.length >= threshold)
          Seq(f)
        else Seq.empty
      }
    val fs = destFs
    walk(src).map { f =>
      val rel = src.toPath.relativize(f.toPath).toString
      archiveOne(fs, f, rel)
    }
  }

  private def archiveOne(fs: FileSystem, f: java.io.File,
      rel: String): ArchiveRecord = {
    val t0 = System.currentTimeMillis()
    val dest = new HPath(destUri, rel)
    val size = f.length
    val sameSize =
      fs.exists(dest) && fs.getFileStatus(dest).getLen == size
    val rowMs = catalogArchivedMs(fs, rel)
    def finish(md5hex: String, copied: Boolean): ArchiveRecord = {
      val removed = removeLocal && {
        swapLock.lock()
        try f.delete() finally swapLock.unlock()
      }
      ArchiveRecord(rel, size, md5hex, dest.toString, t0,
        System.currentTimeMillis(), copied, removed)
    }
    def copyAndCatalog(): ArchiveRecord = {
      val md5hex = fileMd5(f)
      val tmp = new HPath(destUri, rel + ".inprogress")
      fs.mkdirs(dest.getParent)
      val out = fs.create(tmp, true)
      try java.nio.file.Files.copy(f.toPath, out) finally out.close()
      require(fs.getFileStatus(tmp).getLen == size,
        s"archive length mismatch for $rel")
      fs.delete(dest, false) // re-archive after partial/changed: replace
      require(fs.rename(tmp, dest), s"archive rename failed for $rel")
      // catalog row BEFORE any local delete: a crash later never leaves
      // an archived-but-unrecorded (or deleted-but-unrecorded) file
      appendMeta(fs, rel, size, md5hex, dest.toString, t0,
        overwrite = true)
      finish(md5hex, copied = true)
    }
    if (sameSize && rowMs.exists(ms => f.lastModified() <= ms)) {
      // cheap common path: dest has the bytes and the catalog row
      // postdates the local file's last modification — size alone can
      // collide on changed content (r5 ADVICE); mtime-vs-row detects
      // that without hashing anything
      finish("", copied = false)
    } else if (sameSize && rowMs.isEmpty) {
      // Repair the rename→appendMeta crash window: the dest file exists
      // but its catalog row does not (a crash in the gap would otherwise
      // let the local delete below produce an archived-but-unrecorded
      // file). The repair row must describe the ARCHIVED bytes, so the
      // destination object is checksummed and compared to the local
      // file: equal → create-if-absent row with the verified checksum;
      // different (content changed at identical size while the row was
      // missing) → fall through to a full re-archive.
      val localMd5 = fileMd5(f)
      if (destMd5(fs, dest) == localMd5) {
        appendMeta(fs, rel, size, localMd5, dest.toString, t0,
          overwrite = false)
        finish(localMd5, copied = false)
      } else copyAndCatalog()
    } else {
      // fresh file, size mismatch, or local modified after its catalog
      // row (changed-content-same-size) → (re-)archive
      copyAndCatalog()
    }
  }

  /** `archivedMs` of the catalog row for `rel`, if the row exists — the
    * deterministic per-path part name makes this one tiny read. */
  private def catalogArchivedMs(fs: FileSystem, rel: String): Option[Long] = {
    val part = new HPath(new HPath(metaDir),
      s"meta-${graft.functions.md5Hex(rel.getBytes("UTF-8"))}.json")
    if (!fs.exists(part)) None
    else {
      val in = fs.open(part)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      "\"archivedMs\":(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toLong)
    }
  }

  /** Archive EVERYTHING still local, regardless of size — the reference's
    * shutdown path (`run_exit_hook`, run.rs:134-137). */
  def exitHook(): Seq[ArchiveRecord] = scanOnce(threshold = 0L)

  /** Background interval loop (run.rs:90-131's sleeping thread). A failed
    * sweep (transient FS error, file moved mid-walk by a concurrent
    * compaction) logs and retries next interval — it must never kill the
    * thread (the reference logs per-file errors and keeps running too).
    * Returns the thread; [[stop]] ends it at the next wakeup. */
  def start(intervalSecs: Long = 30L): Thread = {
    val t = new Thread(() => {
      while (!stopped.get()) {
        try Thread.sleep(intervalSecs * 1000L)
        catch { case _: InterruptedException => () }
        if (!stopped.get())
          try scanOnce()
          catch {
            case e: Throwable =>
              System.err.println(
                s"[graft-archiver] sweep failed, retrying next interval: $e")
          }
      }
    }, s"graft-archiver-$srcDir")
    t.setDaemon(true)
    t.start()
    t
  }

  def stop(): Unit = stopped.set(true)

  /** The archive catalog as a DataFrame — the DCB-post analog, but
    * queryable in place: one row per archived file (name, size, md5,
    * dest, archival timestamp). */
  def metadata(): DataFrame =
    spark.read.schema(
      "name STRING, size BIGINT, md5 STRING, dest STRING, " +
        "archivedMs BIGINT")
      .json(metaDir)

  private def metaDir: String = destUri + "/_archive_meta"

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** One catalog part per ARCHIVED PATH, named by the md5 of the relative
    * path — deterministic, so (a) two files archived in the same
    * millisecond can never collide onto one part (the old
    * `(millis, hashCode)` scheme could silently lose a record), and (b)
    * the alreadyArchived path can idempotently ensure the row exists
    * (`overwrite = false`: create-if-absent, races resolve to one row).
    * A fresh archival passes `overwrite = true` — re-archiving changed
    * content replaces the row, keeping one catalog row per live archived
    * file. `md5` is by-name: the repair path only pays the checksum read
    * when the part is actually missing. Migration note: catalogs written
    * by the old `(millis, hashCode)` scheme keep their legacy parts — a
    * re-archive under this scheme adds the deterministic part without
    * removing the legacy one, so pre-existing destinations should run a
    * one-time catalog compaction (read `metadata()`, keep the newest row
    * per name, rewrite) if duplicate rows matter to them. */
  private def appendMeta(fs: FileSystem, name: String, size: Long,
      md5: => String, dest: String, ts: Long, overwrite: Boolean): Unit = {
    val dir = new HPath(metaDir)
    fs.mkdirs(dir)
    val part = new HPath(dir,
      s"meta-${graft.functions.md5Hex(name.getBytes("UTF-8"))}.json")
    if (!overwrite && fs.exists(part)) return
    val out =
      try fs.create(part, overwrite)
      catch {
        // create-if-absent race (another sweep won): the row exists, done
        case _: java.io.IOException if !overwrite => return
      }
    try {
      val w = new java.io.OutputStreamWriter(out, "UTF-8")
      w.write(s"""{"name":${jstr(name)},"size":$size,"md5":${jstr(md5)},""" +
        s""""dest":${jstr(dest)},"archivedMs":$ts}""" + "\n")
      w.flush()
    } finally out.close()
  }

  private def fileMd5(f: java.io.File): String =
    streamMd5(java.nio.file.Files.newInputStream(f.toPath))

  /** md5 of the archived destination object (read through the Hadoop
    * FS — works on any scheme the archive targets). */
  private def destMd5(fs: FileSystem, p: HPath): String =
    streamMd5(fs.open(p))

  private def streamMd5(in: java.io.InputStream): String = {
    val md = MessageDigest.getInstance("MD5")
    try {
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) md.update(buf, 0, n)
        n = in.read(buf)
      }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }
}
