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
  *    ([[metadata]]) — the queryable catalog a 100 TB archive needs;
  *  - archive unit is a closed parquet flush file; relative paths (book
  *    dirs) are preserved at the destination, so `spark.read.parquet(dest)`
  *    over the archive keeps working per book.
  *
  * Durability order per file (upload.rs uploads then deletes): copy to a
  * temporary name at the destination, fsync-close, verify length, atomic
  * rename into place, append metadata, and only then delete the local file
  * (when `removeLocal`) — a crash at any point leaves either the local
  * file, or both copies, never neither. The local delete (the only
  * reader-visible mutation) runs under `swapLock` — pass the Engine when
  * archiving a live folder, same reader-exclusion contract as
  * [[graft.sources.Compaction]].
  */
final class Archiver(spark: SparkSession, srcDir: String, destUri: String,
    minFileSize: Long = 1L << 20, removeLocal: Boolean = true,
    swapLock: AnyRef = new AnyRef) {

  case class ArchiveRecord(name: String, size: Long, md5: String,
      dest: String, startMs: Long, finishMs: Long, removed: Boolean)

  private val conf: Configuration = spark.sessionState.newHadoopConf()
  private val stopped = new AtomicBoolean(false)

  private def destFs: FileSystem = new HPath(destUri).getFileSystem(conf)

  /** One archival sweep: every parquet file under `srcDir` (recursive, book
    * subdirs preserved) with size ≥ `threshold` is copied to the
    * destination, verified, logged, and (optionally) removed locally.
    * Returns the records for this sweep. Files already present at the
    * destination with the same length are treated as previously-archived
    * (re-run safe after a crash between copy and delete). */
  def scanOnce(threshold: Long = minFileSize): Seq[ArchiveRecord] = {
    val src = new java.io.File(srcDir)
    def walk(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
        if (f.isDirectory) walk(f)
        else if (f.getName.endsWith(".parquet") && f.length >= threshold)
          Seq(f)
        else Seq.empty
      }
    val fs = destFs
    val recs = walk(src).map { f =>
      val rel = src.toPath.relativize(f.toPath).toString
      archiveOne(fs, f, rel)
    }
    if (recs.nonEmpty) appendMeta(fs, recs)
    recs
  }

  private def archiveOne(fs: FileSystem, f: java.io.File,
      rel: String): ArchiveRecord = {
    val t0 = System.currentTimeMillis()
    val dest = new HPath(destUri, rel)
    val size = f.length
    val md5hex = fileMd5(f)
    if (!(fs.exists(dest) && fs.getFileStatus(dest).getLen == size)) {
      val tmp = new HPath(destUri, rel + ".inprogress")
      fs.mkdirs(dest.getParent)
      val out = fs.create(tmp, true)
      try java.nio.file.Files.copy(f.toPath, out) finally out.close()
      require(fs.getFileStatus(tmp).getLen == size,
        s"archive length mismatch for $rel")
      fs.delete(dest, false) // re-archive after partial: replace
      require(fs.rename(tmp, dest), s"archive rename failed for $rel")
    }
    val removed = removeLocal && swapLock.synchronized(f.delete())
    ArchiveRecord(rel, size, md5hex, dest.toString, t0,
      System.currentTimeMillis(), removed)
  }

  /** Archive EVERYTHING still local, regardless of size — the reference's
    * shutdown path (`run_exit_hook`, run.rs:134-137). */
  def exitHook(): Seq[ArchiveRecord] = scanOnce(threshold = 0L)

  /** Background interval loop (run.rs:90-131's sleeping thread). Returns
    * the thread; [[stop]] ends it at the next wakeup. */
  def start(intervalSecs: Long = 30L): Thread = {
    val t = new Thread(() => {
      while (!stopped.get()) {
        try Thread.sleep(intervalSecs * 1000L)
        catch { case _: InterruptedException => () }
        if (!stopped.get()) scanOnce()
      }
    }, s"graft-archiver-$srcDir")
    t.setDaemon(true)
    t.start()
    t
  }

  def stop(): Unit = stopped.set(true)

  /** The archive catalog as a DataFrame — the DCB-post analog, but
    * queryable in place: one row per archived file (name, size, md5,
    * dest, timings, removed). */
  def metadata(): DataFrame =
    spark.read.schema(
      "name STRING, size BIGINT, md5 STRING, dest STRING, " +
        "startMs BIGINT, finishMs BIGINT, removed BOOLEAN")
      .json(metaDir)

  private def metaDir: String = destUri + "/_archive_meta"

  private def appendMeta(fs: FileSystem, recs: Seq[ArchiveRecord]): Unit = {
    val dir = new HPath(metaDir)
    fs.mkdirs(dir)
    val part = new HPath(dir,
      s"meta-${System.currentTimeMillis()}-${recs.hashCode.abs}.json")
    val out = fs.create(part, true)
    try {
      val w = new java.io.OutputStreamWriter(out, "UTF-8")
      recs.foreach { r =>
        w.write(
          s"""{"name":"${r.name}","size":${r.size},"md5":"${r.md5}",""" +
            s""""dest":"${r.dest}","startMs":${r.startMs},""" +
            s""""finishMs":${r.finishMs},"removed":${r.removed}}""" + "\n")
      }
      w.flush()
    } finally out.close()
  }

  private def fileMd5(f: java.io.File): String = {
    val md = MessageDigest.getInstance("MD5")
    val in = java.nio.file.Files.newInputStream(f.toPath)
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
