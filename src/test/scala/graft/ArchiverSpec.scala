package graft

import java.nio.file.{Files, Paths}

import graft.server.Archiver

/** S17 archival sink: size-thresholded tiering sweep, exit hook, metadata
  * catalog, crash re-run safety (gstorage plugin semantics, run.rs:90-137). */
class ArchiverSpec extends SparkSpec {

  private def mkTree(): (String, String) = {
    val src = Files.createTempDirectory("arch-src").toString
    val dest = Files.createTempDirectory("arch-dest").toString
    Files.createDirectories(Paths.get(src, "book1"))
    Files.write(Paths.get(src, "book1", "big.parquet"),
      Array.fill[Byte](4096)(7))
    Files.write(Paths.get(src, "book1", "small.parquet"),
      Array.fill[Byte](16)(3))
    (src, "file://" + dest)
  }

  test("sweep archives files over the threshold, preserves book paths") {
    val (src, dest) = mkTree()
    val a = new Archiver(spark, src, dest, minFileSize = 1024,
      removeLocal = false)
    val recs = a.scanOnce()
    assert(recs.map(_.name) === Seq("book1/big.parquet"))
    assert(recs.head.size === 4096 && recs.head.copied && !recs.head.removed)
    // local retained (removeLocal=false), dest byte-identical
    assert(Files.exists(Paths.get(src, "book1", "big.parquet")))
    val destFile = Paths.get(dest.stripPrefix("file://"),
      "book1", "big.parquet")
    assert(Files.readAllBytes(destFile).toSeq ===
      Array.fill[Byte](4096)(7).toSeq)
  }

  test("changed content at identical size is re-archived (mtime vs catalog row)") {
    val (src, dest) = mkTree()
    val first = new Archiver(spark, src, dest, minFileSize = 1024,
      removeLocal = false).scanOnce()
    assert(first.head.copied)
    // overwrite the local file with DIFFERENT bytes, same 4096 size, and
    // force the mtime past the catalog row's archivedMs
    val local = Paths.get(src, "book1", "big.parquet")
    Files.write(local, Array.fill[Byte](4096)(9))
    local.toFile.setLastModified(System.currentTimeMillis() + 5000)
    val second = new Archiver(spark, src, dest, minFileSize = 1024,
      removeLocal = false).scanOnce()
    assert(second.head.copied,
      "size-only identity must not skip a changed file")
    // dest and catalog both describe the NEW bytes
    val destFile = Paths.get(dest.stripPrefix("file://"),
      "book1", "big.parquet")
    assert(Files.readAllBytes(destFile).toSeq ===
      Array.fill[Byte](4096)(9).toSeq)
    val newMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(Array.fill[Byte](4096)(9)).map("%02x".format(_)).mkString
    val rows = new Archiver(spark, src, dest, minFileSize = 1024)
      .metadata().collect()
    assert(rows.length === 1 && rows.head.getAs[String]("md5") === newMd5)
    // untouched after the re-archive: third sweep is a cheap skip
    local.toFile.setLastModified(System.currentTimeMillis() - 5000)
    val third = new Archiver(spark, src, dest, minFileSize = 1024,
      removeLocal = false).scanOnce()
    assert(!third.head.copied)
  }

  test("removeLocal deletes the local copy only after the verified copy") {
    val (src, dest) = mkTree()
    val a = new Archiver(spark, src, dest, minFileSize = 1024)
    val recs = a.scanOnce()
    assert(recs.head.removed)
    assert(!Files.exists(Paths.get(src, "book1", "big.parquet")))
    assert(Files.exists(Paths.get(src, "book1", "small.parquet"))) // under threshold
  }

  test("exit hook archives everything regardless of size") {
    val (src, dest) = mkTree()
    val a = new Archiver(spark, src, dest, minFileSize = 1024)
    a.scanOnce()
    val recs = a.exitHook()
    assert(recs.map(_.name) === Seq("book1/small.parquet"))
    assert(!Files.exists(Paths.get(src, "book1", "small.parquet")))
  }

  test("metadata catalog is queryable, md5 matches, no duplicate rows") {
    val (src, dest) = mkTree()
    val a = new Archiver(spark, src, dest, minFileSize = 1024,
      removeLocal = false)
    a.scanOnce()
    a.scanOnce() // re-sweep of an already-archived file: no new row
    val expectMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(Array.fill[Byte](4096)(7))
      .map("%02x".format(_)).mkString
    val rows = a.metadata().collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[String]("name") === "book1/big.parquet")
    assert(r.getAs[Long]("size") === 4096L)
    assert(r.getAs[String]("md5") === expectMd5)
  }

  test("staging dirs (.compact/.old/_temporary) are never swept") {
    val (src, dest) = mkTree()
    for (d <- Seq("book1.compact", "book1.old", "_temporary")) {
      Files.createDirectories(Paths.get(src, d))
      Files.write(Paths.get(src, d, "part.parquet"),
        Array.fill[Byte](4096)(9))
    }
    val recs = new Archiver(spark, src, dest, minFileSize = 1024)
      .scanOnce()
    assert(recs.map(_.name) === Seq("book1/big.parquet"))
    // in-flight files untouched locally
    for (d <- Seq("book1.compact", "book1.old", "_temporary"))
      assert(Files.exists(Paths.get(src, d, "part.parquet")))
  }

  test("engine-wired archiver tiers a flushed book, archive stays readable") {
    import graft.server.{CommandParser, Engine}
    val e = new Engine(spark,
      Files.createTempDirectory("graft-arch-eng").toString)
    e.execute(CommandParser.parse("CREATE ab"))
    e.execute(CommandParser.parse("USE ab"))
    for (j <- 0 until 20)
      e.execute(CommandParser.parse(
        f"ADD ${1505177000.0 + j}%.3f, $j, t, f, 1.5, 2.0; INTO ab"))
    e.execute(CommandParser.parse("FLUSH ALL"))
    val dest = "file://" + Files.createTempDirectory("graft-arch-cold")
    val recs = e.newArchiver(dest).exitHook()
    assert(recs.nonEmpty && recs.forall(r => r.copied && !r.removed))
    // book path preserved: the archive reads back as the same table
    val archived = spark.read
      .parquet(dest.stripPrefix("file://") + "/book=ab")
    assert(archived.count() === 20)
  }

  test("crash between rename and catalog append: re-run restores the row before deleting local") {
    val (src, dest) = mkTree()
    new Archiver(spark, src, dest, minFileSize = 1024,
      removeLocal = false).scanOnce()
    // simulate the crash window: dest file in place, catalog row missing
    val metaDir = Paths.get(dest.stripPrefix("file://"), "_archive_meta")
    Files.list(metaDir).forEach(p => Files.delete(p))
    // re-run with removal: alreadyArchived path must recreate the catalog
    // row BEFORE the local delete — never an unrecorded deletion
    val recs = new Archiver(spark, src, dest, minFileSize = 1024)
      .scanOnce()
    assert(!recs.head.copied && recs.head.removed)
    val rows = new Archiver(spark, src, dest, minFileSize = 1024)
      .metadata().collect()
    assert(rows.length === 1 &&
      rows.head.getAs[String]("name") === "book1/big.parquet")
    // the repair row carries the REAL checksum, not a placeholder
    val expectMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(Array.fill[Byte](4096)(7)).map("%02x".format(_)).mkString
    assert(rows.head.getAs[String]("md5") === expectMd5,
      "crash-window repair row must carry the file's md5")
    // and the repair row does not clobber an EXISTING row on re-sweeps:
    // deterministic per-path part name, create-if-absent semantics
    new Archiver(spark, src, dest, minFileSize = 1024).scanOnce()
    assert(new Archiver(spark, src, dest, minFileSize = 1024)
      .metadata().collect().length === 1)
  }

  test("re-run after a crash between copy and delete is safe") {
    val (src, dest) = mkTree()
    // first pass without local removal simulates copy-done-delete-missed
    new Archiver(spark, src, dest, minFileSize = 1024,
      removeLocal = false).scanOnce()
    // second pass with removal: must not fail on the existing dest file,
    // must skip the copy (copied=false) and remove the local copy now
    val recs = new Archiver(spark, src, dest, minFileSize = 1024)
      .scanOnce()
    assert(recs.map(_.name) === Seq("book1/big.parquet"))
    assert(!recs.head.copied && recs.head.removed)
    assert(!Files.exists(Paths.get(src, "book1", "big.parquet")))
  }
}
