package graft

import java.nio.file.Files

import graft.server.{CommandParser, Engine}

/** T7 metrics recorder: the influx plugin's history loop
  * (`plugins/influx.rs:10-42`) as a queryable metrics sink + the exact
  * line-protocol body. */
class MetricsSpec extends SparkSpec {

  private def mkEngine(): Engine = {
    val e = new Engine(spark,
      Files.createTempDirectory("graft-metrics").toString)
    e.execute(CommandParser.parse("CREATE b1"))
    e.execute(CommandParser.parse("USE b1"))
    for (j <- 0 until 10)
      e.execute(CommandParser.parse(
        f"ADD ${1505177000.0 + j}%.3f, $j, t, f, 1.5, 2.0; INTO b1"))
    e.execute(CommandParser.parse("FLUSH")) // b1 -> disk, mem cleared
    e.execute(CommandParser.parse("CREATE b2"))
    for (j <- 0 until 5)
      e.execute(CommandParser.parse(
        f"ADD ${1505177000.0 + j}%.3f, $j, t, f, 1.5, 2.0; INTO b2"))
    e
  }

  test("bookSizes: disk bytes for flushed books, mem rows for staged ones") {
    val sizes = mkEngine().bookSizes().map(s => s._1 -> ((s._2, s._3))).toMap
    assert(sizes("b1")._1 > 0L, "flushed book must have disk bytes")
    assert(sizes("b1")._2 === 0L, "flush clears mem")
    assert(sizes("b2") === ((0L, 5L)))
    assert(sizes.contains("default"))
  }

  test("line protocol matches the reference body format (influx.rs:22-31)") {
    val e = mkEngine()
    val rec = e.newMetricsRecorder("file:///tmp/unused", db = "tdb")
    val body = rec.lineProtocol(
      Seq(("btc", 4096L, 7L), ("eth", 0L, 0L)))
    assert(body === "tdb,ob=btc disk=4096,size=7\ntdb,ob=eth disk=0,size=0\n")
  }

  test("hostile book names survive both sinks: JSON escape + influx tag escape") {
    val e = mkEngine()
    val dest = "file://" + Files.createTempDirectory("graft-metrics-esc")
    val rec = e.newMetricsRecorder(dest, db = "my db,x=1")
    // influx line protocol: tag values escape \ before space, comma,
    // '=' and double the backslash; the MEASUREMENT position escapes
    // only space/comma/backslash — '=' is not reserved there, so the
    // db's '=' passes through literally
    val body = rec.lineProtocol(Seq(("""a b,c=d\e""", 1L, 2L)))
    assert(body === """my\ db\,x=1,ob=a\ b\,c\=d\\e disk=1,size=2""" + "\n")
    // JSON sink: a book name with quote/backslash/newline must round-trip
    // through the writer and be readable (not a null row) by metrics()
    val hostile = "q\"uote\\back\nline"
    val n = {
      // route through pushOnce by staging a hostile-named book
      e.execute(CommandParser.parse("CREATE hostile")) // placeholder book
      rec.pushOnce()
    }
    assert(n >= 1)
    // direct writer check: jstr semantics via a custom-name recorder row
    val rec2 = e.newMetricsRecorder(dest + "/r2", db = hostile)
    assert(rec2.pushOnce() >= 1)
    val rows = rec2.metrics().collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[String]("db") == hostile),
      s"JSON rows must round-trip the hostile db name: ${rows.toSeq}")
  }

  test("interval sweeps append a queryable time series") {
    val e = mkEngine()
    val dest = "file://" + Files.createTempDirectory("graft-metrics-sink")
    val rec = e.newMetricsRecorder(dest)
    assert(rec.pushOnce() === 3) // b1, b2, default
    // state changes between sweeps are visible in the series
    for (j <- 10 until 14)
      e.execute(CommandParser.parse(
        f"ADD ${1505177100.0 + j}%.3f, $j, t, f, 1.5, 2.0; INTO b2"))
    assert(rec.pushOnce() === 3)
    val rows = rec.metrics().collect()
    assert(rows.length === 6)
    val b2 = rows.filter(_.getAs[String]("ob") == "b2")
      .sortBy(_.getAs[Long]("ts")).map(_.getAs[Long]("size")).toSeq
    assert(b2 === Seq(5L, 9L), s"series must show mem growth: $b2")
    val b1 = rows.filter(_.getAs[String]("ob") == "b1")
    assert(b1.forall(r => r.getAs[Long]("disk") > 0L))
    assert(rows.forall(_.getAs[String]("db") == "tectonic"))
  }
}
