package graft.server

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** T7 — the reference's InfluxDB history recorder
  * (`tdb-server-core/src/plugins/influx.rs:10-42`): an interval loop
  * fetches per-book (disk, mem) sizes from the broker and POSTs influx
  * line protocol `<db>,ob=<book> disk=<n>,size=<n>` to a time-series
  * store.
  *
  * Spark-native re-expression of the WHAT:
  *  - the recorded series lands as a JSON-lines part per sweep under
  *    `<dest>/_metrics/` on ANY Hadoop-compatible filesystem (the
  *    [[Archiver]] catalog pattern) and is directly queryable as a
  *    DataFrame ([[metrics]]) — at 100 TB the monitoring questions
  *    ("which books grew", "mem watermark over time") are themselves
  *    analytic queries, so the sink IS the time-series store;
  *  - [[lineProtocol]] renders the exact reference wire text for users
  *    who do run an InfluxDB endpoint (this container has no egress, so
  *    the HTTP POST stays out; the body it would send is spec-gated
  *    byte-for-byte against the reference's format).
  */
final class MetricsRecorder(spark: SparkSession, engine: Engine,
    destUri: String, db: String = "tectonic") {

  private val conf: Configuration = spark.sessionState.newHadoopConf()
  private val stopped = new AtomicBoolean(false)
  private val partSeq = new AtomicLong(0L)

  private def metricsDir: String = destUri + "/_metrics"

  /** JSON string escape (the [[Archiver]] `jstr` pattern, plus control
    * chars): book names are user input over the wire, so an embedded
    * quote/backslash must not corrupt the catalog rows [[metrics]] reads. */
  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Influx line-protocol TAG-value escape: `\` before space, comma,
    * `=` (reserved in tag keys/values) and backslash itself, per the
    * line-protocol spec — without it a book named `a b,c=d` yields a
    * malformed line. */
  private def lpTag(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case ' ' => "\\ "
      case ',' => "\\,"
      case '=' => "\\="
      case c => c.toString
    }

  /** Influx line-protocol MEASUREMENT escape: only space, comma and
    * backslash are reserved in the measurement position — `=` is NOT,
    * and escaping it there would make conforming parsers read a literal
    * backslash (a db named `a=b` must serialize as `a=b`, not `a\=b`). */
  private def lpMeasurement(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case ' ' => "\\ "
      case ',' => "\\,"
      case c => c.toString
    }

  /** The influx line-protocol body of one snapshot — exactly the
    * reference's `buf` (`influx.rs:22-31`): one
    * `<db>,ob=<book> disk=<n>,size=<n>` line per book. */
  def lineProtocol(sizes: Seq[(String, Long, Long)]): String =
    sizes.map { case (ob, disk, mem) =>
      s"${lpMeasurement(db)},ob=${lpTag(ob)} disk=$disk,size=$mem"
    }.mkString("", "\n", "\n")

  /** One recording sweep: snapshot [[Engine.bookSizes]], append a part
    * with one JSON row per book. Returns the number of rows recorded. */
  def pushOnce(): Int = {
    val ts = System.currentTimeMillis()
    val sizes = engine.bookSizes()
    if (sizes.isEmpty) return 0
    val fs: FileSystem = new HPath(destUri).getFileSystem(conf)
    val dir = new HPath(metricsDir)
    fs.mkdirs(dir)
    // monotone (ts, seq) part name: appends never collide, even two
    // sweeps in one millisecond
    val part = new HPath(dir,
      s"metrics-$ts-${partSeq.getAndIncrement()}.json")
    val out = fs.create(part, false)
    try {
      val w = new java.io.OutputStreamWriter(out, "UTF-8")
      sizes.foreach { case (ob, disk, mem) =>
        w.write(s"""{"ts":$ts,"db":${jstr(db)},"ob":${jstr(ob)},""" +
          s""""disk":$disk,"size":$mem}""" + "\n")
      }
      w.flush()
    } finally out.close()
    sizes.size
  }

  /** The recorded series, queryable in place: (ts, db, ob, disk, size)
    * — one row per (sweep, book). */
  def metrics(): DataFrame =
    spark.read.schema(
      "ts BIGINT, db STRING, ob STRING, disk BIGINT, size BIGINT")
      .json(metricsDir)

  /** Background interval loop (`influx.rs`' `timer_loop`). A failed sweep
    * logs and retries next interval, like the reference's error branch. */
  def start(intervalSecs: Long = 10L): Thread = {
    val t = new Thread(() => {
      while (!stopped.get()) {
        try Thread.sleep(intervalSecs * 1000L)
        catch { case _: InterruptedException => () }
        if (!stopped.get())
          try pushOnce()
          catch {
            case e: Throwable =>
              System.err.println(s"[graft-metrics] sweep failed: $e")
          }
      }
    }, "graft-metrics")
    t.setDaemon(true)
    t.start()
    t
  }

  def stop(): Unit = stopped.set(true)
}
