package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar column helpers — all composed from built-in (codegen'd) Spark
  * functions, no UDFs, so they stay inside whole-stage codegen and push down.
  *
  * Each mirrors a reference scalar (file:line cited per function) but is
  * implemented as a declarative expression so Catalyst can fold / push it.
  */
package object functions {

  /** Spread a narrow input across the local cores when the scan gave too
    * few partitions (e.g. one small parquet file on local[n]). LOCAL-ONLY:
    * the partition-count probe (`df.rdd`) forces a second physical
    * planning outside AQE's view, and on a cluster file splits already
    * provide parallelism — so this is an identity unless the master is
    * local (VERDICT r1).
    *
    * The probe result is memoized per (session, analyzed-plan semantic
    * hash): query construction runs inside the bench's timed region,
    * and the `.rdd` probe pays a full physical-planning pass per call
    * (the same cost class Tables.spreadBy's footer probe replaced —
    * r16). A (vanishingly rare) semantic-hash collision only flips the
    * spread/no-op branch, which is results-neutral by construction. */
  private val partsMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  def parallelized(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (!sc.isLocal) df
    else {
      val key = sc.applicationId + ":" +
        df.queryExecution.analyzed.semanticHash()
      val n = partsMemo.computeIfAbsent(key,
        _ => Integer.valueOf(df.rdd.getNumPartitions))
      if (n < sc.defaultParallelism)
        df.repartition(sc.defaultParallelism)
      else df
    }
  }


  /** Plan-stage materialization barrier with a DEPLOYMENT-SELECTED
    * durability level. Default: `localCheckpoint(eager)` — blocks owned
    * by the plan, GC'd with it, no CacheManager residue; the documented
    * trade-off is that lineage is truncated, so losing an executor
    * mid-query FAILS the query instead of recomputing (right for
    * interactive engine queries). A multi-hour batch campaign on
    * preemptible nodes sets `spark.graft.checkpoint.reliable=true`
    * (plus `sc.setCheckpointDir` to a durable FS) and every
    * materialization point in the engine switches to RELIABLE
    * checkpointing — lost partitions reload from the checkpoint files
    * and the query survives executor loss. One runtime conf, zero
    * operator changes: every ext/streaming op materializes through this
    * helper. */
  def checkpointed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    if (df.sparkSession.conf
        .getOption("spark.graft.checkpoint.reliable").contains("true"))
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** The newest materialized reliable-checkpoint directory (a
    * `.../rdd-N` path) under `root` — the handle a campaign runner
    * records after each [[checkpointed]] stage so a RESTARTED driver
    * can [[resumeCheckpoint]] instead of recomputing. Spark nests the
    * files as `<root>/<session-uuid>/rdd-<id>/part-*`; newest mtime
    * wins. */
  def latestCheckpointPath(root: String): Option[String] = {
    val dirs = for {
      uuid <- Option(new java.io.File(root).listFiles()).getOrElse(Array())
      if uuid.isDirectory
      rdd <- Option(uuid.listFiles()).getOrElse(Array[java.io.File]())
      if rdd.isDirectory && rdd.getName.startsWith("rdd-")
    } yield rdd
    dirs.sortBy(d => (d.lastModified(), d.getName)).lastOption
      .map(_.getPath)
  }

  /** Resume a [[checkpointed]] stage from its reliable checkpoint files
    * — the driver-restart half of the durability contract (the
    * executor-loss half is Spark's own in-session reload). The files
    * store rows, not metadata, so the caller supplies the stage's
    * schema; the result reads the part-files directly, recomputing
    * nothing (ReliableResumeSpec measures resume ≪ recompute). */
  def resumeCheckpoint(spark: org.apache.spark.sql.SparkSession,
      path: String, schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.graftglue.CheckpointBridge
      .readCheckpoint(spark, path, schema)

  /** Materialize a BOUNDED aggregate (per-symbol bin parameters, corpus
    * constants, percentile tables — anything whose cardinality is the
    * GROUP key domain, not the data size) as a LocalRelation: downstream
    * joins against it become broadcasts, composed operators never
    * recompute the subtree, and nothing is left registered in the
    * CacheManager. The collect is the same "tiny result, collected and
    * broadcast" phase-1 pattern as RebinnedBook's bin parameters. */
  def localRelation(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import scala.jdk.CollectionConverters._
    df.sparkSession.createDataFrame(df.collect().toSeq.asJava, df.schema)
  }

  /** Normalize an epoch to 13-digit milliseconds by repeated *10, exactly the
    * reference's `fill_digits` loop (`crates/tdb-core/src/utils.rs:11-22`):
    * multiplies by 10 until the value is >= 1_000_000_000_000. 0 stays 0.
    * Implemented as a when-chain: 12 steps reach ts=1 (1 -> 10^12), matching
    * the scalar `CommandParser.fillDigits` loop on the whole positive domain.
    * No overflow is reachable — the first true branch is the smallest k with
    * `ts*10^k >= lim`, whose product is < 10^13; larger-k branches are never
    * evaluated, and `ts >= lim` inputs take the leading branch. */
  def fillDigits(ts: Column): Column = {
    val lim = 1000000000000L
    // ts * 10^k for the smallest k with ts * 10^k >= lim (ts > 0)
    (1 to 12).foldLeft(when(ts === 0L || ts >= lim, ts)) { (acc, k) =>
      val m = math.pow(10, k).toLong
      acc.when(ts * m >= lim, ts * m)
    }.otherwise(ts)
  }

  /** Millisecond epoch -> epoch seconds (integer division, as the reference
    * does `fill_digits(ts) / 1000` everywhere, e.g. `time_bars.rs:28,85`). */
  def tsSeconds(ts: Column): Column = (fillDigits(ts) / 1000L).cast("long")

  /** Floor an epoch-seconds column onto a `sec`-second grid
    * (`time_bars.rs:28`: `ts / s * s`). */
  def timeBucket(tsSec: Column, sec: Long): Column =
    (tsSec / sec).cast("long") * sec

  /** Price discretization (`postprocessing/orderbook.rs:27-30`):
    * `(price * 10^d) as u64` — truncation toward zero. floor() matches the
    * Rust cast for the non-negative price domain and evaluates identically
    * in Spark and DuckDB (both operate on the same IEEE double product). */
  def discretize(price: Column, decimals: Int): Column =
    floor(price * math.pow(10, decimals)).cast("long")

  /** Inverse of [[discretize]] (`orderbook.rs:32-34`). */
  def undiscretize(level: Column, decimals: Int): Column =
    level.cast("double") / math.pow(10, decimals)

  /** Epoch seconds -> `"2018-02-13 02:28:48 UTC"` (reference
    * `utils.rs:39-45`). Session timezone must be UTC. */
  def epochToHuman(tsSec: Column): Column =
    concat(from_unixtime(tsSec, "yyyy-MM-dd HH:mm:ss"), lit(" UTC"))

  /** Reference CSV bool rendering: `t` / `f` (`dtf/update.rs:27-42`). */
  def tfBool(b: Column): Column = when(b, "t").otherwise("f")

  /** Reference JSON/CSV timestamp rendering: ms epoch printed as seconds
    * float (`dtf/update.rs:144-168`). */
  def tsAsSecondsFloat(ts: Column): Column = ts.cast("double") / 1000.0

  /** Parse `exchange_currency_asset` book names (`dtf/symbol.rs:15-29`). */
  def symbolParts(symbol: Column): (Column, Column, Column) = {
    val parts = split(symbol, "_")
    (parts.getItem(0), parts.getItem(1), parts.getItem(2))
  }

  /** Exact aggregate sum of a double column via decimal widening: sums are
    * order-independent in decimal, so Spark and the DuckDB oracle agree
    * bit-for-bit after the final cast back to double. Use for every SUM over
    * data-derived doubles (plain double sums differ across engines by
    * accumulation order). */
  def exactSum(c: Column): Column =
    sum(c.cast("decimal(30,4)")).cast("double")

  /** Exact sum of a product of two double columns (e.g. price*size,
    * extendedprice*(1-discount)): multiply in decimal, sum exactly.
    * Operand widths are chosen so the product stays ≤ DECIMAL(33,10):
    * DuckDB silently converts >38-width decimal products to double, which
    * would destroy cross-engine exactness. */
  def exactSumProduct(a: Column, b: Column): Column =
    sum(a.cast("decimal(18,2)") * b.cast("decimal(16,4)")).cast("double")

  /** Ordered-first: value of `v` at the smallest `(ts, seq)` in the group.
    * Spark's `first()` is order-nondeterministic; `min_by` over the order
    * struct is the deterministic spelling (SURVEY §7.4-2). */
  def orderedFirst(v: Column, ts: Column, seq: Column): Column =
    min_by(v, struct(ts, seq))

  /** Ordered-last: value of `v` at the largest `(ts, seq)` in the group. */
  def orderedLast(v: Column, ts: Column, seq: Column): Column =
    max_by(v, struct(ts, seq))

  /** Lowercase hex md5 of a byte array — the ONE spelling of the
    * digest-to-hex fold (it must match Spark's `md5()` SQL function and
    * DuckDB's `md5()` for every streamed-equals-batch and catalog
    * contract; hand-rolled copies invite silent divergence). */
  def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
}
