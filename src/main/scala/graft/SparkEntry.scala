package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.TimeBars
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each registry entry is one operator from SURVEY §2 (or a north-star
  * extension op): a Spark query over the driver testdata plus, when
  * SQL-expressible, a bit-exact DuckDB oracle twin.
  */
object SparkEntry {

  /** All correctness-gate entries, grouped by domain. */
  def registry: Seq[Q] =
    TickQueries.all ++ BarQueries.all ++ BookQueries.all ++
      RelationalQueries.all ++ ExtQueries.all ++ EventQueries.all

  /** Registry partitioned for the bench's per-group totals: `core` =
    * the reference's own operator surface (ticks/bars/books/relational),
    * `ext` = the training-data-pipeline extensions. Regressions localize
    * to a group as the suite grows (VERDICT r5 #8). */
  def registryGroups: Seq[(String, Seq[Q])] = Seq(
    "core" -> (TickQueries.all ++ BarQueries.all ++ BookQueries.all ++
      RelationalQueries.all),
    "ext" -> (ExtQueries.all ++ EventQueries.all))

  /** Finer per-query families (VERDICT r6 #7): `core` plus the ext
    * registry's dedup/ann/text/pipeline/multimodal blocks. Emitted as
    * per-family totals in bench.json (regressions localize to a family
    * in cross-round diffs) and accepted as `SPARK_GRAFT_BENCH_ONLY`
    * tokens (one-token family A/B sweeps). */
  def registryFamilies: Seq[(String, Seq[Q])] =
    Seq("core" -> registryGroups.head._2) ++ ExtQueries.families ++
      Seq("events" -> EventQueries.all)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's minimum end-to-end slice (SURVEY §7.2): 1-minute OHLCV
    * bars over the tick stream. */
  def entry(spark: SparkSession): DataFrame =
    TimeBars.bars(Tables.updates(spark, "/root/testdata/sf0.001"))

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
