package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators._

/** Correctness-gate entries for the bar/candle family (SURVEY §2.4-§2.5):
  * tick/volume/dollar bars, continuation fill, rebin, missing ranges, gap
  * detection. Volume/dollar bars carry reset-accumulator semantics that
  * window functions cannot express; their oracles are linear-recursive CTEs
  * ([[graft.operators.FoldBars.volumeBarsOracleSql]]), and the reference
  * test vectors are additionally golden-tested in `FoldBarsSpec`. */
object BarQueries {

  private val TickInterval = 50
  private val VolumeInterval = 300.0
  private val DollarInterval = 15000.0
  private val VpinWindow = 5
  private val ImbThreshold = 4L
  private val GapThresholdSec = 3600L

  private def u(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.updates(s, dir)

  /** Shared DuckDB CTE body for 1-min time bars incl. the drop-last quirk
    * (mirrors `TimeBars.bars`). */
  private val barsCte: String =
    """SELECT symbol, start, start AS "end", open, high, low, close, volume FROM (
      |SELECT symbol, ((ts // 1000) // 60) * 60 AS start,
      | first(price ORDER BY ts, seq) AS open,
      | max(price) AS high, min(price) AS low,
      | last(price ORDER BY ts, seq) AS close,
      | CAST(SUM(CAST(size AS DECIMAL(30,4))) AS DOUBLE) AS volume
      |FROM updates WHERE is_trade GROUP BY 1, 2
      |QUALIFY start < max(start) OVER (PARTITION BY symbol))"""
      .stripMargin.replace('\n', ' ')

  /** Continuation-filled bars CTE chain (mirrors
    * `TimeBars.continuationFill`). */
  private val filledCtes: String =
    s"""bars AS ($barsCte),
       |span AS (SELECT symbol, min(start) AS lo, max(start) AS hi FROM bars GROUP BY 1),
       |grid AS (SELECT symbol, unnest(generate_series(lo, hi, 60)) AS start FROM span),
       |j AS (SELECT g.symbol, g.start, b."end" AS e, b.open, b.high, b.low,
       |  b.close, b.volume FROM grid g
       |  LEFT JOIN bars b ON g.symbol = b.symbol AND g.start = b.start),
       |filled AS (SELECT symbol, start, coalesce(e, start + 60) AS "end",
       |  coalesce(open, fill) AS open, coalesce(high, fill) AS high,
       |  coalesce(low, fill) AS low, coalesce(close, fill) AS close,
       |  coalesce(volume, 0.0) AS volume FROM (
       |   SELECT *, last_value(close IGNORE NULLS) OVER (
       |     PARTITION BY symbol ORDER BY start
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fill
       |   FROM j))""".stripMargin.replace('\n', ' ')

  val all: Seq[Q] = Seq(

    // A6 — tick bars with the counter-before-filter quirk
    // (`tick_bars.rs:20-34,66-104`).
    Q("q_tick_bars",
      (s, dir) => TickBars.bars(u(s, dir), TickInterval)
        .orderBy("symbol", "start"),
      Some(Tables.withUpdates(TickBars.oracleSql(TickInterval)))),

    // A5 — volume bars: reset-accumulator sampler
    // (`volume_bars.rs:20-34`); ordered Spark fold, recursive-CTE oracle.
    Q("q_volume_bars",
      (s, dir) => FoldBars.volumeBars(u(s, dir), VolumeInterval)
        .orderBy("symbol", "start"),
      Some(Tables.withUpdatesChainRecursive(
        FoldBars.volumeBarsOracleSql(VolumeInterval)))),

    // A7 — dollar bars: price*size accumulator (`dollar_bars.rs:25-35`).
    Q("q_dollar_bars",
      (s, dir) => FoldBars.dollarBars(u(s, dir), DollarInterval)
        .orderBy("symbol", "start"),
      Some(Tables.withUpdatesChainRecursive(
        FoldBars.dollarBarsOracleSql(DollarInterval)))),

    // Tick imbalance bars (beyond-reference, López de Prado's
    // information-driven sampling, fixed threshold): integer tick-rule
    // imbalance reset fold, recursive-CTE oracle.
    Q("q_tick_imbalance_bars",
      (s, dir) => FoldBars.tickImbalanceBars(u(s, dir), ImbThreshold)
        .orderBy("symbol", "start"),
      Some(Tables.withUpdatesChainRecursive(
        FoldBars.tickImbalanceBarsOracleSql(ImbThreshold)))),

    // VPIN (beyond-reference, Easley/López de Prado/O'Hara 2012):
    // tick-rule signed flow in volume buckets, trailing-window toxicity
    // ratio; reset-fold bucketing, recursive-CTE oracle.
    Q("q_vpin",
      (s, dir) => Vpin.vpin(u(s, dir), VolumeInterval, VpinWindow)
        .orderBy("symbol", "bucket"),
      Some(Tables.withUpdatesChainRecursive(
        Vpin.vpinSql(VolumeInterval, VpinWindow)))),

    // B8/J4 — continuation candles: grid left-join + forward fill
    // (`time_bars.rs:190-223`).
    Q("q_continuation",
      (s, dir) => TimeBars.continuationFill(TimeBars.bars(u(s, dir)))
        .orderBy("symbol", "start"),
      Some(Tables.withUpdates(filledCtes,
        """SELECT * FROM filled ORDER BY symbol, start"""))),

    // A4 — rebin 1-min bars to 5-min over the continuation-filled grid
    // (`time_bars.rs:252-329`): positional groups of 5, trailing partial
    // dropped.
    Q("q_rebin",
      (s, dir) => TimeBars.rebin(
        TimeBars.continuationFill(TimeBars.bars(u(s, dir))),
        newScale = 5, align = true)
        .orderBy("symbol", "start"),
      Some(Tables.withUpdates(filledCtes,
        """SELECT symbol, min(start) AS start, max(start) AS "end",
          | first(open ORDER BY start) AS open, max(high) AS high,
          | min(low) AS low, last(close ORDER BY start) AS close,
          | CAST(SUM(CAST(volume AS DECIMAL(30,4))) AS DOUBLE) AS volume
          |FROM (SELECT *, (row_number() OVER (PARTITION BY symbol ORDER BY start) - 1) // 5 AS grp
          |      FROM filled)
          |GROUP BY symbol, grp HAVING count(*) = 5
          |ORDER BY symbol, start""".stripMargin.replace('\n', ' ')))),

    // B7/J3 — missing minute epochs collapsed to gaps-and-islands ranges
    // (`time_bars.rs:159-186,332-394`).
    Q("q_missing_ranges",
      (s, dir) => TimeBars.missingRanges(TimeBars.bars(u(s, dir)))
        .orderBy("symbol", "start"),
      Some(Tables.withUpdates(
        s"""bars AS ($barsCte),
           |span AS (SELECT symbol, min(start) AS lo, max(start) AS hi FROM bars GROUP BY 1),
           |grid AS (SELECT symbol, unnest(generate_series(lo, hi - 60, 60)) AS epoch
           |         FROM span WHERE hi - 60 >= lo),
           |miss AS (SELECT g.symbol, g.epoch FROM grid g
           |  LEFT JOIN bars b ON b.symbol = g.symbol AND b.start = g.epoch
           |  WHERE b.start IS NULL),
           |isl AS (SELECT symbol, epoch,
           |  epoch / 60 - row_number() OVER (PARTITION BY symbol ORDER BY epoch) AS k
           |  FROM miss)""".stripMargin.replace('\n', ' '),
        """SELECT symbol, min(epoch) AS start, max(epoch) AS "end"
          |FROM isl GROUP BY symbol, k ORDER BY symbol, start"""
          .stripMargin.replace('\n', ' ')))),

    // B6 — gap detection (`dtfcheck.rs:20-35`).
    Q("q_gap_detect",
      (s, dir) => Gaps.detect(u(s, dir), GapThresholdSec)
        .orderBy("symbol", "ts"),
      Some(Tables.withUpdates(Gaps.oracleSql(GapThresholdSec))))
  )
}
