package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.model.{Candle, Update}

/** Reset-semantics bar samplers (volume / dollar bars).
  *
  * Reference: `crates/tdb-core/src/postprocessing/candle/volume_bars.rs:20-103`
  * and `dollar_bars.rs:25-103`. Bar membership depends on a running
  * accumulator that resets to zero when it crosses the interval — NOT
  * expressible as `floor(cumsum/interval)` (SURVEY §7.4-1), so this is the
  * per-symbol ordered-fold pattern: `repartition(symbol)` +
  * `sortWithinPartitions(ts,seq)` + a STREAMING `mapPartitions` fold.
  * Nothing is materialized per group — Spark's external sort spills, the
  * fold is O(1) memory — so a symbol larger than executor memory still
  * works at 100 TB.
  *
  * Sampler quirks preserved:
  *  - the first trade of a bar run never feeds the accumulator (the
  *    reference only calls `is_sample` when a candle already exists);
  *  - a boundary trade closes the previous bar and STARTS the next one
  *    (its weight is swallowed by the reset);
  *  - the final partial bar is emitted.
  *
  * == Chunk-stitched parallel fold: experiment result (round 2) ==
  *
  * Can one hot symbol's fold be parallelized by folding time-chunks
  * independently and stitching prefix states?
  *
  *  1. NAIVE STITCHING IS SEMANTICALLY IMPOSSIBLE. A chunk's output is a
  *     function of its entry state (accumulator, open candle), and the
  *     position of the FIRST in-chunk boundary shifts with the entry
  *     accumulator — which shifts every subsequent boundary. The chunk
  *     transition function has O(chunk) descriptive complexity (it is the
  *     step function of the chunk's prefix-sum crossings), so there is no
  *     compact per-chunk summary to combine — unlike decomposable aggs.
  *  2. AN EXACT PARALLEL REFORMULATION EXISTS. In cumulative-weight terms
  *     (C over trades in (ts,seq) order), boundary b_{m+1} is the first j
  *     with `C_j > C_{b_m} + interval` — a jump chain over a monotone
  *     array. Distributed prefix sums give C without a funnel (local sums
  *     + broadcast partition offsets), and the boundary orbit is then a
  *     LIST-RANKING problem: O(log bars) pointer-doubling rounds, each a
  *     full shuffle of the trade index. That loses to this one-shuffle
  *     O(1)-memory streaming fold unless a single symbol's linear scan
  *     exceeds a task's wall-time budget by more than the list-ranking
  *     constant — and the fold already spills (external sort), so memory
  *     is never the forcing issue.
  *  3. BIT-STABILITY: the reformulation is exact for VOLUME bars (sizes
  *     are quarter-multiples, so `C_j - C_{b_m}` is exact), but NOT for
  *     dollar bars — `C_j - C_{b_m} > interval` reassociates the float
  *     accumulation that the sequential `acc += price*size` performs, and
  *     can flip a boundary at the ulp edge.
  *
  * Verdict: the streaming fold stays the shipped path; revisit list
  * ranking only for a deployment with one symbol so large that its linear
  * scan dominates the job's critical path.
  */
object FoldBars {

  /** Bar boundary when cumulative `size` exceeds `interval`
    * (`volume_bars.rs:24-33`). */
  def volumeBars(updates: DataFrame, interval: Double): DataFrame =
    fold(updates, interval, u => u.size)

  /** Bar boundary when cumulative `price*size` exceeds `interval`
    * (`dollar_bars.rs:25-35`); candle volume still accumulates `size`. */
  def dollarBars(updates: DataFrame, interval: Double): DataFrame =
    fold(updates, interval, u => u.price * u.size)

  private def fold(updates: DataFrame, interval: Double,
      weight: Update => Double): DataFrame = {
    val spark = updates.sparkSession
    import spark.implicits._
    updates
      .repartition(col("symbol"))
      .sortWithinPartitions("symbol", "ts", "seq")
      .as[Update]
      .mapPartitions(rows => new BarFold(rows, interval, weight))
      .toDF()
  }

  /** DuckDB oracle twin of [[volumeBars]]: the reset-accumulator fold as a
    * linear-recursive CTE — bar membership depends on the accumulator state
    * after the previous trade, which window functions cannot express, but a
    * recursive CTE stepping `rn -> rn+1` per symbol can (one working row per
    * symbol per step). Bit-exact vs the Spark fold: sizes are
    * quarter-multiples (exact doubles) and the accumulator advances in the
    * same (ts,seq) order as [[BarFold]]. Oracle-only — O(max rows/symbol)
    * iterations is fine at correctness SF; the Spark fold is the scale path. */
  def volumeBarsOracleSql(interval: Double): String =
    foldOracleSql("t.size", interval)

  /** DuckDB oracle twin of [[dollarBars]] (accumulates `price*size`,
    * one IEEE multiply + add per trade, same order ⇒ same bits). */
  def dollarBarsOracleSql(interval: Double): String =
    foldOracleSql("(t.price * t.size)", interval)

  /** Body starts with WITH; wrap via [[graft.Tables.withUpdatesChainRecursive]]. */
  private def foldOracleSql(weight: String, interval: Double): String =
    s"""WITH trades AS MATERIALIZED (
       |  SELECT symbol, ts, seq, price, size,
       |         row_number() OVER (PARTITION BY symbol ORDER BY ts, seq) AS rn
       |  FROM updates WHERE is_trade),
       |fold AS (
       |  SELECT symbol, rn, ts, price, size, 1 AS bar, CAST(0.0 AS DOUBLE) AS acc
       |  FROM trades WHERE rn = 1
       |  UNION ALL
       |  SELECT t.symbol, t.rn, t.ts, t.price, t.size,
       |    CASE WHEN f.acc + $weight > $interval THEN f.bar + 1 ELSE f.bar END,
       |    CASE WHEN f.acc + $weight > $interval THEN CAST(0.0 AS DOUBLE)
       |         ELSE f.acc + $weight END
       |  FROM fold f JOIN trades t ON t.symbol = f.symbol AND t.rn = f.rn + 1)
       |SELECT symbol, min(ts) AS start, max(ts) AS "end",
       |  first(price ORDER BY rn) AS open, max(price) AS high, min(price) AS low,
       |  last(price ORDER BY rn) AS close,
       |  CAST(SUM(CAST(size AS DECIMAL(30,4))) AS DOUBLE) AS volume
       |FROM fold GROUP BY symbol, bar ORDER BY symbol, start"""
      .stripMargin.replace('\n', ' ')

  /** Tick imbalance bars (López de Prado's information-driven
    * sampling, fixed-threshold form — a beyond-reference capability
    * next to [[Vpin]]): bar boundary when the running ABSOLUTE
    * tick-rule imbalance `|Σ b_t|` exceeds `threshold`, `b_t` the
    * tick-rule sign with carry ([[Microstructure.tickRuleFlow]]'s
    * convention; a symbol's leading unclassified trades contribute 0).
    * Sampler quirks mirror the volume/dollar bars verbatim: the first
    * trade of a bar never feeds the accumulator, a boundary trade
    * closes the previous bar and starts the next with its contribution
    * swallowed, the final partial bar is emitted. The accumulator is
    * an exact INTEGER, so — unlike the dollar bars (float
    * reassociation, see the chunk-stitching analysis above) — the
    * boundary orbit is even chunk-stitchable in principle; shipped as
    * the same one-pass O(1)-state fold. Non-finite prices raise loud
    * (a NaN price would flip `dir` differently under Scala IEEE vs the
    * twin's NaN-greatest compare). */
  def tickImbalanceBars(updates: DataFrame, threshold: Long): DataFrame = {
    val spark = updates.sparkSession
    import spark.implicits._
    updates.where(col("is_trade"))
      .repartition(col("symbol"))
      .sortWithinPartitions("symbol", "ts", "seq")
      .as[Update]
      .mapPartitions(rows => new ImbalanceFold(rows, threshold))
      .toDF()
  }

  /** DuckDB oracle twin of [[tickImbalanceBars]]: the tick-rule sign
    * as windows (the [[Microstructure.tickRuleFlowSql]] spelling), the
    * integer reset fold as a linear-recursive CTE, the candle as the
    * [[volumeBarsOracleSql]] group-by. Starts with WITH RECURSIVE
    * chaining — wrap via [[graft.Tables.withUpdatesChainRecursive]]. */
  def tickImbalanceBarsOracleSql(threshold: Long): String =
    s"""WITH tr0 AS (
       |  SELECT symbol, ts, seq, price, size,
       |    CASE WHEN price > lag(price, 1) OVER w THEN 1
       |         WHEN price < lag(price, 1) OVER w THEN -1
       |         ELSE 0 END AS dir,
       |    row_number() OVER w AS rn
       |  FROM updates WHERE is_trade
       |  WINDOW w AS (PARTITION BY symbol ORDER BY ts, seq)),
       |tr AS MATERIALIZED (
       |  SELECT symbol, ts, rn, price, size,
       |    COALESCE(last_value(CASE WHEN dir <> 0 THEN dir END
       |        IGNORE NULLS)
       |      OVER (PARTITION BY symbol ORDER BY rn
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |      0) AS b
       |  FROM tr0),
       |ifold AS (
       |  SELECT symbol, rn, 1 AS bar, CAST(0 AS BIGINT) AS theta
       |  FROM tr WHERE rn = 1
       |  UNION ALL
       |  SELECT t.symbol, t.rn,
       |    CASE WHEN ABS(f.theta + t.b) > $threshold THEN f.bar + 1
       |         ELSE f.bar END,
       |    CASE WHEN ABS(f.theta + t.b) > $threshold
       |         THEN CAST(0 AS BIGINT) ELSE f.theta + t.b END
       |  FROM ifold f JOIN tr t ON t.symbol = f.symbol
       |    AND t.rn = f.rn + 1)
       |SELECT t.symbol, min(t.ts) AS start, max(t.ts) AS "end",
       |  first(t.price ORDER BY t.rn) AS open, max(t.price) AS high,
       |  min(t.price) AS low, last(t.price ORDER BY t.rn) AS close,
       |  CAST(SUM(CAST(t.size AS DECIMAL(30,4))) AS DOUBLE) AS volume
       |FROM ifold f JOIN tr t ON t.symbol = f.symbol AND t.rn = f.rn
       |GROUP BY t.symbol, f.bar ORDER BY t.symbol, start"""
      .stripMargin.replace('\n', ' ')

  /** The [[tickImbalanceBars]] fold: [[BarFold]]'s iterator discipline
    * with an integer imbalance accumulator and the tick-rule carry
    * crossing bar boundaries (reset per symbol). */
  private final class ImbalanceFold(rows: Iterator[Update],
      threshold: Long) extends Iterator[Candle] {
    private var out: Candle = _
    private var cur: Candle = _
    private var sym: String = _
    private var theta = 0L
    private var prevPrice = 0.0d
    private var hasPrev = false
    private var carry = 0

    /** Current trade's tick-rule sign (carry INCLUDING current). */
    private def bOf(u: Update): Int = {
      val dir =
        if (!hasPrev) 0
        else if (u.price > prevPrice) 1
        else if (u.price < prevPrice) -1 else 0
      if (dir != 0) carry = dir
      prevPrice = u.price; hasPrev = true
      carry
    }

    @annotation.tailrec
    private def advance(): Unit =
      if (out == null) {
        if (!rows.hasNext) {
          if (cur != null) { out = cur; cur = null } // final partial bar
        } else {
          val u = rows.next()
          if (u.price.isNaN || u.price.isInfinite)
            throw new ArithmeticException(
              "tickImbalanceBars: non-finite price at symbol=" + u.symbol)
          if (u.size.isNaN || u.size.isInfinite)
            throw new ArithmeticException(
              "tickImbalanceBars: non-finite trade size at symbol=" +
                u.symbol)
          if (u.symbol != sym) {
            val flush = cur
            sym = u.symbol
            theta = 0L; prevPrice = 0.0d; hasPrev = false; carry = 0
            bOf(u) // first trade sets the carry, feeds nothing
            cur = newCandle(u)
            if (flush != null) out = flush else advance()
          } else {
            val b = bOf(u)
            if (math.abs(theta + b) > threshold) {
              theta = 0L
              out = cur
              cur = newCandle(u)
            } else { theta += b; cur = merge(cur, u); advance() }
          }
        }
      }

    override def hasNext: Boolean = { advance(); out != null }
    override def next(): Candle = {
      advance()
      val c = out; out = null; c
    }
  }

  private def newCandle(u: Update): Candle =
    Candle(u.symbol, u.ts, u.ts, u.price, u.price, u.price, u.price, u.size)

  private def merge(c: Candle, u: Update): Candle =
    Candle(c.symbol, c.start, u.ts, c.open, math.max(c.high, u.price),
      math.min(c.low, u.price), u.price, c.volume + u.size)

  /** Streaming per-partition fold; partitions hold whole symbols
    * contiguously (sorted by symbol first), state resets on symbol change. */
  private final class BarFold(rows: Iterator[Update], interval: Double,
      weight: Update => Double) extends Iterator[Candle] {
    private var out: Candle = _
    private var cur: Candle = _
    private var sym: String = _
    private var elapsed = 0.0

    @annotation.tailrec
    private def advance(): Unit =
      if (out == null) {
        if (!rows.hasNext) {
          if (cur != null) { out = cur; cur = null } // final partial bar
        } else {
          val u = rows.next()
          // raise-loud ingest guards (the finitePrice/finiteSize
          // stance): a NaN weight freezes the Scala accumulator where
          // the oracle's NaN-greatest compare closes every bar, and a
          // NaN price splits Scala math.min from DuckDB's
          // NaN-greatest MIN — corrupt feed values must fail loud,
          // never silently diverge
          if (u.is_trade && (u.price.isNaN || u.price.isInfinite))
            throw new ArithmeticException(
              "bars: non-finite price at symbol=" + u.symbol)
          if (u.is_trade && (u.size.isNaN || u.size.isInfinite))
            throw new ArithmeticException(
              "bars: non-finite trade size at symbol=" + u.symbol)
          if (u.symbol != sym) {
            val flush = cur
            sym = u.symbol
            elapsed = 0.0
            cur = if (u.is_trade) newCandle(u) else null
            if (flush != null) out = flush else advance()
          } else if (!u.is_trade) advance()
          else if (cur == null) { cur = newCandle(u); advance() }
          else {
            elapsed += weight(u)
            if (elapsed > interval) { // is_sample (volume_bars.rs:25-33)
              elapsed = 0.0
              out = cur
              cur = newCandle(u)
            } else { cur = merge(cur, u); advance() }
          }
        }
      }

    override def hasNext: Boolean = { advance(); out != null }
    override def next(): Candle = {
      advance()
      val c = out; out = null; c
    }
  }
}
