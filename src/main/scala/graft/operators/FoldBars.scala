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
