package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions._

/** Bucket-level microstructure features — the consumer-side analytics a
  * market-data pipeline computes downstream of the reference's candle
  * surface (a beyond-reference capability, like the general joins and
  * the as-of join): volume-weighted average price, signed trade-flow
  * imbalance, and end-of-bucket quote spread/midpoint.
  *
  * All three are single-shuffle per-(symbol, bucket) aggregations with
  * map-side partial combine — the [[TimeBars.bars]] plan shape — under
  * the engine's integer-exactness contract: every SUM runs in decimal
  * ([[graft.functions.exactSum]]/[[graft.functions.exactSumProduct]]),
  * ordered first/last are `min_by`/`max_by` over `(ts, seq)`, and each
  * derived ratio is a single IEEE operation over identically-derived
  * doubles — bit-portable to the DuckDB twins with no tolerance. */
object Microstructure {

  private def bucketed(seconds: Long) =
    timeBucket(tsSeconds(col("ts")), seconds).as("start")

  /** VWAP bars: per (symbol, bucket) `Σ(price·size) / Σ(size)` over
    * TRADES, plus the trade count and both exact operands (`turnover`,
    * `volume`). A bucket whose only trades have size 0 (the data's
    * delete-coded rows) emits null vwap — 0/0 is undefined, not 0. */
  def vwapBars(updates: DataFrame, seconds: Long = 60): DataFrame =
    updates.where(col("is_trade"))
      .groupBy(col("symbol"), bucketed(seconds))
      .agg(
        count(lit(1)).as("n_trades"),
        exactSum(col("size")).as("volume"),
        exactSumProduct(col("price"), col("size")).as("turnover"))
      .select(col("symbol"), col("start"), col("n_trades"),
        col("volume"), col("turnover"),
        when(col("volume") =!= 0.0d, col("turnover") / col("volume"))
          .as("vwap"))

  def vwapBarsSql(seconds: Long = 60): String =
    s"""SELECT symbol, start, n_trades, volume, turnover,
       | CASE WHEN volume <> 0.0 THEN turnover / volume END AS vwap
       |FROM (
       | SELECT symbol, ((ts // 1000) // $seconds) * $seconds AS start,
       |  count(*) AS n_trades,
       |  CAST(SUM(CAST(size AS DECIMAL(30,4))) AS DOUBLE) AS volume,
       |  CAST(SUM(CAST(CAST(price AS VARCHAR) AS DECIMAL(18,2))
       |    * CAST(CAST(size AS VARCHAR) AS DECIMAL(16,4))) AS DOUBLE)
       |   AS turnover
       | FROM updates WHERE is_trade GROUP BY 1, 2)
       |ORDER BY symbol, start""".stripMargin.replace('\n', ' ')

  /** Signed trade-flow imbalance per (symbol, bucket):
    * `(buy_vol − sell_vol) / (buy_vol + sell_vol)` with buys = bid-side
    * trades. The classic order-flow pressure signal; ±1 means one-sided
    * flow, null means a bucket with zero traded volume. */
  def tradeImbalance(updates: DataFrame, seconds: Long = 60): DataFrame =
    updates.where(col("is_trade"))
      .groupBy(col("symbol"), bucketed(seconds))
      .agg(
        exactSum(when(col("is_bid"), col("size")).otherwise(0.0d))
          .as("buy_vol"),
        exactSum(when(!col("is_bid"), col("size")).otherwise(0.0d))
          .as("sell_vol"))
      .select(col("symbol"), col("start"), col("buy_vol"),
        col("sell_vol"),
        when(col("buy_vol") + col("sell_vol") =!= 0.0d,
          (col("buy_vol") - col("sell_vol")) /
            (col("buy_vol") + col("sell_vol"))).as("imbalance"))

  def tradeImbalanceSql(seconds: Long = 60): String =
    s"""SELECT symbol, start, buy_vol, sell_vol,
       | CASE WHEN buy_vol + sell_vol <> 0.0
       |  THEN (buy_vol - sell_vol) / (buy_vol + sell_vol) END AS imbalance
       |FROM (
       | SELECT symbol, ((ts // 1000) // $seconds) * $seconds AS start,
       |  CAST(SUM(CAST(CASE WHEN is_bid THEN size ELSE 0.0 END
       |    AS DECIMAL(30,4))) AS DOUBLE) AS buy_vol,
       |  CAST(SUM(CAST(CASE WHEN NOT is_bid THEN size ELSE 0.0 END
       |    AS DECIMAL(30,4))) AS DOUBLE) AS sell_vol
       | FROM updates WHERE is_trade GROUP BY 1, 2)
       |ORDER BY symbol, start""".stripMargin.replace('\n', ' ')

  /** End-of-bucket quote state per (symbol, bucket) from LEVEL updates:
    * the last bid price, last ask price (level SETS with size > 0 —
    * a size-0 update deletes its level and carries no quote), their
    * spread and midpoint. Sides resolve independently via `max_by`
    * over `(ts, seq)` keyed only on that side's rows (rows off-side
    * have a null ordering key and are ignored — the FILTER-clause
    * semantics of the twin); a bucket missing a side emits null
    * spread/mid. */
  def bucketSpread(updates: DataFrame, seconds: Long = 60): DataFrame = {
    def sideLast(side: org.apache.spark.sql.Column) =
      max_by(when(side, col("price")),
        when(side, struct(col("ts"), col("seq"))))
    updates.where(!col("is_trade") && col("size") > 0.0d)
      .groupBy(col("symbol"), bucketed(seconds))
      .agg(
        sideLast(col("is_bid")).as("last_bid"),
        sideLast(!col("is_bid")).as("last_ask"))
      .select(col("symbol"), col("start"), col("last_bid"),
        col("last_ask"),
        (col("last_ask") - col("last_bid")).as("spread"),
        ((col("last_bid") + col("last_ask")) / 2.0d).as("mid"))
  }

  def bucketSpreadSql(seconds: Long = 60): String =
    s"""SELECT symbol, start, last_bid, last_ask,
       | last_ask - last_bid AS spread,
       | (last_bid + last_ask) / 2.0 AS mid
       |FROM (
       | SELECT symbol, ((ts // 1000) // $seconds) * $seconds AS start,
       |  last(price ORDER BY ts, seq) FILTER (WHERE is_bid) AS last_bid,
       |  last(price ORDER BY ts, seq) FILTER (WHERE NOT is_bid) AS last_ask
       | FROM updates WHERE NOT is_trade AND size > 0.0 GROUP BY 1, 2)
       |ORDER BY symbol, start""".stripMargin.replace('\n', ' ')
}
