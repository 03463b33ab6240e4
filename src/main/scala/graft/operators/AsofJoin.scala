package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join over the tick stream — the classic time-series operator the
  * reference's consumers perform downstream of `GET` (join each trade to
  * the prevailing quote): for every trade, the most recent level-update
  * price STRICTLY earlier in the (ts, seq) total order for the same
  * symbol (reference total order O1/O2, `update.rs:93-103`).
  *
  * Implemented as a single pass over the unified stream — a last-non-null
  * window with an UNBOUNDED..1-PRECEDING frame — instead of the naive
  * per-trade point lookup (a correlated subquery / range join that
  * explodes at scale). One sort per symbol; the frame scan carries O(1)
  * state. Like every order-sensitive operator here (FoldBars,
  * RebinnedBook), wall-time per symbol is single-task by construction —
  * the documented trade-off of total-order semantics.
  */
object AsofJoin {

  /** Trades with the prevailing quote: (symbol, ts, seq, price,
    * quote_price, quote_ts, slippage = price - quote_price). Trades with
    * no earlier quote keep NULL quote columns (both engines agree). */
  def tradesWithQuote(updates: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("ts", "seq")
      .rowsBetween(Window.unboundedPreceding, -1)
    val quotePrice = when(!col("is_trade"), col("price"))
    val quoteTs = when(!col("is_trade"), col("ts"))
    updates
      .withColumn("quote_price", last(quotePrice, ignoreNulls = true).over(w))
      .withColumn("quote_ts", last(quoteTs, ignoreNulls = true).over(w))
      .where(col("is_trade"))
      .select(col("symbol"), col("ts"), col("seq"), col("price"),
        col("quote_price"), col("quote_ts"),
        (col("price") - col("quote_price")).as("slippage"))
  }

  /** DuckDB twin — the same IGNORE NULLS window (bit-exact: the only
    * arithmetic is one IEEE subtraction). */
  val tradesWithQuoteSql: String =
    """SELECT symbol, ts, seq, price, quote_price, quote_ts,
      | price - quote_price AS slippage
      |FROM (
      | SELECT symbol, ts, seq, is_trade, price,
      |  last_value(CASE WHEN NOT is_trade THEN price END IGNORE NULLS)
      |    OVER (PARTITION BY symbol ORDER BY ts, seq
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |    AS quote_price,
      |  last_value(CASE WHEN NOT is_trade THEN ts END IGNORE NULLS)
      |    OVER (PARTITION BY symbol ORDER BY ts, seq
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |    AS quote_ts
      | FROM updates)
      |WHERE is_trade
      |ORDER BY symbol, ts, seq""".stripMargin.replace('\n', ' ')
}
