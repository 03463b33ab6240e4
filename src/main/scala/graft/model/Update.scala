package graft.model

import org.apache.spark.sql.types._

/** The canonical tick record.
  *
  * Mirrors the reference's one core record type
  * (`crates/tdb-core/src/dtf/update.rs:48-61`) — every table ("book") is a
  * `(ts, seq)`-ordered sequence of this 6-field struct — plus an explicit
  * `symbol` column (the reference keys books by name externally,
  * `tdb-server-core/src/state.rs:197-203`; at 100 TB the symbol must be a
  * first-class partition column so every operator is per-symbol parallel).
  *
  * Field names are snake_case on purpose: they double as DataFrame column
  * names and must match the DuckDB oracle SQL exactly.
  *
  * @param ts       epoch milliseconds, normalized to 13 digits (`fill_digits`,
  *                 reference `crates/tdb-core/src/utils.rs:11-22`)
  * @param seq      exchange sequence number; tiebreaker within the same ms
  * @param is_trade trade execution vs. book (level) update
  * @param is_bid   bid side vs. ask side
  * @param price    price of the order/trade (f32 in the reference; Double here)
  * @param size     for level updates the ABSOLUTE new size at that price
  *                 (0 deletes the level); for trades the consumed quantity
  */
case class Update(
    symbol: String,
    ts: Long,
    seq: Long,
    is_trade: Boolean,
    is_bid: Boolean,
    price: Double,
    size: Double)

object Update {
  /** Canonical StructType — the entire type surface of the reference engine
    * is these 6 primitives plus the symbol string. */
  val schema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("is_trade", BooleanType, nullable = false),
    StructField("is_bid", BooleanType, nullable = false),
    StructField("price", DoubleType, nullable = false),
    StructField("size", DoubleType, nullable = false)))

  /** Total order used by every downstream operator
    * (reference `dtf/update.rs:171-189`). */
  val orderCols: Seq[String] = Seq("ts", "seq")
}

/** OHLCV candle (reference `postprocessing/candle/mod.rs:20-37`). */
case class Candle(
    symbol: String,
    start: Long,
    end: Long,
    open: Double,
    high: Double,
    low: Double,
    close: Double,
    volume: Double)
