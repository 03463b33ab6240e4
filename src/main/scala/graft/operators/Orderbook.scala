package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** L2 orderbook reconstruction (`postprocessing/orderbook.rs:16-131`).
  *
  * The reference replays updates sequentially into per-side BTreeMaps
  * (`process_update`, orderbook.rs:46-63):
  *   - level update: set `(side, discretize(price)) -> size`, 0 deletes;
  *   - trade: subtract size at that level IF the level exists (no-op
  *     otherwise); levels driven negative by trades are kept.
  *
  * The final snapshot is order-theoretic, so it has a pure relational form
  * (no fold): for each `(symbol, side, level)` take the LAST level-set by
  * `(ts, seq)`; drop it if that set was 0; subtract the trade sizes that
  * arrived after it. This shuffles once on the level key and scales by
  * symbol×level cardinality — no sequential pass, no driver state. The
  * sequential `flatMapGroups` replay would give the same answer (cross-checked
  * in OrderbookSpec); the relational form is what you want at 100 TB.
  */
object Orderbook {

  /** Final book snapshot: `(symbol, is_bid, level, size)`. */
  def snapshot(updates: DataFrame, decimals: Int = 2): DataFrame = {
    val dp = discretize(col("price"), decimals)
    val levels = updates.where(!col("is_trade"))
      .select(col("symbol"), col("is_bid"), dp.as("level"),
        col("size"), col("ts"), col("seq"))
      .groupBy("symbol", "is_bid", "level")
      .agg(
        orderedLast(col("size"), col("ts"), col("seq")).as("lvl_size"),
        max(struct(col("ts"), col("seq"))).as("k"))
    val tradedAfter = updates.where(col("is_trade"))
      .select(col("symbol"), col("is_bid"), dp.as("level"),
        col("size"), col("ts"), col("seq"))
      .join(levels.select(col("symbol"), col("is_bid"), col("level"),
        col("k")), Seq("symbol", "is_bid", "level"))
      .where(struct(col("ts"), col("seq")) > col("k"))
      .groupBy("symbol", "is_bid", "level")
      .agg(exactSum(col("size")).as("traded"))
    levels
      .where(col("lvl_size") =!= 0.0)
      .join(tradedAfter, Seq("symbol", "is_bid", "level"), "left")
      .select(col("symbol"), col("is_bid"), col("level"),
        (col("lvl_size") - coalesce(col("traded"), lit(0.0))).as("size"))
  }

  /** DuckDB twin of [[snapshot]]. */
  def snapshotSql(decimals: Int = 2): String = {
    val p = math.pow(10, decimals).toLong
    s"""SELECT l.symbol, l.is_bid, l.level,
       | l.lvl_size - coalesce(t.traded, 0.0) AS size
       |FROM (
       | SELECT symbol, is_bid, CAST(floor(price * $p) AS BIGINT) AS level,
       |  last(size ORDER BY ts, seq) AS lvl_size,
       |  last(ts ORDER BY ts, seq) AS kts,
       |  last(seq ORDER BY ts, seq) AS kseq
       | FROM updates WHERE NOT is_trade
       | GROUP BY 1, 2, 3) l
       |LEFT JOIN (
       | SELECT u.symbol, u.is_bid, CAST(floor(u.price * $p) AS BIGINT) AS level,
       |  ls.kts, ls.kseq,
       |  CAST(SUM(CAST(u.size AS DECIMAL(30,4))) AS DOUBLE) AS traded
       | FROM updates u
       | JOIN (SELECT symbol, is_bid, CAST(floor(price * $p) AS BIGINT) AS level,
       |        last(ts ORDER BY ts, seq) AS kts, last(seq ORDER BY ts, seq) AS kseq
       |       FROM updates WHERE NOT is_trade GROUP BY 1, 2, 3) ls
       |  ON u.symbol = ls.symbol AND u.is_bid = ls.is_bid
       |  AND CAST(floor(u.price * $p) AS BIGINT) = ls.level
       | WHERE u.is_trade
       |  AND (u.ts > ls.kts OR (u.ts = ls.kts AND u.seq > ls.kseq))
       | GROUP BY 1, 2, 3, 4, 5) t
       |ON l.symbol = t.symbol AND l.is_bid = t.is_bid AND l.level = t.level
       |WHERE l.lvl_size <> 0.0
       |ORDER BY 1, 2, 3""".stripMargin.replace('\n', ' ')
  }

  /** Sequential replay (`process_update`, orderbook.rs:46-63) as a
    * per-symbol ordered fold — same answer as [[snapshot]] (cross-checked in
    * OrderbookSpec); used by the streaming/server path where the book is
    * maintained incrementally. */
  def replayFold(updates: DataFrame, decimals: Int = 2): DataFrame = {
    val spark = updates.sparkSession
    import spark.implicits._
    val mult = math.pow(10, decimals)
    updates
      .repartition(col("symbol"))
      .sortWithinPartitions("symbol", "ts", "seq")
      .as[graft.model.Update]
      .mapPartitions { rows =>
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, Boolean, Long, Double)]
        var sym: String = null
        var book = scala.collection.mutable.TreeMap.empty[(Boolean, Long), Double]
        def flush(): Unit = if (sym != null) {
          book.foreach { case ((bid, lvl), sz) => out += ((sym, bid, lvl, sz)) }
          book = scala.collection.mutable.TreeMap.empty
        }
        rows.foreach { u =>
          if (u.symbol != sym) { flush(); sym = u.symbol }
          val lvl = math.floor(u.price * mult).toLong
          val key = (u.is_bid, lvl)
          if (u.is_trade) {
            book.get(key).foreach(sz => book(key) = sz - u.size)
          } else if (u.size == 0.0) book.remove(key)
          else book(key) = u.size
        }
        flush()
        out.iterator
      }
      .toDF("symbol", "is_bid", "level", "size")
  }

  /** Top of book per symbol (`orderbook.rs:84-131`): best bid = max bid
    * level, best ask = min ask level, mid = (bb+ba)/2, plus the raw
    * integer-division variants. */
  def top(book: DataFrame, decimals: Int = 2): DataFrame = {
    def und(c: Column) = undiscretize(c, decimals)
    book.groupBy("symbol")
      .agg(
        max(when(col("is_bid"), col("level"))).as("bb_raw"),
        min(when(!col("is_bid"), col("level"))).as("ba_raw"))
      .select(col("symbol"), col("bb_raw"), col("ba_raw"),
        expr("(bb_raw + ba_raw) div 2").as("mid_raw"),
        und(col("bb_raw")).as("best_bid"),
        und(col("ba_raw")).as("best_ask"),
        ((und(col("bb_raw")) + und(col("ba_raw"))) / 2.0).as("mid"))
  }

  /** Liquidity within `bps` basis points of the mid, per (symbol,
    * side), off the final [[snapshot]]: level count and exact-decimal
    * size sum over book levels with
    * `|level − mid_raw|·10⁴ ≤ mid_raw·bps` — an ALL-INTEGER band test
    * on the discretized levels and the raw integer mid (no float
    * threshold to diverge on). A symbol missing a side has a null mid
    * and drops entirely (no band is defined), in both engines.
    *
    * Scale shape: the snapshot aggregation plus one broadcast join of
    * the symbol-cardinality top table and one (symbol, side) partial
    * aggregation. */
  def liquidityBand(updates: DataFrame, bps: Long = 25L,
      decimals: Int = 2): DataFrame = {
    val book = snapshot(updates, decimals)
    val mids = top(book, decimals).select("symbol", "mid_raw")
    book.join(mids, "symbol")
      .where(abs(col("level") - col("mid_raw")) * lit(10000L) <=
        col("mid_raw") * lit(bps))
      .groupBy(col("symbol"), col("is_bid"))
      .agg(count(lit(1)).as("n_levels"),
        exactSum(col("size")).as("liquidity"))
      .orderBy("symbol", "is_bid")
  }

  def liquidityBandSql(bps: Long = 25L, decimals: Int = 2): String =
    s"""WITH book AS (${snapshotSql(decimals)}),
       |tp AS (${topSql(decimals)})
       |SELECT b.symbol, b.is_bid, count(*) AS n_levels,
       | CAST(SUM(CAST(b.size AS DECIMAL(30,4))) AS DOUBLE) AS liquidity
       |FROM book b JOIN tp ON b.symbol = tp.symbol
       |WHERE abs(b.level - tp.mid_raw) * 10000 <= tp.mid_raw * $bps
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin.replace('\n', ' ')

  def topSql(decimals: Int = 2): String = {
    val p = math.pow(10, decimals).toLong
    s"""SELECT symbol, bb_raw, ba_raw, (bb_raw + ba_raw) // 2 AS mid_raw,
       | bb_raw / $p.0 AS best_bid, ba_raw / $p.0 AS best_ask,
       | (bb_raw / $p.0 + ba_raw / $p.0) / 2.0 AS mid
       |FROM (SELECT symbol,
       |  max(CASE WHEN is_bid THEN level END) AS bb_raw,
       |  min(CASE WHEN NOT is_bid THEN level END) AS ba_raw
       | FROM book GROUP BY symbol)
       |ORDER BY symbol""".stripMargin.replace('\n', ' ')
  }
}
