package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Update

/** VPIN — Volume-Synchronized Probability of Informed Trading (Easley,
  * López de Prado, O'Hara 2012): trade flow is cut into VOLUME buckets
  * and each bucket's classified order-flow imbalance `|V_buy − V_sell|`
  * is averaged over a trailing window of buckets — the flow-toxicity
  * signal market makers watch. A beyond-reference capability composing
  * two shipped primitives:
  *
  *  - the tick-rule running sign ([[Microstructure.tickRuleFlow]]'s
  *    carry: `dir` against the previous trade price, last non-zero
  *    carried; a symbol's leading unclassified trades count in
  *    `n_trades` and feed the bucket accumulator but carry no side
  *    weight);
  *  - the volume-bar reset fold with [[FoldBars]]' sampler quirks
  *    preserved verbatim (`volume_bars.rs:24-33`): the first trade of
  *    a bucket never feeds the accumulator, a boundary trade closes
  *    the previous bucket and STARTS the next with its weight
  *    swallowed, and the final partial bucket is emitted.
  *
  * Exactness: side volumes accumulate as unscaled scale-4 longs (the
  * [[graft.streaming.Streaming.Dec4]] quantization — the fold-side twin
  * of `CAST(size AS DECIMAL(30,4))`), `imb = |buy − sell|` is computed
  * on the unscaled integers, and the trailing `vpin` operands re-enter
  * decimal sums Spark-side (`exactSum`) against the DuckDB twin's
  * native DECIMAL window sums — exact integer operand sums into ONE
  * IEEE division, null when the trailing classified volume is 0.
  * Non-finite prices and sizes raise loud at ingest (the
  * [[Microstructure.finitePrice]]/finiteSize discipline — a NaN weight
  * would also silently diverge from the twin's NaN-greatest boundary
  * compare).
  *
  * Scale shape: one per-symbol streaming fold (the [[FoldBars]]
  * budget — `repartition(symbol)` + external sort + O(1)-state
  * `mapPartitions`, spill-safe for any symbol size) emits the BUCKET
  * series; the trailing window is a per-symbol window over buckets —
  * thousands of rows per symbol, key-bounded (the bucket-series
  * windows the [[Microstructure.kyleLambda]] family already runs). */
object Vpin {

  /** One closed (or final partial) volume bucket with exact scale-4
    * unscaled side sums. */
  private[operators] case class VpinBucket(symbol: String, bucket: Long,
      start: Long, end: Long, n_trades: Long, buyU: Long, sellU: Long,
      classU: Long, volU: Long)

  def vpin(updates: DataFrame, interval: Double = 100.0,
      window: Int = 5): DataFrame = {
    require(window >= 1, "vpin needs a trailing window of >= 1 buckets")
    val spark = updates.sparkSession
    import spark.implicits._
    val d4 = (u: Long) => java.math.BigDecimal.valueOf(u, 4).doubleValue()
    val buckets = updates.where(col("is_trade"))
      .repartition(col("symbol"))
      .sortWithinPartitions("symbol", "ts", "seq")
      .as[Update]
      .mapPartitions(rows => new VpinFold(rows, interval))
      .map(b => (b.symbol, b.bucket, b.start, b.end, b.n_trades,
        d4(b.buyU), d4(b.sellU), d4(b.classU), d4(b.volU),
        d4(math.abs(b.buyU - b.sellU))))
      .toDF("symbol", "bucket", "start", "end", "n_trades", "buy_vol",
        "sell_vol", "class_vol", "volume", "imb")
    val w = Window.partitionBy(col("symbol")).orderBy(col("bucket"))
      .rowsBetween(-(window - 1).toLong, Window.currentRow)
    buckets
      .withColumn("imb_win",
        sum(col("imb").cast("decimal(30,4)")).over(w).cast("double"))
      .withColumn("class_win",
        sum(col("class_vol").cast("decimal(30,4)")).over(w)
          .cast("double"))
      .withColumn("vpin",
        when(col("class_win") =!= 0.0d,
          col("imb_win") / col("class_win")))
  }

  /** DuckDB twin: the tick-rule sign as windows (the
    * [[Microstructure.tickRuleFlowSql]] spelling), the reset-fold
    * bucket id as a linear-recursive CTE (the
    * [[FoldBars.volumeBarsOracleSql]] spelling), DECIMAL bucket sums,
    * and a trailing DECIMAL window for the vpin operands. Starts with
    * WITH — wrap via [[graft.Tables]]' recursive chain. */
  def vpinSql(interval: Double = 100.0, window: Int = 5): String =
    s"""WITH t1 AS (
       |  SELECT symbol, ts, seq, price, size,
       |    CASE WHEN price > lag(price, 1) OVER w THEN 1
       |         WHEN price < lag(price, 1) OVER w THEN -1
       |         ELSE 0 END AS dir,
       |    row_number() OVER w AS rn
       |  FROM updates WHERE is_trade
       |  WINDOW w AS (PARTITION BY symbol ORDER BY ts, seq)),
       |t2 AS MATERIALIZED (
       |  SELECT symbol, ts, rn, size,
       |    last_value(CASE WHEN dir <> 0 THEN dir END IGNORE NULLS)
       |      OVER (PARTITION BY symbol ORDER BY rn
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sgn
       |  FROM t1),
       |vfold AS (
       |  SELECT symbol, rn, CAST(1 AS BIGINT) AS bucket,
       |    CAST(0.0 AS DOUBLE) AS acc
       |  FROM t2 WHERE rn = 1
       |  UNION ALL
       |  SELECT t.symbol, t.rn,
       |    CASE WHEN f.acc + t.size > $interval THEN f.bucket + 1
       |         ELSE f.bucket END,
       |    CASE WHEN f.acc + t.size > $interval THEN CAST(0.0 AS DOUBLE)
       |         ELSE f.acc + t.size END
       |  FROM vfold f JOIN t2 t ON t.symbol = f.symbol
       |    AND t.rn = f.rn + 1),
       |bkt AS (
       |  SELECT t.symbol, f.bucket, min(t.ts) AS start, max(t.ts) AS "end",
       |    count(*) AS n_trades,
       |    SUM(CASE WHEN t.sgn = 1 THEN CAST(t.size AS DECIMAL(30,4))
       |      ELSE CAST(0.0 AS DECIMAL(30,4)) END) AS buyd,
       |    SUM(CASE WHEN t.sgn = -1 THEN CAST(t.size AS DECIMAL(30,4))
       |      ELSE CAST(0.0 AS DECIMAL(30,4)) END) AS selld,
       |    SUM(CASE WHEN t.sgn IS NOT NULL
       |      THEN CAST(t.size AS DECIMAL(30,4))
       |      ELSE CAST(0.0 AS DECIMAL(30,4)) END) AS classd,
       |    SUM(CAST(t.size AS DECIMAL(30,4))) AS vold
       |  FROM vfold f JOIN t2 t ON t.symbol = f.symbol AND t.rn = f.rn
       |  GROUP BY 1, 2),
       |tw AS (
       |  SELECT symbol, bucket, start, "end", n_trades,
       |    CAST(buyd AS DOUBLE) AS buy_vol,
       |    CAST(selld AS DOUBLE) AS sell_vol,
       |    CAST(classd AS DOUBLE) AS class_vol,
       |    CAST(vold AS DOUBLE) AS volume,
       |    CAST(ABS(buyd - selld) AS DOUBLE) AS imb,
       |    CAST(SUM(ABS(buyd - selld)) OVER win AS DOUBLE) AS imb_win,
       |    CAST(SUM(classd) OVER win AS DOUBLE) AS class_win
       |  FROM bkt
       |  WINDOW win AS (PARTITION BY symbol ORDER BY bucket
       |    ROWS BETWEEN ${window - 1} PRECEDING AND CURRENT ROW))
       |SELECT symbol, bucket, start, "end", n_trades, buy_vol, sell_vol,
       |  class_vol, volume, imb, imb_win, class_win,
       |  CASE WHEN class_win <> 0.0 THEN imb_win / class_win END AS vpin
       |FROM tw ORDER BY symbol, bucket""".stripMargin.replace('\n', ' ')

  /** The one-pass bucket fold: O(1) state per symbol run (tick-rule
    * carry + open-bucket accumulators), [[FoldBars.BarFold]]'s
    * iterator discipline. */
  private final class VpinFold(rows: Iterator[Update], interval: Double)
      extends Iterator[VpinBucket] {
    private val Dec4 = graft.streaming.Streaming.Dec4
    private var out: VpinBucket = _
    private var sym: String = _
    private var bucket = 0L
    private var acc = 0.0d
    private var prevPrice = 0.0d
    private var hasPrev = false
    private var carry = 0
    private var start = 0L
    private var end = 0L
    private var n = 0L
    private var buyU = 0L
    private var sellU = 0L
    private var classU = 0L
    private var volU = 0L

    private def closed: VpinBucket =
      VpinBucket(sym, bucket, start, end, n, buyU, sellU, classU, volU)

    private def startBucket(u: Update): Unit = {
      start = u.ts; end = u.ts; n = 0L
      buyU = 0L; sellU = 0L; classU = 0L; volU = 0L
      addTo(u)
    }

    private def addTo(u: Update): Unit = {
      end = u.ts; n += 1L
      val s = Dec4.dec4(u.size)
      volU = Math.addExact(volU, s)
      val dir =
        if (!hasPrev) 0
        else if (u.price > prevPrice) 1
        else if (u.price < prevPrice) -1 else 0
      if (dir != 0) carry = dir
      prevPrice = u.price; hasPrev = true
      if (carry == 1) { buyU = Math.addExact(buyU, s)
        classU = Math.addExact(classU, s) }
      else if (carry == -1) { sellU = Math.addExact(sellU, s)
        classU = Math.addExact(classU, s) }
    }

    @annotation.tailrec
    private def advance(): Unit =
      if (out == null) {
        if (!rows.hasNext) {
          if (sym != null) { out = closed; sym = null }
        } else {
          val u = rows.next()
          // raise-loud ingest guards: a NaN price would silently
          // de-classify flow, a NaN size would freeze the accumulator
          // where the twin's NaN-greatest compare closes every bucket
          if (u.price.isNaN || u.price.isInfinite)
            throw new ArithmeticException(
              "vpin: non-finite price at symbol=" + u.symbol)
          if (u.size.isNaN || u.size.isInfinite)
            throw new ArithmeticException(
              "vpin: non-finite trade size at symbol=" + u.symbol)
          if (sym == null || sym != u.symbol) {
            if (sym != null) out = closed
            sym = u.symbol; bucket = 1L; acc = 0.0d
            hasPrev = false; carry = 0
            startBucket(u)
          } else if (acc + u.size > interval) {
            out = closed
            bucket += 1L; acc = 0.0d
            startBucket(u)
          } else {
            acc += u.size
            addTo(u)
          }
          advance()
        }
      }

    override def hasNext: Boolean = { advance(); out != null }
    override def next(): VpinBucket = {
      advance(); val r = out; out = null; r
    }
  }
}
