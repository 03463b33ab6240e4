package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions._

/** Geometric-decay series over the per-symbol bucket grid — the
  * Hawkes-style self-exciting activity proxy and the classic EMA,
  * both under a PURE-INTEGER recursion so the cross-engine contract
  * has zero libm risk (no `exp`/`pow` in the recurrence at all):
  *
  *  - [[tradeIntensity]]: `iq_b = n_b·1e6 + floor(iq_{b-1}·num/den)`
  *    over PRESENT buckets (decay advances one step per traded bucket
  *    — the bucket-series convention [[Microstructure.kyleLambda]]'s
  *    regressions use), `iq_0 = 0`. A geometrically-decayed trade
  *    count: the discrete-time analog of an exponentially-decaying
  *    arrival intensity.
  *  - [[emaClose]]: `eq_b = floor((cq_b + eq_{b-1}·(den−num_c))/den)`
  *    with `cq` the bucket close in integer cents·1e4 and
  *    `num_c = den − num` — the standard EMA `α = num_c/den` written
  *    as one integer multiply-add + floor division; seeded
  *    `eq_1 = cq_1`.
  *
  * Integer recursions are sequential by nature (floor breaks
  * associativity), but they run over the BUCKET series — key-bounded,
  * thousands of rows per symbol at any corpus size, the same budget as
  * the estimator wave's bucket windows — via one per-symbol
  * `mapPartitions` fold after the (symbol, bucket) partial
  * aggregation. The DuckDB twins step the identical recursion as a
  * linear-recursive CTE (the [[FoldBars.volumeBarsOracleSql]]
  * pattern), so every emitted integer matches bit-for-bit, and each
  * emitted double is ONE exact-integer→double cast + division.
  * Non-finite prices raise loud in [[emaClose]] (the
  * [[Microstructure.finitePrice]] discipline, here through the cents
  * quantization guard). */
object DecaySeries {

  private def bucketed(seconds: Long) =
    timeBucket(tsSeconds(col("ts")), seconds).as("start")

  private[operators] case class IntensityRow(symbol: String, start: Long,
      n_trades: Long, intensity_q: Long, intensity: Double)

  /** Geometric-decay trade intensity per (symbol, bucket). Decay
    * `num/den` per present bucket; counts scale to 1e6 so the floor
    * division keeps six fractional digits of the decayed tail. */
  def tradeIntensity(updates: DataFrame, seconds: Long = 60,
      num: Long = 7, den: Long = 8): DataFrame = {
    require(num >= 0 && den > 0 && num < den,
      "decay num/den must be a proper fraction")
    val spark = updates.sparkSession
    import spark.implicits._
    updates.where(col("is_trade"))
      .groupBy(col("symbol"), bucketed(seconds))
      .agg(count(lit(1)).as("n_trades"))
      .select(col("symbol"), col("start"), col("n_trades"))
      .as[(String, Long, Long)]
      .repartition(col("symbol"))
      .sortWithinPartitions("symbol", "start")
      .mapPartitions { rows =>
        var sym: String = null
        var iq = 0L
        rows.map { case (s, start, n) =>
          if (s != sym) { sym = s; iq = 0L }
          iq = Math.addExact(Math.multiplyExact(n, 1000000L),
            Math.floorDiv(Math.multiplyExact(iq, num), den))
          IntensityRow(s, start, n, iq, iq.toDouble / 1e6)
        }
      }
      .toDF()
  }

  /** DuckDB twin of [[tradeIntensity]] — the identical integer
    * recursion as a linear-recursive CTE over the bucket series.
    * Starts with WITH; wrap via
    * [[graft.Tables.withUpdatesChainRecursive]]. */
  def tradeIntensitySql(seconds: Long = 60, num: Long = 7,
      den: Long = 8): String =
    s"""WITH bk AS MATERIALIZED (
       |  SELECT symbol, ((ts // 1000) // $seconds) * $seconds AS start,
       |    count(*) AS n_trades,
       |    row_number() OVER (PARTITION BY symbol
       |      ORDER BY ((ts // 1000) // $seconds) * $seconds) AS rn
       |  FROM updates WHERE is_trade GROUP BY 1, 2),
       |dfold AS (
       |  SELECT symbol, rn, start, n_trades,
       |    n_trades * 1000000 AS iq
       |  FROM bk WHERE rn = 1
       |  UNION ALL
       |  SELECT b.symbol, b.rn, b.start, b.n_trades,
       |    b.n_trades * 1000000 + (f.iq * $num // $den)
       |  FROM dfold f JOIN bk b ON b.symbol = f.symbol
       |    AND b.rn = f.rn + 1)
       |SELECT symbol, start, n_trades, CAST(iq AS BIGINT) AS intensity_q,
       |  CAST(iq AS DOUBLE) / 1e6 AS intensity
       |FROM dfold ORDER BY symbol, start""".stripMargin.replace('\n', ' ')

  private[operators] case class EmaRow(symbol: String, start: Long,
      close_cq: Long, ema_q: Long, ema: Double)

  /** EMA of the bucket close per (symbol, bucket): α = (den−num)/den
    * over PRESENT buckets, integer state `eq` at cents·1e4. */
  def emaClose(updates: DataFrame, seconds: Long = 60,
      num: Long = 7, den: Long = 8): DataFrame = {
    require(num >= 0 && den > 0 && num < den,
      "decay num/den must be a proper fraction")
    val spark = updates.sparkSession
    import spark.implicits._
    // cents guarded the kyleLambda way: NaN/huge prices must never
    // quantize silently (floor(NaN) is 0L under non-ANSI mode)
    val cents = when(
      abs(floor(Microstructure.finitePrice * 100.0d + 0.5d)) > 1.0e12d,
      raise_error(concat(lit("emaClose: price outside the " +
        "exact-decimal regime at symbol="), col("symbol"))).cast("long"))
      .otherwise(floor(Microstructure.finitePrice * 100.0d + 0.5d)
        .cast("long"))
    updates.where(col("is_trade") && col("price") > 0.0d)
      .groupBy(col("symbol"), bucketed(seconds))
      .agg(max_by(cents, struct(col("ts"), col("seq"))).as("c"))
      .select(col("symbol"), col("start"),
        (col("c") * 10000L).as("cq"))
      .as[(String, Long, Long)]
      .repartition(col("symbol"))
      .sortWithinPartitions("symbol", "start")
      .mapPartitions { rows =>
        var sym: String = null
        var eq = 0L
        var seeded = false
        rows.map { case (s, start, cq) =>
          if (s != sym) { sym = s; seeded = false }
          eq =
            if (!seeded) { seeded = true; cq }
            else Math.floorDiv(Math.addExact(
              Math.multiplyExact(cq, den - num),
              Math.multiplyExact(eq, num)), den)
          EmaRow(s, start, cq, eq, eq.toDouble / 1e6)
        }
      }
      .toDF()
  }

  /** DuckDB twin of [[emaClose]] — same integer recursion; the close
    * is the ordered-last trade price in cents (the
    * [[Microstructure.rollSpread]] round-half-up). */
  def emaCloseSql(seconds: Long = 60, num: Long = 7,
      den: Long = 8): String =
    s"""WITH bk AS MATERIALIZED (
       |  SELECT symbol, ((ts // 1000) // $seconds) * $seconds AS start,
       |    CAST(last(CAST(floor(price * 100.0 + 0.5) AS BIGINT)
       |      ORDER BY ts, seq) AS BIGINT) * 10000 AS cq,
       |    row_number() OVER (PARTITION BY symbol
       |      ORDER BY ((ts // 1000) // $seconds) * $seconds) AS rn
       |  FROM updates WHERE is_trade AND price > 0.0 GROUP BY 1, 2),
       |efold AS (
       |  SELECT symbol, rn, start, cq, cq AS eq FROM bk WHERE rn = 1
       |  UNION ALL
       |  SELECT b.symbol, b.rn, b.start, b.cq,
       |    ((b.cq * (${den - num}) + f.eq * $num) // $den)
       |  FROM efold f JOIN bk b ON b.symbol = f.symbol
       |    AND b.rn = f.rn + 1)
       |SELECT symbol, start, cq AS close_cq, CAST(eq AS BIGINT) AS ema_q,
       |  CAST(eq AS DOUBLE) / 1e6 AS ema
       |FROM efold ORDER BY symbol, start""".stripMargin.replace('\n', ' ')
}
