package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Tick-count-sampled bars (`candle/tick_bars.rs:20-104`).
  *
  * Two reference quirks are load-bearing for the goldens:
  *  1. the sampler counts EVERY update (non-trades included) — `is_sample`
  *     is evaluated before the `is_trade` filter (`tick_bars.rs:70-73`);
  *  2. a boundary landing on a NON-trade row is lost (the `continue` skips
  *     the close), so a candle only closes when a TRADE row lands exactly on
  *     a boundary position (row_number ≡ 1 mod interval, rn > 1).
  *
  * Hence: number all updates, keep trades, bar id = running count of
  * boundary TRADES — pure window functions, no custom code, one shuffle for
  * the window + one for the aggregation.
  *
  * SCALE NOTE (named funnel, VERDICT r1): the `row_number` window sorts a
  * symbol's ENTIRE update stream through one task. Unlike the percentile
  * path (now distributed order statistics), the tick counter is inherently
  * a global per-symbol enumeration; the distributed alternative is a
  * two-pass rank (per-partition counts + broadcast offsets) over a
  * range-partitioned sort, worth wiring only if a single symbol's history
  * outgrows one task's sort budget — the window's external sort already
  * spills, so memory is not the forcing issue.
  */
object TickBars {

  def bars(updates: DataFrame, interval: Int): DataFrame = {
    val wAll = Window.partitionBy(col("symbol")).orderBy(col("ts"), col("seq"))
    val wRun = Window.partitionBy(col("symbol")).orderBy(col("rn"))
    updates
      .withColumn("rn", row_number().over(wAll))
      .where(col("is_trade"))
      .withColumn("b",
        when(col("rn") % interval === 1 && col("rn") > 1, 1).otherwise(0))
      .withColumn("grp", sum(col("b")).over(wRun))
      .groupBy(col("symbol"), col("grp"))
      .agg(
        min(col("ts")).as("start"),
        max(col("ts")).as("end"),
        orderedFirst(col("price"), col("ts"), col("seq")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        orderedLast(col("price"), col("ts"), col("seq")).as("close"),
        exactSum(col("size")).as("volume"))
      .select("symbol", "start", "end", "open", "high", "low", "close",
        "volume")
  }

  /** DuckDB oracle twin of [[bars]]. */
  def oracleSql(interval: Int): String =
    s"""SELECT symbol, min(ts) AS start, max(ts) AS "end",
       | first(price ORDER BY ts, seq) AS open, max(price) AS high,
       | min(price) AS low, last(price ORDER BY ts, seq) AS close,
       | CAST(SUM(CAST(size AS DECIMAL(30,4))) AS DOUBLE) AS volume
       |FROM (
       | SELECT *, sum(b) OVER (PARTITION BY symbol ORDER BY rn) AS grp FROM (
       |  SELECT *, CASE WHEN rn % $interval = 1 AND rn > 1 THEN 1 ELSE 0 END AS b
       |  FROM (SELECT *, row_number() OVER (PARTITION BY symbol ORDER BY ts, seq) AS rn
       |        FROM updates)
       |  WHERE is_trade))
       |GROUP BY symbol, grp ORDER BY symbol, start"""
      .stripMargin.replace('\n', ' ')
}
