package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap detection over the tick stream
  * (`bins/dtftools/dtfcheck.rs:20-35`): lag over `(ts, seq)` per symbol,
  * report pairs further apart than `thresholdSec`. */
object Gaps {

  def detect(updates: DataFrame, thresholdSec: Long): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("ts"), col("seq"))
    updates
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .where(col("ts") - col("prev_ts") > thresholdSec * 1000)
      .select(col("symbol"), col("prev_ts"), col("ts"),
        (col("ts") - col("prev_ts")).as("gap_ms"))
  }

  def oracleSql(thresholdSec: Long): String =
    s"""SELECT symbol, prev_ts, ts, ts - prev_ts AS gap_ms FROM (
       | SELECT symbol, ts,
       |  lag(ts) OVER (PARTITION BY symbol ORDER BY ts, seq) AS prev_ts
       | FROM updates)
       |WHERE ts - prev_ts > ${thresholdSec * 1000}
       |ORDER BY symbol, ts""".stripMargin.replace('\n', ' ')
}
