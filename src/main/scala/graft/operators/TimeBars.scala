package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Time-sampled OHLCV candles and their derived transforms.
  *
  * Reference: `crates/tdb-core/src/postprocessing/candle/time_bars.rs`.
  * All operators here are pure DataFrame expressions — the shuffle is the
  * per-(symbol, bucket) aggregation, map-side combined by Catalyst; window
  * functions partition by symbol so a 1000-executor cluster scales by symbol
  * count with no driver involvement.
  */
object TimeBars {

  /** 1-shuffle OHLCV aggregation over trades
    * (`time_bars.rs:77-109`, sampler 7-43).
    *
    * open/close use `min_by`/`max_by` over `(ts, seq)` — Spark's `first/last`
    * aggregates are order-nondeterministic (SURVEY §7.4-2).
    *
    * @param dropLast reproduce the reference iterator quirk of never flushing
    *                 the in-progress candle (`time_bars.rs:79-106` falls off
    *                 the while loop without emitting), i.e. the last bucket
    *                 per symbol is dropped.
    */
  def bars(updates: DataFrame, seconds: Long = 60, dropLast: Boolean = true)
      : DataFrame = {
    val bucket = timeBucket(tsSeconds(col("ts")), seconds)
    val agg = updates
      .where(col("is_trade"))
      .groupBy(col("symbol"), bucket.as("start"))
      .agg(
        orderedFirst(col("price"), col("ts"), col("seq")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        orderedLast(col("price"), col("ts"), col("seq")).as("close"),
        exactSum(col("size")).as("volume"))
      .withColumn("end", col("start"))
      .select("symbol", "start", "end", "open", "high", "low", "close",
        "volume")
    if (!dropLast) agg
    else {
      val w = Window.partitionBy(col("symbol"))
      agg.withColumn("_maxs", max(col("start")).over(w))
        .where(col("start") < col("_maxs"))
        .drop("_maxs")
    }
  }

  /** Insert flat continuation candles into minute gaps
    * (`time_bars.rs:190-223`): synthetic candles carry the previous close as
    * O=H=L=C, volume 0, and — reference quirk — `end = start + 60` while real
    * candles have `end = start`. */
  def continuationFill(bars: DataFrame, seconds: Long = 60): DataFrame = {
    val grid = bars.groupBy(col("symbol"))
      .agg(min(col("start")).as("lo"), max(col("start")).as("hi"))
      .select(col("symbol"),
        explode(sequence(col("lo"), col("hi"), lit(seconds))).as("start"))
    val w = Window.partitionBy(col("symbol")).orderBy(col("start"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(bars, Seq("symbol", "start"), "left")
      .withColumn("_fill", last(col("close"), ignoreNulls = true).over(w))
      .select(
        col("symbol"), col("start"),
        coalesce(col("end"), col("start") + seconds).as("end"),
        coalesce(col("open"), col("_fill")).as("open"),
        coalesce(col("high"), col("_fill")).as("high"),
        coalesce(col("low"), col("_fill")).as("low"),
        coalesce(col("close"), col("_fill")).as("close"),
        coalesce(col("volume"), lit(0.0)).as("volume"))
  }

  /** Rebin 1-min candles into `newScale`-minute candles
    * (`time_bars.rs:252-329`): POSITIONAL grouping — consecutive runs of
    * `newScale` candles in `start` order, trailing partial group dropped
    * (the reference asserts `res.len == v.len / k`). With `align`, leading
    * candles are discarded until the first whose start sits on the
    * `oldScale`-minute grid (`time_bars.rs:268-283`). */
  def rebin(bars: DataFrame, newScale: Int, align: Boolean = false,
      oldScale: Int = 1): DataFrame = {
    val aligned =
      if (!align) bars
      else {
        val grid = oldScale * 60L
        val wA = Window.partitionBy(col("symbol"))
        bars
          .withColumn("_snap",
            min(when(col("start") % grid === 0, col("start"))).over(wA))
          .where(col("start") >= col("_snap"))
          .drop("_snap")
      }
    val w = Window.partitionBy(col("symbol")).orderBy(col("start"))
    aligned
      .withColumn("_grp",
        floor((row_number().over(w) - 1) / newScale))
      .groupBy(col("symbol"), col("_grp"))
      .agg(
        min(col("start")).as("start"),
        max(col("start")).as("end"),
        min_by(col("open"), col("start")).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), col("start")).as("close"),
        exactSum(col("volume")).as("volume"),
        count(lit(1)).as("_n"))
      .where(col("_n") === newScale)
      .select("symbol", "start", "end", "open", "high", "low", "close",
        "volume")
  }

  /** Minute epochs absent from the bars between each symbol's min and max
    * (`time_bars.rs:159-186`): grid anti-join. */
  def missingEpochs(bars: DataFrame, seconds: Long = 60): DataFrame = {
    val grid = bars.groupBy(col("symbol"))
      .agg(min(col("start")).as("lo"), max(col("start")).as("hi"))
      // reference iterates `it < max_epoch` — max itself excluded; guard the
      // single-bar case (Spark's sequence() rejects start > stop)
      .where(col("hi") - seconds >= col("lo"))
      .select(col("symbol"),
        explode(sequence(col("lo"), col("hi") - seconds, lit(seconds)))
          .as("epoch"))
    grid.join(bars.select(col("symbol"), col("start").as("epoch")),
      Seq("symbol", "epoch"), "left_anti")
  }

  /** Gaps-and-islands over missing epochs (`time_bars.rs:332-394` `ranges`):
    * consecutive runs collapse to `(start, end)`. Classic
    * `epoch/step - row_number()` grouping. */
  def ranges(epochs: DataFrame, step: Long = 60): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("epoch"))
    epochs
      .withColumn("_isl", col("epoch") / step - row_number().over(w))
      .groupBy(col("symbol"), col("_isl"))
      .agg(min(col("epoch")).as("start"), max(col("epoch")).as("end"))
      .select("symbol", "start", "end")
  }

  /** missingEpochs |> ranges (`missing_ranges`, `time_bars.rs:183-186`). */
  def missingRanges(bars: DataFrame, seconds: Long = 60): DataFrame =
    ranges(missingEpochs(bars, seconds), seconds)

  /** Epoch-sequence check (`_test_epochs_must_be_sequential`,
    * `time_bars.rs:236-247`): rows whose start is NOT exactly
    * `60*scale` after the previous — empty result ⇔ sequential. */
  def epochGaps(bars: DataFrame, scale: Int = 1): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("start"))
    bars
      .withColumn("_prev", lag(col("start"), 1).over(w))
      .where(col("_prev").isNotNull &&
        col("start") =!= col("_prev") + 60L * scale)
      .select(col("symbol"), col("_prev").as("prev_start"), col("start"))
  }
}
