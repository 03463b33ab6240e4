package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.model.{Candle, Update}
import graft.operators._

/** Golden vectors ported from the reference test suite — the de-facto
  * conformance tests (SURVEY §5). */
class BarGoldenSpec extends SparkSpec {

  private def candles(df: org.apache.spark.sql.DataFrame): Seq[Candle] = {
    import spark.implicits._
    df.select("symbol", "start", "end", "open", "high", "low", "close",
      "volume").as[Candle].collect().toSeq.sortBy(c => (c.symbol, c.start))
  }

  test("tick bars golden (tick_bars.rs:125-172)") {
    val got = candles(TickBars.bars(updatesDf(tenTrades()), 3))
    assert(got === Seq(
      Candle("t", 0, 2, 0, 2, 0, 2, 3),
      Candle("t", 3, 5, 3, 5, 3, 5, 12),
      Candle("t", 6, 8, 6, 8, 6, 8, 21),
      Candle("t", 9, 9, 9, 9, 9, 9, 9)))
  }

  test("volume bars golden (volume_bars.rs:127-158)") {
    val got = candles(FoldBars.volumeBars(updatesDf(tenTrades()), 36.0))
    assert(got === Seq(
      Candle("t", 0, 8, 0, 8, 0, 8, 36),
      Candle("t", 9, 9, 9, 9, 9, 9, 9)))
  }

  test("dollar bars golden (dollar_bars.rs:125-163)") {
    val got = candles(FoldBars.dollarBars(updatesDf(tenTrades()), 100.0))
    assert(got === Seq(
      Candle("t", 0, 6, 0, 6, 0, 6, 21),
      Candle("t", 7, 8, 7, 8, 7, 8, 15),
      Candle("t", 9, 9, 9, 9, 9, 9, 9)))
  }

  test("fold bars keep per-symbol state independent") {
    val two = tenTrades("a") ++ tenTrades("b")
    val got = candles(FoldBars.volumeBars(updatesDf(two), 36.0))
    assert(got === Seq(
      Candle("a", 0, 8, 0, 8, 0, 8, 36), Candle("a", 9, 9, 9, 9, 9, 9, 9),
      Candle("b", 0, 8, 0, 8, 0, 8, 36), Candle("b", 9, 9, 9, 9, 9, 9, 9)))
  }

  /** 91 minute-candles from minute 30; rebin(align=true, 60) → one 60-min
    * candle starting 1800, end 5340, vol 60 (time_bars.rs:418-455). */
  test("rebin snap-to-grid golden") {
    import spark.implicits._
    val bars = (30 to 120).map { i =>
      Candle("t", 60L * i, 60L * i + 60, 0.0, 2.0, 0.0, 1.0, 1.0)
    }
    val got = candles(TimeBars.rebin(spark.createDataset(bars).toDF(),
      newScale = 60, align = true))
    assert(got === Seq(Candle("t", 1800, 5340, 0, 2, 0, 1, 60)))
  }

  /** Candles at minutes 30..120 minus 50..60 → missing epochs 3000..3600,
    * one range (3000, 3600); empty after continuation fill
    * (time_bars.rs:501-544). */
  test("missing ranges + continuation golden") {
    import spark.implicits._
    val bars = (30 to 120).filterNot(i => i >= 50 && i <= 60).map { i =>
      Candle("t", 60L * i, 60L * i + 60, 0.0, 2.0, 0.0, 1.0, 1.0)
    }
    val df = spark.createDataset(bars).toDF()
    val missing = TimeBars.missingEpochs(df).orderBy("epoch")
      .select("epoch").as[Long].collect().toSeq
    assert(missing === (3000L to 3600L by 60L).toSeq)
    val rng = TimeBars.missingRanges(df)
      .select("start", "end").collect().toSeq
    assert(rng === Seq(Row(3000L, 3600L)))
    val filled = TimeBars.continuationFill(df)
    assert(TimeBars.missingEpochs(filled).count() === 0)
    // synthetic candles carry prev close, volume 0, end = start + 60
    val synth = candles(filled).filter(c => c.start == 3000)
    assert(synth === Seq(Candle("t", 3000, 3060, 1, 1, 1, 1, 0)))
  }

  /** ranges() golden (time_bars.rs:548-558). */
  test("gaps-and-islands ranges golden") {
    import spark.implicits._
    def run(epochs: Seq[Long]): Seq[(Long, Long)] =
      TimeBars.ranges(epochs.toDF("epoch").withColumn("symbol", lit("t")))
        .orderBy("start").select("start", "end").as[(Long, Long)]
        .collect().toSeq
    assert(run(Seq(60, 120, 180, 600, 660, 720)) ===
      Seq((60L, 180L), (600L, 720L)))
    assert(run(Seq(0, 60, 120, 180, 240, 600, 660, 720)) ===
      Seq((0L, 240L), (600L, 720L)))
  }

  test("time bars drop the in-progress final bucket per symbol") {
    // trades in two minute-buckets; the later bucket must be dropped.
    // 13-digit ms timestamps: fill_digits normalizes anything shorter
    // (utils.rs:11-22), so sub-1e12 inputs are not fixed points of ts
    val T = 1500000000000L
    val ups = Seq(
      Update("t", T, 0, true, true, 1.0, 2.0),
      Update("t", T + 1000L, 1, true, true, 3.0, 4.0),
      Update("t", T + 60000L, 2, true, true, 5.0, 6.0))
    val got = candles(TimeBars.bars(updatesDf(ups)))
    assert(got === Seq(Candle("t", 1500000000L, 1500000000L, 1, 3, 1, 3, 6)))
    val all = candles(TimeBars.bars(updatesDf(ups), dropLast = false))
    assert(all.map(_.start) === Seq(1500000000L, 1500000060L))
  }

  test("microstructure: vwap/imbalance/spread hand-computed golden, " +
      "missing sides and zero volume stay null") {
    // realistic epoch seconds (fillDigits would rescale toy values)
    def u(ts: Long, seq: Long, trade: Boolean, bid: Boolean, p: Double,
        s: Double) =
      Update("m", (1500000000L + ts) * 1000, seq, trade, bid, p, s)
    val ups = Seq(
      // bucket 0: trades 2@10 buy, 4@11 sell; quotes bid 9.5 then 9.8,
      // ask 10.5; a size-0 level SET must not become the last bid
      u(1, 1, trade = true, bid = true, 10.0, 2.0),
      u(2, 2, trade = true, bid = false, 11.0, 4.0),
      u(3, 3, trade = false, bid = true, 9.5, 1.0),
      u(4, 4, trade = false, bid = false, 10.5, 2.0),
      u(5, 5, trade = false, bid = true, 9.8, 1.0),
      u(6, 6, trade = false, bid = true, 9.9, 0.0), // delete: no quote
      // bucket 60: one zero-size trade (vwap null), quotes only bid side
      u(61, 7, trade = true, bid = true, 12.0, 0.0),
      u(62, 8, trade = false, bid = true, 11.5, 3.0))
    val vw = Microstructure.vwapBars(updatesDf(ups)).orderBy("start")
      .collect()
    assert(vw.length === 2)
    assert(vw(0).getLong(2) === 2L &&
      vw(0).getDouble(3) === 6.0 && vw(0).getDouble(4) === 64.0 &&
      vw(0).getDouble(5) === 64.0 / 6.0)
    assert(vw(1).getDouble(3) === 0.0 && vw(1).isNullAt(5),
      "zero-volume bucket must have null vwap")
    val im = Microstructure.tradeImbalance(updatesDf(ups))
      .orderBy("start").collect()
    assert(im(0).getDouble(2) === 2.0 && im(0).getDouble(3) === 4.0 &&
      im(0).getDouble(4) === (2.0 - 4.0) / (2.0 + 4.0))
    assert(im(1).isNullAt(4), "zero-volume bucket must have null imbalance")
    val sp = Microstructure.bucketSpread(updatesDf(ups))
      .orderBy("start").collect()
    assert(sp(0).getDouble(2) === 9.8 && sp(0).getDouble(3) === 10.5,
      "last bid must skip the size-0 delete; sides resolve independently")
    assert(sp(0).getDouble(4) === 10.5 - 9.8 &&
      sp(0).getDouble(5) === (9.8 + 10.5) / 2.0)
    assert(sp(1).getDouble(2) === 11.5 && sp(1).isNullAt(3) &&
      sp(1).isNullAt(4) && sp(1).isNullAt(5),
      "bucket missing the ask side emits null spread/mid")
    // realized vol: returns ln(11/10) then ln(12/11) (the second crosses
    // into bucket 60 — a return belongs to its LATER trade's bucket);
    // the first trade has no return
    val rvUps = Seq(
      u(1, 1, trade = true, bid = true, 10.0, 1.0),
      u(2, 2, trade = true, bid = true, 11.0, 1.0),
      u(61, 3, trade = true, bid = true, 12.0, 1.0))
    val rv = Microstructure.realizedVol(updatesDf(rvUps))
      .orderBy("start").collect()
    def qOf(r: Double): Long = math.floor(math.log(r) * 1e6).toLong
    assert(rv.length === 2)
    assert(rv(0).getLong(2) === 1L &&
      rv(0).getLong(3) === qOf(11.0 / 10.0) * qOf(11.0 / 10.0))
    assert(rv(1).getLong(3) === qOf(12.0 / 11.0) * qOf(12.0 / 11.0))
    assert(rv(0).getDouble(4) ===
      math.sqrt(rv(0).getLong(3).toDouble) / 1e6)
    // order/trade ratio: bucket 0 has 4 levels (incl. the size-0
    // delete — it IS order traffic) and 2 trades
    val ot = Microstructure.orderTradeRatio(updatesDf(ups))
      .orderBy("start").collect()
    assert(ot(0).getLong(2) === 4L && ot(0).getLong(3) === 2L &&
      ot(0).getDouble(4) === 2.0)
    // twap: bid 9.5 prevails from t=3 to its successor at t=5 (2000 ms),
    // 9.8 from t=5 to BUCKET END at t=60 (55000 ms — clipped, no carry
    // into the next bucket); ask 10.5 runs t=4 -> bucket end (56000 ms)
    val tw = Microstructure.twapQuote(updatesDf(ups))
      .orderBy("is_bid", "start").collect()
    val bid0 = tw.find(r => r.getBoolean(1) &&
      r.getLong(2) === 1500000000L).get
    assert(bid0.getLong(3) === 2L && bid0.getLong(4) === 57000L)
    assert(bid0.getDouble(5) ===
      (2000.0 * 950 + 55000.0 * 980) / 57000.0 / 100.0)
    val ask0 = tw.find(r => !r.getBoolean(1) &&
      r.getLong(2) === 1500000000L).get
    assert(ask0.getLong(3) === 1L && ask0.getLong(4) === 56000L &&
      ask0.getDouble(5) === 10.5)
    // an event on its bucket's LAST second still gets clipped weight;
    // one superseded in the same ms carries none but counts
    val zed = Seq(
      u(59, 1, trade = false, bid = true, 5.0, 1.0),
      u(59, 2, trade = false, bid = true, 6.0, 1.0))
    val tz = Microstructure.twapQuote(updatesDf(zed)).collect()(0)
    assert(tz.getLong(3) === 2L && tz.getLong(4) === 1000L &&
      tz.getDouble(5) === 6.0,
      "same-ms supersession must zero-weight the first event only")
  }
}
