package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions._
import graft.operators._

/** Correctness-gate entries for the reference's tick-table surface
  * (SURVEY §2.1/§2.2/§2.4/§2.6). Every query orders its output
  * deterministically and keeps doubles bit-exact vs. the DuckDB oracle. */
object TickQueries {

  // inclusive ms range used by the range-scan queries: 2024-01-10..2024-01-20
  private val RangeLo = 1704844800000L
  private val RangeHi = 1705708800000L

  private def u(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.updates(s, dir)

  val all: Seq[Q] = Seq(

    // A1/A2 — COUNT (`state.rs:517-543`)
    Q("q_count",
      (s, dir) => u(s, dir).agg(count(lit(1)).as("n")),
      Some(Tables.withUpdates("SELECT count(*) AS n FROM updates"))),

    Q("q_count_by_symbol",
      (s, dir) => u(s, dir).groupBy(col("symbol"))
        .agg(count(lit(1)).as("n")).orderBy("symbol"),
      Some(Tables.withUpdates(
        "SELECT symbol, count(*) AS n FROM updates GROUP BY symbol ORDER BY symbol"))),

    // S3/S4 — ts-range scan, inclusive bounds (`file_format.rs:292-413`);
    // Parquet row-group stats give the reference's batch-skipping for free.
    Q("q_range_scan",
      (s, dir) => Tables.updatesInRange(s, dir, RangeLo, RangeHi)
        .orderBy("ts", "seq"),
      Some(Tables.withUpdates(
        s"SELECT * FROM updates WHERE ts BETWEEN $RangeLo AND $RangeHi ORDER BY ts, seq"))),

    // F1 — in-memory filter uses EXCLUSIVE bounds (`state.rs:617-624`) —
    // reference quirk preserved as its own operator.
    Q("q_range_scan_exclusive",
      (s, dir) => Tables.updatesInRange(s, dir, RangeLo + 1, RangeHi - 1)
        .orderBy("ts", "seq"),
      Some(Tables.withUpdates(
        s"SELECT * FROM updates WHERE ts > $RangeLo AND ts < $RangeHi ORDER BY ts, seq"))),

    // O3 — GET n FROM a TO b (`state.rs:604-671`), exact limit(n)
    // (the reference's fs-path off-by-one is a documented latent bug,
    // SURVEY §7.4-4).
    Q("q_get_n",
      (s, dir) => Tables.updatesInRange(s, dir, RangeLo, RangeHi)
        .orderBy("ts", "seq").limit(100),
      Some(Tables.withUpdates(
        s"SELECT * FROM updates WHERE ts BETWEEN $RangeLo AND $RangeHi ORDER BY ts, seq LIMIT 100"))),

    // A3 — 1-minute OHLCV time bars (`time_bars.rs:46-124`), including the
    // reference quirk of dropping the final in-progress candle per symbol.
    Q("q_time_bars",
      (s, dir) => TimeBars.bars(u(s, dir)).orderBy("symbol", "start"),
      Some(Tables.withUpdates(
        """SELECT symbol, start, start AS "end", open, high, low, close, volume FROM (
          |SELECT symbol, ((ts // 1000) // 60) * 60 AS start,
          | first(price ORDER BY ts, seq) AS open,
          | max(price) AS high, min(price) AS low,
          | last(price ORDER BY ts, seq) AS close,
          | CAST(SUM(CAST(size AS DECIMAL(30,4))) AS DOUBLE) AS volume
          |FROM updates WHERE is_trade GROUP BY 1, 2
          |QUALIFY start < max(start) OVER (PARTITION BY symbol))
          |ORDER BY symbol, start""".stripMargin.replace('\n', ' ')))),

    // O4 — iterator offset/limit (`file_format.rs:575-648`):
    // start at the i-th update, stop at the j-th.
    Q("q_offset_limit",
      (s, dir) => Tables.updatesInRange(s, dir, RangeLo, RangeHi)
        .orderBy("ts", "seq").offset(50).limit(100),
      Some(Tables.withUpdates(
        s"""SELECT * FROM updates WHERE ts BETWEEN $RangeLo AND $RangeHi
           |ORDER BY ts, seq LIMIT 100 OFFSET 50"""
          .stripMargin.replace('\n', ' ')))),

    // S10/C7 — JSON/CSV rendering exprs: ts as seconds float, t/f bools
    // (`dtf/update.rs:144-168`).
    Q("q_render",
      (s, dir) => Tables.updatesInRange(s, dir, RangeLo, RangeHi)
        .select(col("seq"),
          tsAsSecondsFloat(col("ts")).as("ts_s"),
          tfBool(col("is_trade")).as("is_trade_c"),
          tfBool(col("is_bid")).as("is_bid_c"),
          col("price"), col("size"))
        .orderBy("seq"),
      Some(Tables.withUpdates(
        s"""SELECT seq, ts / 1000.0 AS ts_s,
           | CASE WHEN is_trade THEN 't' ELSE 'f' END AS is_trade_c,
           | CASE WHEN is_bid THEN 't' ELSE 'f' END AS is_bid_c,
           | price, size
           |FROM updates WHERE ts BETWEEN $RangeLo AND $RangeHi ORDER BY seq"""
          .stripMargin.replace('\n', ' ')))),

    // C1 — fill_digits epoch normalization (`utils.rs:11-22`): feed it
    // second-resolution epochs and check the ms normalization.
    Q("q_fill_digits",
      (s, dir) => u(s, dir)
        .select(col("seq"), (col("ts") / 1000L).cast("long").as("ts_sec"))
        .select(col("seq"), fillDigits(col("ts_sec")).as("ts_norm"))
        .orderBy("seq"),
      Some(Tables.withUpdates(
        """SELECT seq, CASE WHEN ts_sec = 0 THEN 0 ELSE ts_sec * pw END AS ts_norm FROM (
          |SELECT seq, ts // 1000 AS ts_sec,
          | CASE WHEN ts // 1000 >= 1000000000000 THEN 1
          |      WHEN ts // 1000 >= 100000000000 THEN 10
          |      WHEN ts // 1000 >= 10000000000 THEN 100
          |      WHEN ts // 1000 >= 1000000000 THEN 1000
          |      ELSE 10000 END AS pw
          |FROM updates) ORDER BY seq""".stripMargin.replace('\n', ' ')))),

    // C2 — epoch_to_human render (`utils.rs:39-45`): epoch seconds to
    // "YYYY-MM-DD HH:MM:SS UTC". Session TZ is UTC on the Spark side; the
    // oracle uses make_timestamp (naive, TZ-free) so neither engine
    // consults a local zone.
    Q("q_epoch_human",
      (s, dir) => u(s, dir)
        .select(col("ts"), col("seq"),
          epochToHuman(tsSeconds(col("ts"))).as("human"))
        .orderBy("ts", "seq"),
      Some(Tables.withUpdates(
        """SELECT ts, seq,
          | strftime(make_timestamp((ts // 1000) * 1000000),
          |   '%Y-%m-%d %H:%M:%S') || ' UTC' AS human
          |FROM updates ORDER BY ts, seq""".stripMargin
          .replace('\n', ' ')))),

    // C6 — symbol parse `exchange_currency_asset` (`dtf/symbol.rs:15-29`).
    Q("q_symbol_parse", (s, dir) => {
      val full = concat(lit("bnc_"), col("symbol"), lit("_usd"))
      val parts = split(full, "_")
      u(s, dir).select(col("symbol")).distinct()
        .select(full.as("book"), element_at(parts, 1).as("exchange"),
          element_at(parts, 2).as("currency"), element_at(parts, 3).as("asset"))
        .orderBy("book")
    },
      Some(Tables.withUpdates(
        """SELECT 'bnc_' || symbol || '_usd' AS book,
          | string_split('bnc_' || symbol || '_usd', '_')[1] AS exchange,
          | string_split('bnc_' || symbol || '_usd', '_')[2] AS currency,
          | string_split('bnc_' || symbol || '_usd', '_')[3] AS asset
          |FROM (SELECT DISTINCT symbol FROM updates) ORDER BY book"""
          .stripMargin.replace('\n', ' ')))),

    // as-of join (kdb `aj` shape): every trade joined to the prevailing
    // quote — single-pass last-non-null window, no per-trade point lookup.
    Q("q_asof_quote",
      (s, dir) => AsofJoin.tradesWithQuote(u(s, dir))
        .orderBy("symbol", "ts", "seq"),
      Some(Tables.withUpdates(AsofJoin.tradesWithQuoteSql))),

    // microstructure features (beyond-reference consumer analytics,
    // TimeBars plan shape: one shuffle, map-side partial, decimal-exact
    // sums, single-IEEE-op ratios)
    Q("q_vwap_bars",
      (s, dir) => Microstructure.vwapBars(u(s, dir))
        .orderBy("symbol", "start"),
      Some(Tables.withUpdates(Microstructure.vwapBarsSql()))),

    Q("q_trade_imbalance",
      (s, dir) => Microstructure.tradeImbalance(u(s, dir))
        .orderBy("symbol", "start"),
      Some(Tables.withUpdates(Microstructure.tradeImbalanceSql()))),

    Q("q_tick_rule_flow",
      (s, dir) => Microstructure.tickRuleFlow(u(s, dir))
        .orderBy("symbol", "start"),
      Some(Tables.withUpdates(Microstructure.tickRuleFlowSql()))),

    Q("q_effective_spread",
      (s, dir) => Microstructure.effectiveSpread(u(s, dir))
        .orderBy("symbol", "start"),
      Some(Tables.withUpdates(Microstructure.effectiveSpreadSql()))),

    Q("q_roll_spread",
      (s, dir) => Microstructure.rollSpread(u(s, dir))
        .orderBy("symbol", "start"),
      Some(Tables.withUpdates(Microstructure.rollSpreadSql()))),

    Q("q_kyle_lambda",
      (s, dir) => Microstructure.kyleLambda(u(s, dir))
        .orderBy("symbol"),
      Some(Tables.withUpdates(Microstructure.kyleLambdaSql()))),

    Q("q_flow_autocorr",
      (s, dir) => Microstructure.flowAutocorr(u(s, dir))
        .orderBy("symbol"),
      Some(Tables.withUpdates(Microstructure.flowAutocorrSql()))),

    Q("q_amihud",
      (s, dir) => Microstructure.amihud(u(s, dir))
        .orderBy("symbol"),
      Some(Tables.withUpdates(Microstructure.amihudSql()))),

    Q("q_variance_ratio",
      (s, dir) => Microstructure.varianceRatio(u(s, dir))
        .orderBy("symbol"),
      Some(Tables.withUpdates(Microstructure.varianceRatioSql()))),

    Q("q_return_anomaly",
      (s, dir) => Microstructure.returnAnomaly(u(s, dir)),
      Some(Tables.withUpdatesChain(Microstructure.returnAnomalySql()))),

    Q("q_max_drawdown",
      (s, dir) => Microstructure.maxDrawdown(u(s, dir)),
      Some(Tables.withUpdates(Microstructure.maxDrawdownSql()))),

    Q("q_return_moments",
      (s, dir) => Microstructure.returnMoments(u(s, dir)),
      Some(Tables.withUpdates(Microstructure.returnMomentsSql()))),

    Q("q_return_corr",
      (s, dir) => Microstructure.returnCorr(u(s, dir)),
      Some(Tables.withUpdates(Microstructure.returnCorrSql()))),

    Q("q_bucket_spread",
      (s, dir) => Microstructure.bucketSpread(u(s, dir))
        .orderBy("symbol", "start"),
      Some(Tables.withUpdates(Microstructure.bucketSpreadSql()))),

    Q("q_realized_vol",
      (s, dir) => Microstructure.realizedVol(u(s, dir))
        .orderBy("symbol", "start"),
      Some(Tables.withUpdates(Microstructure.realizedVolSql()))),

    // geometric-decay trade intensity (Hawkes-style activity proxy):
    // pure-integer recursion over the bucket series, recursive-CTE twin
    Q("q_trade_intensity",
      (s, dir) => DecaySeries.tradeIntensity(u(s, dir))
        .orderBy("symbol", "start"),
      Some(Tables.withUpdatesChainRecursive(
        DecaySeries.tradeIntensitySql()))),

    // EMA of the bucket close, alpha = 1/8 as an integer multiply-add
    Q("q_ema_close",
      (s, dir) => DecaySeries.emaClose(u(s, dir))
        .orderBy("symbol", "start"),
      Some(Tables.withUpdatesChainRecursive(DecaySeries.emaCloseSql()))),

    Q("q_order_trade_ratio",
      (s, dir) => Microstructure.orderTradeRatio(u(s, dir))
        .orderBy("symbol", "start"),
      Some(Tables.withUpdates(Microstructure.orderTradeRatioSql()))),

    Q("q_twap_quote",
      (s, dir) => Microstructure.twapQuote(u(s, dir))
        .orderBy("symbol", "is_bid", "start"),
      Some(Tables.withUpdates(Microstructure.twapQuoteSql()))),

    // the partitioned tick store itself, oracle-gated: write the
    // updates table into the symbol=/day= layout (once per dir per JVM
    // — the trained-quantizer memo pattern; see storeMemo), scan one
    // symbol's range
    // through BOTH partition prunings, and let DuckDB recompute the
    // expected rows from the RAW events — a source-of-truth round-trip
    // of write → layout → prune → scan, not a reread of our own files
    Q("q_tickstore_scan",
      (s, dir) => {
        val root = tickStoreFor(s, dir)
        graft.sources.TickStore.scan(s, root, "click", RangeLo, RangeHi)
          .orderBy("ts", "seq")
      },
      Some(Tables.withUpdates(
        s"""SELECT * FROM updates WHERE symbol = 'click'
           |AND ts BETWEEN $RangeLo AND $RangeHi ORDER BY ts, seq"""
          .stripMargin.replace('\n', ' ')))),

    // storage → operator composition: OHLCV bars computed directly over
    // the PRUNED store scan (the plan a production query actually runs
    // — partition pruning feeding the bar aggregation), against the
    // same-window bars recomputed from raw events
    Q("q_tickstore_bars",
      (s, dir) => {
        val root = tickStoreFor(s, dir)
        TimeBars.bars(
          graft.sources.TickStore.scan(s, root, "click", RangeLo, RangeHi))
          .orderBy("symbol", "start")
      },
      Some(Tables.withUpdates(
        s"""SELECT symbol, start, start AS "end", open, high, low, close,
           | volume FROM (
           |SELECT symbol, ((ts // 1000) // 60) * 60 AS start,
           | first(price ORDER BY ts, seq) AS open,
           | max(price) AS high, min(price) AS low,
           | last(price ORDER BY ts, seq) AS close,
           | CAST(SUM(CAST(size AS DECIMAL(30,4))) AS DOUBLE) AS volume
           |FROM updates
           |WHERE symbol = 'click' AND ts BETWEEN $RangeLo AND $RangeHi
           | AND is_trade GROUP BY 1, 2
           |QUALIFY start < max(start) OVER (PARTITION BY symbol))
           |ORDER BY symbol, start""".stripMargin.replace('\n', ' ')))),

    // the microstructure family over the SAME pruned store scan — the
    // production plan for "vwap of one symbol, one day-range" reads
    // only that symbol's day partitions
    Q("q_tickstore_vwap",
      (s, dir) => {
        val root = tickStoreFor(s, dir)
        Microstructure.vwapBars(
          graft.sources.TickStore.scan(s, root, "click", RangeLo, RangeHi))
          .orderBy("symbol", "start")
      },
      Some(Tables.withUpdates(
        s"""SELECT symbol, start, n_trades, volume, turnover,
           | CASE WHEN volume <> 0.0 THEN turnover / volume END AS vwap
           |FROM (
           | SELECT symbol, ((ts // 1000) // 60) * 60 AS start,
           |  count(*) AS n_trades,
           |  CAST(SUM(CAST(size AS DECIMAL(30,4))) AS DOUBLE) AS volume,
           |  CAST(SUM(CAST(CAST(price AS VARCHAR) AS DECIMAL(18,2))
           |    * CAST(CAST(size AS VARCHAR) AS DECIMAL(16,4)))
           |   AS DOUBLE) AS turnover
           | FROM updates
           | WHERE symbol = 'click' AND ts BETWEEN $RangeLo AND $RangeHi
           |  AND is_trade GROUP BY 1, 2)
           |ORDER BY symbol, start""".stripMargin.replace('\n', ' ')))),

    // return-dynamics wave over the shared bucketReturns kernel:
    // realized-vs-bipower jump decomposition, the multi-lag return
    // ACF, and the aggregated-variance Hurst exponent
    Q("q_bipower_var",
      (s, dir) => ReturnDynamics.bipowerVar(u(s, dir))
        .orderBy("symbol"),
      Some(Tables.withUpdates(ReturnDynamics.bipowerVarSql()))),

    Q("q_return_acf",
      (s, dir) => ReturnDynamics.returnAcf(u(s, dir))
        .orderBy("symbol", "lag"),
      Some(Tables.withUpdates(ReturnDynamics.returnAcfSql()))),

    Q("q_hurst",
      (s, dir) => ReturnDynamics.hurst(u(s, dir))
        .orderBy("symbol"),
      Some(Tables.withUpdates(ReturnDynamics.hurstSql()))),

    // Corwin-Schultz high-low spread: exact integer cents, quantized
    // log ranges, sqrt-only alpha chain, quantized exp emission
    Q("q_corwin_schultz",
      (s, dir) => RangeSpread.corwinSchultz(u(s, dir))
        .orderBy("symbol", "start"),
      Some(Tables.withUpdates(RangeSpread.corwinSchultzSql()))),

    // day-of-week activity/volume seasonality (0 = Sunday)
    Q("q_weekly_profile",
      (s, dir) => Microstructure.weeklyProfile(u(s, dir))
        .orderBy("symbol", "dow"),
      Some(Tables.withUpdates(Microstructure.weeklyProfileSql()))),

    // per-symbol trade-size percentiles (block-trade profile)
    Q("q_trade_size_percentiles",
      (s, dir) => Microstructure.tradeSizePercentiles(u(s, dir)),
      Some(Tables.withUpdatesChain(
        Microstructure.tradeSizePercentilesSql()))),

    // cross-symbol lead-lag correlation vs the benchmark at hourly
    // buckets (the symbolBeta grain: minute buckets barely overlap
    // across the sparse sf symbols)
    Q("q_lead_lag",
      (s, dir) => Microstructure.leadLag(u(s, dir), seconds = 3600),
      Some(Tables.withUpdatesChain(
        Microstructure.leadLagSql(seconds = 3600)))),

    // quote-to-trade response latency: exact ms gaps to the last
    // prior live quote write
    Q("q_quote_trade_lag",
      (s, dir) => Microstructure.quoteTradeLag(u(s, dir))
        .orderBy("symbol", "start"),
      Some(Tables.withUpdates(Microstructure.quoteTradeLagSql()))),

    // Lee-Ready trade classification: quote rule with tick-rule
    // fallback, exact side volumes, signed-flow ratio
    Q("q_lee_ready",
      (s, dir) => Microstructure.leeReady(u(s, dir))
        .orderBy("symbol", "start"),
      Some(Tables.withUpdates(Microstructure.leeReadySql()))),

    // BNS/Huang-Tauchen jump TEST: max-adjusted ratio statistic with
    // exact quarticity sums (decimal->double emission)
    Q("q_jump_test",
      (s, dir) => ReturnDynamics.jumpTest(u(s, dir))
        .orderBy("symbol"),
      Some(Tables.withUpdates(ReturnDynamics.jumpTestSql()))),

    // volume-concentration HHI + effective bin count over the
    // volume-profile price bins
    Q("q_volume_hhi",
      (s, dir) => Microstructure.volumeHhi(u(s, dir)),
      Some(Tables.withUpdates(Microstructure.volumeHhiSql()))),

    // realized semivariance: sign-split RV + signed jump variation
    Q("q_realized_semivariance",
      (s, dir) => ReturnDynamics.realizedSemivariance(u(s, dir))
        .orderBy("symbol"),
      Some(Tables.withUpdates(
        ReturnDynamics.realizedSemivarianceSql()))),

    // hour-of-day volume/trade seasonality profile per symbol
    Q("q_intraday_profile",
      (s, dir) => Microstructure.intradayProfile(u(s, dir))
        .orderBy("symbol", "hour"),
      Some(Tables.withUpdates(Microstructure.intradayProfileSql()))),

    // market beta vs the benchmark symbol's bucket returns — HOURLY
    // buckets in the gate: minute buckets barely overlap across the
    // sparse sf0.01 symbols (the returnCorr situation), hourly gives
    // the oracle a fully-joined moment system to check
    Q("q_symbol_beta",
      (s, dir) => Microstructure.symbolBeta(u(s, dir), seconds = 3600)
        .orderBy("symbol"),
      Some(Tables.withUpdates(Microstructure.symbolBetaSql(
        seconds = 3600)))),

    // traded-volume histogram by price bin with per-symbol share and
    // point of control (lowest-bin tie-break)
    Q("q_volume_profile",
      (s, dir) => Microstructure.volumeProfile(u(s, dir)),
      Some(Tables.withUpdates(Microstructure.volumeProfileSql()))),

    // range-based volatility pair over the shared bucket-OHLC-cents
    // kernel: Parkinson high-low and Garman-Klass OHLC estimators,
    // quantized log ranges, exact squared sums, fixed IEEE chains
    Q("q_parkinson",
      (s, dir) => RangeSpread.parkinson(u(s, dir))
        .orderBy("symbol"),
      Some(Tables.withUpdates(RangeSpread.parkinsonSql()))),

    Q("q_garman_klass",
      (s, dir) => RangeSpread.garmanKlass(u(s, dir))
        .orderBy("symbol"),
      Some(Tables.withUpdates(RangeSpread.garmanKlassSql()))),

    // realized variance at multiple sampling scales (signature plot);
    // Spark re-aggregates coarse closes from the finest grain, the
    // twin re-buckets each scale from the raw stream — rebin identity
    Q("q_vol_signature",
      (s, dir) => Microstructure.volSignature(u(s, dir)),
      Some(Tables.withUpdates(Microstructure.volSignatureSql()))),

    // r15: realized-kernel variance (BNHLS 2008, Parzen weights) —
    // autocovariance-corrected noise-robust RV; exact integer γ_h
    // sums, Scala-literal kernel weights, one IEEE chain
    Q("q_realized_kernel",
      (s, dir) => ReturnDynamics.realizedKernel(u(s, dir)),
      Some(Tables.withUpdates(ReturnDynamics.realizedKernelSql()))),

    // r15: Epps-effect curve — returnCorr over a scale ladder; the
    // cross-symbol sampling-horizon diagnostic
    Q("q_epps_effect",
      (s, dir) => Microstructure.eppsEffect(u(s, dir)),
      Some(Tables.withUpdates(Microstructure.eppsEffectSql()))),

    // r15: CUSUM change-point (Page 1954, Brownian-bridge
    // standardization) — exact ×n-cleared partial sums, exact peak
    // and argmax bucket, one IEEE statistic chain
    Q("q_cusum_change_point",
      (s, dir) => ReturnDynamics.cusumChangePoint(u(s, dir)),
      Some(Tables.withUpdates(ReturnDynamics.cusumChangePointSql()))),

    // r14: the OHLC estimator family completed — Rogers-Satchell
    // (drift-independent) and Yang-Zhang (overnight + intraday +
    // RS, the minimum-variance combination); same quantized-log
    // kernel, exact term sums, fixed IEEE chains
    Q("q_rogers_satchell",
      (s, dir) => RangeSpread.rogersSatchell(u(s, dir))
        .orderBy("symbol"),
      Some(Tables.withUpdates(RangeSpread.rogersSatchellSql()))),

    Q("q_yang_zhang",
      (s, dir) => RangeSpread.yangZhang(u(s, dir))
        .orderBy("symbol"),
      Some(Tables.withUpdates(RangeSpread.yangZhangSql()))),

    // two-scale realized variance (noise-robust RV): subgrid-average
    // minus bias-corrected full-grid RV, both scales off the one
    // bucket-close series with two lags over a single window
    Q("q_tsrv",
      (s, dir) => ReturnDynamics.tsrv(u(s, dir))
        .orderBy("symbol"),
      Some(Tables.withUpdates(ReturnDynamics.tsrvSql()))),

    // Hayashi-Yoshida tick-grain covariance vs the benchmark symbol:
    // asynchronous-data covariance with NO bucket grid — the bench
    // side telescopes to two total-order as-of lookups per interval
    // (global TickCarry carries, forward + backward), exact integer
    // products, 1-row bench-RV broadcast
    Q("q_hayashi_yoshida",
      (s, dir) => Microstructure.hayashiYoshida(u(s, dir))
        .orderBy("symbol"),
      Some(Tables.withUpdatesChain(
        Microstructure.hayashiYoshidaSql()))),

    // trade-duration lag-1 autocorrelation (the ACD clustering
    // diagnostic): exact ms durations via two chained tick carries,
    // decimal sums, one paired-sample IEEE chain
    Q("q_duration_acf",
      (s, dir) => Microstructure.durationAcf(u(s, dir))
        .orderBy("symbol"),
      Some(Tables.withUpdates(Microstructure.durationAcfSql())))
  )

  /** One partitioned store per sf DIR (keyed by dir alone, NOT per
    * session: a second SparkSession in the same JVM reuses the store the
    * first one wrote — benign, since the store content is a pure
    * function of the dir's parquet), built on first use and rebuilt
    * only when a fresh JVM runs (java.io.tmpdir scoped). */
  private val storeMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def tickStoreFor(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    storeMemo.computeIfAbsent(dir, { _ =>
      val root = java.nio.file.Files
        .createTempDirectory("graft-tickstore-gate").toString + "/store"
      graft.sources.TickStore.write(Tables.updates(s, dir), root,
        org.apache.spark.sql.SaveMode.Overwrite)
      root
    })
}
