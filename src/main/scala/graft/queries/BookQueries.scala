package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators._

/** Correctness-gate entries for orderbook reconstruction, event
  * classification, levels, histograms and the stats suite
  * (SURVEY §2.4 A8-A10, §2.5 B1/B2/B4/B5). */
object BookQueries {

  private val Decimals = 2
  private val Bins = 20
  private val StepBins = 10
  private val TickBins = 20
  private val M = 3.0

  private def u(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.updates(s, dir)

  val all: Seq[Q] = Seq(

    // B1 — final orderbook snapshot after replaying the full stream
    // (`orderbook.rs:46-63`), relational form.
    Q("q_orderbook",
      (s, dir) => Orderbook.snapshot(u(s, dir), Decimals)
        .orderBy("symbol", "is_bid", "level"),
      Some(Tables.withUpdates(Orderbook.snapshotSql(Decimals)))),

    // B2 — top of book / best bid / best ask / midprice
    // (`orderbook.rs:84-131`).
    Q("q_book_top",
      (s, dir) => Orderbook.top(Orderbook.snapshot(u(s, dir), Decimals),
        Decimals).orderBy("symbol"),
      Some(Tables.withUpdates(
        s"book AS (${Orderbook.snapshotSql(Decimals)})",
        Orderbook.topSql(Decimals)))),

    // B2+ — liquidity within 25 bps of the mid per side: all-integer
    // band test on discretized levels, exact-decimal size sums
    Q("q_liquidity_band",
      (s, dir) => Orderbook.liquidityBand(u(s, dir), 25L, Decimals),
      Some(Tables.withUpdatesChain(
        Orderbook.liquidityBandSql(25L, Decimals)))),

    // B2+ — size-weighted microprice off the snapshot touch (the
    // queue-imbalance-adjusted fair price a quant pipeline derives
    // right after midprice)
    Q("q_microprice",
      (s, dir) => BookFeatures.microprice(
        Orderbook.snapshot(u(s, dir), Decimals), Decimals)
        .orderBy("symbol"),
      Some(Tables.withUpdates(
        s"book AS (${Orderbook.snapshotSql(Decimals)})",
        BookFeatures.micropriceSql(Decimals)))),

    // B2+ — depth imbalance within 10 ticks of each side's best:
    // exact decimal depth sums, bounded best-level table broadcast
    Q("q_depth_imbalance",
      (s, dir) => BookFeatures.depthImbalance(
        Orderbook.snapshot(u(s, dir), Decimals)).orderBy("symbol"),
      Some(Tables.withUpdates(
        s"book AS (${Orderbook.snapshotSql(Decimals)})",
        BookFeatures.depthImbalanceSql()))),

    // B2+ — Order Flow Imbalance (Cont-Kukanov-Stoikov) at bucket-end
    // touches: integer level comparisons, four-term IEEE chain on raw
    // SET sizes, per-(symbol,side,level) forward fill over the bucket
    // grid
    Q("q_ofi",
      (s, dir) => BookFeatures.ofi(u(s, dir), 60L, Decimals)
        .orderBy("symbol", "start"),
      Some(Tables.withUpdatesChain(
        BookFeatures.ofiSql(60L, Decimals)))),

    // B2+ — book depth profile: cumulative resting size and live-level
    // count within 5/10/25/50 bps of the bucket-end mid; exact integer
    // band cut (10000·|2l−m2| <= e·m2), scale-4 depth sums; the same
    // book fold vs grid-twin split as q_ofi
    Q("q_depth_profile",
      (s, dir) => BookFeatures.depthProfile(u(s, dir), 60L, Decimals)
        .orderBy("symbol", "start", "is_bid", "band_bps"),
      Some(Tables.withUpdatesChain(
        BookFeatures.depthProfileSql(60L, Decimals)))),

    // B2+ — the SCALE-TOLERANT cross-checks of the two book folds
    // (VERDICT r13 #2): same fold output, strided ~64-bucket sample
    // per symbol, sparse forward-fill twins that stay O(sample ×
    // levels) at every SF — these close the sf0.1 float-portability
    // blind spot the dense grid twins (oracle-SF-only) leave open
    Q("q_ofi_sampled",
      (s, dir) => BookFeatures.ofiSampled(u(s, dir), 60L, Decimals)
        .orderBy("symbol", "start"),
      Some(Tables.withUpdatesChain(
        BookFeatures.ofiSampledSql(60L, Decimals)))),

    Q("q_depth_profile_sampled",
      (s, dir) => BookFeatures.depthProfileSampled(
        u(s, dir), 60L, Decimals)
        .orderBy("symbol", "start", "is_bid", "band_bps"),
      Some(Tables.withUpdatesChain(
        BookFeatures.depthProfileSampledSql(60L, Decimals)))),

    // A3+ — rolling trailing-60s trade volume per trade row (RANGE
    // frame: identical peer semantics both engines; exact decimal sum)
    Q("q_rolling_volume",
      (s, dir) => BookFeatures.rollingVolume(u(s, dir))
        .orderBy("symbol", "ts", "seq"),
      Some(Tables.withUpdates(BookFeatures.rollingVolumeSql()))),

    // B3 — rebinned orderbook: 2-D (price-bin × time-bin) downsample of
    // book evolution (`orderbook.rs:174-281`); Spark side is the sequential
    // coarse-delta fold, oracle side rewrites the clamp-at-0 state with the
    // prefix-min identity (see RebinnedBook.rebinnedOracleSql).
    Q("q_rebinned_book",
      (s, dir) => RebinnedBook.rebinned(u(s, dir), Decimals, StepBins,
        TickBins, M).orderBy("symbol", "time_bin", "is_bid", "level"),
      Some(Tables.withUpdatesChain(
        RebinnedBook.rebinnedOracleSql(Decimals, StepBins, TickBins, M)))),

    // B4 — event classification: trade / cancel / create via lag over the
    // same-raw-price partition (`event.rs:28-72`).
    Q("q_events_classify",
      (s, dir) => EventsOps.classify(u(s, dir))
        .orderBy("symbol", "ts", "seq"),
      Some(Tables.withUpdates(
        EventsOps.classifySql + " ORDER BY symbol, ts, seq"))),

    // F4 — event size-range filter (`event.rs:76-92`): cancels in [10, 20].
    Q("q_events_filter_size",
      (s, dir) => EventsOps.filterSize(u(s, dir), "cancel", 10.0, 20.0)
        .orderBy("symbol", "ts", "seq"),
      Some(Tables.withUpdates(
        s"ev AS (${EventsOps.classifySql})",
        """SELECT * FROM ev WHERE event_class = 'cancel'
          | AND size BETWEEN 10.0 AND 20.0
          |ORDER BY symbol, ts, seq""".stripMargin.replace('\n', ' ')))),

    // B5 — levels transpose (price_bin × time_bin -> last size,
    // `level.rs:23-49`).
    Q("q_levels",
      (s, dir) => HistogramOps.levels(u(s, dir), StepBins, TickBins, M)
        .orderBy("symbol", "price_bin", "time_bin"),
      Some(Tables.withUpdatesChain(
        HistogramOps.levelsSql(StepBins, TickBins, M)))),

    // A8 — price histogram with MAD outlier rejection
    // (`histogram.rs:27-30,93-158`).
    Q("q_histogram",
      (s, dir) => HistogramOps.histogram(u(s, dir), Bins, M)
        .orderBy("symbol", "bin"),
      Some(Tables.withUpdatesChain(HistogramOps.histogramSql(Bins, M)))),

    // A9 — uniform time-step boundaries (`histogram.rs:43-64`).
    Q("q_time_boundaries",
      (s, dir) => HistogramOps.timeBoundaries(u(s, dir), StepBins)
        .orderBy("symbol", "bin"),
      Some(Tables.withUpdates(HistogramOps.timeBoundariesSql(StepBins)))),

    // A10 — descriptive stats suite (`histogram.rs:160-366`).
    Q("q_stats",
      (s, dir) => HistogramOps.stats(u(s, dir)).orderBy("symbol"),
      Some(Tables.withUpdatesChain(HistogramOps.statsSql)))
  )
}
