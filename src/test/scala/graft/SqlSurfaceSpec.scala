package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.plans.GraftExtensions

/** The operator registry through the SQL front door (VERDICT r11 #5):
  * every table function injected by [[GraftExtensions]] must return
  * DataFrame-IDENTICAL results to the Column API on the same session
  * view — same plan by construction, pinned here row-for-row on real
  * sf0.001 ticks. Also pins the argument conventions: defaulted args,
  * explicit numeric args, and the optional leading view-name string. */
class SqlSurfaceSpec extends SparkSpec {

  test("SQL table functions == Column API for the registry surface " +
      "(the FULL registered-TVF set pinned, ticks + events views)") {
    val base = spark // force shared session init first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val u = Tables.updates(s, sf())
      u.createOrReplaceTempView("updates")
      def rows(df: DataFrame): Seq[String] = df.collect().map(r =>
        r.toSeq.map(v => if (v == null) "null" else v.toString)
          .mkString("|")).sorted.toSeq
      val cases: Seq[(String, String, DataFrame)] = Seq(
        ("time_bars", "SELECT * FROM time_bars(60)",
          TimeBars.bars(u, 60L)),
        ("volume_bars", "SELECT * FROM volume_bars(500.0)",
          FoldBars.volumeBars(u, 500.0)),
        ("dollar_bars", "SELECT * FROM dollar_bars(100000.0)",
          FoldBars.dollarBars(u, 100000.0)),
        ("tick_bars", "SELECT * FROM tick_bars(7)",
          TickBars.bars(u, 7)),
        ("orderbook", "SELECT * FROM orderbook(2)",
          Orderbook.snapshot(u, 2)),
        ("asof_quote", "SELECT * FROM asof_quote()",
          AsofJoin.tradesWithQuote(u)),
        ("tick_histogram", "SELECT * FROM tick_histogram(12, 3.0)",
          HistogramOps.histogram(u, 12, 3.0)),
        ("time_boundaries", "SELECT * FROM time_boundaries(10)",
          HistogramOps.timeBoundaries(u, 10)),
        ("tick_stats", "SELECT * FROM tick_stats()",
          HistogramOps.stats(u)),
        ("gap_detect", "SELECT * FROM gap_detect(3600)",
          Gaps.detect(u, 3600L)),
        ("vwap_bars", "SELECT * FROM vwap_bars(120)",
          Microstructure.vwapBars(u, 120L)),
        ("trade_imbalance", "SELECT * FROM trade_imbalance()",
          Microstructure.tradeImbalance(u, 60L)),
        ("realized_vol", "SELECT * FROM realized_vol('updates', 60)",
          Microstructure.realizedVol(u, 60L)),
        ("roll_spread", "SELECT * FROM roll_spread(60)",
          Microstructure.rollSpread(u, 60L)),
        ("kyle_lambda", "SELECT * FROM kyle_lambda(60)",
          Microstructure.kyleLambda(u, 60L)),
        ("twap_quote", "SELECT * FROM twap_quote(60)",
          Microstructure.twapQuote(u, 60L)))
      cases.foreach { case (name, sql, api) =>
        val viaSql = rows(s.sql(sql))
        assert(viaSql.nonEmpty, s"$name: SQL surface returned no rows")
        assert(viaSql === rows(api), s"$name: SQL != Column API")
      }
      // r12/r13 estimator + clickstream waves: the same identity over
      // the events view (clickstream TVFs default to view 'events')
      val ev = Tables.table(s, sf(), "events")
      ev.createOrReplaceTempView("events")
      val wave: Seq[(String, String, DataFrame)] = Seq(
        ("vpin", "SELECT * FROM vpin(100.0, 5)",
          Vpin.vpin(u, 100.0, 5)),
        ("tick_imbalance_bars", "SELECT * FROM tick_imbalance_bars(4)",
          FoldBars.tickImbalanceBars(u, 4L)),
        ("bipower_var", "SELECT * FROM bipower_var(60)",
          ReturnDynamics.bipowerVar(u, 60L)),
        ("realized_semivariance",
          "SELECT * FROM realized_semivariance(60)",
          ReturnDynamics.realizedSemivariance(u, 60L)),
        ("corwin_schultz", "SELECT * FROM corwin_schultz(60)",
          RangeSpread.corwinSchultz(u, 60L)),
        ("trade_intensity", "SELECT * FROM trade_intensity(60)",
          DecaySeries.tradeIntensity(u, 60L)),
        ("ema_close", "SELECT * FROM ema_close(60)",
          DecaySeries.emaClose(u, 60L)),
        ("intraday_profile", "SELECT * FROM intraday_profile()",
          Microstructure.intradayProfile(u)),
        ("symbol_beta", "SELECT * FROM symbol_beta(3600)",
          Microstructure.symbolBeta(u, 3600L)),
        ("parkinson", "SELECT * FROM parkinson(60)",
          RangeSpread.parkinson(u, 60L)),
        ("garman_klass", "SELECT * FROM garman_klass(60)",
          RangeSpread.garmanKlass(u, 60L)),
        ("stickiness", "SELECT * FROM stickiness(7)",
          EventAnalytics.stickiness(ev, 7L)),
        ("jump_test", "SELECT * FROM jump_test(60)",
          ReturnDynamics.jumpTest(u, 60L)),
        ("lee_ready", "SELECT * FROM lee_ready(60)",
          Microstructure.leeReady(u, 60L)),
        ("lead_lag", "SELECT * FROM lead_lag(3600, 2)",
          Microstructure.leadLag(u, 3600L, 2)),
        ("quote_trade_lag", "SELECT * FROM quote_trade_lag(60)",
          Microstructure.quoteTradeLag(u, 60L)),
        ("weekly_profile", "SELECT * FROM weekly_profile()",
          Microstructure.weeklyProfile(u)),
        ("trade_size_percentiles",
          "SELECT * FROM trade_size_percentiles()",
          Microstructure.tradeSizePercentiles(u)),
        ("volume_hhi", "SELECT * FROM volume_hhi(100)",
          Microstructure.volumeHhi(u, 100L)),
        ("activity_gini", "SELECT * FROM activity_gini()",
          ActivityStats.activityGini(ev)),
        ("transition_entropy", "SELECT * FROM transition_entropy()",
          EventAnalytics.transitionEntropy(ev)),
        ("daily_anomaly", "SELECT * FROM daily_anomaly()",
          ActivityStats.dailyAnomaly(ev)),
        ("sessionize", "SELECT * FROM sessionize(1800)",
          EventAnalytics.sessionize(ev, 1800L)),
        ("transitions", "SELECT * FROM transitions()",
          EventAnalytics.transitions(ev)),
        ("rfm", "SELECT * FROM rfm('events')",
          EventAnalytics.rfm(ev)),
        ("user_fano", "SELECT * FROM user_fano()",
          ActivityStats.userFano(ev)),
        ("nav_entropy", "SELECT * FROM nav_entropy()",
          ActivityStats.navEntropy(ev)),
        ("touch_attribution", "SELECT * FROM touch_attribution()",
          EventAnalytics.touchAttribution(ev)),
        ("position_attribution",
          "SELECT * FROM position_attribution()",
          EventAnalytics.positionAttribution(ev)),
        ("time_decay_attribution",
          "SELECT * FROM time_decay_attribution()",
          EventAnalytics.timeDecayAttribution(ev)),
        // r13 verdict #5: the previously-unpinned registry residue —
        // with these, the pinned set below closes over EVERY
        // registered TVF and the closure assertion keeps it closed
        ("bucket_spread", "SELECT * FROM bucket_spread(60)",
          Microstructure.bucketSpread(u, 60L)),
        ("tick_rule_flow", "SELECT * FROM tick_rule_flow(60)",
          Microstructure.tickRuleFlow(u, 60L)),
        ("effective_spread", "SELECT * FROM effective_spread(60)",
          Microstructure.effectiveSpread(u, 60L)),
        ("flow_autocorr", "SELECT * FROM flow_autocorr(60)",
          Microstructure.flowAutocorr(u, 60L)),
        ("amihud", "SELECT * FROM amihud(60)",
          Microstructure.amihud(u, 60L)),
        ("variance_ratio", "SELECT * FROM variance_ratio(60)",
          Microstructure.varianceRatio(u, 60L)),
        ("return_moments", "SELECT * FROM return_moments(60)",
          Microstructure.returnMoments(u, 60L)),
        ("max_drawdown", "SELECT * FROM max_drawdown(60)",
          Microstructure.maxDrawdown(u, 60L)),
        // hourly buckets: minute buckets barely overlap across the
        // sparse sf0.001 symbols (the q_symbol_beta note)
        ("return_corr", "SELECT * FROM return_corr(3600)",
          Microstructure.returnCorr(u, 3600L)),
        ("order_trade_ratio", "SELECT * FROM order_trade_ratio(60)",
          Microstructure.orderTradeRatio(u, 60L)),
        ("return_acf", "SELECT * FROM return_acf(60)",
          ReturnDynamics.returnAcf(u, 60L)),
        ("hurst", "SELECT * FROM hurst(60)",
          ReturnDynamics.hurst(u, 60L)),
        ("rogers_satchell", "SELECT * FROM rogers_satchell(60)",
          RangeSpread.rogersSatchell(u, 60L)),
        ("yang_zhang", "SELECT * FROM yang_zhang(60)",
          RangeSpread.yangZhang(u, 60L)),
        ("tsrv", "SELECT * FROM tsrv(60, 5)",
          ReturnDynamics.tsrv(u, 60L, 5)),
        ("hayashi_yoshida", "SELECT * FROM hayashi_yoshida()",
          Microstructure.hayashiYoshida(u)),
        ("duration_acf", "SELECT * FROM duration_acf()",
          Microstructure.durationAcf(u)),
        ("realized_kernel", "SELECT * FROM realized_kernel(60, 4)",
          ReturnDynamics.realizedKernel(u, 60L, 4)),
        // hourly+ scales: minute buckets barely overlap across the
        // sparse sf0.001 symbols (the return_corr pin's note)
        ("epps_effect", "SELECT * FROM epps_effect(3600, 7200)",
          Microstructure.eppsEffect(u, Seq(3600L, 7200L))),
        ("cusum_change_point",
          "SELECT * FROM cusum_change_point(60)",
          ReturnDynamics.cusumChangePoint(u, 60L)),
        ("burstiness", "SELECT * FROM burstiness()",
          ActivityStats.burstiness(ev)),
        // r14: the attribution/survival solver wave through the SQL
        // front door (driver-side solves run during analysis; the
        // loud guards surface from spark.sql directly — see below)
        ("session_paths", "SELECT * FROM session_paths(1800)",
          EventAnalytics.sessionPaths(ev, 1800L)),
        ("bounce_rate", "SELECT * FROM bounce_rate(1800, 7)",
          EventAnalytics.bounceRate(ev, 1800L, 7L)),
        ("retention_cohorts", "SELECT * FROM retention_cohorts(7)",
          EventAnalytics.retentionCohorts(ev, 7L)),
        ("dwell_percentiles", "SELECT * FROM dwell_percentiles()",
          EventAnalytics.dwellPercentiles(ev)),
        ("ab_test", "SELECT * FROM ab_test()",
          EventAnalytics.abTest(ev)),
        ("event_lift", "SELECT * FROM event_lift()",
          EventAnalytics.eventLift(ev)),
        ("type_pagerank", "SELECT * FROM type_pagerank(20)",
          EventAnalytics.typePagerank(ev, 20)),
        ("markov_attribution", "SELECT * FROM markov_attribution()",
          EventAnalytics.markovAttribution(ev)),
        ("chain_hitting_time", "SELECT * FROM chain_hitting_time()",
          EventAnalytics.chainHittingTime(ev)),
        ("shapley_attribution", "SELECT * FROM shapley_attribution()",
          EventAnalytics.shapleyAttribution(ev)),
        ("kaplan_meier", "SELECT * FROM kaplan_meier(7, 7)",
          EventAnalytics.kaplanMeier(ev, 7L, 7L)),
        ("cohort_ltv", "SELECT * FROM cohort_ltv(7)",
          EventAnalytics.cohortLtv(ev, 7L)))
      wave.foreach { case (name, sql, api) =>
        val viaSql = rows(s.sql(sql))
        assert(viaSql.nonEmpty, s"$name: SQL surface returned no rows")
        assert(viaSql === rows(api), s"$name: SQL != Column API")
      }
      // closure: the pinned sweep covers EXACTLY the registered TVF
      // set — a table function injected without a pin here fails the
      // suite (VERDICT r13 #5)
      val pinned = (cases.map(_._1) ++ wave.map(_._1)).toSet
      val registered = GraftExtensions.registeredTableFunctions
      assert(registered.nonEmpty, "registry not populated")
      assert(pinned === registered,
        s"unpinned TVFs: ${(registered -- pinned).toSeq.sorted}; " +
          s"stale pins: ${(pinned -- registered).toSeq.sorted}")
      // the reserved-state guard fires THROUGH the SQL front door
      // too (r13 verdict #6): a feed carrying a literal reserved
      // chain state — including the '__full__' sentinel — raises
      // loud from spark.sql, never silently merging with the
      // absorbing state
      for (bad <- Seq("CONV", "__full__")) {
        import org.apache.spark.sql.functions.{lit, when, col}
        ev.withColumn("event_type",
            when(col("event_id") % 2 === 0, lit(bad))
              .otherwise(col("event_type")))
          .createOrReplaceTempView("events")
        val g = intercept[Exception] {
          s.sql("SELECT * FROM markov_attribution()").collect()
        }
        assert(g.getMessage.contains("collide") &&
          g.getMessage.contains(bad),
          s"TVF path did not raise on reserved state $bad: " +
            g.getMessage)
      }
      ev.createOrReplaceTempView("events")
      // composability: the TVF is a real relation — joins, filters and
      // aggregates over it parse and run like any table
      val joined = s.sql(
        """SELECT b.symbol, count(*) AS n
          |FROM time_bars(60) b JOIN vwap_bars(60) v
          |  ON b.symbol = v.symbol AND b.start = v.start
          |WHERE v.n_trades > 0 GROUP BY b.symbol""".stripMargin)
      assert(joined.collect().length > 0, "TVF join surface broken")
      // non-literal arguments are rejected loudly, not silently wrong
      // (the analyzer refuses the column reference in TVF position
      // before our own foldable guard even fires)
      val ex = intercept[Exception] {
        s.sql("SELECT * FROM time_bars(ts)").collect()
      }
      assert(ex.getMessage.contains("literal") ||
        ex.getMessage.contains("cannot be resolved"),
        s"wrong failure: ${ex.getMessage}")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
