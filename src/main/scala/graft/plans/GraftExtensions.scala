package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** `SparkSessionExtensions` surface: the engine's scalar functions as
  * SQL-callable Catalyst expressions, so a `spark.sql` user gets the same
  * semantics as the Column API without UDFs (the builders compose
  * codegen-friendly built-in expressions, no black boxes).
  *
  * Register with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  *  - `fill_digits(ts)` — 13-digit ms normalization
  *    (`tdb-core/src/utils.rs:11-22`)
  *  - `ts_seconds(ts)` — normalized epoch seconds (`time_bars.rs:28,85`)
  *  - `discretize(price, decimals)` / `undiscretize(level, decimals)` —
  *    price-level integerization (`postprocessing/orderbook.rs:27-34`)
  *
  * And the OPERATOR registry as SQL TABLE functions (VERDICT r11 #5 —
  * SURVEY §2.7's "free via Spark SQL if we expose it", now exposed), so
  * a reference user's `dtfcat`-class candle/stats/book workflows run as
  * plain SQL:
  * {{{
  *   updatesDf.createOrReplaceTempView("updates")
  *   spark.sql("SELECT * FROM time_bars(60)")
  *   spark.sql("SELECT * FROM realized_vol('updates', 60)")
  * }}}
  * Every table function reads the session temp view `updates` (or the
  * view named by an optional leading string argument) and returns the
  * exact plan the Column API builds — SqlSurfaceSpec pins
  * DataFrame-identity for the whole surface. Arguments must be literals
  * (they parameterize plan construction, the TVF contract). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    registerOperators(ext)
    register(ext, "fill_digits", "normalize an epoch to 13-digit ms",
      { case Seq(ts) => fillDigitsExpr(ts) })
    register(ext, "ts_seconds", "normalized epoch seconds",
      { case Seq(ts) => tsSecondsExpr(ts) })
    register(ext, "discretize", "price -> integer level at 10^decimals",
      { case Seq(price, d) => discretizeExpr(price, d) })
    register(ext, "undiscretize", "integer level -> price at 10^decimals",
      { case Seq(level, d) => undiscretizeExpr(level, d) })
    register(ext, "array_dot", "codegen'd dot product of two array<double>",
      { case Seq(a, b) => ArrayDotProduct(a, b) })
    // text-pipeline scalars (same semantics as graft.ext.TextOps;
    // ExtensionsSpec pins SQL == Column API on shared inputs)
    register(ext, "token_count", "whitespace token count",
      { case Seq(t) => tokenCountExpr(t) })
    register(ext, "bpe_token_count", "GPT-2-style pre-token count",
      { case Seq(t) => bpeTokenCountExpr(t) })
    register(ext, "ln_q", "ln quantized to 12 decimals (bit-portable idf)",
      { case Seq(x) => lnQExpr(x) })
  }

  private def register(ext: SparkSessionExtensions, name: String,
      usage: String, builder: PartialFunction[Seq[Expression], Expression])
      : Unit =
    ext.injectFunction((FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name),
      (exprs: Seq[Expression]) =>
        builder.applyOrElse(exprs, (_: Seq[Expression]) =>
          throw new IllegalArgumentException(
            s"$name: wrong number of arguments (${exprs.length})"))))

  /** The operator registry as table functions. Numeric parameters in
    * comments are position 0.. after the optional view name. */
  private def registerOperators(ext: SparkSessionExtensions): Unit = {
    import graft.operators._
    def long0(a: Seq[Double], d: Long): Long =
      a.headOption.map(_.toLong).getOrElse(d)
    // candles
    registerTable(ext, "time_bars") { (u, a) =>
      TimeBars.bars(u, long0(a, 60L)) }
    registerTable(ext, "volume_bars") { (u, a) =>
      FoldBars.volumeBars(u, a.headOption.getOrElse(1000.0)) }
    registerTable(ext, "dollar_bars") { (u, a) =>
      FoldBars.dollarBars(u, a.headOption.getOrElse(1000.0)) }
    registerTable(ext, "tick_bars") { (u, a) =>
      TickBars.bars(u, long0(a, 10L).toInt) }
    // book
    registerTable(ext, "orderbook") { (u, a) =>
      Orderbook.snapshot(u, long0(a, 2L).toInt) }
    registerTable(ext, "asof_quote") { (u, _) =>
      AsofJoin.tradesWithQuote(u) }
    // histogram / stats family
    registerTable(ext, "tick_histogram") { (u, a) =>
      HistogramOps.histogram(u, long0(a, 10L).toInt,
        a.lift(1).getOrElse(3.0)) }
    registerTable(ext, "time_boundaries") { (u, a) =>
      HistogramOps.timeBoundaries(u, long0(a, 10L).toInt) }
    registerTable(ext, "tick_stats") { (u, _) => HistogramOps.stats(u) }
    registerTable(ext, "gap_detect") { (u, a) =>
      Gaps.detect(u, long0(a, 60L)) }
    // microstructure estimators (seconds defaults to 60 everywhere)
    registerTable(ext, "vwap_bars") { (u, a) =>
      Microstructure.vwapBars(u, long0(a, 60L)) }
    registerTable(ext, "trade_imbalance") { (u, a) =>
      Microstructure.tradeImbalance(u, long0(a, 60L)) }
    registerTable(ext, "bucket_spread") { (u, a) =>
      Microstructure.bucketSpread(u, long0(a, 60L)) }
    registerTable(ext, "realized_vol") { (u, a) =>
      Microstructure.realizedVol(u, long0(a, 60L)) }
    registerTable(ext, "roll_spread") { (u, a) =>
      Microstructure.rollSpread(u, long0(a, 60L)) }
    registerTable(ext, "tick_rule_flow") { (u, a) =>
      Microstructure.tickRuleFlow(u, long0(a, 60L)) }
    registerTable(ext, "effective_spread") { (u, a) =>
      Microstructure.effectiveSpread(u, long0(a, 60L)) }
    registerTable(ext, "kyle_lambda") { (u, a) =>
      Microstructure.kyleLambda(u, long0(a, 60L)) }
    registerTable(ext, "flow_autocorr") { (u, a) =>
      Microstructure.flowAutocorr(u, long0(a, 60L)) }
    registerTable(ext, "amihud") { (u, a) =>
      Microstructure.amihud(u, long0(a, 60L)) }
    registerTable(ext, "variance_ratio") { (u, a) =>
      Microstructure.varianceRatio(u, long0(a, 60L)) }
    registerTable(ext, "return_moments") { (u, a) =>
      Microstructure.returnMoments(u, long0(a, 60L)) }
    registerTable(ext, "max_drawdown") { (u, a) =>
      Microstructure.maxDrawdown(u, long0(a, 60L)) }
    registerTable(ext, "return_corr") { (u, a) =>
      Microstructure.returnCorr(u, long0(a, 60L)) }
    registerTable(ext, "twap_quote") { (u, a) =>
      Microstructure.twapQuote(u, long0(a, 60L)) }
    registerTable(ext, "order_trade_ratio") { (u, a) =>
      Microstructure.orderTradeRatio(u, long0(a, 60L)) }
    // r12/r13 estimator wave
    registerTable(ext, "vpin") { (u, a) =>
      Vpin.vpin(u, a.headOption.getOrElse(100.0),
        a.lift(1).map(_.toInt).getOrElse(5)) }
    registerTable(ext, "tick_imbalance_bars") { (u, a) =>
      FoldBars.tickImbalanceBars(u, long0(a, 4L)) }
    registerTable(ext, "bipower_var") { (u, a) =>
      ReturnDynamics.bipowerVar(u, long0(a, 60L)) }
    registerTable(ext, "return_acf") { (u, a) =>
      ReturnDynamics.returnAcf(u, long0(a, 60L)) }
    registerTable(ext, "hurst") { (u, a) =>
      ReturnDynamics.hurst(u, long0(a, 60L)) }
    registerTable(ext, "realized_semivariance") { (u, a) =>
      ReturnDynamics.realizedSemivariance(u, long0(a, 60L)) }
    registerTable(ext, "corwin_schultz") { (u, a) =>
      RangeSpread.corwinSchultz(u, long0(a, 60L)) }
    registerTable(ext, "trade_intensity") { (u, a) =>
      DecaySeries.tradeIntensity(u, long0(a, 60L)) }
    registerTable(ext, "ema_close") { (u, a) =>
      DecaySeries.emaClose(u, long0(a, 60L)) }
    registerTable(ext, "intraday_profile") { (u, _) =>
      Microstructure.intradayProfile(u) }
    registerTable(ext, "symbol_beta") { (u, a) =>
      Microstructure.symbolBeta(u, long0(a, 60L)) }
    registerTable(ext, "parkinson") { (u, a) =>
      RangeSpread.parkinson(u, long0(a, 60L)) }
    registerTable(ext, "garman_klass") { (u, a) =>
      RangeSpread.garmanKlass(u, long0(a, 60L)) }
    registerTable(ext, "jump_test") { (u, a) =>
      ReturnDynamics.jumpTest(u, long0(a, 60L)) }
    registerTable(ext, "lee_ready") { (u, a) =>
      Microstructure.leeReady(u, long0(a, 60L)) }
    registerTable(ext, "lead_lag") { (u, a) =>
      Microstructure.leadLag(u, long0(a, 60L),
        a.lift(1).map(_.toInt).getOrElse(2)) }
    registerTable(ext, "quote_trade_lag") { (u, a) =>
      Microstructure.quoteTradeLag(u, long0(a, 60L)) }
    registerTable(ext, "weekly_profile") { (u, _) =>
      Microstructure.weeklyProfile(u) }
    registerTable(ext, "trade_size_percentiles") { (u, _) =>
      Microstructure.tradeSizePercentiles(u) }
    registerTable(ext, "volume_hhi") { (u, a) =>
      Microstructure.volumeHhi(u, long0(a, 100L)) }
    registerTable(ext, "rogers_satchell") { (u, a) =>
      RangeSpread.rogersSatchell(u, long0(a, 60L)) }
    registerTable(ext, "yang_zhang") { (u, a) =>
      RangeSpread.yangZhang(u, long0(a, 60L)) }
    registerTable(ext, "tsrv") { (u, a) =>
      ReturnDynamics.tsrv(u, long0(a, 60L),
        a.lift(1).map(_.toInt).getOrElse(5)) }
    registerTable(ext, "hayashi_yoshida") { (u, _) =>
      Microstructure.hayashiYoshida(u) }
    registerTable(ext, "duration_acf") { (u, _) =>
      Microstructure.durationAcf(u) }
    registerTable(ext, "realized_kernel") { (u, a) =>
      ReturnDynamics.realizedKernel(u, long0(a, 60L),
        a.lift(1).map(_.toInt).getOrElse(4)) }
    registerTable(ext, "epps_effect") { (u, a) =>
      Microstructure.eppsEffect(u,
        if (a.isEmpty) Seq(60L, 300L, 900L) else a.map(_.toLong)) }
    registerTable(ext, "cusum_change_point") { (u, a) =>
      ReturnDynamics.cusumChangePoint(u, long0(a, 60L),
        a.lift(1).getOrElse(1.358d)) }
    // clickstream family (the tick view argument names the EVENTS
    // view here — default 'events')
    registerEventTable(ext, "sessionize") { (e, a) =>
      EventAnalytics.sessionize(e, long0(a, 1800L)) }
    registerEventTable(ext, "transitions") { (e, _) =>
      EventAnalytics.transitions(e) }
    registerEventTable(ext, "rfm") { (e, _) => EventAnalytics.rfm(e) }
    registerEventTable(ext, "user_fano") { (e, _) =>
      ActivityStats.userFano(e) }
    registerEventTable(ext, "burstiness") { (e, _) =>
      ActivityStats.burstiness(e) }
    registerEventTable(ext, "nav_entropy") { (e, _) =>
      ActivityStats.navEntropy(e) }
    registerEventTable(ext, "touch_attribution") { (e, _) =>
      EventAnalytics.touchAttribution(e) }
    registerEventTable(ext, "position_attribution") { (e, _) =>
      EventAnalytics.positionAttribution(e) }
    registerEventTable(ext, "time_decay_attribution") { (e, a) =>
      EventAnalytics.timeDecayAttribution(e,
        halflifeMicros = long0(a, 7L * 86400L * 1000000L)) }
    registerEventTable(ext, "stickiness") { (e, a) =>
      EventAnalytics.stickiness(e, long0(a, 28L)) }
    registerEventTable(ext, "activity_gini") { (e, _) =>
      ActivityStats.activityGini(e) }
    registerEventTable(ext, "transition_entropy") { (e, _) =>
      EventAnalytics.transitionEntropy(e) }
    registerEventTable(ext, "daily_anomaly") { (e, _) =>
      ActivityStats.dailyAnomaly(e) }
    // r14: the attribution/survival solver wave and the remaining
    // clickstream surface as SQL table functions (convType stays at
    // its 'purchase' default — TVF args are numeric by contract).
    // The solver TVFs run their driver-side solve during analysis,
    // so their loud guards (reserved states, maxTypes/maxChannels)
    // surface from spark.sql() directly.
    registerEventTable(ext, "session_paths") { (e, a) =>
      EventAnalytics.sessionPaths(e, long0(a, 1800L),
        a.lift(1).map(_.toInt).getOrElse(8)) }
    registerEventTable(ext, "bounce_rate") { (e, a) =>
      EventAnalytics.bounceRate(e, long0(a, 1800L),
        a.lift(1).map(_.toLong).getOrElse(7L)) }
    registerEventTable(ext, "retention_cohorts") { (e, a) =>
      EventAnalytics.retentionCohorts(e, long0(a, 7L)) }
    registerEventTable(ext, "dwell_percentiles") { (e, _) =>
      EventAnalytics.dwellPercentiles(e) }
    registerEventTable(ext, "ab_test") { (e, _) =>
      EventAnalytics.abTest(e) }
    registerEventTable(ext, "event_lift") { (e, _) =>
      EventAnalytics.eventLift(e) }
    registerEventTable(ext, "type_pagerank") { (e, a) =>
      EventAnalytics.typePagerank(e, long0(a, 20L).toInt) }
    registerEventTable(ext, "markov_attribution") { (e, a) =>
      EventAnalytics.markovAttribution(e,
        iterations = long0(a, 20L).toInt) }
    registerEventTable(ext, "chain_hitting_time") { (e, a) =>
      EventAnalytics.chainHittingTime(e,
        iterations = long0(a, 20L).toInt) }
    registerEventTable(ext, "shapley_attribution") { (e, _) =>
      EventAnalytics.shapleyAttribution(e) }
    registerEventTable(ext, "kaplan_meier") { (e, a) =>
      EventAnalytics.kaplanMeier(e, long0(a, 7L),
        a.lift(1).map(_.toLong).getOrElse(7L)) }
    registerEventTable(ext, "cohort_ltv") { (e, a) =>
      EventAnalytics.cohortLtv(e, long0(a, 7L)) }
  }

  /** Inject one operator as a SQL table function: evaluate the literal
    * arguments, pull the tick view from the ACTIVE session's catalog
    * (resolution happens inside analysis, so `SparkSession.active` is
    * the calling session), build the operator's DataFrame with the
    * Column API, and hand its logical plan back to the analyzer — the
    * SQL front door and the Scala front door are the same plan by
    * construction. */
  private def registerTable(ext: SparkSessionExtensions, name: String)(
      build: (DataFrame, Seq[Double]) => DataFrame): Unit = {
    GraftExtensions.recordTableFunction(name)
    ext.injectTableFunction((FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name),
      (exprs: Seq[Expression]) => tablePlan(name, exprs, build)))
  }

  /** [[registerTable]] with the clickstream family's default view:
    * the optional leading string argument names the EVENTS view. */
  private def registerEventTable(ext: SparkSessionExtensions,
      name: String)(
      build: (DataFrame, Seq[Double]) => DataFrame): Unit = {
    GraftExtensions.recordTableFunction(name)
    ext.injectTableFunction((FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name),
      (exprs: Seq[Expression]) =>
        tablePlan(name, exprs, build, defaultView = "events")))
  }

  private def tablePlan(name: String, exprs: Seq[Expression],
      build: (DataFrame, Seq[Double]) => DataFrame,
      defaultView: String = "updates"): LogicalPlan = {
    val vals = exprs.map { e =>
      if (!e.foldable) throw new IllegalArgumentException(
        s"$name: table-function arguments must be literals, got $e")
      (e.dataType, e.eval())
    }
    val (view, nums) = vals match {
      case (StringType, v) +: rest =>
        (v.toString, rest.map { case (_, n) => numOf(name, n) })
      case all => (defaultView, all.map { case (_, v) => numOf(name, v) })
    }
    val spark = SparkSession.active
    build(spark.table(view), nums).queryExecution.logical
  }

  private def numOf(name: String, v: Any): Double = v match {
    case n: java.lang.Number => n.doubleValue()
    // SQL decimal literals ('0.5') arrive as Spark Decimal, not Number
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => throw new IllegalArgumentException(
      s"$name: expected a numeric argument, got $other")
  }
}

object GraftExtensions {

  /** Every table-function name ever injected (populated as a side
    * effect of building a session `.withExtensions(new
    * GraftExtensions)`). SqlSurfaceSpec asserts its pinned
    * SQL==Column-API sweep covers EXACTLY this set, so a new TVF
    * cannot land unpinned (VERDICT r13 #5). */
  private val tableFns =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private[plans] def recordTableFunction(name: String): Unit =
    tableFns.add(name)
  def registeredTableFunctions: Set[String] = {
    import scala.jdk.CollectionConverters._
    tableFns.asScala.toSet
  }

  private val Lim = Literal(1000000000000L)

  /** Catalyst tree mirroring `functions.fillDigits`: the smallest
    * `ts * 10^k >= 10^12` wins; 0 stays 0. */
  def fillDigitsExpr(ts0: Expression): Expression = {
    val ts = Cast(ts0, LongType)
    val base = (EqualTo(ts, Literal(0L)),
      ts) :: (GreaterThanOrEqual(ts, Lim), ts) :: Nil
    val branches = base ++ (1 to 7).map { k =>
      val m = Multiply(ts, Literal(math.pow(10, k).toLong))
      (GreaterThanOrEqual(m, Lim), m: Expression)
    }
    CaseWhen(branches, Some(ts))
  }

  def tsSecondsExpr(ts: Expression): Expression =
    Cast(Divide(Cast(fillDigitsExpr(ts), DoubleType), Literal(1000.0)),
      LongType)

  def discretizeExpr(price: Expression, decimals: Expression): Expression =
    Cast(Floor(Multiply(Cast(price, DoubleType),
      Pow(Literal(10.0), Cast(decimals, DoubleType)))), LongType)

  def undiscretizeExpr(level: Expression, decimals: Expression): Expression =
    Divide(Cast(level, DoubleType),
      Pow(Literal(10.0), Cast(decimals, DoubleType)))

  /** `size(split(trim(text), '[ \t\n\x0B\f\r]+'))` — the explicit
    * Java-whitespace class (never bare `\s`, which Java and RE2
    * disagree on) — graft.ext.TextOps.tokenCount. */
  def tokenCountExpr(text: Expression): Expression =
    Size(StringSplit(StringTrim(text), Literal("[ \\t\\n\\x0B\\f\\r]+"), Literal(-1)))

  /** `size(regexp_extract_all(text, BpePattern, 0))` —
    * graft.ext.TextOps.bpeTokenCount. */
  def bpeTokenCountExpr(text: Expression): Expression =
    Size(RegExpExtractAll(text,
      Literal(graft.ext.TextOps.BpePattern), Literal(0)))

  /** `floor(ln(x) * 1e12) / 1e12` — graft.ext.TextOps.lnQ. */
  def lnQExpr(x: Expression): Expression =
    Divide(
      Cast(Floor(Multiply(Log(Cast(x, DoubleType)), Literal(1e12))),
        DoubleType),
      Literal(1e12))
}
