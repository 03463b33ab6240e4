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
      "(16 operators)") {
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
