package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.model.Update
import graft.operators.Microstructure
import graft.streaming.Streaming

/** Adversarial batch ≡ streaming cross-check for the microstructure
  * family: the streaming twins are independent SCALAR folds of the same
  * contract the batch plans express relationally, so agreement on
  * generator-driven data (price ties, zero-size deletes, same-ts seq
  * peers, bucket-boundary timestamps, one-sided books, trade-less and
  * quote-less buckets) is a two-implementation consistency proof that
  * the single sf fixtures can't give. One streaming pass per operator
  * over ALL generated symbols (symbols partition the folds), split
  * mid-stream to exercise cross-micro-batch state carry. */
class MicrostructureFuzzSpec extends SparkSpec {

  import spark.implicits._

  /** ~26 symbols of adversarial shapes. Prices from a tiny ladder so
    * upticks/downticks/ties all occur; ts clustered around 60s bucket
    * edges; duplicate ts with distinct seq; ~15% zero-size (level
    * delete / degenerate trade). */
  private def fuzzUpdates: Seq[Update] = {
    val base = 1700000000000L
    def gen(sym: String): Gen[List[Update]] = for {
      n <- Gen.choose(3, 60)
      rows <- Gen.listOfN(n, for {
        dt <- Gen.oneOf(Gen.choose(0L, 290000L),
          Gen.oneOf(59999L, 60000L, 60001L, 119999L, 120000L))
        trade <- Gen.prob(0.45)
        bid <- Gen.prob(0.5)
        price <- Gen.oneOf(9.97, 9.98, 9.99, 10.0, 10.0, 10.01, 10.02)
        // corrupt-feed sizes ride on LEVEL rows only: they exercise the
        // NaN-greatest ordering of the batch plans' `size > 0` level
        // acceptance (SqlOrd twins it) without entering a flow sum — a
        // classified trade with a non-finite size raises loud in BOTH
        // forms instead (the dedicated test below)
        size <- if (trade) Gen.frequency(
          (85, Gen.choose(1, 99999).map(_ / 10000.0)),
          (15, Gen.const(0.0)))
        else Gen.frequency(
          (82, Gen.choose(1, 99999).map(_ / 10000.0)),
          (15, Gen.const(0.0)),
          (3, Gen.oneOf(Double.NaN, Double.PositiveInfinity)))
      } yield (dt, trade, bid, price, size))
    } yield rows.sortBy(_._1).zipWithIndex.map {
      case ((dt, trade, bid, p, s), i) =>
        Update(sym, base + dt, i.toLong, trade, bid, p, s)
    }
    (0 until 26).flatMap { i =>
      gen(s"fz$i")(Gen.Parameters.default, Seed(1000L + i))
        .getOrElse(Nil)
    }
  }

  private lazy val ups = fuzzUpdates.sortBy(u => (u.ts, u.seq))
  private lazy val df = updatesDf(ups)

  /** Everything except each symbol's final (still-open) bucket. */
  private def closedKeys[V](m: Map[(String, Long), V])
      : Set[(String, Long)] = {
    val lastPerSym = m.keys.groupBy(_._1).view
      .mapValues(_.map(_._2).max).toMap
    m.keySet.filterNot { case (s0, b) => lastPerSym(s0) == b }
  }

  private def optD(r: org.apache.spark.sql.Row, i: Int): Option[Double] =
    if (r.isNullAt(i)) None else Some(r.getDouble(i))

  test("fuzz: tick-rule flow batch ≡ streaming fold on adversarial data") {
    val batch = Microstructure.tickRuleFlow(df).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), optD(r, 5))))
      .toMap
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Update]
    val q = Streaming.streamingTickRuleFlow(in.toDS()).writeStream
      .outputMode("append").format("memory").queryName("fz_flow").start()
    val (b1, b2) = ups.splitAt(ups.length / 3)
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("fz_flow").as[Streaming.TickFlowBucket]
      .collect()
      .map(r => (r.symbol, r.start) ->
        ((r.n_trades, r.signed_vol, r.class_vol, r.flow_ratio))).toMap
    val want = closedKeys(batch)
    assert(want.nonEmpty)
    assert(got.keySet === want)
    want.foreach(k => assert(got(k) === batch(k), s"drift at $k"))
  }

  test("fuzz: Epps ladder / return correlation batch ≡ streaming " +
      "serving rows after a global closer (VERDICT r15 #3)") {
    // the fuzz symbols share the same few 60s buckets, so the pair
    // surface is dense — the cross-symbol case sf0.001 can't give
    val scales = Seq(60L, 120L, 300L)
    val maxTs = ups.map(_.ts).max
    val closer = Update("zz_close", maxTs + 7200L * 1000, 99999L,
      is_trade = true, is_bid = true, 10.0, 1.0)
    val all = ups :+ closer
    val batch = Microstructure.eppsEffect(updatesDf(all), scales)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        ((r.getLong(3), optD(r, 4)))).toMap
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Update]
    val q = Streaming.streamingEppsEffect(in.toDS(), scales)
      .writeStream.outputMode("append").format("memory")
      .queryName("fz_epps").start()
    val (b1, b2) = ups.splitAt(ups.length / 3)
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    in.addData(closer); q.processAllAvailable()
    q.stop()
    val got = spark.table("fz_epps").as[Streaming.EppsCorrRow]
      .collect().zipWithIndex
      .groupBy(r => (r._1.symbol_a, r._1.symbol_b, r._1.scale_s)).view
      .mapValues(_.maxBy(_._2)._1).toMap
    assert(batch.nonEmpty)
    assert(got.keySet === batch.keySet, "(pair, scale) set drift")
    batch.foreach { case (k, (n, corr)) =>
      val g = got(k)
      assert((g.n_pairs, g.return_corr) === ((n, corr)),
        s"epps drift at $k")
    }
  }

  test("fuzz: effective spread batch ≡ streaming fold on adversarial data") {
    val batch = Microstructure.effectiveSpread(df).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), optD(r, 5)))).toMap
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Update]
    val q = Streaming.streamingEffectiveSpread(in.toDS()).writeStream
      .outputMode("append").format("memory").queryName("fz_eff").start()
    val (b1, b2) = ups.splitAt(ups.length / 3)
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("fz_eff").as[Streaming.EffSprBucket].collect()
      .map(r => (r.symbol, r.start) ->
        ((r.n_trades, r.n_classified, r.eff_sum, r.avg_eff_spread))).toMap
    val want = closedKeys(batch)
    assert(want.nonEmpty)
    assert(got.keySet === want)
    want.foreach(k => assert(got(k) === batch(k), s"drift at $k"))
  }

  test("fuzz: roll spread batch ≡ streaming fold on adversarial data") {
    val batch = Microstructure.rollSpread(df).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), optD(r, 7)))).toMap
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Update]
    val q = Streaming.streamingRollSpread(in.toDS()).writeStream
      .outputMode("append").format("memory").queryName("fz_roll").start()
    val (b1, b2) = ups.splitAt(ups.length / 3)
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("fz_roll").as[Streaming.RollSprBucket].collect()
      .map(r => (r.symbol, r.start) ->
        ((r.n_pairs, r.sum_x, r.sum_y, r.sum_xy, r.cov,
          r.roll_spread))).toMap
    val want = closedKeys(batch)
    assert(want.nonEmpty)
    assert(got.keySet === want)
    want.foreach(k => assert(got(k) === batch(k), s"drift at $k"))
  }

  test("a classified trade with a non-finite size raises loud in batch " +
      "AND throws in the fold (the DuckDB twin errors on the same cast)") {
    val t0 = 1700000000000L
    val bad = Seq(
      Update("nf", t0, 0L, is_trade = true, is_bid = true, 10.0, 1.0),
      Update("nf", t0 + 1, 1L, is_trade = true, is_bid = true, 10.01,
        Double.NaN)) // uptick -> classified -> enters the signed sum
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    val exB = intercept[Exception] {
      Microstructure.tickRuleFlow(updatesDf(bad)).collect()
    }
    assert(msgs(exB).exists(_.contains("non-finite trade size")),
      s"wrong batch failure: ${msgs(exB).mkString(" | ")}")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Update]
    val q = Streaming.streamingTickRuleFlow(in.toDS()).writeStream
      .outputMode("append").format("memory").queryName("fz_nf").start()
    in.addData(bad: _*)
    val exS = intercept[Exception] { q.processAllAvailable() }
    try q.stop() catch { case _: Throwable => () }
    assert(msgs(exS).exists(_.contains("non-finite trade size")),
      s"wrong fold failure: ${msgs(exS).mkString(" | ")}")
  }

  test("fuzz: variance ratio and max drawdown batch ≡ streaming serving " +
      "rows after closers") {
    def optL(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    val wantVr = Microstructure.varianceRatio(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), optL(r, 2), optL(r, 3), r.getLong(4),
          optL(r, 5), optL(r, 6), optD(r, 7), optD(r, 8), optD(r, 9))))
      .toMap
    val wantDd = Microstructure.maxDrawdown(df).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_buckets"), r.getAs[Long]("q_min"),
          r.getAs[Long]("trough_start"),
          r.getAs[Double]("max_drawdown")))).toMap
    val maxTs = ups.map(_.ts).max
    val closers = ups.map(_.symbol).distinct.zipWithIndex.map {
      case (s0, i) => Update(s0, maxTs + 7200L * 1000, 6000L + i,
        is_trade = true, is_bid = true, 1.0, 1.0)
    }
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Update]
    val qv = Streaming.streamingVarianceRatio(in.toDS()).writeStream
      .outputMode("append").format("memory").queryName("fz_vr").start()
    val qd = Streaming.streamingMaxDrawdown(in.toDS()).writeStream
      .outputMode("append").format("memory").queryName("fz_dd").start()
    val (b1, b2) = ups.splitAt(ups.length / 3)
    def drain(): Unit = {
      qv.processAllAvailable(); qd.processAllAvailable()
    }
    in.addData(b1: _*); drain()
    in.addData(b2: _*); drain()
    in.addData(closers: _*); drain()
    qv.stop(); qd.stop()
    val gotV = spark.table("fz_vr").as[Streaming.VrRow].collect()
      .zipWithIndex.groupBy(_._1.symbol).view
      .mapValues(_.maxBy(_._2)._1).toMap
    assert(wantVr.nonEmpty)
    wantVr.foreach { case (s0, w) =>
      val g = gotV(s0)
      assert((g.n1, g.sum_q1, g.sum_sq1, g.nk, g.sum_qk, g.sum_sqk,
        g.var1, g.vark, g.vr) === w, s"variance-ratio drift at $s0")
    }
    val gotD = spark.table("fz_dd").as[Streaming.DdRow].collect()
      .zipWithIndex.groupBy(_._1.symbol).view
      .mapValues(_.maxBy(_._2)._1).toMap
    assert(wantDd.nonEmpty)
    wantDd.foreach { case (s0, (n, qm, tr, dd)) =>
      val g = gotD(s0)
      assert((g.n_buckets, g.q_min, g.trough_start, g.max_drawdown) ===
        ((n, Some(qm), Some(tr), Some(dd))), s"drawdown drift at $s0")
    }
  }

  test("fuzz: kyle lambda and flow autocorr batch ≡ streaming serving " +
      "rows after closers") {
    val wantKyle = Microstructure.kyleLambda(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), optD(r, 6)))).toMap
    val wantAc = Microstructure.flowAutocorr(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6), optD(r, 7)))).toMap
    val maxTs = ups.map(_.ts).max
    val closers = ups.map(_.symbol).distinct.zipWithIndex.map {
      case (s0, i) => Update(s0, maxTs + 7200L * 1000, 5000L + i,
        is_trade = true, is_bid = true, 1.0, 1.0)
    }
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Update]
    val qk = Streaming.streamingKyleLambda(in.toDS()).writeStream
      .outputMode("append").format("memory").queryName("fz_kyle").start()
    val qa = Streaming.streamingFlowAutocorr(in.toDS()).writeStream
      .outputMode("append").format("memory").queryName("fz_fac").start()
    val (b1, b2) = ups.splitAt(ups.length / 3)
    def drain(): Unit = {
      qk.processAllAvailable(); qa.processAllAvailable()
    }
    in.addData(b1: _*); drain()
    in.addData(b2: _*); drain()
    in.addData(closers: _*); drain()
    qk.stop(); qa.stop()
    val gotK = spark.table("fz_kyle").as[Streaming.KyleLamRow].collect()
      .zipWithIndex.groupBy(_._1.symbol).view
      .mapValues(_.maxBy(_._2)._1).toMap
    assert(wantKyle.nonEmpty)
    wantKyle.foreach { case (s0, w) =>
      val g = gotK(s0)
      assert((g.n_pairs, g.sum_x, g.sum_y, g.sum_xy, g.sum_xx,
        g.kyle_lambda) === w, s"kyle drift at $s0")
    }
    val gotA = spark.table("fz_fac").as[Streaming.FlowAcRow].collect()
      .zipWithIndex.groupBy(_._1.symbol).view
      .mapValues(_.maxBy(_._2)._1).toMap
    assert(wantAc.nonEmpty)
    wantAc.foreach { case (s0, w) =>
      val g = gotA(s0)
      assert((g.n_pairs, g.sum_x, g.sum_y, g.sum_xy, g.sum_xx, g.sum_yy,
        g.flow_autocorr) === w, s"flow-autocorr drift at $s0")
    }
  }

  test("fuzz: vpin batch ≡ streaming serving rows after volume closers") {
    // the volume-bucket twin pair: the stream serves a bucket AT CLOSE
    // with its trailing window; a far-future closer of size > interval
    // closes each symbol's final real bucket with its weight swallowed
    // by the reset, so the emitted set equals the batch table exactly
    import graft.operators.Vpin
    val (interval, window) = (20.0, 3)
    val want = Vpin.vpin(df, interval, window).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7), r.getDouble(8),
          r.getDouble(9), r.getDouble(10), r.getDouble(11),
          optD(r, 12)))).toMap
    assert(want.nonEmpty)
    assert(want.keys.groupBy(_._1).values.exists(_.size > window),
      "fixture must roll past the trailing window")
    val maxTs = ups.map(_.ts).max
    val closers = ups.map(_.symbol).distinct.zipWithIndex.map {
      case (s0, i) => Update(s0, maxTs + 7200L * 1000, 8000L + i,
        is_trade = true, is_bid = true, 1.0, interval + 1.0)
    }
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Update]
    val q = Streaming.streamingVpin(in.toDS(), interval, window)
      .writeStream.outputMode("append").format("memory")
      .queryName("fz_vpin").start()
    val (b1, b2) = ups.splitAt(ups.length / 3)
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    in.addData(closers: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("fz_vpin").as[Streaming.VpinRow].collect()
      .map(v => (v.symbol, v.bucket) ->
        ((v.start, v.end, v.n_trades, v.buy_vol, v.sell_vol,
          v.class_vol, v.volume, v.imb, v.imb_win, v.class_win,
          v.vpin))).toMap
    assert(got === want, "vpin batch/stream drift")
  }

  test("fuzz: tick imbalance bars batch ≡ streaming closed bars") {
    // the integer reset fold + tick carry, two implementations: the
    // batch mapPartitions fold emits the final partial bar, the stream
    // keeps it open (dropLast stance) — so compare every bar EXCEPT
    // each symbol's last
    import graft.operators.FoldBars
    val threshold = 3L
    val batch = FoldBars.tickImbalanceBars(df, threshold).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7))))
    val lastPerSym = batch.groupBy(_._1._1).view
      .mapValues(_.map(_._1._2).max).toMap
    val wantClosed = batch.filterNot { case ((s0, st), _) =>
      lastPerSym(s0) == st }.toMap
    assert(wantClosed.nonEmpty, "fixture produced no closed bars")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Update]
    val q = Streaming.streamingTickImbalanceBars(in.toDS(), threshold)
      .writeStream.outputMode("append").format("memory")
      .queryName("fz_imb").start()
    val (b1, b2) = ups.splitAt(ups.length / 3)
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("fz_imb").as[graft.model.Candle].collect()
      .map(c => (c.symbol, c.start) ->
        ((c.end, c.open, c.high, c.low, c.close, c.volume))).toMap
    assert(got === wantClosed, "imbalance-bar batch/stream drift")
  }

  test("fuzz: trade intensity and ema close batch ≡ streaming serving " +
      "rows after closers") {
    // the integer decay recursions: a far-future closer shuts each
    // symbol's final real bucket, so the emitted series equals the
    // batch table exactly (the closer's own bucket stays open)
    import graft.operators.DecaySeries
    val wantI = DecaySeries.tradeIntensity(df).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val wantE = DecaySeries.emaClose(df).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(wantI.nonEmpty && wantE.nonEmpty)
    val maxTs = ups.map(_.ts).max
    val closers = ups.map(_.symbol).distinct.zipWithIndex.map {
      case (s0, i) => Update(s0, maxTs + 7200L * 1000, 9000L + i,
        is_trade = true, is_bid = true, 1.0, 1.0)
    }
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Update]
    val qi = Streaming.streamingTradeIntensity(in.toDS()).writeStream
      .outputMode("append").format("memory").queryName("fz_int").start()
    val qe = Streaming.streamingEmaClose(in.toDS()).writeStream
      .outputMode("append").format("memory").queryName("fz_ema").start()
    val (b1, b2) = ups.splitAt(ups.length / 3)
    def drain(): Unit = {
      qi.processAllAvailable(); qe.processAllAvailable()
    }
    in.addData(b1: _*); drain()
    in.addData(b2: _*); drain()
    in.addData(closers: _*); drain()
    qi.stop(); qe.stop()
    val gotI = spark.table("fz_int").as[Streaming.IntensityRow].collect()
      .map(v => (v.symbol, v.start) ->
        ((v.n_trades, v.intensity_q, v.intensity))).toMap
    assert(gotI === wantI, "intensity batch/stream drift")
    val gotE = spark.table("fz_ema").as[Streaming.EmaRow].collect()
      .map(v => (v.symbol, v.start) ->
        ((v.close_cq, v.ema_q, v.ema))).toMap
    assert(gotE === wantE, "ema batch/stream drift")
  }

  test("fuzz: ofi batch ≡ streaming serving rows after level closers") {
    // the SET-only book fold vs the relational forward-fill pipeline:
    // a far-future LEVEL row closes each symbol's final real bucket
    // (its own bucket stays open), so emitted rows equal the batch
    // table exactly — including NaN touch sizes, which propagate
    // identically (no decimal cast in the chain)
    import graft.operators.BookFeatures
    def optDStr(o: Option[Double]): String =
      o.map(_.toString).getOrElse("null")
    val want = BookFeatures.ofi(df).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        Seq(2, 3, 4, 5, 6).map(i =>
          if (r.isNullAt(i)) "null" else r.getDouble(i).toString)
          .mkString("|")).toMap
    assert(want.nonEmpty)
    val maxTs = ups.map(_.ts).max
    val closers = ups.map(_.symbol).distinct.zipWithIndex.map {
      case (s0, i) => Update(s0, maxTs + 7200L * 1000, 9500L + i,
        is_trade = false, is_bid = true, 10.0, 1.0)
    }
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Update]
    val q = Streaming.streamingOfi(in.toDS()).writeStream
      .outputMode("append").format("memory").queryName("fz_ofi").start()
    val (b1, b2) = ups.splitAt(ups.length / 3)
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    in.addData(closers: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("fz_ofi").as[Streaming.OfiRow].collect()
      .map(v => (v.symbol, v.start) ->
        Seq(optDStr(v.best_bid), optDStr(v.bid_size),
          optDStr(v.best_ask), optDStr(v.ask_size), optDStr(v.ofi))
          .mkString("|")).toMap
    assert(got === want, "ofi batch/stream drift")
  }

  test("fuzz: depthProfile batch ≡ streaming serving rows after " +
      "level closers") {
    // the same SET-only book carry as ofi, plus the band scan: closed
    // buckets must equal the batch fold bit-for-bit (integer band
    // cuts, Dec4 depth sums)
    import graft.operators.BookFeatures
    val want = BookFeatures.depthProfile(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2),
        r.getLong(3)) -> (r.getLong(4), r.getDouble(5))).toMap
    assert(want.nonEmpty)
    val maxTs = ups.map(_.ts).max
    val closers = ups.map(_.symbol).distinct.zipWithIndex.map {
      case (s0, i) => Update(s0, maxTs + 7200L * 1000, 9600L + i,
        is_trade = false, is_bid = true, 10.0, 1.0)
    }
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Update]
    val q = Streaming.streamingDepthProfile(in.toDS()).writeStream
      .outputMode("append").format("memory").queryName("fz_depth")
      .start()
    val (b1, b2) = ups.splitAt(ups.length / 3)
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    in.addData(closers: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("fz_depth").as[Streaming.DepthRow].collect()
      .map(v => (v.symbol, v.start, v.is_bid, v.band_bps) ->
        (v.n_levels, v.depth)).toMap
    // the closers' own (still-open) buckets never emit; every batch
    // row from the REAL data must appear identically. NaN depths
    // cannot arise (Dec4 zeroes non-finite sizes in both forms), so
    // tuple equality is exact.
    val gotReal = got.filter { case ((_, start, _, _), _) =>
      start < (maxTs + 7200L * 1000) / 1000 / 60 * 60 }
    assert(gotReal === want, "depthProfile batch/stream drift")
  }

  test("non-finite price: the whole quantizing family raises loud in " +
      "BOTH forms — batch finitePrice, fold ingest guard (ADVICE r11)") {
    // Spark's non-ANSI floor turns a NaN price into 0L SILENTLY (and a
    // decimal cast nulls it out of a sum) where the DuckDB twins ERROR
    // on the same cast — so a corrupt price must fail loud, never fold
    // a fabricated 0. (ADVICE r11 assumed the batch plans dropped the
    // NaN return via a NULL log; they actually folded q = 0 — the
    // guard closes the real, worse divergence.)
    import org.apache.spark.sql.{DataFrame, Dataset}
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    val base = 1700000000000L
    def rows(px: (Double, Boolean)*): Seq[Update] =
      px.zipWithIndex.map { case ((p, trade), i) =>
        Update("nn", base + i * 60000L, i.toLong + 1,
          is_trade = trade, is_bid = i % 2 == 0, p, 1.0)
      }
    val nanTrades =
      rows((10.0, true), (10.1, true), (Double.NaN, true), (10.2, true))
    val nanQuotes =
      rows((10.0, false), (Double.NaN, false), (10.1, false))
    val batchOps: Seq[(String, DataFrame, DataFrame => DataFrame)] = Seq(
      ("vwapBars", updatesDf(nanTrades),
        (u: DataFrame) => Microstructure.vwapBars(u)),
      ("realizedVol", updatesDf(nanTrades),
        (u: DataFrame) => Microstructure.realizedVol(u)),
      ("rollSpread", updatesDf(nanTrades),
        (u: DataFrame) => Microstructure.rollSpread(u)),
      ("amihud", updatesDf(nanTrades),
        (u: DataFrame) => Microstructure.amihud(u)),
      ("maxDrawdown", updatesDf(nanTrades),
        (u: DataFrame) => Microstructure.maxDrawdown(u)),
      ("varianceRatio", updatesDf(nanTrades),
        (u: DataFrame) => Microstructure.varianceRatio(u)),
      ("returnMoments", updatesDf(nanTrades),
        (u: DataFrame) => Microstructure.returnMoments(u)),
      ("effectiveSpread", updatesDf(nanTrades),
        (u: DataFrame) => Microstructure.effectiveSpread(u)),
      ("twapQuote", updatesDf(nanQuotes),
        (u: DataFrame) => Microstructure.twapQuote(u)),
      ("kyleLambda", updatesDf(nanQuotes),
        (u: DataFrame) => Microstructure.kyleLambda(u)),
      ("ofi", updatesDf(nanQuotes),
        (u: DataFrame) => graft.operators.BookFeatures.ofi(u)))
    batchOps.foreach { case (name, u, op) =>
      val ex = intercept[Exception] { op(u).collect() }
      assert(msgs(ex).exists(m => m.contains("non-finite price") ||
        m.contains("exact-decimal regime")),
        s"$name batch: ${msgs(ex).mkString(" | ")}")
    }
    // the ingest folds throw on the SAME fixtures
    implicit val sqlCtx = spark.sqlContext
    def streamRaises(name: String,
        mk: Dataset[Update] => DataFrame, data: Seq[Update]): Unit = {
      val in = MemoryStream[Update]
      val q = mk(in.toDS()).writeStream.outputMode("append")
        .format("memory").queryName(s"nf_$name").start()
      in.addData(data: _*)
      val ex = intercept[Exception] { q.processAllAvailable() }
      try q.stop() catch { case _: Throwable => () }
      assert(msgs(ex).exists(m => m.contains("non-finite price") ||
        m.contains("exact-decimal regime")),
        s"$name stream: ${msgs(ex).mkString(" | ")}")
    }
    streamRaises("vwap",
      ds => Streaming.streamingVwapBars(ds.toDF()), nanTrades)
    streamRaises("rv",
      ds => Streaming.streamingRealizedVol(ds).toDF(), nanTrades)
    streamRaises("roll",
      ds => Streaming.streamingRollSpread(ds).toDF(), nanTrades)
    streamRaises("vr",
      ds => Streaming.streamingVarianceRatio(ds).toDF(), nanTrades)
    streamRaises("mom",
      ds => Streaming.streamingReturnMoments(ds).toDF(), nanTrades)
    streamRaises("dd",
      ds => Streaming.streamingMaxDrawdown(ds).toDF(), nanTrades)
    streamRaises("eff",
      ds => Streaming.streamingEffectiveSpread(ds).toDF(), nanTrades)
    streamRaises("twap",
      ds => Streaming.streamingTwapQuote(ds).toDF(), nanQuotes)
    streamRaises("kyle",
      ds => Streaming.streamingKyleLambda(ds).toDF(), nanQuotes)
    streamRaises("ofi",
      ds => Streaming.streamingOfi(ds).toDF(), nanQuotes)
  }

  test("fuzz: yang-zhang, tsrv and realized kernel serving rows == " +
      "batch bit-exactly after closers on adversarial data") {
    // the r15 serving twins under the generator's tie/edge shapes:
    // one far-future closer per traded symbol folds the last real
    // bucket; the closer's own bucket stays open (StreamingSpec's
    // sentinel contract), so the folded bucket set equals the batch
    // input exactly
    implicit val sqlCtx = spark.sqlContext
    val maxTs = ups.map(_.ts).max
    val closers = ups.filter(u => u.is_trade && u.price > 0.0)
      .map(_.symbol).distinct.sorted.zipWithIndex.map {
        case (s0, i) => Update(s0, maxTs + 7200L * 1000,
          900000L + i, is_trade = true, is_bid = true, 10.0, 1.0)
      }
    def latest[T](rows: Seq[(String, T)]): Map[String, T] =
      rows.zipWithIndex.groupBy(_._1._1).view
        .mapValues(_.maxBy(_._2)._1._2).toMap
    // yang-zhang
    locally {
      val want = graft.operators.RangeSpread.yangZhang(df).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), optD(r, 3), r.getLong(4),
            optD(r, 5), r.getLong(6), optD(r, 7), optD(r, 8)))).toMap
      val in = MemoryStream[Update]
      val q = Streaming.streamingYangZhang(in.toDS()).writeStream
        .outputMode("append").format("memory").queryName("fz_yz")
        .start()
      val (b1, b2) = ups.splitAt(ups.length / 3)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      in.addData(closers: _*); q.processAllAvailable()
      q.stop()
      val got = latest(spark.table("fz_yz").as[Streaming.YzRow]
        .collect().toSeq.map(r => r.symbol -> r))
      assert(want.nonEmpty)
      want.foreach { case (s0, w) =>
        val g = got(s0)
        assert((g.n, g.sum_oq.get, g.sum_oq2, g.sum_cq.get, g.sum_cq2,
          g.sum_rs.get, g.yz_var, g.yz_vol) === w, s"yz drift at $s0")
      }
    }
    // tsrv
    locally {
      val want = graft.operators.ReturnDynamics.tsrv(df).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), optD(r, 4),
            optD(r, 5), optD(r, 6)))).toMap
      val in = MemoryStream[Update]
      val q = Streaming.streamingTsrv(in.toDS()).writeStream
        .outputMode("append").format("memory").queryName("fz_tsrv")
        .start()
      val (b1, b2) = ups.splitAt(ups.length / 3)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      in.addData(closers: _*); q.processAllAvailable()
      q.stop()
      val got = latest(spark.table("fz_tsrv").as[Streaming.TsrvRow]
        .collect().toSeq.map(r => r.symbol -> r))
      assert(want.nonEmpty)
      want.foreach { case (s0, w) =>
        val g = got(s0)
        assert((g.m, g.sum_q2_1.get, g.sum_q2_k.get, g.rv_full,
          g.tsrv, g.tsrv_pos) === w, s"tsrv drift at $s0")
      }
    }
    // realized kernel
    locally {
      val want = graft.operators.ReturnDynamics.realizedKernel(df)
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5), r.getLong(6), optD(r, 7), optD(r, 8))))
        .toMap
      val in = MemoryStream[Update]
      val q = Streaming.streamingRealizedKernel(in.toDS()).writeStream
        .outputMode("append").format("memory").queryName("fz_rk")
        .start()
      val (b1, b2) = ups.splitAt(ups.length / 3)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      in.addData(closers: _*); q.processAllAvailable()
      q.stop()
      val got = latest(spark.table("fz_rk").as[Streaming.RkRow]
        .collect().toSeq.map(r => r.symbol -> r))
      assert(want.nonEmpty)
      want.foreach { case (s0, w) =>
        val g = got(s0)
        assert((g.n_rets, g.gamma0.get, g.gamma1.get, g.gamma2.get,
          g.gamma3.get, g.gamma4.get, g.rk_var, g.rk_vol) === w,
          s"rk drift at $s0")
      }
    }
  }
}
