package graft

import org.apache.spark.sql.functions.col

import graft.model.Update
import graft.operators.{ActivityStats, RangeSpread, ReturnDynamics}

/** Behavior gates for the round-12 analytics wave: jump decomposition,
  * return ACF, Hurst, Corwin–Schultz, activity dispersion, and the
  * length-PSI drift monitor. Each operator also carries a DuckDB
  * oracle gate (q_bipower_var, q_return_acf, q_hurst,
  * q_corwin_schultz, q_user_fano, q_burstiness, q_length_psi); these
  * tests pin the SEMANTICS — planted-signal detection, scalar
  * reimplementation equality, and the null contracts — which a
  * bit-identical twin cannot see. */
class ReturnDynamicsSpec extends SparkSpec {

  /** 13-digit ms epoch base — fillDigits is the identity here, so one
    * trade lands per minute bucket in order. */
  private val T0 = 1700000000000L

  /** One trade per minute bucket at the given closes. */
  private def closes(sym: String, ps: Seq[Double]): Seq[Update] =
    ps.zipWithIndex.map { case (p, i) =>
      Update(sym, T0 + i * 60000L, 0L, is_trade = true, is_bid = true,
        p, 1.0)
    }

  test("bipowerVar: planted jump loads RV not BV; smooth walk stays " +
      "diffusive; invariants hold") {
    // smooth geometric walk: tiny alternating returns, no jumps
    val smooth = closes("s", (0 until 200).scanLeft(100.0) {
      (p, i) => p * (if (i % 2 == 0) 1.001 else 0.999)
    })
    // same walk with one 40% crash in the middle
    val jumpy = closes("j", (0 until 200).scanLeft(100.0) { (p, i) =>
      if (i == 100) p * 0.6 else p * (if (i % 2 == 0) 1.001 else 0.999)
    })
    val out = ReturnDynamics.bipowerVar(updatesDf(smooth ++ jumpy))
      .collect().map(r => r.getString(0) -> r).toMap
    for ((_, r) <- out) {
      val (rv, bv, jump) = (r.getDouble(5), r.getDouble(6), r.getDouble(7))
      assert(rv >= 0.0 && bv >= 0.0 && jump >= 0.0)
      assert(math.abs(jump - math.max(rv - bv, 0.0)) < 1e-15)
    }
    val (js, ss) = (out("j").getDouble(8), out("s").getDouble(8))
    assert(js > 0.5, s"planted 40% jump not detected: jump_ratio=$js")
    assert(ss < 0.2, s"smooth walk flagged jumpy: jump_ratio=$ss")
  }

  test("returnAcf: alternating returns give acf(1) near -1; acf stays " +
      "in [-1, 1]; zero-variance series yields null") {
    val alt = closes("a", (0 until 300).scanLeft(100.0) {
      (p, i) => p * (if (i % 2 == 0) 1.01 else 1.0 / 1.01)
    })
    // exactly-representable doubling closes: every q identical, so the
    // pair variance is exactly zero (1.01 ratios would wobble at the
    // last ulp of the accumulated product)
    val flat = closes("f", (0 until 50).scanLeft(100.0)((p, _) => p * 2.0))
    val rows = ReturnDynamics.returnAcf(updatesDf(alt ++ flat))
      .collect()
    val acf = rows.map(r => (r.getString(0), r.getInt(1)) ->
      (if (r.isNullAt(8)) None else Some(r.getDouble(8)))).toMap
    assert(acf(("a", 1)).get < -0.9, s"alternating acf(1)=${acf(("a", 1))}")
    assert(acf(("a", 2)).get > 0.9, s"alternating acf(2)=${acf(("a", 2))}")
    rows.foreach { r =>
      if (!r.isNullAt(8))
        assert(math.abs(r.getDouble(8)) <= 1.0 + 1e-12,
          s"acf out of range: $r")
    }
    // constant-ratio series: every q equal -> zero variance -> null
    (1 to 5).foreach(l => assert(acf(("f", l)).isEmpty,
      s"flat series acf($l) should be null"))
  }

  test("realizedSemivariance: sign split reconciles with bipower RV; " +
      "planted crash loads the downside; null/zero contracts") {
    // monotone up: every return positive
    val up = closes("u", (0 until 100).scanLeft(100.0)((p, _) => p * 1.01))
    // alternating walk with one 40% crash: downside dominates
    val dn = closes("d", (0 until 200).scanLeft(100.0) { (p, i) =>
      if (i == 100) p * 0.6 else p * (if (i % 2 == 0) 1.001 else 0.999)
    })
    // constant closes: every q = 0 -> both sums 0, down_share null
    val flat = closes("f", Seq.fill(50)(100.0))
    val df = updatesDf(up ++ dn ++ flat)
    val out = ReturnDynamics.realizedSemivariance(df)
      .collect().map(r => r.getString(0) -> r).toMap
    // exact reconciliation with the jump decomposition's RV integer
    val rv = ReturnDynamics.bipowerVar(df).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    for ((s, r) <- out)
      assert(r.getLong(2) + r.getLong(3) === rv(s),
        s"$s: pos+neg != sum_q2")
    assert(out("u").getLong(3) === 0L, "up-only series has RS- = 0")
    assert(out("u").getDouble(6) === out("u").getDouble(4),
      "sjv == rs_up when RS- = 0")
    assert(out("u").getDouble(7) === 0.0)
    assert(out("d").getDouble(6) < 0.0, "crash must make SJV negative")
    assert(out("d").getDouble(7) > 0.5, "crash downside share > 1/2")
    assert(out("f").getLong(2) === 0L && out("f").getLong(3) === 0L)
    assert(out("f").isNullAt(7), "all-zero returns -> down_share null")
  }

  test("hurst: null contract on degenerate series; anti-persistent " +
      "alternation scores below a random-ish walk") {
    // alternating +/-: m=2 block sums are constant -> var 0 at m=2 ->
    // that level is null -> hurst null by the all-four contract
    val alt = closes("a", (0 until 200).scanLeft(100.0) {
      (p, i) => p * (if (i % 2 == 0) 1.01 else 1.0 / 1.01)
    })
    // period-3 cycle: no aggregation level collapses, but long-horizon
    // variance grows sublinearly -> H well below 1/2
    val cyc = closes("c", (0 until 600).scanLeft(100.0) {
      (p, i) => p * (i % 3 match {
        case 0 => 1.02; case 1 => 0.99; case _ => 1.0 / (1.02 * 0.99) })
    })
    // deterministic pseudo-random walk (fixed LCG): H near 1/2
    var s = 12345L
    val rnd = closes("r", (0 until 600).scanLeft(100.0) { (p, _) =>
      s = (s * 6364136223846793005L + 1442695040888963407L)
      p * (if ((s >>> 32) % 2 == 0) 1.01 else 1.0 / 1.01)
    })
    val out = ReturnDynamics.hurst(updatesDf(alt ++ cyc ++ rnd))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(7)) None else Some(r.getDouble(7)))).toMap
    assert(out("a").isEmpty, "alternating series must yield null hurst")
    val (hc, hr) = (out("c").get, out("r").get)
    assert(hc < hr, s"cycle H=$hc not below walk H=$hr")
    assert(hr > 0.2 && hr < 0.8, s"pseudo-random walk H=$hr implausible")
  }

  test("corwinSchultz: constant-range fixture matches the scalar " +
      "formula exactly; highs dominate lows") {
    // every bucket trades the exact same high/low (H=102, L=100) and
    // the 2-bucket span range equals the single-bucket range
    val ups = (0 until 20).flatMap(i => Seq(
      Update("c", T0 + i * 60000L, 0L, true, true, 100.0, 1.0),
      Update("c", T0 + i * 60000L + 1000, 1L, true, true, 102.0, 1.0)))
    val rows = RangeSpread.corwinSchultz(updatesDf(ups)).collect()
    assert(rows.length === 19)
    // scalar replication of the operator's exact pipeline
    val r = math.floor(math.log(10200.0 / 10000.0) * 1e8).toLong
    val betaQ = 2L * r * r
    val gammaQ = r * r
    val d = 3.0 - 2.0 * math.sqrt(2.0)
    val alpha = (math.sqrt(2.0 * (betaQ.toDouble / 1e16)) -
      math.sqrt(betaQ.toDouble / 1e16)) / d -
      math.sqrt((gammaQ.toDouble / 1e16) / d)
    val spreadQ = math.floor(2.0 * (math.exp(alpha) - 1.0) /
      (1.0 + math.exp(alpha)) * 1e8).toLong
    rows.foreach { row =>
      assert(row.getLong(2) === 10200L && row.getLong(3) === 10000L)
      assert(row.getLong(4) === betaQ && row.getLong(5) === gammaQ)
      assert(row.getDouble(6) === alpha)
      assert(row.getLong(7) === spreadQ)
      assert(row.getDouble(9) >= 0.0)
    }
  }

  test("activity stats: metronomic vs bursty users separate; scalar " +
      "moments match") {
    import spark.implicits._
    // metro: one event per hour, 24h. burst: 10 events in hour 0 and
    // 2 in hour 5 (present-hour convention).
    val hour = 3600L * 1000000L
    val evs =
      (0 until 24).map(i => (i.toLong, "metro", i * hour)) ++
        (0 until 10).map(i => (100L + i, "burst", i * 60L * 1000000L)) ++
        (0 until 2).map(i => (200L + i, "burst", 5 * hour + i * 1000000L))
    val df = evs.toDF("event_id", "user_id", "us")
      .select(col("event_id"), col("user_id"),
        org.apache.spark.sql.functions.timestamp_micros(col("us"))
          .cast("timestamp_ntz").as("ts"))
    val fano = ActivityStats.userFano(df).collect()
      .map(r => r.getString(0) -> r.getDouble(6)).toMap
    assert(fano("metro") === 0.0, "1/hour user must have zero Fano")
    // burst: counts {10, 2}: mean 6, var 16 -> fano 16/6
    assert(math.abs(fano("burst") - 16.0 / 6.0) < 1e-12)
    val b = ActivityStats.burstiness(df).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap
    assert(b("metro").get === -1.0, "equal gaps must score B = -1")
    assert(b("burst").get > b("metro").get)
  }

  test("symbolBeta: benchmark scores exactly 1; co-mover 1; " +
      "anti-mover strongly negative; flat benchmark yields null") {
    val walk = (0 until 200).scanLeft(100.0) {
      (p, i) => p * (if (i % 3 == 0) 1.01 else 0.997)
    }
    val ups = closes("m", walk) ++ closes("same", walk) ++
      closes("inv", walk.map(1000.0 / _))
    val out = graft.operators.Microstructure
      .symbolBeta(updatesDf(ups), benchmark = "m").collect()
      .map(r => r.getString(0) -> r.getDouble(8)).toMap
    assert(out("m") === 1.0, "benchmark against itself must be 1")
    assert(out("same") === 1.0, "identical closes must give beta 1")
    assert(out("inv") < -0.9, s"reciprocal closes: ${out("inv")}")
    // zero-variance benchmark -> null beta everywhere
    val flat = closes("m", Seq.fill(50)(100.0)) ++
      closes("x", walk.take(50))
    val nul = graft.operators.Microstructure
      .symbolBeta(updatesDf(flat), benchmark = "m").collect()
    nul.foreach(r => assert(r.isNullAt(8), s"expected null beta: $r"))
    intercept[IllegalArgumentException] {
      graft.operators.Microstructure.symbolBetaSql(benchmark = "x'y")
    }
  }

  test("intradayProfile: exact hour bucketing, decimal volume, " +
      "shares sum to 1 per symbol; quotes excluded") {
    // midnight-aligned 13-digit ms base (1700006400 % 86400 == 0)
    val mid = 1700006400000L
    def trade(sym: String, h: Int, off: Long, sz: Double) =
      Update(sym, mid + h * 3600000L + off, 0L, is_trade = true,
        is_bid = true, 100.0, sz)
    val ups = Seq(
      trade("s", 0, 0L, 1.5), trade("s", 0, 1000L, 2.5),
      trade("s", 23, 59L * 60000L, 6.0),
      // a quote must not count
      Update("s", mid, 1L, is_trade = false, is_bid = true, 100.0, 9.0),
      trade("t", 5, 0L, 4.0))
    val out = graft.operators.Microstructure
      .intradayProfile(updatesDf(ups)).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    assert(out.keySet === Set(("s", 0), ("s", 23), ("t", 5)))
    assert(out(("s", 0)).getLong(2) === 2L)
    assert(out(("s", 0)).getDouble(3) === 4.0)
    assert(out(("s", 0)).getDouble(4) === 0.4)
    assert(out(("s", 23)).getDouble(4) === 0.6)
    assert(out(("t", 5)).getDouble(4) === 1.0)
  }

  test("navEntropy: quantized Shannon entropy matches the scalar lnQ " +
      "replay; single-type user is zero with null norm") {
    import spark.implicits._
    // mix: 2×a + 2×b (H = ln 2, norm ≈ 1); mono: 3×c (H = 0, norm null);
    // skew: 3×a + 1×b
    val evs = Seq(
      (1L, "mix", 0L, "a"), (2L, "mix", 1L, "a"),
      (3L, "mix", 2L, "b"), (4L, "mix", 3L, "b"),
      (5L, "mono", 0L, "c"), (6L, "mono", 1L, "c"), (7L, "mono", 2L, "c"),
      (8L, "skew", 0L, "a"), (9L, "skew", 1L, "a"),
      (10L, "skew", 2L, "a"), (11L, "skew", 3L, "b"))
    val df = evs.toDF("event_id", "user_id", "us", "event_type")
      .select(col("event_id"), col("user_id"), col("event_type"),
        org.apache.spark.sql.functions.timestamp_micros(col("us"))
          .cast("timestamp_ntz").as("ts"))
    val out = ActivityStats.navEntropy(df).collect()
      .map(r => r.getString(0) -> r).toMap
    // scalar replay of the exact pipeline
    def lnQ(p: Double): Long = math.floor(math.log(p) * 1e12).toLong
    def h(cs: Seq[Long]): Double = {
      val n = cs.sum
      -cs.map(c => BigInt(c) * BigInt(lnQ(c.toDouble / n.toDouble)))
        .sum.toDouble / 1e12 / n.toDouble
    }
    assert(out("mix").getDouble(4) === h(Seq(2L, 2L)))
    assert(math.abs(out("mix").getDouble(4) - math.log(2.0)) < 1e-9)
    assert(out("mix").getDouble(5) ===
      h(Seq(2L, 2L)) / (lnQ(2.0).toDouble / 1e12))
    assert(out("mono").getDouble(4) === 0.0)
    assert(out("mono").isNullAt(5), "k = 1 user must have null norm")
    assert(out("skew").getDouble(4) === h(Seq(3L, 1L)))
    assert(out("skew").getDouble(4) < out("mix").getDouble(4),
      "skewed mix must be less entropic than uniform")
  }

  test("lengthPsi: identical sources score identically; a planted " +
      "snippet-collapsed source dominates; PSI >= 0 on real docs") {
    import spark.implicits._
    // two identical bulk sources spanning bins 2-4, plus a SMALL
    // source collapsed entirely into the snippet bin
    val normal = (0 until 200).map(i => "w " * (10 + (i * 7) % 200))
    val docs =
      normal.zipWithIndex.map { case (t, i) => (i.toLong, "a", t) } ++
        normal.zipWithIndex.map { case (t, i) =>
          (1000L + i, "b", t) } ++
        (0 until 20).map(i => (2000L + i.toLong, "snip", "tiny doc"))
    val out = graft.ext.DriftStats.lengthPsi(
        docs.toDF("doc_id", "source", "text"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out.values.forall(_ >= -1e-15), s"negative PSI: $out")
    // identical count vectors -> bit-identical PSI
    assert(out("a") === out("b"), s"identical sources differ: $out")
    assert(out("snip") > 0.25, s"collapsed source not flagged: $out")
    assert(out("snip") > 5.0 * out("a"),
      s"planted source does not dominate: $out")
    // corpus-wide-empty bins still contribute the smoothed term:
    // recompute PSI with the documented formula over the FULL
    // 0..Bins-1 ladder (every doc above lands in bins 0-4, so bins
    // 5-7 are empty corpus-wide yet must appear in the sum)
    val edges = graft.ext.DriftStats.LengthBinEdges
    val bins = graft.ext.DriftStats.Bins
    def bin(t: String): Int =
      edges.indexWhere(t.length < _) match {
        case -1 => edges.length; case i => i }
    val all = docs.map { case (_, s, t) => (s, bin(t)) }
    val n = all.size.toDouble
    val expected = all.map(_._1).distinct.map { s =>
      val ns = all.count(_._1 == s).toDouble
      s -> (0 until bins).map { b =>
        val csb = all.count(x => x._1 == s && x._2 == b) + 1.0
        val cb = all.count(_._2 == b) + 1.0
        val pbs = csb / (ns + bins)
        val pb = cb / (n + bins)
        (pbs - pb) * math.log(pbs / pb)
      }.sum
    }.toMap
    expected.foreach { case (s, e) =>
      assert(math.abs(out(s) - e) < 1e-9,
        s"$s: engine ${out(s)} vs full-ladder formula $e") }
    val real = graft.ext.DriftStats.lengthPsi(
      Tables.table(spark, sf(), "documents")).collect()
    real.foreach(r => assert(r.getDouble(2) >= -1e-15, s"negative: $r"))
  }

  test("volumeProfile: cent bins, exact shares, POC ties break to the " +
      "lower bin; non-trades and zero prices excluded") {
    import graft.operators.Microstructure
    val rows = Seq(
      Update("v", T0, 1L, is_trade = true, is_bid = true, 100.10, 1.0),
      Update("v", T0 + 1, 2L, is_trade = true, is_bid = true, 100.90, 2.0),
      Update("v", T0 + 2, 3L, is_trade = true, is_bid = true, 101.20, 3.0),
      Update("v", T0 + 3, 4L, is_trade = true, is_bid = true, 99.95, 1.0),
      // excluded: book update and zero-price trade
      Update("v", T0 + 4, 5L, is_trade = false, is_bid = true, 50.0, 9.0),
      Update("v", T0 + 5, 6L, is_trade = true, is_bid = true, 0.0, 9.0))
    val out = Microstructure.volumeProfile(updatesDf(rows)).collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(9900L, 10000L, 10100L))
    val byBin = out.map(r => r.getLong(1) ->
      (r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
        r.getBoolean(6))).toMap
    assert(byBin(9900L) === ((99.0, 1L, 1.0, 1.0 / 7.0, false)))
    // bins 10000 and 10100 tie at vol 3.0 -> POC is the LOWER bin
    assert(byBin(10000L) === ((100.0, 2L, 3.0, 3.0 / 7.0, true)))
    assert(byBin(10100L) === ((101.0, 1L, 3.0, 3.0 / 7.0, false)))
    intercept[IllegalArgumentException] {
      Microstructure.volumeProfile(updatesDf(rows), binCents = 0)
    }
  }

  test("volSignature: exact doubling walk at the finest scale; coarse " +
      "scales equal the direct re-bucketing (rebin identity)") {
    import graft.operators.Microstructure
    // ratio-2 closes: every 60s return is exactly floor(ln(2)*1e6)
    val walk = closes("g", (0 until 12).scanLeft(100.0)((p, _) => p * 2.0))
    val df = updatesDf(walk)
    val out = Microstructure.volSignature(df, Seq(60L, 300L, 900L))
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val q60 = math.floor(math.log(2.0) * 1e6).toLong // 693147
    assert(out(60L) === ((12L, 12L * q60 * q60,
      math.sqrt((12L * q60 * q60).toDouble) / 1e6)))
    // rebin identity: each coarse row == q² summed straight off the
    // direct coarse bucketing of the raw trades
    for (s <- Seq(300L, 900L)) {
      val direct = Microstructure.bucketReturns(df, s)
        .collect().map(_.getLong(2))
      assert(out(s)._1 === direct.length.toLong, s"n at scale $s")
      assert(out(s)._2 === direct.map(q => q * q).sum, s"sum_sq at $s")
    }
    intercept[IllegalArgumentException] {
      Microstructure.volSignature(df, Seq(60L, 90L))
    }
  }
}
