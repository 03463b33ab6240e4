package graft

import org.apache.spark.sql.functions.col

import graft.model.Update
import graft.operators.BookFeatures

/** Behavior gates for the round-14 scale-tolerant book cross-checks
  * (`q_ofi_sampled`, `q_depth_profile_sampled`): the strided bucket
  * sample must be a pure deterministic function of each symbol's
  * emitted-bucket sequence (stride = max(1, emitted/buckets), keep
  * rank % stride == 0) and the sampled output must be EXACTLY the
  * full fold output restricted to those buckets — sampling changes
  * which rows are checked, never their values. The DuckDB side of the
  * same contract (the sparse forward-fill twin) is pinned by the
  * oracle gates at sf0.01 AND sf0.1 (the dense grid twin OOMs DuckDB
  * at sf0.1 — the r13 blind spot these close). */
class R14WaveSpec extends SparkSpec {

  private val T0 = 1700000000000L

  /** A two-sided book with `n` one-minute buckets: every bucket sets
    * a fresh bid level below 100.00 and ask level above 100.02, so
    * every bucket is live on both sides and the touch drifts. */
  private def book(sym: String, n: Int): Seq[Update] =
    (0 until n).flatMap { i =>
      Seq(
        Update(sym, T0 + i * 60000L, i * 2L, is_trade = false,
          is_bid = true, 100.00 - 0.01 * (i % 7), 1.0 + i),
        Update(sym, T0 + i * 60000L + 1000L, i * 2L + 1L,
          is_trade = false, is_bid = false,
          100.02 + 0.01 * (i % 5), 2.0 + i))
    }

  test("ofiSampled: the strided sample is exactly the full fold " +
      "output at rank % stride == 0; oversized budget degenerates " +
      "to the full output") {
    val ups = book("a", 20) ++ book("b", 7)
    val full = BookFeatures.ofi(updatesDf(ups))
      .orderBy("symbol", "start").collect()
    val fullBySym = full.groupBy(_.getString(0))
    assert(fullBySym("a").length === 20 && fullBySym("b").length === 7)
    // buckets=4: symbol a stride 20/4=5 -> ranks 5,10,15,20;
    // symbol b stride 7/4=1 -> all 7 rows
    val samp = BookFeatures.ofiSampled(updatesDf(ups), buckets = 4)
      .orderBy("symbol", "start").collect()
    val expected = fullBySym("a").zipWithIndex
      .collect { case (r, i) if (i + 1) % 5 == 0 => r } ++ fullBySym("b")
    assert(samp.map(_.toString).toSeq ===
      expected.map(_.toString).toSeq)
    // a budget >= the emitted count keeps every row (stride floors at 1)
    val all = BookFeatures.ofiSampled(updatesDf(ups), buckets = 64)
      .orderBy("symbol", "start").collect()
    assert(all.map(_.toString).toSeq === full.map(_.toString).toSeq)
  }

  private def lq8(a: Long, b: Long): Long =
    math.floor(math.log(a.toDouble / b.toDouble) * 1e8).toLong

  /** One bucket per minute trading the exact path o -> h -> l -> c. */
  private def ohlc(sym: String, n: Int,
      o: Double, h: Double, l: Double, c: Double): Seq[Update] =
    (0 until n).flatMap { i =>
      Seq(o, h, l, c).zipWithIndex.map { case (p, j) =>
        Update(sym, T0 + i * 60000L + j * 1000L, j.toLong,
          is_trade = true, is_bid = true, p, 1.0)
      }
    }

  test("rogersSatchell: planted OHLC matches the exact quantized " +
      "scalar; a pure-drift path scores exactly zero") {
    import graft.operators.RangeSpread
    // 10 buckets of o=100 h=102 l=99 c=101
    val mixed = ohlc("m", 10, 100.0, 102.0, 99.0, 101.0)
    // pure drift: opens at the low, closes at the high -> both
    // products carry a zero leg, RS is EXACTLY zero (the
    // drift-independence Garman-Klass lacks)
    val drift = ohlc("d", 10, 100.0, 102.0, 100.0, 102.0)
    val out = RangeSpread.rogersSatchell(updatesDf(mixed ++ drift))
      .collect().map(r => r.getString(0) -> r).toMap
    val term = lq8(10200, 10100) * lq8(10200, 10000) +
      lq8(9900, 10100) * lq8(9900, 10000)
    assert(out("m").getLong(1) === 10L)
    assert(out("m").getLong(2) === 10L * term)
    assert(out("m").getDouble(3) ===
      (10L * term).toDouble / 1e16 / 10.0)
    assert(out("d").getLong(2) === 0L)
    assert(out("d").getDouble(3) === 0.0)
  }

  test("yangZhang: zero-overnight zero-intraday fixture reduces to " +
      "(1-k) x Rogers-Satchell; first bucket is excluded") {
    import graft.operators.RangeSpread
    // every bucket opens where the last closed (no overnight move)
    // and closes at its open (no intraday move), with an h=102/l=99
    // wick -> sigma_o = sigma_c = 0 exactly, yz = (1-k) * rs
    val ups = ohlc("y", 12, 100.0, 102.0, 99.0, 100.0)
    val out = RangeSpread.yangZhang(updatesDf(ups)).collect()
    assert(out.length === 1)
    val r = out(0)
    val n = 11L // 12 buckets, first excluded (no prior close)
    assert(r.getLong(1) === n)
    assert(r.getLong(2) === 0L && r.getLong(4) === 0L) // sum_oq, sum_cq
    assert(r.getDouble(3) === 0.0 && r.getDouble(5) === 0.0)
    val term = lq8(10200, 10000) * lq8(10200, 10000) +
      lq8(9900, 10000) * lq8(9900, 10000)
    assert(r.getLong(6) === n * term)
    val k = 0.34 / (1.34 + (n + 1).toDouble / (n - 1).toDouble)
    val rs = (n * term).toDouble / 1e16 / n.toDouble
    assert(math.abs(r.getDouble(7) - (1.0 - k) * rs) < 1e-18,
      s"yz_var ${r.getDouble(7)} != ${(1.0 - k) * rs}")
  }

  test("tsrv: pure bid-ask bounce collapses toward zero while " +
      "RV_full stays inflated; exact integer sums pin the chain") {
    import graft.operators.ReturnDynamics
    // alternating 100/101 closes: full-grid returns are +-ln(1.01)
    // every bucket (pure noise RV), while the K=5 subgrid return
    // (odd lag) is also +-ln(1.01) per 5 buckets -> TSRV removes
    // ~4/5 of the noise by construction of the estimator
    val m = 101
    val ups = (0 until m).map { i =>
      Update("b", T0 + i * 60000L, 0L, is_trade = true,
        is_bid = true, if (i % 2 == 0) 100.0 else 101.0, 1.0)
    }
    val out = ReturnDynamics.tsrv(updatesDf(ups)).collect()
    assert(out.length === 1)
    val r = out(0)
    val up = math.floor(math.log(101.0 / 100.0) * 1e6).toLong
    val dn = math.floor(math.log(100.0 / 101.0) * 1e6).toLong
    assert(r.getLong(1) === m.toLong)
    assert(r.getLong(2) === 50L * up * up + 50L * dn * dn)
    // K=5 with alternating closes: each lag-5 ratio is one net move
    val nK = m - 5
    assert(r.getLong(3) === (nK / 2) * up * up + (nK / 2) * dn * dn)
    val rvFull = r.getLong(2).toDouble / 1e12
    val avgRv = r.getLong(3).toDouble / 1e12 / 5.0
    val nBar = (m - 5 + 1).toDouble / 5.0
    val want = avgRv - nBar / (m - 1).toDouble * rvFull
    assert(r.getDouble(5) === want)
    assert(r.getDouble(5) < 0.5 * rvFull,
      s"TSRV ${r.getDouble(5)} did not shrink the noise RV $rvFull")
  }

  test("hayashiYoshida: planted async ticks pin the telescoped bench " +
      "lookups exactly; boundary intervals drop; segmented == window " +
      "plan bit-for-bit on real multi-day ticks") {
    import graft.operators.Microstructure
    def tr(sym: String, ms: Long, seq: Long, p: Double) =
      Update(sym, T0 + ms, seq, is_trade = true, is_bid = true, p, 1.0)
    // bench B ticks at 0/10/20s; target A at 5/15/25s — A's only
    // COVERED interval is (5s, 15s]: bench telescopes from the last
    // bench tick at-or-before 5s (100 @ 0s) to the first at-or-after
    // 15s (121 @ 20s); the 25s interval has no bench tick after it
    // and must drop; A's 5s row has no previous trade and drops
    val ups = Seq(
      tr("B", 0L, 0L, 100.0), tr("B", 10000L, 1L, 110.0),
      tr("B", 20000L, 2L, 121.0),
      tr("A", 5000L, 3L, 50.0), tr("A", 15000L, 4L, 55.0),
      tr("A", 25000L, 5L, 60.0))
    val out = Microstructure.hayashiYoshida(updatesDf(ups),
      benchmark = "B").collect()
    assert(out.length === 1)
    val r = out(0)
    def q6(a: Double, b: Double): Long =
      math.floor(math.log(a / b) * 1e6).toLong
    val qa = q6(55.0, 50.0)
    val qb = q6(121.0, 100.0)
    val b2 = q6(110.0, 100.0) * q6(110.0, 100.0) +
      q6(121.0, 110.0) * q6(121.0, 110.0)
    assert(r.getString(0) === "A")
    assert(r.getLong(1) === 1L) // n_intervals: 25s interval dropped
    assert(r.getLong(2) === qa * qb)
    assert(r.getLong(3) === qa * qa)
    assert(r.getLong(4) === b2)
    assert(r.getDouble(5) === (qa * qb).toDouble / 1e12)
    assert(r.getDouble(6) === (qa * qb).toDouble /
      math.sqrt((qa * qa).toDouble * b2.toDouble))
    // the scale arm (per-day segments, constant-key global carries,
    // the FORWARD boundary stitch) is bit-identical to the single
    // window on real 30-day ticks
    val base = Tables.updates(spark, sf())
      .where(col("is_trade") && col("price") > 0.0)
      .select(col("symbol"), col("ts"), col("seq"), col("price"))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(r0 => r0.toSeq.map(v =>
        if (v == null) "null" else v.toString).mkString("|"))
        .sorted.toSeq
    assert(rows(Microstructure.hayashiYoshidaPlan(base, "click",
        segmented = true)) ===
      rows(Microstructure.hayashiYoshidaPlan(base, "click",
        segmented = false)),
      "segmented HY diverges from the single-window plan")
  }

  test("durationAcf: planted clustered durations score the exact " +
      "paired-sample chain; constant durations null out; segmented " +
      "== window on real ticks") {
    import graft.operators.Microstructure
    // durations 1s,1s,9s,9s,1s,1s,9s,9s... (clustered): pairs (d', d)
    // alternate (1,1),(1,9),(9,9),(9,1) — hand-compute rho below
    val durs = Seq(1000L, 1000L, 9000L, 9000L, 1000L, 1000L,
      9000L, 9000L, 1000L)
    val times = durs.scanLeft(0L)(_ + _)
    val ups = times.zipWithIndex.map { case (ms, i) =>
      Update("c", T0 + ms, i.toLong, is_trade = true, is_bid = true,
        100.0, 1.0)
    }
    // constant durations -> zero variance -> null rho
    val flat = (0 until 6).map(i =>
      Update("f", T0 + i * 5000L, 100L + i, is_trade = true,
        is_bid = true, 100.0, 1.0))
    val out = Microstructure.durationAcf(updatesDf(ups ++ flat))
      .collect().map(r => r.getString(0) -> r).toMap
    val pairs = durs.zip(durs.tail) // (prev, cur)
    val n = pairs.length.toDouble
    val sd = pairs.map(_._2).sum.toDouble
    val sp = pairs.map(_._1).sum.toDouble
    val sdp = pairs.map { case (p, d) => p.toDouble * d.toDouble }.sum
    val sd2 = pairs.map(p => p._2.toDouble * p._2.toDouble).sum
    val sp2 = pairs.map(p => p._1.toDouble * p._1.toDouble).sum
    val rho = (n * sdp - sd * sp) /
      math.sqrt((n * sd2 - sd * sd) * (n * sp2 - sp * sp))
    val c = out("c")
    assert(c.getLong(1) === pairs.length.toLong)
    assert(c.getLong(2) === sd.toLong && c.getLong(3) === sp.toLong)
    assert(math.abs(c.getDouble(7) - rho) < 1e-12,
      s"rho ${c.getDouble(7)} != $rho")
    assert(out("f").isNullAt(7), "constant durations must null rho")
    // scale-arm parity on real ticks
    val base = Tables.updates(spark, sf()).where(col("is_trade"))
      .select(col("symbol"), col("ts"), col("seq"))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(r0 => r0.toSeq.map(v =>
        if (v == null) "null" else v.toString).mkString("|"))
        .sorted.toSeq
    assert(rows(Microstructure.durationAcfPlan(base, segmented = true))
      === rows(Microstructure.durationAcfPlan(base, segmented = false)),
      "segmented durationAcf diverges from the single-window plan")
  }

  test("twoNN: a planted 1-D manifold estimates ~1 with the exact " +
      "quantized chain; duplicates are excluded and counted; the " +
      "maxVectors guard raises loud") {
    import spark.implicits._
    import graft.ext.Similarity
    // points on a line (1-D manifold in 3-D space), irregular spacing
    val pts = Seq(0.0, 1.0, 2.5, 4.1, 6.0, 8.3, 11.0, 13.2, 16.0)
    val docs = pts.zipWithIndex.map { case (t, i) =>
      (i.toLong, Seq((2 * t).toFloat, t.toFloat, (3 * t).toFloat), 0)
    } :+ ((100L, Seq(0f, 0f, 0f), 0)) // exact duplicate of vec 0
    val df = docs.toDF("vec_id", "embedding", "label")
    val out = Similarity.twoNN(df).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getLong(0) === 10L) // n_points
    assert(r.getLong(2) === 2L, // both dup twins have d1 = 0
      s"n_dup ${r.getLong(2)}")
    assert(r.getLong(1) === 8L) // n_used
    // recompute the exact chain
    def xq(v: Double): Long = math.floor(v * 1e6).toLong
    val vecs = docs.map { case (id, e, _) =>
      id -> e.map(x => xq(x.toDouble)) }
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val sum = vecs.map { case (id, e) =>
      val ds = vecs.filter(_._1 != id)
        .map { case (oid, oe) => (d2(e, oe), oid) }.sorted
      (ds(0)._1, ds(1)._1)
    }.collect { case (d1v, d2v) if d1v > 0L =>
      math.floor(math.log(d2v.toDouble / d1v.toDouble) * 1e12).toLong
    }.sum
    assert(r.getLong(3) === sum)
    val dHat = 2.0e12 * 8.0 / sum.toDouble
    assert(r.getDouble(4) === dHat)
    // dimensionality ORDERING (the estimator is exactly unbiased only
    // under Poisson sampling, so pin the property, not the constant):
    // a 3-D jittered lattice must estimate strictly higher than the
    // 1-D manifold
    val cloud = (for {
      i <- 0 until 3; j <- 0 until 3; k <- 0 until 3
    } yield {
      val id = (i * 9 + j * 3 + k).toLong
      (id, Seq(
        (i * 10.0 + (id * 7 % 5) * 0.61).toFloat,
        (j * 10.0 + (id * 11 % 7) * 0.47).toFloat,
        (k * 10.0 + (id * 13 % 11) * 0.29).toFloat), 0)
    }).toDF("vec_id", "embedding", "label")
    val dCloud = Similarity.twoNN(cloud).collect()(0).getDouble(4)
    assert(dHat < dCloud,
      s"1-D manifold $dHat not below 3-D cloud $dCloud")
    assert(dCloud > 1.5, s"3-D cloud estimated at only $dCloud")
    val e = intercept[IllegalStateException] {
      Similarity.twoNN(df, maxVectors = 5)
    }
    assert(e.getMessage.contains("maxVectors"))
  }

  test("repetitionCoverage: planted docs pin the line, top-2gram and " +
      "dup-5gram fractions exactly; empty and tiny docs null out") {
    import spark.implicits._
    val docs = Seq(
      // lines: x, y, x, '' -> 4 lines, dup 'x' pair; words: x y x
      (1L, "a", "x\ny\nx\n"),
      // one line, no dup; 6 words all 'w' -> top 2-gram 'w w' cnt 5,
      // denom 11; 5-grams 'w w w w w' cnt 2 -> dup chars 2*9=18
      (2L, "a", "w w w w w w"),
      (3L, "a", ""), // no words -> null fracs
      (4L, "a", "solo")) // 1 word: no 2-grams, n_words < 5
      .toDF("doc_id", "source", "text")
    val out = graft.ext.TextOps.repetitionCoverage(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d1 = out(1L)
    assert(d1.getLong(2) === 4L) // n_lines (trailing empty kept)
    assert(d1.getLong(3) === 2L) // dup_lines
    assert(d1.getDouble(6) === 0.5) // dup_line_frac
    assert(d1.getDouble(7) === 2.0 / 3.0) // dup chars 2 of 3
    val d2 = out(2L)
    assert(d2.getDouble(6) === 0.0)
    assert(d2.getLong(4) === 5L * 3L) // top2_chars: 'w w' x5
    assert(d2.getDouble(8) === 15.0 / 11.0) // occurrence-weighted
    assert(d2.getLong(5) === 2L * 9L) // dup5 chars
    assert(d2.getDouble(9) === 18.0 / 11.0)
    val d3 = out(3L)
    assert(d3.getLong(1) === 0L && d3.isNullAt(8) && d3.isNullAt(9))
    val d4 = out(4L)
    assert(d4.isNullAt(8), "no 2-grams must emit null top fraction")
    assert(d4.isNullAt(9), "sub-5-word doc must emit null dup5")
  }

  test("depthProfileSampled: bucket-rank striding keeps whole " +
      "8-row bucket groups and matches the full fold rows exactly") {
    val ups = book("d", 12)
    val full = BookFeatures.depthProfile(updatesDf(ups))
      .orderBy("symbol", "start", "is_bid", "band_bps").collect()
    assert(full.length === 12 * 8) // 12 buckets x 2 sides x 4 bands
    // buckets=3: stride 12/3=4 -> bucket ranks 4,8,12 survive whole
    val samp = BookFeatures.depthProfileSampled(updatesDf(ups),
        buckets = 3)
      .orderBy("symbol", "start", "is_bid", "band_bps").collect()
    val starts = full.map(_.getLong(1)).distinct.sorted
    val kept = Set(starts(3), starts(7), starts(11))
    val expected = full.filter(r => kept.contains(r.getLong(1)))
    assert(samp.length === 3 * 8)
    assert(samp.map(_.toString).toSeq ===
      expected.map(_.toString).toSeq)
  }
}
