package graft

import org.apache.spark.sql.functions.{col, timestamp_micros}

import graft.model.Update
import graft.operators.{EventAnalytics, RangeSpread}
import graft.ext.TextOps

/** Behavior gates for the round-13 analytics wave: the Parkinson /
  * Garman–Klass range-volatility pair, DAU/MAU stickiness, the Heaps
  * vocabulary-growth exponent, and per-source Jensen–Shannon
  * divergence. Each also carries a DuckDB oracle gate (q_parkinson,
  * q_garman_klass, q_stickiness, q_heaps_law, q_jsd_sources); these
  * tests pin SEMANTICS — exact scalar replication on planted fixtures
  * and the closed-form edge cases — which a bit-identical twin cannot
  * see. */
class R13WaveSpec extends SparkSpec {

  private val T0 = 1700000000000L

  /** One trade per minute bucket at the given closes (the
    * ReturnDynamicsSpec fixture). */
  private def closes(sym: String, ps: Seq[Double]): Seq[Update] =
    ps.zipWithIndex.map { case (p, i) =>
      Update(sym, T0 + i * 60000L, 0L, is_trade = true, is_bid = true,
        p, 1.0)
    }

  test("parkinson: constant-range fixture matches the scalar formula " +
      "exactly; sub-cent lows are dropped") {
    // 20 buckets, each trading exactly H=102 / L=100
    val ups = (0 until 20).flatMap(i => Seq(
      Update("p", T0 + i * 60000L, 0L, true, true, 102.0, 1.0),
      Update("p", T0 + i * 60000L + 1000, 1L, true, true, 100.0, 1.0)))
    // a symbol whose only prices round to zero cents -> no output row
    val sub = (0 until 5).map(i =>
      Update("z", T0 + i * 60000L, 0L, true, true, 0.001, 1.0))
    val rows = RangeSpread.parkinson(updatesDf(ups ++ sub)).collect()
    assert(rows.length === 1 && rows(0).getString(0) === "p")
    val r = math.floor(math.log(10200.0 / 10000.0) * 1e8).toLong
    val sumRq2 = 20L * r * r
    val pv = (sumRq2.toDouble / 1e16) / (4.0 * math.log(2.0) * 20.0)
    assert(rows(0).getLong(1) === 20L)
    assert(rows(0).getLong(2) === sumRq2)
    assert(rows(0).getDouble(3) === pv)
    assert(rows(0).getDouble(4) === math.sqrt(pv))
  }

  test("garmanKlass: open/close drift subtracts from the range term " +
      "exactly; flat close-to-open reduces to the pure range form") {
    // drift symbol: every bucket opens 100, runs to high 102, closes
    // 102 (o=100 c=102 h=102 l=100)
    val drift = (0 until 10).flatMap(i => Seq(
      Update("d", T0 + i * 60000L, 0L, true, true, 100.0, 1.0),
      Update("d", T0 + i * 60000L + 1000, 1L, true, true, 102.0, 1.0)))
    // flat symbol: opens and closes 100, wick to 102 in between
    val flat = (0 until 10).flatMap(i => Seq(
      Update("f", T0 + i * 60000L, 0L, true, true, 100.0, 1.0),
      Update("f", T0 + i * 60000L + 1000, 1L, true, true, 102.0, 1.0),
      Update("f", T0 + i * 60000L + 2000, 2L, true, true, 100.0, 1.0)))
    val out = RangeSpread.garmanKlass(updatesDf(drift ++ flat))
      .collect().map(x => x.getString(0) -> x).toMap
    val r = math.floor(math.log(10200.0 / 10000.0) * 1e8).toLong
    val k = 2.0 * math.log(2.0) - 1.0
    // drift: rq = cq = r each bucket
    val sr = 10L * r * r
    val gvD = 0.5 * (sr.toDouble / 1e16) / 10.0 -
      k * (sr.toDouble / 1e16) / 10.0
    assert(out("d").getLong(2) === sr && out("d").getLong(3) === sr)
    assert(out("d").getDouble(4) === gvD)
    assert(out("d").getDouble(5) === math.sqrt(math.max(gvD, 0.0)))
    // flat: cq = 0 (ln(1) = 0 exactly) -> pure range form, larger var
    val gvF = 0.5 * (sr.toDouble / 1e16) / 10.0 -
      k * (0.0 / 1e16) / 10.0
    assert(out("f").getLong(3) === 0L)
    assert(out("f").getDouble(4) === gvF)
    assert(gvF > gvD, "removing the drift penalty must raise GK var")
  }

  test("stickiness: planted DAU/MAU ladder is exact; single-day user " +
      "dilutes the ratio") {
    import spark.implicits._
    val dayUs = 86400L * 1000000L
    // u1 active days 0..6; u2 active day 0 only; period = 7 days
    val evs = (0 until 7).map(d =>
        (d.toLong, 1L, d * dayUs, "view", 0.0)) :+
      (100L, 2L, 0L, "view", 0.0)
    val df = evs.toDF("event_id", "user_id", "us", "event_type", "value")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val rows = EventAnalytics.stickiness(df, periodDays = 7).collect()
    assert(rows.length === 1)
    val r = rows(0)
    assert(r.getLong(1) === 7L) // n_days
    assert(r.getLong(2) === 8L) // dau_sum: day0 has 2, days 1-6 have 1
    assert(r.getLong(3) === 2L) // mau
    assert(r.getDouble(4) === 8.0 / 7.0)
    assert(r.getDouble(5) === 8.0 / (7.0 * 2.0))
  }

  test("heapsLaw: all-new-words corpus fits beta = 1 exactly; pure " +
      "repetition fits beta = 0 exactly") {
    import spark.implicits._
    // growth: doc i contributes 4 never-seen tokens -> cum_v == cum_n
    // at every checkpoint -> xq == yq -> slope exactly 1
    val growth = (0 until 32).map(i =>
      (i.toLong, (0 until 4).map(j => s"g${i}_$j").mkString(" "), "g"))
    // repeat: every doc is the same word 4 times -> cum_v == 1 always
    // -> yq == 0 -> slope exactly 0
    val repeat = (0 until 32).map(i =>
      (i.toLong, "w w w w", "r"))
    val df = (growth ++ repeat).toDF("doc_id", "text", "lang")
    val out = TextOps.heapsLaw(df, step = 4).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("g").getLong(1) === 8L) // 32 docs / step 4
    assert(out("g").getDouble(2) === 1.0)
    assert(out("r").getDouble(2) === 0.0)
  }

  test("depthProfile: planted book bins levels by the exact integer " +
      "band cut; removed levels vanish; the book carries across " +
      "buckets") {
    // dyadic-cent prices so floor(price*100) is exact. Book at bucket
    // 0 close: bids 100.00/1.5, 99.75/2.25, 99.50/4.0 (12.5/37.5/62.5
    // bps from mid 100.125); asks 100.25/3.0, 100.50/0.5 (12.5/37.5).
    // A bid set then zeroed must vanish. Bucket 1 only adds a far ask.
    def set(ts: Long, bid: Boolean, p: Double, sz: Double, seq: Long) =
      Update("d", T0 + ts, seq, is_trade = false, is_bid = bid, p, sz)
    val ups = Seq(
      set(0L, true, 100.00, 1.5, 1), set(1L, true, 99.75, 2.25, 2),
      set(2L, true, 99.50, 4.0, 3), set(3L, false, 100.25, 3.0, 4),
      set(4L, false, 100.50, 0.5, 5),
      set(5L, true, 99.90, 2.0, 6), set(6L, true, 99.90, 0.0, 7),
      set(60000L, false, 103.00, 9.0, 8))
    val rows = graft.operators.BookFeatures.depthProfile(updatesDf(ups))
      .collect()
      .map(r => (r.getLong(1), r.getBoolean(2), r.getLong(3)) ->
        (r.getLong(4), r.getDouble(5))).toMap
    assert(rows.size === 16) // 2 buckets x 2 sides x 4 bands
    val b0 = T0 / 1000 / 60 * 60
    for (b <- Seq(b0, b0 + 60)) {
      assert(rows((b, true, 5L)) === ((0L, 0.0)))
      assert(rows((b, true, 10L)) === ((0L, 0.0)))
      assert(rows((b, true, 25L)) === ((1L, 1.5)))
      assert(rows((b, true, 50L)) === ((2L, 3.75)))
      assert(rows((b, false, 25L)) === ((1L, 3.0)))
      assert(rows((b, false, 50L)) === ((2L, 3.5)))
    }
  }

  test("jumpTest: planted jump inflates z; smooth walk stays small; " +
      "flat series yields null; rq nonnegative") {
    val smooth = closes("s", (0 until 200).scanLeft(100.0) {
      (p, i) => p * (if (i % 2 == 0) 1.001 else 0.999)
    })
    val jumpy = closes("j", (0 until 200).scanLeft(100.0) { (p, i) =>
      if (i == 100) p * 0.6 else p * (if (i % 2 == 0) 1.001 else 0.999)
    })
    val flat = closes("f", Seq.fill(50)(100.0))
    val out = graft.operators.ReturnDynamics
      .jumpTest(updatesDf(smooth ++ jumpy ++ flat))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("f").isNullAt(8), "zero-RV series must yield null z")
    val (zj, zs) = (out("j").getDouble(8), out("s").getDouble(8))
    assert(zj > zs, s"planted jump z=$zj not above smooth z=$zs")
    assert(zj > 3.0, s"planted 40% jump must reject the null: z=$zj")
    for (sym <- Seq("s", "j")) {
      assert(out(sym).getDouble(7) >= 0.0, "med_rq must be nonnegative")
      assert(out(sym).getDouble(4) >= 0.0, "sum_m4 must be nonnegative")
    }
  }

  test("activityGini: planted skew scores the exact rank identity; " +
      "uniform counts score exactly zero") {
    import spark.implicits._
    // type t: users 1,2 with 1 event, user 3 with 2 -> gini 1/6
    // type u: three users with 2 events each -> gini 0
    val evs =
      Seq((1L, 1L, "t"), (2L, 2L, "t"), (3L, 3L, "t"), (4L, 3L, "t")) ++
        (0 until 6).map(i => (10L + i, 100L + i % 3, "u"))
    val df = evs.toDF("event_id", "user_id", "event_type")
    val out = graft.operators.ActivityStats.activityGini(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("t").getLong(1) === 3L && out("t").getLong(2) === 4L)
    // ranks (cnt, user): u1 r1, u2 r2, u3 r3 -> rw = 1 + 2 + 6 = 9
    assert(out("t").getDouble(3) === 9.0)
    assert(out("t").getDouble(4) === (2.0 * 9.0 - 4.0 * 4.0) / 12.0)
    assert(out("u").getDouble(4) === 0.0)
  }

  test("transitionEntropy: deterministic source scores exactly zero; " +
      "an even 2-way split scores the quantized ln 2; contributions " +
      "sum to the entropy rate") {
    import spark.implicits._
    // two identical users A->B->A->C: A splits evenly (B or C),
    // B always returns to A
    val evs = Seq(1L, 2L).flatMap(u => Seq(
      (u * 10 + 1, u, 0L, "A"), (u * 10 + 2, u, 1000000L, "B"),
      (u * 10 + 3, u, 2000000L, "A"), (u * 10 + 4, u, 3000000L, "C")))
    val df = evs.toDF("event_id", "user_id", "us", "event_type")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"),
        org.apache.spark.sql.functions.lit(0.0).as("value"))
    val out = graft.operators.EventAnalytics.transitionEntropy(df)
      .collect().map(r => r.getString(0) -> r).toMap
    val lnHalfQ = math.floor(math.log(0.5) * 1e12)
    val hA = -(4.0 * lnHalfQ) / 1e12 / 4.0
    assert(out("A").getLong(2) === 4L) // from_total
    assert(out("A").getDouble(5) === hA)
    assert(out("B").getDouble(5) === 0.0)
    val rate = out.values.map(_.getDouble(6)).sum
    assert(rate === -(4.0 * lnHalfQ) / 1e12 / 6.0,
      "contributions must sum to the empirical entropy rate")
  }

  test("leeReady: quote rule classifies around the mid, mid ties fall " +
      "back to the tick rule, pre-quote pre-tick trades stay " +
      "unclassified") {
    def q(ts: Long, seq: Long, bid: Boolean, p: Double) =
      Update("l", T0 + ts, seq, is_trade = false, is_bid = bid, p, 1.0)
    def t(ts: Long, seq: Long, p: Double, sz: Double) =
      Update("l", T0 + ts, seq, is_trade = true, is_bid = true, p, sz)
    val ups = Seq(
      t(0L, 0L, 100.0, 16.0), // before any quote, no tick -> null
      q(0L, 1L, true, 99.0), q(1L, 2L, false, 101.0), // mid = 100
      t(2L, 3L, 101.0, 2.0), // > mid -> buy
      t(3L, 4L, 100.0, 4.0), // == mid -> tick vs 101 -> sell
      t(4L, 5L, 99.5, 8.0)) // < mid -> sell
    val rows = graft.operators.Microstructure.leeReady(updatesDf(ups))
      .collect()
    assert(rows.length === 1)
    val r = rows(0)
    assert(r.getLong(2) === 4L) // n_trades
    assert(r.getLong(3) === 1L) // n_buy
    assert(r.getLong(4) === 2L) // n_sell
    assert(r.getDouble(5) === 2.0) // buy_vol
    assert(r.getDouble(6) === 12.0) // sell_vol
    assert(r.getDouble(7) === (2.0 - 12.0) / (2.0 + 12.0))
  }

  test("leadLag: a one-bucket follower peaks at lag +1; the benchmark " +
      "autocorrelates to exactly 1 at lag 0") {
    // click's bucket returns; f replays them one bucket later
    val ratios = Seq(1.01, 0.99, 1.03, 0.97, 1.02, 0.98, 1.04, 0.96)
    val clickPs = ratios.scanLeft(100.0)(_ * _)
    val fPs = 100.0 +: ratios.scanLeft(100.0)(_ * _)
    val ups = closes("click", clickPs) ++ closes("f", fPs)
    val out = graft.operators.Microstructure
      .leadLag(updatesDf(ups), seconds = 60, maxLag = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(8)) None else Some(r.getDouble(8)))).toMap
    assert(out(("click", 0L)).get === 1.0,
      "benchmark lag-0 autocorrelation must be exactly 1")
    val fLags = (-2L to 2L).map(l => l -> out(("f", l)).get).toMap
    assert(fLags(1L) > 0.999, s"follower lag+1 corr ${fLags(1L)}")
    assert((-2L to 2L).filter(_ != 1L)
      .forall(l => fLags(l) < fLags(1L)),
      s"lag+1 must dominate: $fLags")
  }

  test("quoteTradeLag: exact ms gaps to the last prior live quote; " +
      "pre-quote trades stay out of the gap stats") {
    def q(ts: Long, seq: Long) =
      Update("q", T0 + ts, seq, is_trade = false, is_bid = true,
        100.0, 1.0)
    def t(ts: Long, seq: Long) =
      Update("q", T0 + ts, seq, is_trade = true, is_bid = true,
        100.0, 1.0)
    val ups = Seq(t(0L, 0L), q(1L, 1L), t(6L, 2L), q(7L, 3L),
      t(10L, 4L))
    val rows = graft.operators.Microstructure
      .quoteTradeLag(updatesDf(ups)).collect()
    assert(rows.length === 1)
    val r = rows(0)
    assert(r.getLong(2) === 3L) // n_trades
    assert(r.getLong(3) === 2L) // n_with_quote
    assert(r.getLong(4) === 8L) // 5 + 3 ms
    assert(r.getDouble(5) === 4.0)
  }

  test("dailyAnomaly: planted spike day scores the exact population " +
      "z; constant days yield null") {
    import spark.implicits._
    val dayUs = 86400L * 1000000L
    // type s: days with counts 1,1,4 -> mean 2, var 2
    // type c: constant 2/day -> zero variance -> null z
    val evs =
      Seq((1L, 0L), (2L, dayUs), (3L, 2 * dayUs), (4L, 2 * dayUs),
        (5L, 2 * dayUs), (6L, 2 * dayUs)).map {
        case (id, us) => (id, 1L, us, "s") } ++
        (0 until 6).map(i =>
          (100L + i, 1L, (i / 2) * dayUs, "c"))
    val df = evs.toDF("event_id", "user_id", "us", "event_type")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"))
    val out = graft.operators.ActivityStats.dailyAnomaly(df).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    val spike = out(("s", 2L))
    assert(spike.getLong(2) === 4L)
    // mean 2, var = (1+1+16)/3 - 4 = 2 -> z = (4-2)/sqrt(2)
    val mean = 6.0 / 3.0
    val variance = 18.0 / 3.0 - mean * mean
    assert(spike.getDouble(6) === (4.0 - mean) / math.sqrt(variance))
    assert(out(("c", 0L)).isNullAt(6), "zero variance must yield null")
  }

  test("weeklyProfile: planted days land on the right weekday with " +
      "exact shares") {
    // T0 = 2023-11-14 (a Tuesday): epoch day 19675 -> dow 2
    val day = 86400000L
    val ups = Seq(
      Update("w", T0, 0L, true, true, 1.0, 1.0),
      Update("w", T0 + 1, 1L, true, true, 1.0, 3.0),
      Update("w", T0 + day, 2L, true, true, 1.0, 4.0))
    val out = graft.operators.Microstructure
      .weeklyProfile(updatesDf(ups)).collect()
      .map(r => r.getInt(1) -> r).toMap
    assert(out.keySet === Set(2, 3))
    assert(out(2).getLong(2) === 2L && out(2).getDouble(3) === 4.0)
    assert(out(2).getDouble(4) === 0.5)
    assert(out(3).getDouble(4) === 0.5)
  }

  test("tradeSizePercentiles: 1..5 sizes hit the exact rank " +
      "interpolation") {
    val ups = (1 to 5).map(i =>
      Update("p", T0 + i, i.toLong, true, true, 1.0, i.toDouble))
    val rows = graft.operators.Microstructure
      .tradeSizePercentiles(updatesDf(ups)).collect()
    assert(rows.length === 1)
    val r = rows(0)
    assert(r.getDouble(1) === 2.0) // p25
    assert(r.getDouble(2) === 3.0) // p50
    assert(r.getDouble(3) === 4.0) // p75
    val rank = 95.0 / 100.0 * 4.0
    val d = rank - math.floor(rank)
    assert(r.getDouble(4) === 4.0 + (5.0 - 4.0) * d) // p95
  }

  test("volumeHhi: two-bin fixture matches the closed form exactly") {
    val ups = Seq(
      Update("v", T0, 1L, is_trade = true, is_bid = true, 100.0, 1.0),
      Update("v", T0 + 1, 2L, is_trade = true, is_bid = true, 101.0,
        3.0))
    val rows = graft.operators.Microstructure.volumeHhi(updatesDf(ups))
      .collect()
    assert(rows.length === 1)
    val r = rows(0)
    assert(r.getLong(1) === 2L) // n_bins
    assert(r.getLong(2) === 40000L) // sum_vq (scale-4)
    assert(r.getDouble(3) === 1.0e9) // sum_vq2
    assert(r.getDouble(4) === 0.625) // (1e8+9e8)/(4e4)^2
    assert(r.getDouble(5) === 1.0 / 0.625)
  }

  test("principalAxis: rank-1 planted direction recovers the exact " +
      "(0.6, 0.8) axis and eigenvalue; a zero-covariance corpus " +
      "yields nulls") {
    import spark.implicits._
    // points along (3,4): C' = 2.5e12 * outer((3,4)) exactly after
    // the n-squared truncating scale; the iteration locks to ratio
    // 0.75 after one step, so component/eigenvalue are EXACT doubles
    val planted = Seq(
      (1L, Seq(3f, 4f), 0), (2L, Seq(-3f, -4f), 0),
      (3L, Seq(6f, 8f), 0), (4L, Seq(-6f, -8f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = graft.ext.Similarity.principalAxis(planted).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getDouble(2) === 0.6)
    assert(out(1L).getDouble(2) === 0.8)
    assert(out(0L).getDouble(3) === 62.5)
    // identical vectors: centered moments vanish -> zero iterate,
    // null component/eigenvalue
    val flat = Seq(
      (1L, Seq(1f, 1f), 0), (2L, Seq(1f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
    val z = graft.ext.Similarity.principalAxis(flat).collect()
    assert(z.forall(r => r.isNullAt(2) && r.isNullAt(3)))
    // the dims guard raises loud
    val e = intercept[IllegalStateException] {
      graft.ext.Similarity.principalAxis(planted, maxDims = 1)
    }
    assert(e.getMessage.contains("maxDims"))
    // projections onto the exact (0.6, 0.8) axis: (3,4) -> 5 etc.
    val proj = graft.ext.Similarity.axisProjection(planted).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(proj === Map(1L -> 5.0, 2L -> -5.0, 3L -> 10.0,
      4L -> -10.0))
  }

  test("readability: planted counts match the exact Flesch chain; " +
      "the sentence floor and zero-word null hold") {
    import spark.implicits._
    val df = Seq(
      (1L, "Hello world.", "a"), // w=2 s=1 y=3
      (2L, "no punctuation here", "b"), // w=3 s=1(floor) y=7
      (3L, "", "c")) // w=0 -> null flesch
      .toDF("doc_id", "text", "source")
    val out = graft.ext.TextOps.readability(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(2) === 2L && out("a").getLong(3) === 1L &&
      out("a").getLong(4) === 3L)
    assert(out("a").getDouble(5) ===
      206.835 - 1.015 * (2.0 / 1.0) - 84.6 * (3.0 / 2.0))
    // "no punctuation here": vowel groups o | u, ua, io | e, e -> 6
    assert(out("b").getLong(3) === 1L, "sentence floor must apply")
    assert(out("b").getLong(4) === 6L)
    assert(out("c").isNullAt(5), "zero-word doc must yield null")
  }

  test("ngramContainment: a quoted subset scores containment 1 with " +
      "the smaller doc named; unrelated docs never pair") {
    import spark.implicits._
    val df = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"), // superset: 5 bigrams
      (2L, "w1 w2 w3"), // contained: both bigrams inside doc 1
      (3L, "x1 x2 x3 x4")) // unrelated
      .toDF("doc_id", "text")
    val out = graft.ext.Dedup.ngramContainment(df).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L)
    assert(r.getLong(2) === 2L) // inter
    assert(r.getLong(3) === 5L && r.getLong(4) === 2L)
    assert(r.getDouble(5) === 1.0) // 2 / min(5, 2)
    assert(r.getLong(6) === 2L, "the smaller doc is the contained one")
  }

  test("jsdSources: identical sources score exactly zero; disjoint " +
      "vocabularies land in (0, ln 2]") {
    import spark.implicits._
    // identical: both sources have the same multiset -> every mixture
    // ratio is exactly 1 (integer identity), absent mass is zero
    val same = Seq(
      (1L, "a b c", "s1"), (2L, "a b c", "s2"))
      .toDF("doc_id", "text", "source")
    val z = TextOps.jsdSources(same).collect()
    assert(z.forall(_.getDouble(2) === 0.0))
    // disjoint equal-size sources: closed form
    // 0.5·ln(4/3) + 0.25·ln(2/3) + 0.25·ln 2 per source
    val disj = Seq(
      (1L, "a b c d", "s1"), (2L, "e f g h", "s2"))
      .toDF("doc_id", "text", "source")
    val d = TextOps.jsdSources(disj).collect()
    val want = 0.5 * math.log(4.0 / 3.0) + 0.25 * math.log(2.0 / 3.0) +
      0.25 * math.log(2.0)
    d.foreach { r =>
      val v = r.getDouble(2)
      assert(math.abs(v - want) < 1e-9, s"jsd=$v want~$want")
      assert(v > 0.0 && v <= math.log(2.0) + 1e-12)
    }
  }
}
