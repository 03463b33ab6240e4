package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.model.Update

/** Systematic overflow audit for the quantized-integer arithmetic class
  * (VERDICT r10 #5): rounds 9-10 fixed four Long-overflow/parity hazards
  * found one at a time by review; this suite makes the class mechanical.
  * Every lnQ/quantized operator is DRIVEN AT its documented magnitude
  * bound with planted extreme inputs and must either (a) produce the
  * exact value a BigInt scalar replay produces — no silent 64-bit wrap —
  * or (b) where the documented bound is actually breachable from data
  * (realized vol's pathological price ratios), fail LOUD, matching the
  * DuckDB twins' erroring BIGINT casts. */
class OverflowAuditSpec extends SparkSpec {

  import spark.implicits._

  private def lnQ6(x: Double): Long = math.floor(math.log(x) * 1e6).toLong
  private def lnQ12(x: Double): Long = math.floor(math.log(x) * 1e12).toLong

  // ------------------------------------------------------- realized vol

  /** The extreme FINITE ratio: 1 ↔ 1e300 gives |ln| ≈ 690.8 per return
    * (near the finite-double ceiling ~709.8, the corrected bound), so
    * q² ≈ 4.77e17 and 2^63 is crossed at the 20th return. */
  private val pLo = 1.0
  private val pHi = 1.0e300

  private def rvTrades(n: Int): Seq[Update] =
    (0 until n).map { i =>
      Update("ovf", 1700000000000L + i, i.toLong, is_trade = true,
        is_bid = true, if (i % 2 == 0) pLo else pHi, 1.0)
    }

  /** Scalar replay of the operator's own semantics: a ratio that
    * UNDERFLOWS the double division to 0.0 yields `ln(0) -> null` in
    * Spark and the row drops (unreachable from the reference's f32
    * price domain, whose worst ratio ~4e-84 stays positive); an
    * overflowed ratio (ln = inf) clamps lnQ6 to Long.Max and the q
    * guard is expected to raise. */
  private def rvScalarSum(prices: Seq[Double]): BigInt =
    prices.sliding(2).flatMap { case Seq(a, b) =>
      if (b / a == 0.0) None
      else { val q = BigInt(lnQ6(b / a)); Some(q * q) }
    }.sum

  test("realizedVol at the |q| bound: exact below 2^63, loud raise above") {
    // 19 extreme returns: ~9.07e18, still a long — must equal the
    // BigInt scalar replay exactly (a wrap would differ by 2^64)
    val ups19 = rvTrades(20)
    val want = rvScalarSum(ups19.map(_.price))
    assert(want < BigInt(Long.MaxValue), s"fixture broke: $want")
    val row = graft.operators.Microstructure.realizedVol(updatesDf(ups19))
      .select("n_returns", "sum_sq_q").head()
    assert(row.getLong(0) === 19L)
    assert(BigInt(row.getLong(1)) === want, "silent wrap below the bound")
    // 20 extreme returns: ~9.54e18 > 2^63 — the guarded cast must raise
    // (the DuckDB twin's CAST(HUGEINT AS BIGINT) errors identically),
    // never silently wrap
    val ups20 = rvTrades(21)
    assert(rvScalarSum(ups20.map(_.price)) > BigInt(Long.MaxValue))
    val ex = intercept[Exception] {
      graft.operators.Microstructure.realizedVol(updatesDf(ups20)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("overflows BIGINT")),
      s"wrong failure: ${messages(ex).mkString(" | ")}")
  }

  test("realizedVol with an infinite price ratio: loud raise, no clamp") {
    // min-subnormal -> double-max overflows the double division itself;
    // the non-ANSI double->long cast would clamp q to Long.Max and the
    // decimal(15,0) cast would then silently NULL the row — the q guard
    // raises instead, as DuckDB's CAST(inf AS BIGINT) errors
    val ups = Seq(
      Update("inf", 1700000000000L, 0L, is_trade = true, is_bid = true,
        java.lang.Double.MIN_VALUE, 1.0),
      Update("inf", 1700000000001L, 1L, is_trade = true, is_bid = true,
        java.lang.Double.MAX_VALUE, 1.0))
    val ex = intercept[Exception] {
      graft.operators.Microstructure.realizedVol(updatesDf(ups)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("outside double range")),
      s"wrong failure: ${messages(ex).mkString(" | ")}")
  }

  // ----------------------------------------------------- variance ratio

  /** One extreme trade per 60 s bucket, so bucket closes are the trade
    * prices and every consecutive-bucket return hits the |q| ceiling —
    * the [[rvTrades]] magnitudes on the variance-ratio plan. */
  private def vrTrades(n: Int): Seq[Update] =
    (0 until n).map { i =>
      Update("ovf", 1700000000000L + i * 60000L, i.toLong,
        is_trade = true, is_bid = true,
        if (i % 2 == 0) pLo else pHi, 1.0)
    }

  /** BigInt scalar replay of varianceRatio's operand sums (k = 4):
    * (n1, Σq, Σq², nk, Σqk, Σqk²) over the bucket-close series. */
  private def vrScalar(prices: Seq[Double], k: Int = 4)
      : (Long, BigInt, BigInt, Long, BigInt, BigInt) = {
    val qs = prices.sliding(2).flatMap { case Seq(a, b) =>
      if (b / a == 0.0) None else Some(lnQ6(b / a))
    }.toSeq
    val qks = ((k - 1) until qs.length).map(i =>
      qs.slice(i - k + 1, i + 1).sum)
    (qs.length.toLong, qs.map(BigInt(_)).sum,
      qs.map(q => BigInt(q) * BigInt(q)).sum,
      qks.length.toLong, qks.map(BigInt(_)).sum,
      qks.map(q => BigInt(q) * BigInt(q)).sum)
  }

  test("varianceRatio at the sum bound: exact below 2^63, loud above") {
    // 19 extreme returns: Σq² ≈ 9.07e18 < 2^63 — all four emitted sums
    // must equal the BigInt replay exactly (a wrap differs by 2^64)
    val ups19 = vrTrades(20)
    val (n1, s1, ss1, nk, sk, ssk) = vrScalar(ups19.map(_.price))
    assert(ss1 < BigInt(Long.MaxValue), s"fixture broke: $ss1")
    val row = graft.operators.Microstructure
      .varianceRatio(updatesDf(ups19))
      .select("n1", "sum_q1", "sum_sq1", "nk", "sum_qk", "sum_sqk")
      .head()
    assert(row.getLong(0) === n1)
    assert(BigInt(row.getLong(1)) === s1, "sum_q1 wrapped")
    assert(BigInt(row.getLong(2)) === ss1, "sum_sq1 wrapped")
    assert(row.getLong(3) === nk)
    assert(BigInt(row.getLong(4)) === sk, "sum_qk wrapped")
    assert(BigInt(row.getLong(5)) === ssk, "sum_sqk wrapped")
    // 20 extreme returns cross 2^63 in Σq²: the guarded BIGINT emission
    // must raise (the twin's CAST(HUGEINT AS BIGINT) errors), not wrap
    val ups20 = vrTrades(21)
    assert(vrScalar(ups20.map(_.price))._3 > BigInt(Long.MaxValue))
    val ex = intercept[Exception] {
      graft.operators.Microstructure
        .varianceRatio(updatesDf(ups20)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("overflows BIGINT")),
      s"wrong failure: ${messages(ex).mkString(" | ")}")
  }

  test("varianceRatio with an infinite bucket-close ratio: loud raise") {
    // same hazard as realizedVol's: an overflowed double ratio clamps
    // the long cast — the |q| guard raises instead of feeding a
    // clamped Long.Max into the sums
    val ups = Seq(
      Update("inf", 1700000000000L, 0L, is_trade = true, is_bid = true,
        java.lang.Double.MIN_VALUE, 1.0),
      Update("inf", 1700000060000L, 1L, is_trade = true, is_bid = true,
        java.lang.Double.MAX_VALUE, 1.0))
    val ex = intercept[Exception] {
      graft.operators.Microstructure.varianceRatio(updatesDf(ups)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("outside double range")),
      s"wrong failure: ${messages(ex).mkString(" | ")}")
  }

  // ---------------------------------------------------- realized kernel

  /** BigInt scalar replay of realizedKernel's γ operands (H = 4). */
  private def rkScalar(prices: Seq[Double])
      : (Long, BigInt, Seq[BigInt]) = {
    val q = prices.sliding(2).map { case Seq(a, b) =>
      BigInt(lnQ6(b / a))
    }.toSeq
    val g0 = q.map(x => x * x).sum
    val gs = (1 to 4).map(h =>
      q.drop(h).zip(q.dropRight(h)).map { case (x, y) => x * y }.sum)
    (q.length.toLong, g0, gs)
  }

  test("realizedKernel at the gamma bounds: exact below 2^63, loud " +
      "above") {
    // 19 extreme returns: γ0 ≈ 9.07e18 < 2^63 and every |γ_h| is a
    // long — all five emitted autocovariances must equal the BigInt
    // replay exactly (a wrap differs by 2^64)
    val ups19 = vrTrades(20)
    val (n, g0, gs) = rkScalar(ups19.map(_.price))
    assert(g0 < BigInt(Long.MaxValue), s"fixture broke: $g0")
    val row = graft.operators.ReturnDynamics
      .realizedKernel(updatesDf(ups19))
      .select("n_rets", "gamma0", "gamma1", "gamma2", "gamma3",
        "gamma4").head()
    assert(row.getLong(0) === n)
    assert(BigInt(row.getLong(1)) === g0, "gamma0 wrapped")
    for (h <- 1 to 4)
      assert(BigInt(row.getLong(1 + h)) === gs(h - 1),
        s"gamma$h wrapped")
    // 20 extreme returns cross 2^63 in γ0: the guarded BIGINT
    // emission must raise (the twin's CAST(HUGEINT AS BIGINT)
    // errors), not wrap
    val ups20 = vrTrades(21)
    assert(rkScalar(ups20.map(_.price))._2 > BigInt(Long.MaxValue))
    val ex = intercept[Exception] {
      graft.operators.ReturnDynamics
        .realizedKernel(updatesDf(ups20)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("overflows BIGINT")),
      s"wrong failure: ${messages(ex).mkString(" | ")}")
  }

  test("cusumChangePoint on the extreme ladder: exact operands (the " +
      "s_max bound itself is unreachable — cum telescopes to " +
      "ln(p_max/p_min))") {
    // the ×n-cleared peak is bounded by 2n·|ln(p_hi/p_lo)|·1e6 ≈
    // 2.8e9·n — crossing 2^63 needs ~3.3e9 buckets, unreachable from
    // any feed; what IS reachable is Σq² overflow in the σ̂ operand,
    // which shares returnMoments' guarded decimal→double emission.
    // Pin the exact integer operands at the same 19-return ladder.
    val ups19 = vrTrades(20)
    val q = ups19.map(_.price).sliding(2).map { case Seq(a, b) =>
      BigInt(lnQ6(b / a))
    }.toSeq
    val n = q.length
    val tot = q.sum
    val sdev = q.scanLeft(BigInt(0))(_ + _).tail.zipWithIndex.map {
      case (cum, i) => BigInt(n) * cum - BigInt(i + 1) * tot
    }
    val row = graft.operators.ReturnDynamics
      .cusumChangePoint(updatesDf(ups19))
      .select("n_rets", "sum_q", "s_max").head()
    assert(row.getLong(0) === n.toLong)
    assert(BigInt(row.getLong(1)) === tot, "sum_q wrapped")
    assert(BigInt(row.getLong(2)) === sdev.map(_.abs).max,
      "s_max wrapped")
  }

  // ----------------------------------------------------- return moments

  test("returnMoments at the decimal headroom: exact below, loud above") {
    // |q| ≈ 6.9e8 per extreme return -> q⁴ ≈ 2.27e35; decimal(38,0)
    // holds ~440 such terms. Below: all four power sums must equal the
    // BigInt replay through the correctly-rounded decimal→double cast.
    def qs(prices: Seq[Double]): Seq[BigInt] =
      prices.sliding(2).flatMap { case Seq(a, b) =>
        if (b / a == 0.0) None else Some(BigInt(lnQ6(b / a)))
      }.toSeq
    def d(b: BigInt): Double =
      new java.math.BigDecimal(b.bigInteger).doubleValue()
    val ups100 = vrTrades(101) // 100 extreme returns: inside headroom
    val q100 = qs(ups100.map(_.price))
    assert(q100.map(q => q * q * q * q).sum < BigInt(10).pow(38))
    val row = graft.operators.Microstructure
      .returnMoments(updatesDf(ups100))
      .select("n", "sum_q", "sum_q2", "sum_q3", "sum_q4").head()
    assert(row.getLong(0) === 100L)
    assert(row.getDouble(1) === d(q100.sum))
    assert(row.getDouble(2) === d(q100.map(q => q * q).sum))
    assert(row.getDouble(3) === d(q100.map(q => q * q * q).sum))
    assert(row.getDouble(4) === d(q100.map(q => q * q * q * q).sum))
    // past ~440 terms the Σq⁴ decimal overflows: Spark raises its own
    // ARITHMETIC_OVERFLOW on decimal sums (the operator's isNull guard
    // is the backstop for any non-raising path) — either way LOUD,
    // matching the twin's erroring HUGEINT
    val ups460 = vrTrades(461)
    assert(qs(ups460.map(_.price)).map(q => q * q * q * q).sum >
      BigInt(10).pow(38))
    val ex = intercept[Exception] {
      graft.operators.Microstructure
        .returnMoments(updatesDf(ups460)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(m =>
      m.contains("overflows decimal headroom") ||
        m.contains("Overflow in sum of decimals")),
      s"wrong failure: ${messages(ex).mkString(" | ")}")
  }

  test("streamingRealizedVol fold: exact-or-throw at the same bound") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // 19 extreme returns then a bucket advance: emitted bucket must
    // equal the scalar replay (the decimal sum's exact value) — i.e.
    // the Long fold did not wrap where the decimal sum did not
    val closer = Update("ovf", 1700000000000L + 120000L, 99L,
      is_trade = true, is_bid = true, 1.0, 1.0)
    val in = MemoryStream[Update]
    val q = graft.streaming.Streaming.streamingRealizedVol(in.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("ovfrv").start()
    in.addData(rvTrades(20) :+ closer: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ovfrv")
      .select("sum_sq_q").as[Long].collect().toSeq
    assert(got === Seq(rvScalarSum(rvTrades(20).map(_.price)).toLong))
    // 20 extreme returns inside one bucket: the fold's addExact must
    // throw (ArithmeticException surfaces as a query failure), matching
    // the batch raise — not wrap into a bogus emitted bucket
    val in2 = MemoryStream[Update]
    val q2 = graft.streaming.Streaming.streamingRealizedVol(in2.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("ovfrv2").start()
    in2.addData(rvTrades(21) :+ closer: _*)
    val ex = intercept[Exception] { q2.processAllAvailable() }
    q2.stop()
    def rootChain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(e => e +: rootChain(e.getCause))
    assert(rootChain(ex).exists(_.isInstanceOf[ArithmeticException]),
      s"fold overflow not loud: $ex")
  }

  test("streamingRealizedVol on a ratio that underflows to 0.0: the " +
      "return drops like the batch plan's NULL log, no crash") {
    // batch: Spark log(0.0) = NULL -> the return is filtered out but
    // the row still serves as the next return's lag; the fold must
    // replicate that, not throw from multiplyExact(Long.MinValue, ...)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    val ups = Seq(
      Update("uf", t0, 0L, is_trade = true, is_bid = true, 1.0e300, 1.0),
      Update("uf", t0 + 1, 1L, is_trade = true, is_bid = true,
        1.0e-300, 1.0), // ratio 1e-600 -> 0.0: return drops
      Update("uf", t0 + 2, 2L, is_trade = true, is_bid = true, 2.0e-300,
        1.0), // ln(2) vs the DROPPED row's price — it is still the lag
      Update("uf", t0 + 120000, 9L, is_trade = true, is_bid = true, 1.0,
        1.0)) // next bucket: closes the first
    val want = graft.operators.Microstructure
      .realizedVol(updatesDf(ups))
      .where(col("start") === t0 / 1000 / 60 * 60)
      .select("n_returns", "sum_sq_q").head()
    assert(want.getLong(0) === 1L) // only the ln(2) return survives
    val in = MemoryStream[Update]
    val q = graft.streaming.Streaming.streamingRealizedVol(in.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("ufrv").start()
    in.addData(ups: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ufrv")
      .select("n_returns", "sum_sq_q").head()
    assert((got.getLong(0), got.getLong(1)) ===
      ((want.getLong(0), want.getLong(1))),
      "streamed bucket diverges from batch on the underflow ratio")
  }

  // --------------------------------------------------------- twap quote

  test("twapQuote at the cents bound: exact vs BigInt scalar replay") {
    // price 9.999e9 → cents 999,900,000,000: the last magnitude the
    // documented decimal(12,0) operand holds (1e12 itself raises the
    // ANSI decimal cast — loud, as the audit demands); durations fill
    // the whole 60 s bucket, so Σ dur·cents approaches the width·cents
    // ceiling (~6e16) the Scaladoc names
    val t0 = 1700000000000L
    val bucketStart = (t0 / 1000 / 60) * 60
    val startMs = bucketStart * 1000
    val ups = Seq(
      Update("b", startMs, 0L, is_trade = false, is_bid = true,
        9.999e9, 5.0),
      Update("b", startMs + 20000, 1L, is_trade = false, is_bid = true,
        9.998e9, 5.0),
      Update("b", startMs + 70000, 2L, is_trade = false, is_bid = true,
        1.0, 5.0)) // next bucket: clips event 2 at its bucket end
    def cents(p: Double): Long = math.floor(p * 100d + 0.5d).toLong
    val durs = Seq(20000L, 40000L) // event 1 clipped at bucket end
    val wq = durs.zip(ups.take(2).map(u => BigInt(cents(u.price))))
      .map { case (d, c) => BigInt(d) * c }.sum
    val wantTwap = (wq.toDouble / durs.sum.toDouble) / 100.0d
    val row = graft.operators.Microstructure.twapQuote(updatesDf(ups))
      .where(col("start") === bucketStart).head()
    assert(row.getAs[Long]("dur_ms") === durs.sum)
    assert(row.getAs[Double]("twap") === wantTwap,
      "twap diverged from the BigInt scalar replay")
    // one order of magnitude past the edge: cents = 1e12 no longer fits
    // decimal(12,0) — the ANSI cast raises (loud), never truncates
    val beyond = ups.map(u => u.copy(price = u.price * 10.0))
    intercept[Exception] {
      graft.operators.Microstructure.twapQuote(updatesDf(beyond)).collect()
    }
  }

  // ------------------------------------------------------- char entropy

  test("charEntropy with a 300k-char skewed doc: exact vs BigInt replay") {
    // the Scaladoc's c ~ 3e5 zone where a 64-bit c·lnQ product family
    // would wrap: one dominant char + a rare tail
    val text = "a" * 299999 + "b"
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val counts = Map('a' -> 299999L, 'b' -> 1L)
    val n = counts.values.sum
    val s = counts.values.map(c =>
      BigInt(c) * BigInt(lnQ12(c.toDouble / n.toDouble))).sum
    val want = -s.toDouble / 1e12 / n.toDouble
    val row = graft.ext.TextOps.charEntropy(df).head()
    assert(row.getAs[Long]("n_chars") === n)
    assert(row.getAs[Double]("entropy") === want,
      "entropy diverged from the BigInt scalar replay")
  }

  // ------------------------------------------------------- source drift

  test("sourceDrift with a 200k-count word: exact vs BigInt replay") {
    // c_sw = 2e5 with |Δq| ~ 0.7e12 puts the c_sw·Δq product at ~1.4e17
    // — far past any 32-bit path and big enough that a precision-lossy
    // plan shows; the decimal(36,0) sum must equal the BigInt replay
    val big = ("x " * 200000).trim
    val df = Seq((1L, "a", big), (2L, "b", "x y")).toDF(
      "doc_id", "source", "text")
    def drift(csw: Map[String, Long], ns: Long, cw: Map[String, Long],
        nc: Long): BigInt =
      csw.map { case (w, c) =>
        val qs = lnQ12(c.toDouble / ns.toDouble)
        val qc = lnQ12(cw(w).toDouble / nc.toDouble)
        BigInt(c) * BigInt(qs - qc)
      }.sum
    val cw = Map("x" -> 200001L, "y" -> 1L)
    val wantA = drift(Map("x" -> 200000L), 200000L, cw, 200002L)
    val klA = (wantA.toDouble / 1e12) / 200000.0d
    val row = graft.ext.TextOps.sourceDrift(df)
      .where(col("source") === "a").head()
    assert(row.getAs[Long]("n_tokens") === 200000L)
    assert(row.getAs[Double]("kl_nats") === klA,
      "sourceDrift diverged from the BigInt scalar replay")
  }

  // ----------------------------------------------------------- LM sums

  test("bigramLogProb decimal sum on a 100k-bigram doc: exact vs BigInt") {
    // one long doc: per-doc Σ q_lnp reaches ~1e17-1e18 territory (1e5
    // bigrams · |q| ~ 1e12) — asserts the decimal(38,0) per-doc sum and
    // the final double division replay the scalar bit-for-bit
    val words = (0 until 100001).map(i => s"w${i % 50}")
    val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val lambda = 0.9
    val pairs = words.sliding(2).map { case Seq(a, b) => (a, b) }.toSeq
    val uni = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c12 = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nTotal = words.size.toLong
    val sum = pairs.map { case (a, b) =>
      val p = lambda * c12((a, b)).toDouble / uni(a).toDouble +
        (1.0 - lambda) * uni(b).toDouble / nTotal.toDouble
      BigInt(lnQ12(p))
    }.sum
    val want = sum.toDouble / 1e12 / pairs.size.toDouble
    val row = graft.ext.TextOps.bigramLogProb(df, lambda).head()
    assert(row.getAs[Long]("n_bigrams") === pairs.size.toLong)
    assert(row.getAs[Double]("avg_logprob") === want,
      "LM sum diverged from the BigInt scalar replay")
  }

  // -------------------------------------------------- Roll's estimator

  /** Alternating 0 ↔ p trades: every cents delta is ±c, every
    * cross-product −c², so sum_xy ≈ −n·c² — the fastest route to the
    * BIGINT emission bound. */
  private def rollTrades(n: Int, p: Double): Seq[Update] =
    (0 until n).map { i =>
      Update("ovf", 1700000000000L + i, i.toLong, is_trade = true,
        is_bid = true, if (i % 2 == 0) 0.0 else p, 1.0)
    }

  private def rollScalar(prices: Seq[Double]): (BigInt, BigInt, BigInt) = {
    val cs = prices.map(p => BigInt(math.floor(p * 100.0 + 0.5).toLong))
    val xs = cs.sliding(3).toSeq.collect { case Seq(c2, c1, c0) =>
      (c0 - c1, c1 - c2) }
    (xs.map(_._1).sum, xs.map(_._2).sum,
      xs.map { case (x, y) => x * y }.sum)
  }

  test("rollSpread at the BIGINT emission bound: exact below, loud above") {
    // c = 9e8 cents (p = $9e6): c² = 8.1e17 — 11 pairs ≈ 8.9e18 < 2^63,
    // 12 pairs ≈ 9.7e18 cross it. Below: must equal the BigInt scalar
    // replay exactly (a wrap differs by 2^64); above: guarded raise,
    // where the DuckDB twin's CAST(HUGEINT AS BIGINT) errors.
    val ups13 = rollTrades(13, 9.0e6) // 11 pairs
    val (sx, sy, sxy) = rollScalar(ups13.map(_.price))
    assert(sxy.abs < BigInt(Long.MaxValue) &&
      sxy.abs > BigInt(Long.MaxValue) * 8 / 10, s"fixture broke: $sxy")
    val row = graft.operators.Microstructure.rollSpread(updatesDf(ups13))
      .select("n_pairs", "sum_x", "sum_y", "sum_xy").head()
    assert(row.getLong(0) === 11L)
    assert((BigInt(row.getLong(1)), BigInt(row.getLong(2)),
      BigInt(row.getLong(3))) === ((sx, sy, sxy)), "silent wrap below bound")
    val ups14 = rollTrades(14, 9.0e6) // 12 pairs, |sum_xy| > 2^63
    assert(rollScalar(ups14.map(_.price))._3.abs > BigInt(Long.MaxValue))
    val ex = intercept[Exception] {
      graft.operators.Microstructure.rollSpread(updatesDf(ups14)).collect()
    }
    assert(msgs(ex).exists(_.contains("overflows BIGINT")),
      s"wrong failure: ${msgs(ex).mkString(" | ")}")
  }

  test("rollSpread past the exact-decimal delta regime: loud raise") {
    // p = $2e10 -> |delta| = 2e12 cents > the 1e12 guard — past it the
    // decimal(13,0) operand cast would go silently null where the
    // DuckDB twin's HUGEINT keeps counting
    val ex = intercept[Exception] {
      graft.operators.Microstructure.rollSpread(
        updatesDf(rollTrades(6, 2.0e10))).collect()
    }
    assert(msgs(ex).exists(_.contains("exact-decimal regime")),
      s"wrong failure: ${msgs(ex).mkString(" | ")}")
  }

  test("streamingRollSpread fold: exact at the bound, throws past it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // 11 pairs + a far-future trade to close the bucket: the emitted
    // bucket must carry the same exact sums as the batch op
    val base = rollTrades(13, 9.0e6)
    val closer = Update("ovf", 1700000000000L + 7200L * 1000, 999L,
      is_trade = true, is_bid = true, 9.0e6, 1.0)
    val (sx, sy, sxy) = rollScalar(base.map(_.price))
    val in = MemoryStream[Update]
    val q = graft.streaming.Streaming.streamingRollSpread(in.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("srsp_ovf").start()
    in.addData(base: _*); q.processAllAvailable()
    in.addData(closer); q.processAllAvailable()
    q.stop()
    val rows = spark.table("srsp_ovf")
      .as[graft.streaming.Streaming.RollSprBucket].collect()
    assert(rows.length === 1)
    assert((BigInt(rows.head.sum_x), BigInt(rows.head.sum_y),
      BigInt(rows.head.sum_xy)) === ((sx, sy, sxy)),
      "streaming fold diverged from the scalar replay at the bound")
    // 12 pairs: Math.addExact must throw (ArithmeticException surfaces
    // as a stream failure), never wrap
    val in2 = MemoryStream[Update]
    val q2 = graft.streaming.Streaming.streamingRollSpread(in2.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("srsp_ovf2").start()
    in2.addData(rollTrades(14, 9.0e6): _*)
    val ex = intercept[Exception] { q2.processAllAvailable() }
    try q2.stop() catch { case _: Throwable => () }
    assert(msgs(ex).exists(m => m.contains("long overflow") ||
      m.contains("ArithmeticException")),
      s"wrong failure: ${msgs(ex).mkString(" | ")}")
  }

  // ------------------------------------------------------ Kyle's lambda

  test("kyleLambda guards: cents and signed-flow bounds raise loud") {
    // quote at $2e10 -> cents 2e12 > the 1e12 guard
    val quoteBreach = Seq(
      Update("kg", 1700000000000L, 0L, is_trade = false, is_bid = true,
        2.0e10, 1.0))
    val ex1 = intercept[Exception] {
      graft.operators.Microstructure.kyleLambda(updatesDf(quoteBreach))
        .collect()
    }
    assert(msgs(ex1).exists(_.contains("price outside")),
      s"wrong failure: ${msgs(ex1).mkString(" | ")}")
    // flow of 2e11 units > the 1e11 guard, planted in the SECOND bucket
    // so the pair survives the `dm IS NOT NULL` filter and actually
    // reaches the operand guard (the first bucket of a symbol never
    // forms a pair — its breach would be invisible)
    val t0 = 1700000000000L
    val flowBreach = Seq(
      Update("kf", t0, 0L, is_trade = false, is_bid = true, 10.0, 1.0),
      Update("kf", t0 + 1, 1L, is_trade = false, is_bid = false, 11.0, 1.0),
      Update("kf", t0 + 2, 2L, is_trade = true, is_bid = true, 10.0, 1.0),
      Update("kf", t0 + 60001L, 3L, is_trade = true, is_bid = true,
        11.0, 2.0e11))
    val ex2 = intercept[Exception] {
      graft.operators.Microstructure.kyleLambda(updatesDf(flowBreach))
        .collect()
    }
    assert(msgs(ex2).exists(_.contains("signed flow outside")),
      s"wrong failure: ${msgs(ex2).mkString(" | ")}")
  }

  private def msgs(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(e =>
      Option(e.getMessage).toSeq ++ msgs(e.getCause))

  // ------------------------------------------- events family (value_q)

  test("events value_q at the bounds: exact below 2^63, loud above; " +
      "corrupt values raise, never silently floor (VERDICT r11 #2)") {
    // the quantized value sum behind sessionize/abTest/rfm and the
    // streaming sessionize twin, driven at each documented bound
    import graft.operators.EventAnalytics
    def eventsOf(rows: Seq[(Long, Long, Long, String, Double)]) =
      rows.toDF("event_id", "us", "user_id", "event_type", "value")
        .withColumn("ts", timestamp_micros(col("us")))
        .select("event_id", "ts", "user_id", "event_type", "value")
    // 9,000 summands of exactly 1e15 (value = 1e9 sits AT the summand
    // bound; 1e9·1e6 = 1e15 is dyadic-exact): the session sum 9e18 is
    // still a long and must equal the BigInt replay exactly — a silent
    // 64-bit wrap would differ by 2^64
    val below = eventsOf((0 until 9000).map(i =>
      (i.toLong, i.toLong, 1L, "view", 1.0e9)))
    val row = EventAnalytics.sessionize(below).head()
    assert(row.getAs[Long]("n_events") === 9000L)
    assert(BigInt(row.getAs[Long]("value_q")) ===
      BigInt(9000) * BigInt(1000000000000000L),
      "silent wrap below the bound")
    // 10,000 summands: 1e19 > 2^63 — the guarded BIGINT emission must
    // raise exactly where the twin's CAST(HUGEINT AS BIGINT) errors
    val above = eventsOf((0 until 10000).map(i =>
      (i.toLong, i.toLong, 1L, "view", 1.0e9)))
    val ex1 = intercept[Exception] {
      EventAnalytics.sessionize(above).collect()
    }
    assert(msgs(ex1).exists(_.contains("value_q sum overflows BIGINT")),
      s"wrong failure: ${msgs(ex1).mkString(" | ")}")
    // a quantized summand past 1e15 (value = 2e9): raise, never let the
    // non-ANSI double->long floor clamp silently
    val summandBreach = eventsOf(Seq((1L, 0L, 2L, "view", 2.0e9)))
    val ex2 = intercept[Exception] {
      EventAnalytics.sessionize(summandBreach).collect()
    }
    assert(msgs(ex2).exists(_.contains("exact-decimal regime")),
      s"wrong failure: ${msgs(ex2).mkString(" | ")}")
    // a NaN value: raise loud — Spark's floor(NaN) is silently 0 while
    // the DuckDB twins' CAST(NaN AS BIGINT) errors; ±inf rides the same
    // NaN-greatest guard
    Seq(Double.NaN, Double.PositiveInfinity).foreach { v =>
      val ex3 = intercept[Exception] {
        EventAnalytics.sessionize(
          eventsOf(Seq((1L, 0L, 3L, "view", v)))).collect()
      }
      assert(msgs(ex3).exists(_.contains("non-finite event value")),
        s"wrong failure for $v: ${msgs(ex3).mkString(" | ")}")
    }
    // rfm and abTest share the same guarded sum: spot the emission
    // bound through each aggregation shape
    val ex4 = intercept[Exception] {
      EventAnalytics.rfm(above).collect()
    }
    assert(msgs(ex4).exists(_.contains("value_q sum overflows BIGINT")),
      s"wrong failure: ${msgs(ex4).mkString(" | ")}")
    val ex5 = intercept[Exception] {
      EventAnalytics.abTest(above).collect()
    }
    assert(msgs(ex5).exists(_.contains("value_q sum overflows BIGINT")),
      s"wrong failure: ${msgs(ex5).mkString(" | ")}")
  }

  // ------------------------------------ one quantized-return bound

  test("the 1e9 quantized-return bound has ONE definition: no " +
      "estimator re-spells the literal (VERDICT r15 #4)") {
    // every 1e6-quantized log-return guard must compare against
    // Microstructure.QuantizedReturnBound — a re-spelled literal is
    // how a future estimator drifts to a different bound than its
    // DuckDB twin. Source-level lint: no comparison against the raw
    // literal anywhere in main (the definition site uses `=`, and
    // fixed-point SCALE factors multiply/divide, never compare).
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    assert(java.nio.file.Files.isDirectory(root),
      s"lint expects to run from the repo root, cwd=${
        System.getProperty("user.dir")}")
    val cmp = java.util.regex.Pattern
      .compile("[><]=?\\s*1_?000_?000_?000L")
    val offenders = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        java.nio.file.Files.readAllLines(p).asScala.zipWithIndex
          .collect { case (l, i) if cmp.matcher(l).find() =>
            s"$p:${i + 1}: $l" }
      }.toList
    assert(offenders.isEmpty,
      "re-spelled quantized-return bound (use " +
        s"Microstructure.QuantizedReturnBound):\n${
          offenders.mkString("\n")}")
  }

  // --------------------------------------- randomized magnitude sweep

  test("realizedVol random log-uniform price sweep: always exact or loud") {
    // prices sampled log-uniformly across the full double exponent range
    // — every case either matches the BigInt replay exactly or raises
    // the guarded-cast error; no third outcome exists
    val genPrices: Gen[List[Double]] = for {
      n <- Gen.choose(2, 12)
      es <- Gen.listOfN(n, Gen.choose(-300.0, 300.0))
    } yield es.map(e => math.pow(10.0, e))
    (0 until 12).foreach { i =>
      genPrices(Gen.Parameters.default, Seed(i.toLong)).foreach { ps =>
        val ups = ps.zipWithIndex.map { case (p, j) =>
          Update("r", 1700000000000L + j, j.toLong, is_trade = true,
            is_bid = true, p, 1.0)
        }
        val want = rvScalarSum(ps)
        if (want <= BigInt(Long.MaxValue)) {
          val got = graft.operators.Microstructure
            .realizedVol(updatesDf(ups)).select("sum_sq_q").head().getLong(0)
          assert(BigInt(got) === want, s"wrap on prices $ps")
        } else {
          val ex = intercept[Exception] {
            graft.operators.Microstructure.realizedVol(updatesDf(ups))
              .collect()
          }
          assert(ex != null)
        }
      }
    }
  }
}
