package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corwin–Schultz high-low spread estimation per (symbol, bucket) —
  * the range-based cousin of [[Microstructure.rollSpread]]: the
  * bid-ask spread inferred from the fact that bucket HIGHS are buys
  * and LOWS are sells, so the high-low ratio embeds the spread once
  * the variance component (which scales with time) is differenced out
  * across a 2-bucket span (Corwin & Schultz 2012, the standard
  * daily-data estimator, here at bucket cadence).
  *
  * Exactness contract (the estimator-wave stance):
  *  - per-bucket high/low are EXACT integer cents (round-half-up, the
  *    [[DecaySeries.emaClose]] quantization, finite-guarded loud);
  *  - each log range is floor-quantized: `rq = floor(ln(h/l)·1e8)`
  *    per bucket and `gq = floor(ln(max(h,h')/min(l,l'))·1e8)` per
  *    2-bucket span — the [[Microstructure.bucketReturns]] treatment
  *    of the one non-correctly-rounded libm call, with a loud
  *    |·| > 2e9 bound so the exact squares below stay under 2^63;
  *  - `beta_q = rq² + rq'²` and `gamma_q = gq²` are exact longs;
  *    `beta`/`gamma` are single divisions; `alpha` is a chain of
  *    correctly-rounded ops only (sqrt, -, /, with the √2-derived
  *    constants embedded as identical Scala-computed literals);
  *  - `spread = 2(e^α − 1)/(1 + e^α)` passes through `exp` (not
  *    correctly rounded), so it is floor-quantized to 1e8 before
  *    emission, the same stance as the log ranges.
  *
  * Scale shape: one (symbol, bucket) partial aggregation, one
  * per-symbol lag over the BUCKET series, then pure per-row
  * arithmetic. */
object RangeSpread {

  /** `3 − 2√2`, the Corwin–Schultz denominator, computed once here and
    * embedded as the identical literal in both engines. */
  private val Denom: Double = 3.0d - 2.0d * math.sqrt(2.0d)

  /** Loud bound on a quantized log range: 2e9 ≡ ln(ratio) > 20, an
    * intra-span high/low ratio past 4.8e8× — unphysical data fails
    * loud before `rq²` could exceed 2^63. */
  private val MaxRangeQ: Long = 2000000000L

  private def guardedRangeQ(c: Column, what: String,
      op: String = "corwinSchultz"): Column =
    when(abs(c) > MaxRangeQ,
      raise_error(concat(lit(s"$op: $what outside the " +
        "exact regime at symbol="), col("symbol"))).cast("long"))
      .otherwise(c)

  /** Per (symbol, bucket-pair) Corwin–Schultz estimate. Buckets with
    * a zero-cent low (sub-cent prices) cannot take the log-range and
    * are dropped, as is each symbol's first bucket (no prior span).
    * `spread` is the raw estimate (negative in bounce-dominated spans
    * — the estimator's known small-sample behavior);
    * `spread_pos` clamps at 0, the authors' convention. */
  def corwinSchultz(updates: DataFrame, seconds: Long = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("symbol")).orderBy(col("start"))
    // exact integer cents, finite-guarded (the emaClose stance: NaN
    // floors to 0L silently under non-ANSI mode, so raise first)
    val cents = when(
      abs(floor(Microstructure.finitePrice * 100.0d + 0.5d)) > 1.0e12d,
      raise_error(concat(lit("corwinSchultz: price outside the " +
        "exact-decimal regime at symbol="), col("symbol"))).cast("long"))
      .otherwise(floor(Microstructure.finitePrice * 100.0d + 0.5d)
        .cast("long"))
    val hl = updates
      .where(col("is_trade") && col("price") > 0.0d)
      .groupBy(col("symbol"),
        graft.functions.timeBucket(graft.functions.tsSeconds(col("ts")),
          seconds).as("start"))
      .agg(max(cents).as("hc"), min(cents).as("lc"))
    val spans = hl
      .withColumn("hp", lag(col("hc"), 1).over(w))
      .withColumn("lp", lag(col("lc"), 1).over(w))
      .where(col("hp").isNotNull && col("lc") > 0L && col("lp") > 0L)
      .withColumn("rq", guardedRangeQ(
        floor(log(col("hc").cast("double") / col("lc").cast("double")) *
          1e8d).cast("long"), "log range"))
      .withColumn("rqp", guardedRangeQ(
        floor(log(col("hp").cast("double") / col("lp").cast("double")) *
          1e8d).cast("long"), "prior log range"))
      .withColumn("gq", guardedRangeQ(
        floor(log(greatest(col("hc"), col("hp")).cast("double") /
          least(col("lc"), col("lp")).cast("double")) * 1e8d)
          .cast("long"), "span log range"))
      .withColumn("beta_q", col("rq") * col("rq") + col("rqp") * col("rqp"))
      .withColumn("gamma_q", col("gq") * col("gq"))
    val beta = col("beta_q").cast("double") / 1e16d
    val gamma = col("gamma_q").cast("double") / 1e16d
    val alpha = (sqrt(lit(2.0d) * beta) - sqrt(beta)) / lit(Denom) -
      sqrt(gamma / lit(Denom))
    spans
      .withColumn("alpha", alpha)
      .withColumn("spread_q",
        floor(lit(2.0d) * (exp(col("alpha")) - lit(1.0d)) /
          (lit(1.0d) + exp(col("alpha"))) * 1e8d).cast("long"))
      .select(col("symbol"), col("start"), col("hc"), col("lc"),
        col("beta_q"), col("gamma_q"), col("alpha"), col("spread_q"),
        (col("spread_q").cast("double") / 1e8d).as("spread"),
        greatest(col("spread_q").cast("double") / 1e8d, lit(0.0d))
          .as("spread_pos"))
  }

  /** DuckDB twin of [[corwinSchultz]] — identical quantizations and
    * the same IEEE chain order. */
  def corwinSchultzSql(seconds: Long = 60): String =
    s"""SELECT symbol, start, hc, lc, beta_q, gamma_q, alpha, spread_q,
       | CAST(spread_q AS DOUBLE) / 1e8 AS spread,
       | greatest(CAST(spread_q AS DOUBLE) / 1e8, 0.0) AS spread_pos
       |FROM (
       | SELECT symbol, start, hc, lc, beta_q, gamma_q, alpha,
       |  CAST(floor(2.0 * (exp(alpha) - 1.0) / (1.0 + exp(alpha))
       |    * 1e8) AS BIGINT) AS spread_q
       | FROM (
       |  SELECT symbol, start, hc, lc, beta_q, gamma_q,
       |   (sqrt(2.0 * (CAST(beta_q AS DOUBLE) / 1e16))
       |     - sqrt(CAST(beta_q AS DOUBLE) / 1e16)) / $Denom
       |    - sqrt((CAST(gamma_q AS DOUBLE) / 1e16) / $Denom) AS alpha
       |  FROM (
       |   SELECT symbol, start, hc, lc,
       |    rq * rq + rqp * rqp AS beta_q, gq * gq AS gamma_q
       |   FROM (
       |    SELECT symbol, start, hc, lc,
       |     CAST(floor(ln(CAST(hc AS DOUBLE) / CAST(lc AS DOUBLE))
       |       * 1e8) AS BIGINT) AS rq,
       |     CAST(floor(ln(CAST(hp AS DOUBLE) / CAST(lp AS DOUBLE))
       |       * 1e8) AS BIGINT) AS rqp,
       |     CAST(floor(ln(CAST(greatest(hc, hp) AS DOUBLE)
       |       / CAST(least(lc, lp) AS DOUBLE)) * 1e8) AS BIGINT) AS gq
       |    FROM (
       |     SELECT symbol, start, hc, lc,
       |      lag(hc, 1) OVER wb AS hp, lag(lc, 1) OVER wb AS lp
       |     FROM (
       |      SELECT symbol, ((ts // 1000) // $seconds) * $seconds
       |        AS start,
       |       max(CAST(floor(price * 100.0 + 0.5) AS BIGINT)) AS hc,
       |       min(CAST(floor(price * 100.0 + 0.5) AS BIGINT)) AS lc
       |      FROM updates WHERE is_trade AND price > 0.0
       |      GROUP BY 1, 2)
       |     WINDOW wb AS (PARTITION BY symbol ORDER BY start))
       |    WHERE hp IS NOT NULL AND lc > 0 AND lp > 0))))
       |ORDER BY symbol, start""".stripMargin.replace('\n', ' ')

  /** `4·ln 2`, the Parkinson normalizer, computed once and embedded as
    * the identical literal in both engines. */
  private val FourLn2: Double = 4.0d * math.log(2.0d)

  /** `2·ln 2 − 1`, the Garman–Klass close-to-open weight, same
    * treatment. */
  private val TwoLn2M1: Double = 2.0d * math.log(2.0d) - 1.0d

  /** Per-(symbol, bucket) OHLC in exact integer cents — the shared
    * kernel of the range-volatility pair below: the
    * [[corwinSchultz]] round-half-up cents quantization
    * (finite-guarded loud), ordered open/close via `min_by`/`max_by`
    * over `(ts, seq)` (≡ the twins' ordered `first`/`last`). Buckets
    * whose LOW rounds to zero cents (sub-cent prices) cannot take a
    * log range and are dropped in both engines. */
  private def ohlcCents(updates: DataFrame, op: String,
      seconds: Long): DataFrame = {
    val cents = when(
      abs(floor(Microstructure.finitePrice * 100.0d + 0.5d)) > 1.0e12d,
      raise_error(concat(lit(s"$op: price outside the " +
        "exact-decimal regime at symbol="), col("symbol"))).cast("long"))
      .otherwise(floor(Microstructure.finitePrice * 100.0d + 0.5d)
        .cast("long"))
    val byTsSeq = struct(col("ts"), col("seq"))
    updates
      .where(col("is_trade") && col("price") > 0.0d)
      .groupBy(col("symbol"),
        graft.functions.timeBucket(graft.functions.tsSeconds(col("ts")),
          seconds).as("start"))
      .agg(
        min_by(cents, byTsSeq).as("oc"),
        max(cents).as("hc"),
        min(cents).as("lc"),
        max_by(cents, byTsSeq).as("cc"))
      .where(col("lc") > 0L)
  }

  /** The shared OHLC-cents kernel as SQL — the twin of [[ohlcCents]]. */
  private def ohlcCentsSql(seconds: Long): String =
    s"""SELECT symbol, ((ts // 1000) // $seconds) * $seconds AS start,
       | first(CAST(floor(price * 100.0 + 0.5) AS BIGINT)
       |   ORDER BY ts, seq) AS oc,
       | max(CAST(floor(price * 100.0 + 0.5) AS BIGINT)) AS hc,
       | min(CAST(floor(price * 100.0 + 0.5) AS BIGINT)) AS lc,
       | last(CAST(floor(price * 100.0 + 0.5) AS BIGINT)
       |   ORDER BY ts, seq) AS cc
       |FROM updates WHERE is_trade AND price > 0.0
       |GROUP BY 1, 2 HAVING min(CAST(floor(price * 100.0 + 0.5)
       |  AS BIGINT)) > 0""".stripMargin.replace('\n', ' ')

  /** Parkinson (1980) range volatility per symbol: `σ²_P =
    * Σ ln(h/l)² / (4·ln2 · n)` over the bucket OHLC series — the
    * classic high-low variance estimator, ~5× more efficient than
    * close-to-close at the same sample size.
    *
    * Exactness: each log range is the [[corwinSchultz]] quantization
    * `rq = floor(ln(hc/lc)·1e8)` with the loud 2e9 bound; `Σ rq²` runs
    * in decimal and emits through the raise-guarded BIGINT cast;
    * `park_var` is one cast + two divisions in identical textual order,
    * `park_vol` one correctly-rounded sqrt.
    *
    * Scale shape: one (symbol, bucket) partial aggregation, one
    * per-symbol hash aggregation. No window anywhere. */
  def parkinson(updates: DataFrame, seconds: Long = 60): DataFrame = {
    val rq = guardedRangeQ(
      floor(log(col("hc").cast("double") / col("lc").cast("double")) *
        1e8d).cast("long"), "log range", "parkinson")
    val g = when(abs(col("_s")) > lit(Long.MaxValue),
      raise_error(concat(lit("parkinson: sum_rq2 overflows BIGINT " +
        "at symbol="), col("symbol"))).cast("long"))
      .otherwise(col("_s").cast("long"))
    val pv = (col("sum_rq2").cast("double") / 1e16d) /
      (lit(FourLn2) * col("n_buckets").cast("double"))
    ohlcCents(updates, "parkinson", seconds)
      .withColumn("rq", rq)
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("rq").cast("decimal(31,0)") *
          col("rq").cast("decimal(31,0)")).as("_s"))
      .select(col("symbol"), col("n_buckets"), g.as("sum_rq2"))
      .withColumn("park_var", pv)
      .withColumn("park_vol", sqrt(pv))
  }

  /** DuckDB twin of [[parkinson]] — identical kernel, HUGEINT sum,
    * the same IEEE chain order. */
  def parkinsonSql(seconds: Long = 60): String =
    s"""SELECT symbol, n_buckets, sum_rq2,
       | (CAST(sum_rq2 AS DOUBLE) / 1e16)
       |  / ($FourLn2 * CAST(n_buckets AS DOUBLE)) AS park_var,
       | sqrt((CAST(sum_rq2 AS DOUBLE) / 1e16)
       |  / ($FourLn2 * CAST(n_buckets AS DOUBLE))) AS park_vol
       |FROM (
       | SELECT symbol, count(*) AS n_buckets,
       |  CAST(SUM(CAST(rq AS HUGEINT) * CAST(rq AS HUGEINT))
       |    AS BIGINT) AS sum_rq2
       | FROM (
       |  SELECT symbol, CAST(floor(ln(CAST(hc AS DOUBLE)
       |    / CAST(lc AS DOUBLE)) * 1e8) AS BIGINT) AS rq
       |  FROM (${ohlcCentsSql(seconds)}))
       | GROUP BY 1)
       |ORDER BY symbol""".stripMargin.replace('\n', ' ')

  /** Garman–Klass (1980) range volatility per symbol: `σ²_GK =
    * (Σ 0.5·ln(h/l)² − (2ln2−1)·ln(c/o)²) / n` over the bucket OHLC
    * series — the higher-efficiency OHLC estimator that differences
    * out the drift via the close-to-open term. `gk_var` can go
    * (slightly) negative in bounce-dominated samples; `gk_vol` clamps
    * at 0 before the sqrt, the standard convention.
    *
    * Exactness: `rq`/`cq` are the quantized log range and log return
    * (loud 2e9 bounds); both squared sums run in decimal with
    * raise-guarded BIGINT emission; the variance is one fixed IEEE
    * chain over the two exact integers. Buckets with a zero-cent open
    * are dropped (log domain) in both engines. */
  def garmanKlass(updates: DataFrame, seconds: Long = 60): DataFrame = {
    val rq = guardedRangeQ(
      floor(log(col("hc").cast("double") / col("lc").cast("double")) *
        1e8d).cast("long"), "log range", "garmanKlass")
    val cq = guardedRangeQ(
      floor(log(col("cc").cast("double") / col("oc").cast("double")) *
        1e8d).cast("long"), "log return", "garmanKlass")
    def g(c: Column, what: String): Column =
      when(abs(c) > lit(Long.MaxValue),
        raise_error(concat(lit(s"garmanKlass: $what overflows BIGINT " +
          "at symbol="), col("symbol"))).cast("long"))
        .otherwise(c.cast("long"))
    val gv = lit(0.5d) * (col("sum_rq2").cast("double") / 1e16d) /
      col("n_buckets").cast("double") -
      lit(TwoLn2M1) * (col("sum_cq2").cast("double") / 1e16d) /
      col("n_buckets").cast("double")
    ohlcCents(updates, "garmanKlass", seconds)
      .where(col("oc") > 0L)
      .withColumn("rq", rq)
      .withColumn("cq", cq)
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("rq").cast("decimal(31,0)") *
          col("rq").cast("decimal(31,0)")).as("_sr"),
        sum(col("cq").cast("decimal(31,0)") *
          col("cq").cast("decimal(31,0)")).as("_sc"))
      .select(col("symbol"), col("n_buckets"),
        g(col("_sr"), "sum_rq2").as("sum_rq2"),
        g(col("_sc"), "sum_cq2").as("sum_cq2"))
      .withColumn("gk_var", gv)
      .withColumn("gk_vol", sqrt(greatest(gv, lit(0.0d))))
  }

  /** Rogers–Satchell (1991) range volatility per symbol: `σ²_RS =
    * (1/n) Σ [ln(h/c)·ln(h/o) + ln(l/c)·ln(l/o)]` over the bucket
    * OHLC series — the drift-INDEPENDENT OHLC estimator ([[
    * garmanKlass]] assumes zero drift; RS does not, so it is the
    * right default on trending series).
    *
    * Exactness: the four log legs quantize like the family
    * (`floor(ln(ratio)·1e8)`, loud 2e9 bounds); each bucket term
    * `uq·vq + wq·xq` is an exact long (both products ≤ 4e18 under
    * the bound — and nonnegative: h ≥ c,o makes uq,vq ≥ 0 while
    * l ≤ c,o makes wq,xq ≤ 0, so the sum never cancels to negative);
    * `Σ term` runs in decimal with raise-guarded BIGINT emission;
    * `rs_var` is one cast + two divisions, `rs_vol` one
    * correctly-rounded sqrt. Buckets with a zero-cent open are
    * dropped (log domain), as in [[garmanKlass]].
    *
    * Scale shape: one (symbol, bucket) partial aggregation, one
    * per-symbol hash aggregation. No window anywhere. */
  def rogersSatchell(updates: DataFrame, seconds: Long = 60)
      : DataFrame = {
    def lq(a: Column, b: Column, what: String): Column =
      guardedRangeQ(
        floor(log(a.cast("double") / b.cast("double")) * 1e8d)
          .cast("long"), what, "rogersSatchell")
    val termQ =
      lq(col("hc"), col("cc"), "high/close leg") *
        lq(col("hc"), col("oc"), "high/open leg") +
      lq(col("lc"), col("cc"), "low/close leg") *
        lq(col("lc"), col("oc"), "low/open leg")
    val g = when(abs(col("_s")) > lit(Long.MaxValue),
      raise_error(concat(lit("rogersSatchell: sum_term overflows " +
        "BIGINT at symbol="), col("symbol"))).cast("long"))
      .otherwise(col("_s").cast("long"))
    val rv = (col("sum_term").cast("double") / 1e16d) /
      col("n_buckets").cast("double")
    ohlcCents(updates, "rogersSatchell", seconds)
      .where(col("oc") > 0L)
      .withColumn("term_q", termQ)
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("term_q").cast("decimal(38,0)")).as("_s"))
      .select(col("symbol"), col("n_buckets"), g.as("sum_term"))
      .withColumn("rs_var", rv)
      .withColumn("rs_vol", sqrt(rv))
  }

  /** DuckDB twin of [[rogersSatchell]] — identical kernel, HUGEINT
    * sum, the same IEEE chain order. */
  def rogersSatchellSql(seconds: Long = 60): String =
    s"""SELECT symbol, n_buckets, sum_term,
       | (CAST(sum_term AS DOUBLE) / 1e16)
       |  / CAST(n_buckets AS DOUBLE) AS rs_var,
       | sqrt((CAST(sum_term AS DOUBLE) / 1e16)
       |  / CAST(n_buckets AS DOUBLE)) AS rs_vol
       |FROM (
       | SELECT symbol, count(*) AS n_buckets,
       |  CAST(SUM(CAST(uq AS HUGEINT) * CAST(vq AS HUGEINT)
       |    + CAST(wq AS HUGEINT) * CAST(xq AS HUGEINT)) AS BIGINT)
       |   AS sum_term
       | FROM (
       |  SELECT symbol,
       |   CAST(floor(ln(CAST(hc AS DOUBLE) / CAST(cc AS DOUBLE))
       |     * 1e8) AS BIGINT) AS uq,
       |   CAST(floor(ln(CAST(hc AS DOUBLE) / CAST(oc AS DOUBLE))
       |     * 1e8) AS BIGINT) AS vq,
       |   CAST(floor(ln(CAST(lc AS DOUBLE) / CAST(cc AS DOUBLE))
       |     * 1e8) AS BIGINT) AS wq,
       |   CAST(floor(ln(CAST(lc AS DOUBLE) / CAST(oc AS DOUBLE))
       |     * 1e8) AS BIGINT) AS xq
       |  FROM (${ohlcCentsSql(seconds)}) WHERE oc > 0)
       | GROUP BY 1)
       |ORDER BY symbol""".stripMargin.replace('\n', ' ')

  /** Yang–Zhang (2000) volatility per symbol: `σ²_YZ = σ²_o + k·σ²_c
    * + (1−k)·σ²_RS` over the bucket OHLC series — the
    * minimum-variance OHLC estimator combining the overnight
    * (close→next open) variance, the open→close variance, and the
    * drift-independent [[rogersSatchell]] term, with
    * `k = 0.34 / (1.34 + (n+1)/(n−1))`.
    *
    * Exactness: the overnight leg `oq = floor(ln(o_b/c_{b−1})·1e8)`
    * and intraday leg `cq = floor(ln(c/o)·1e8)` quantize like the
    * family (loud 2e9 bounds); the linear sums (`Σoq`, `Σcq`,
    * `Σrs_term`) are exact decimal with raise-guarded BIGINT
    * emission, while the SQUARE sums can legitimately exceed 2^63
    * (a 2e9-bounded leg squares to 4e18 — a handful of wild
    * overnight gaps is enough) and emit through ONE decimal→double
    * cast, correctly rounded over the same exact int128 in both
    * engines (the jumpTest Σm⁴ stance); each
    * sample variance is the textbook `(Σq² − (Σq)²/n)/(n−1)` spelled
    * as one fixed IEEE chain over the exact operands. Null without a
    * two-sided sample (n ≤ 1). The first bucket per symbol has no
    * prior close and is excluded from ALL terms (the estimator's
    * jointly-indexed sample).
    *
    * Scale shape: one (symbol, bucket) partial aggregation, ONE
    * per-symbol lag over the bucket series, one hash aggregation. */
  def yangZhang(updates: DataFrame, seconds: Long = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("symbol")).orderBy(col("start"))
    def lq(a: Column, b: Column, what: String): Column =
      guardedRangeQ(
        floor(log(a.cast("double") / b.cast("double")) * 1e8d)
          .cast("long"), what, "yangZhang")
    def g(c: Column, what: String): Column =
      when(abs(c) > lit(Long.MaxValue),
        raise_error(concat(lit(s"yangZhang: $what overflows BIGINT " +
          "at symbol="), col("symbol"))).cast("long"))
        .otherwise(c.cast("long"))
    val nD = col("n").cast("double")
    def sampleVar(sumQ: Column, sumQ2: Column): Column =
      (sumQ2 / 1e16d -
        (sumQ.cast("double") / 1e8d) * (sumQ.cast("double") / 1e8d) /
          nD) / (nD - lit(1.0d))
    val k = lit(0.34d) /
      (lit(1.34d) + (nD + lit(1.0d)) / (nD - lit(1.0d)))
    val rsv = (col("sum_rs").cast("double") / 1e16d) / nD
    val yz = sampleVar(col("sum_oq"), col("sum_oq2")) +
      k * sampleVar(col("sum_cq"), col("sum_cq2")) +
      (lit(1.0d) - k) * rsv
    ohlcCents(updates, "yangZhang", seconds)
      .where(col("oc") > 0L)
      .withColumn("pc", lag(col("cc"), 1).over(w))
      .where(col("pc").isNotNull && col("pc") > 0L)
      .withColumn("oq", lq(col("oc"), col("pc"), "overnight leg"))
      .withColumn("cq", lq(col("cc"), col("oc"), "open-close leg"))
      .withColumn("rs_q",
        lq(col("hc"), col("cc"), "high/close leg") *
          lq(col("hc"), col("oc"), "high/open leg") +
        lq(col("lc"), col("cc"), "low/close leg") *
          lq(col("lc"), col("oc"), "low/open leg"))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n"),
        sum(col("oq").cast("decimal(38,0)")).as("_so"),
        sum(col("oq").cast("decimal(19,0)") *
          col("oq").cast("decimal(19,0)")).as("_so2"),
        sum(col("cq").cast("decimal(38,0)")).as("_sc"),
        sum(col("cq").cast("decimal(19,0)") *
          col("cq").cast("decimal(19,0)")).as("_sc2"),
        sum(col("rs_q").cast("decimal(38,0)")).as("_sr"))
      .select({
        // every leg is non-null past the pc filter, so with n ≥ 1 a
        // null square-sum can ONLY be the decimal(38,0) sum
        // overflowing (non-ANSI → null) — raise loud instead of
        // silently nulling yz_var (the DuckDB twin's HUGEINT sum
        // errors loudly past int128; the jumpTest Σm⁴ stance)
        def gd(c: Column, what: String): Column =
          when(col("n") >= 1L && c.isNull,
            raise_error(concat(lit(s"yangZhang: $what outside the " +
              "exact decimal regime at symbol="), col("symbol")))
              .cast("double"))
            .otherwise(c.cast("double"))
        Seq(col("symbol"), col("n"),
          g(col("_so"), "sum_oq").as("sum_oq"),
          gd(col("_so2"), "sum_oq2").as("sum_oq2"),
          g(col("_sc"), "sum_cq").as("sum_cq"),
          gd(col("_sc2"), "sum_cq2").as("sum_cq2"),
          g(col("_sr"), "sum_rs").as("sum_rs"))
      }: _*)
      .withColumn("yz_var", when(col("n") > 1L, yz))
      .withColumn("yz_vol",
        when(col("n") > 1L, sqrt(greatest(yz, lit(0.0d)))))
  }

  /** DuckDB twin of [[yangZhang]] — identical kernel, lag, HUGEINT
    * sums, and IEEE chain order. */
  def yangZhangSql(seconds: Long = 60): String = {
    def sv(q: String, q2: String) =
      s"($q2 / 1e16 - (CAST($q AS DOUBLE) / 1e8)" +
        s" * (CAST($q AS DOUBLE) / 1e8)" +
        " / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)"
    val k = "0.34 / (1.34 + (CAST(n AS DOUBLE) + 1.0)" +
      " / (CAST(n AS DOUBLE) - 1.0))"
    val rsv = "(CAST(sum_rs AS DOUBLE) / 1e16) / CAST(n AS DOUBLE)"
    val yz = s"${sv("sum_oq", "sum_oq2")} + ($k) * " +
      s"${sv("sum_cq", "sum_cq2")} + (1.0 - ($k)) * $rsv"
    s"""SELECT symbol, n, sum_oq, sum_oq2, sum_cq, sum_cq2, sum_rs,
       | CASE WHEN n > 1 THEN $yz END AS yz_var,
       | CASE WHEN n > 1 THEN sqrt(greatest($yz, 0.0)) END AS yz_vol
       |FROM (
       | SELECT symbol, count(*) AS n,
       |  CAST(SUM(CAST(oq AS HUGEINT)) AS BIGINT) AS sum_oq,
       |  CAST(SUM(CAST(oq AS HUGEINT) * CAST(oq AS HUGEINT))
       |    AS DOUBLE) AS sum_oq2,
       |  CAST(SUM(CAST(cq AS HUGEINT)) AS BIGINT) AS sum_cq,
       |  CAST(SUM(CAST(cq AS HUGEINT) * CAST(cq AS HUGEINT))
       |    AS DOUBLE) AS sum_cq2,
       |  CAST(SUM(CAST(rs_q AS HUGEINT)) AS BIGINT) AS sum_rs
       | FROM (
       |  SELECT symbol,
       |   CAST(floor(ln(CAST(oc AS DOUBLE) / CAST(pc AS DOUBLE))
       |     * 1e8) AS BIGINT) AS oq,
       |   CAST(floor(ln(CAST(cc AS DOUBLE) / CAST(oc AS DOUBLE))
       |     * 1e8) AS BIGINT) AS cq,
       |   CAST(floor(ln(CAST(hc AS DOUBLE) / CAST(cc AS DOUBLE))
       |     * 1e8) AS BIGINT)
       |    * CAST(floor(ln(CAST(hc AS DOUBLE) / CAST(oc AS DOUBLE))
       |     * 1e8) AS BIGINT)
       |   + CAST(floor(ln(CAST(lc AS DOUBLE) / CAST(cc AS DOUBLE))
       |     * 1e8) AS BIGINT)
       |    * CAST(floor(ln(CAST(lc AS DOUBLE) / CAST(oc AS DOUBLE))
       |     * 1e8) AS BIGINT) AS rs_q
       |  FROM (
       |   SELECT symbol, start, oc, hc, lc, cc,
       |    lag(cc, 1) OVER (PARTITION BY symbol ORDER BY start) AS pc
       |   FROM (${ohlcCentsSql(seconds)}) WHERE oc > 0)
       |  WHERE pc IS NOT NULL AND pc > 0)
       | GROUP BY 1)
       |ORDER BY symbol""".stripMargin.replace('\n', ' ')
  }

  /** DuckDB twin of [[garmanKlass]] — identical kernel and chain. */
  def garmanKlassSql(seconds: Long = 60): String =
    s"""SELECT symbol, n_buckets, sum_rq2, sum_cq2,
       | 0.5 * (CAST(sum_rq2 AS DOUBLE) / 1e16)
       |   / CAST(n_buckets AS DOUBLE)
       |  - $TwoLn2M1 * (CAST(sum_cq2 AS DOUBLE) / 1e16)
       |   / CAST(n_buckets AS DOUBLE) AS gk_var,
       | sqrt(greatest(
       |  0.5 * (CAST(sum_rq2 AS DOUBLE) / 1e16)
       |    / CAST(n_buckets AS DOUBLE)
       |   - $TwoLn2M1 * (CAST(sum_cq2 AS DOUBLE) / 1e16)
       |    / CAST(n_buckets AS DOUBLE), 0.0)) AS gk_vol
       |FROM (
       | SELECT symbol, count(*) AS n_buckets,
       |  CAST(SUM(CAST(rq AS HUGEINT) * CAST(rq AS HUGEINT))
       |    AS BIGINT) AS sum_rq2,
       |  CAST(SUM(CAST(cq AS HUGEINT) * CAST(cq AS HUGEINT))
       |    AS BIGINT) AS sum_cq2
       | FROM (
       |  SELECT symbol,
       |   CAST(floor(ln(CAST(hc AS DOUBLE) / CAST(lc AS DOUBLE))
       |     * 1e8) AS BIGINT) AS rq,
       |   CAST(floor(ln(CAST(cc AS DOUBLE) / CAST(oc AS DOUBLE))
       |     * 1e8) AS BIGINT) AS cq
       |  FROM (${ohlcCentsSql(seconds)}) WHERE oc > 0)
       | GROUP BY 1)
       |ORDER BY symbol""".stripMargin.replace('\n', ' ')
}
