package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Return-dynamics estimators over the shared
  * [[Microstructure.bucketReturns]] kernel — the second wave of
  * beyond-reference consumer analytics downstream of the reference's
  * candle surface (`crates/tdb-core/src/postprocessing/candle`):
  * realized-vs-bipower jump decomposition, the multi-lag return
  * autocorrelation function, and the aggregated-variance Hurst
  * exponent.
  *
  * All three follow the estimator-wave contract established by
  * [[Microstructure.varianceRatio]]:
  *  - returns are the exact integers `q = floor(ln(close_b/close_{b-1})
  *    * 1e6)` (loud |q| > 1e9 guard inherited from the kernel);
  *  - every cross-engine sum runs in decimal/HUGEINT and is emitted as
  *    a raise-guarded BIGINT (past 2^63 both engines error loud);
  *  - each derived double is one short IEEE chain (+,-,*,/ and the
  *    correctly-rounded sqrt) over identically-derived operands, so
  *    the DuckDB twins match bit-for-bit with no tolerance. Where a
  *    non-correctly-rounded libm call is unavoidable (`ln` of a
  *    computed variance in [[hurst]]) the output is floor-quantized to
  *    1e8 first — the [[Microstructure.bucketReturns]] stance.
  *
  * Scale shape, identical for all three: one (symbol, bucket) partial
  * aggregation, per-symbol ordered windows over the BUCKET series
  * (time-bounded — buckets/symbol, not events/symbol), one per-symbol
  * hash aggregation. No event-axis window anywhere. */
object ReturnDynamics {

  /** π/2 = µ₁⁻² for the bipower scaling, the closest double, embedded
    * as the same literal in both engines. */
  private val HalfPi: Double = 1.5707963267948966d

  private def guardedLong(op: String)(c: Column, what: String): Column =
    when(abs(c) > lit(Long.MaxValue),
      raise_error(concat(lit(s"$op: $what overflows BIGINT at symbol="),
        col("symbol"))).cast("long"))
      .otherwise(c.cast("long"))

  /** Barndorff-Nielsen–Shephard jump decomposition per symbol:
    * realized variance `RV = Σ q²` against bipower variation
    * `BV = (π/2)·Σ|q_b||q_{b-1}|` over consecutive PRESENT-bucket
    * return pairs; `jump = max(RV − BV, 0)` and
    * `jump_ratio = jump / RV` (null when RV = 0). A diffusive price
    * path has RV ≈ BV; discontinuities load RV only — the standard
    * jump-activity diagnostic at bucket cadence.
    *
    * `q² ≤ 1e18` and `|q·q'| ≤ 1e18` each fit a long; the SUMS run in
    * decimal(31,0) and emit through the raise-guarded BIGINT cast
    * (OverflowAuditSpec drives the bound). RV/BV are then one
    * cast + division + multiplication each, in the same textual order
    * as the twin. */
  def bipowerVar(updates: DataFrame, seconds: Long = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("symbol")).orderBy(col("start"))
    val g = guardedLong("bipowerVar") _
    val qDec = col("q").cast("decimal(15,0)")
    val qpDec = col("qp").cast("decimal(15,0)")
    val rv = col("sum_q2").cast("double") / 1e12d
    val bv = lit(HalfPi) * (col("sum_bp").cast("double") / 1e12d)
    Microstructure.bucketReturns(updates, seconds)
      .withColumn("qp", lag(col("q"), 1).over(w))
      .groupBy(col("symbol"))
      .agg(
        count(col("q")).as("n_rets"),
        sum(qDec * qDec).as("_rv"),
        count(col("qp")).as("n_pairs"),
        sum(abs(qDec) * abs(qpDec)).as("_bp"))
      .select(col("symbol"), col("n_rets"), col("n_pairs"),
        g(col("_rv"), "sum_q2").as("sum_q2"),
        coalesce(g(col("_bp"), "sum_bp"), lit(0L)).as("sum_bp"))
      .withColumn("rv", rv)
      .withColumn("bv", bv)
      .withColumn("jump", greatest(rv - bv, lit(0.0d)))
      .withColumn("jump_ratio",
        when(rv > 0.0d, greatest(rv - bv, lit(0.0d)) / rv))
  }

  /** DuckDB twin of [[bipowerVar]] — identical kernel, HUGEINT sums,
    * the same IEEE chain order. */
  def bipowerVarSql(seconds: Long = 60): String =
    s"""SELECT symbol, n_rets, n_pairs, sum_q2, sum_bp,
       | CAST(sum_q2 AS DOUBLE) / 1e12 AS rv,
       | $HalfPi * (CAST(sum_bp AS DOUBLE) / 1e12) AS bv,
       | greatest(CAST(sum_q2 AS DOUBLE) / 1e12
       |  - $HalfPi * (CAST(sum_bp AS DOUBLE) / 1e12), 0.0) AS jump,
       | CASE WHEN CAST(sum_q2 AS DOUBLE) / 1e12 > 0.0 THEN
       |  greatest(CAST(sum_q2 AS DOUBLE) / 1e12
       |   - $HalfPi * (CAST(sum_bp AS DOUBLE) / 1e12), 0.0)
       |  / (CAST(sum_q2 AS DOUBLE) / 1e12) END AS jump_ratio
       |FROM (
       | SELECT symbol, count(q) AS n_rets, count(qp) AS n_pairs,
       |  CAST(SUM(CAST(q AS HUGEINT) * CAST(q AS HUGEINT)) AS BIGINT)
       |   AS sum_q2,
       |  COALESCE(CAST(SUM(abs(CAST(q AS HUGEINT))
       |   * abs(CAST(qp AS HUGEINT))) AS BIGINT), 0) AS sum_bp
       | FROM (
       |  SELECT symbol, q, lag(q, 1) OVER (PARTITION BY symbol
       |    ORDER BY start) AS qp
       |  FROM (${Microstructure.bucketReturnsSql(seconds)}))
       | GROUP BY 1)
       |ORDER BY symbol""".stripMargin.replace('\n', ' ')

  /** `θ = (π/2)² + π − 5`, the asymptotic variance constant of the
    * BNS ratio jump statistic, computed once and embedded as the
    * identical literal in both engines. */
  private val Theta: Double =
    HalfPi * HalfPi + 3.141592653589793d - 5.0d

  /** `3π/(9π + 72 − 52√3)`, the MedRQ scaling constant (Andersen–
    * Dobrev–Schaumburg 2012), computed once and embedded as the
    * identical literal in both engines. */
  private val MedC: Double = {
    val pi = 3.141592653589793d
    3.0d * pi / (9.0d * pi + 72.0d - 52.0d * math.sqrt(3.0d))
  }

  /** Barndorff-Nielsen–Shephard jump TEST per symbol: the
    * max-adjusted ratio statistic (Huang–Tauchen 2005)
    * `z = (1 − BV/RV) / sqrt(θ·max(1, RQ̂/BV²)/n)` over the same
    * bucket-return kernel as [[bipowerVar]], with the JUMP-ROBUST
    * MedRQ quarticity (Andersen–Dobrev–Schaumburg 2012)
    * `RQ̂ = C·n·(n/(n−2))·Σ med(|q_b|,|q_{b-1}|,|q_{b-2}|)⁴` — the
    * median kills any single jump, so the denominator stays pinned to
    * the continuous variation (realized quarticity would load the
    * jump's 4th power and destroy power; the classic tripower needs
    * |·|^{4/3}, and NO fractional power is bit-portable here — JVM
    * Math.pow/exp and DuckDB's diverge by 1 ulp, both measured at
    * sf0.01). Under a continuous path z is asymptotically N(0,1);
    * z ≳ 3 flags jump activity — the inferential companion of
    * [[bipowerVar]]'s descriptive decomposition.
    *
    * Exactness — NO libm anywhere: the three-way median is exact
    * greatest/least selection on the kernel integers, guarded loud so
    * `m² ≤ 1e15` (|ln ratio| > 31.6 per bucket is unphysical), each
    * `m⁴ = (m²)²` is an exact decimal/int128 term, and `Σ m⁴` — which
    * can legitimately exceed 2^63 — emits through ONE decimal→double
    * cast (correctly rounded over the same exact integer in both
    * engines). RV/BV reuse [[bipowerVar]]'s exact sums; RV/BV/RQ̂/z
    * are one fixed IEEE chain each; z is null without a two-sided
    * moment system (n ≤ 2, RV = 0 or BV = 0).
    *
    * Scale shape: [[bipowerVar]]'s verbatim — one (symbol, bucket)
    * partial aggregation, two per-symbol lags over the BUCKET series,
    * one hash aggregation. */
  def jumpTest(updates: DataFrame, seconds: Long = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("symbol")).orderBy(col("start"))
    val g = guardedLong("jumpTest") _
    val qDec = col("q").cast("decimal(15,0)")
    val qpDec = col("qp").cast("decimal(15,0)")
    val (a, b, c) = (abs(col("q")), abs(col("qp")), abs(col("qpp")))
    val med = greatest(least(a, b), least(greatest(a, b), c))
    // complete triples only: Spark/DuckDB greatest-least SKIP nulls,
    // which would fabricate a 2-value "median" at the series head
    val m2 = when(
      col("q").isNull || col("qp").isNull || col("qpp").isNull,
      lit(null).cast("long"))
      .otherwise(when(med * med > lit(1000000000000000L),
        raise_error(concat(lit("jumpTest: med^2 outside the exact " +
          "regime at symbol="), col("symbol"))).cast("long"))
        .otherwise((med * med).cast("long")))
    val rv = col("sum_q2").cast("double") / 1e12d
    val bv = lit(HalfPi) * (col("sum_bp").cast("double") / 1e12d)
    val nD = col("n_rets").cast("double")
    // ADS 2012: MedRQ = C·n·(n/(n−2))·Σmed⁴ — the leading n makes
    // the estimator consistent for the INTEGRATED quarticity (each
    // med⁴ term is O(1/n²) of it); without it RQ̂/BV² ≈ 1/n and the
    // Huang–Tauchen max-adjustment clamps to 1 always.
    val rq = lit(MedC) * nD * (nD / (nD - lit(2.0d))) *
      (col("sum_m4") / 1e24d)
    val z = (lit(1.0d) - bv / rv) /
      sqrt(lit(Theta) * greatest(lit(1.0d), rq / (bv * bv)) /
        nD)
    Microstructure.bucketReturns(updates, seconds)
      .withColumn("qp", lag(col("q"), 1).over(w))
      .withColumn("qpp", lag(col("q"), 2).over(w))
      .withColumn("m2", m2)
      .groupBy(col("symbol"))
      .agg(
        count(col("q")).as("n_rets"),
        sum(qDec * qDec).as("_rv"),
        sum(abs(qDec) * abs(qpDec)).as("_bp"),
        sum(col("m2").cast("decimal(19,0)") *
          col("m2").cast("decimal(19,0)")).as("_m4"))
      .select(col("symbol"), col("n_rets"),
        g(col("_rv"), "sum_q2").as("sum_q2"),
        coalesce(g(col("_bp"), "sum_bp"), lit(0L)).as("sum_bp"),
        // n_rets ≥ 3 with head-only null returns guarantees ≥ 1
        // complete triple, so a null Σm⁴ there can ONLY be the
        // decimal(38,0) sum overflowing (Spark non-ANSI → null) —
        // raise loud instead of silently zeroing the quarticity
        // (the DuckDB twin's HUGEINT sum errors loudly there too)
        when(col("n_rets") > 2L && col("_m4").isNull,
          raise_error(concat(
            lit("jumpTest: sum_m4 outside the exact decimal " +
              "regime at symbol="), col("symbol"))).cast("double"))
          .otherwise(coalesce(col("_m4").cast("double"), lit(0.0d)))
          .as("sum_m4"))
      .withColumn("rv", rv)
      .withColumn("bv", bv)
      .withColumn("med_rq", when(col("n_rets") > 2L, rq))
      .withColumn("z",
        when(col("n_rets") > 2L && rv > 0.0d && bv > 0.0d, z))
  }

  /** DuckDB twin of [[jumpTest]] — identical kernel, HUGEINT sums,
    * the same exact median selection, chain order, and null
    * contract. */
  def jumpTestSql(seconds: Long = 60): String = {
    val rv = "CAST(sum_q2 AS DOUBLE) / 1e12"
    val bv = s"$HalfPi * (CAST(sum_bp AS DOUBLE) / 1e12)"
    val rq = s"$MedC * CAST(n_rets AS DOUBLE) * (CAST(n_rets AS" +
      " DOUBLE) / (CAST(n_rets AS DOUBLE) - 2.0)) * (sum_m4 / 1e24)"
    s"""SELECT symbol, n_rets, sum_q2, sum_bp, sum_m4,
       | $rv AS rv, $bv AS bv,
       | CASE WHEN n_rets > 2 THEN $rq END AS med_rq,
       | CASE WHEN n_rets > 2 AND $rv > 0.0 AND $bv > 0.0 THEN
       |  (1.0 - $bv / ($rv))
       |   / sqrt($Theta * greatest(1.0, $rq / (($bv) * ($bv)))
       |      / CAST(n_rets AS DOUBLE)) END AS z
       |FROM (
       | SELECT symbol, count(q) AS n_rets,
       |  CAST(SUM(CAST(q AS HUGEINT) * CAST(q AS HUGEINT)) AS BIGINT)
       |   AS sum_q2,
       |  COALESCE(CAST(SUM(abs(CAST(q AS HUGEINT))
       |   * abs(CAST(qp AS HUGEINT))) AS BIGINT), 0) AS sum_bp,
       |  COALESCE(CAST(SUM(CASE WHEN q IS NOT NULL
       |    AND qp IS NOT NULL AND qpp IS NOT NULL THEN
       |    CAST(greatest(least(abs(q), abs(qp)),
       |      least(greatest(abs(q), abs(qp)), abs(qpp))) AS HUGEINT)
       |    * greatest(least(abs(q), abs(qp)),
       |      least(greatest(abs(q), abs(qp)), abs(qpp)))
       |    * greatest(least(abs(q), abs(qp)),
       |      least(greatest(abs(q), abs(qp)), abs(qpp)))
       |    * greatest(least(abs(q), abs(qp)),
       |      least(greatest(abs(q), abs(qp)), abs(qpp))) END)
       |   AS DOUBLE), 0.0) AS sum_m4
       | FROM (
       |  SELECT symbol, q,
       |   lag(q, 1) OVER (PARTITION BY symbol ORDER BY start) AS qp,
       |   lag(q, 2) OVER (PARTITION BY symbol ORDER BY start) AS qpp
       |  FROM (${Microstructure.bucketReturnsSql(seconds)}))
       | GROUP BY 1)
       |ORDER BY symbol""".stripMargin.replace('\n', ' ')
  }

  /** Realized semivariance decomposition per symbol (Barndorff-
    * Nielsen/Kinnebrock/Shephard 2010): the realized variance split by
    * return sign — `RS⁺ = Σ q²·[q>0]`, `RS⁻ = Σ q²·[q<0]` over the
    * same bucket returns as [[bipowerVar]], plus the signed jump
    * variation `SJV = RS⁺ − RS⁻` (downside-jump dominance ⇒ SJV < 0)
    * and the downside share `RS⁻/(RS⁺+RS⁻)` (null when no nonzero
    * return) — the standard asymmetric-risk diagnostic at bucket
    * cadence.
    *
    * Sign-conditional `q²` sums in decimal with raise-guarded BIGINT
    * emission ([[bipowerVar]]'s bound discipline); all four derived
    * doubles are short IEEE chains over those two exact integers, in
    * identical textual order in both engines. */
  def realizedSemivariance(updates: DataFrame,
      seconds: Long = 60): DataFrame = {
    val g = guardedLong("realizedSemivariance") _
    val qDec = col("q").cast("decimal(15,0)")
    val up = col("sum_pos_q2").cast("double") / 1e12d
    val down = col("sum_neg_q2").cast("double") / 1e12d
    Microstructure.bucketReturns(updates, seconds)
      .groupBy(col("symbol"))
      .agg(
        count(col("q")).as("n_rets"),
        sum(when(col("q") > 0L, qDec * qDec)).as("_p"),
        sum(when(col("q") < 0L, qDec * qDec)).as("_n"))
      .select(col("symbol"), col("n_rets"),
        coalesce(g(col("_p"), "sum_pos_q2"), lit(0L)).as("sum_pos_q2"),
        coalesce(g(col("_n"), "sum_neg_q2"), lit(0L)).as("sum_neg_q2"))
      .withColumn("rs_up", up)
      .withColumn("rs_down", down)
      .withColumn("sjv", up - down)
      .withColumn("down_share",
        when(up + down > 0.0d, down / (up + down)))
  }

  /** DuckDB twin of [[realizedSemivariance]] — identical kernel,
    * HUGEINT sums, the same IEEE chain order. */
  def realizedSemivarianceSql(seconds: Long = 60): String =
    s"""SELECT symbol, n_rets, sum_pos_q2, sum_neg_q2,
       | CAST(sum_pos_q2 AS DOUBLE) / 1e12 AS rs_up,
       | CAST(sum_neg_q2 AS DOUBLE) / 1e12 AS rs_down,
       | CAST(sum_pos_q2 AS DOUBLE) / 1e12
       |  - CAST(sum_neg_q2 AS DOUBLE) / 1e12 AS sjv,
       | CASE WHEN CAST(sum_pos_q2 AS DOUBLE) / 1e12
       |   + CAST(sum_neg_q2 AS DOUBLE) / 1e12 > 0.0
       |  THEN (CAST(sum_neg_q2 AS DOUBLE) / 1e12)
       |   / (CAST(sum_pos_q2 AS DOUBLE) / 1e12
       |    + CAST(sum_neg_q2 AS DOUBLE) / 1e12)
       | END AS down_share
       |FROM (
       | SELECT symbol, count(q) AS n_rets,
       |  COALESCE(CAST(SUM(CASE WHEN q > 0
       |   THEN CAST(q AS HUGEINT) * CAST(q AS HUGEINT) END)
       |    AS BIGINT), 0) AS sum_pos_q2,
       |  COALESCE(CAST(SUM(CASE WHEN q < 0
       |   THEN CAST(q AS HUGEINT) * CAST(q AS HUGEINT) END)
       |    AS BIGINT), 0) AS sum_neg_q2
       | FROM (${Microstructure.bucketReturnsSql(seconds)})
       | GROUP BY 1)
       |ORDER BY symbol""".stripMargin.replace('\n', ' ')

  /** Return autocorrelation function per symbol at lags 1..`maxLag`:
    * the Pearson correlation of `(q_{b-L}, q_b)` pairs over the bucket
    * series — the [[Microstructure.flowAutocorr]] estimator generalized
    * from signed flow at lag 1 to returns at a lag ladder (the
    * momentum/mean-reversion horizon profile; lag-1 negative is the
    * bid-ask-bounce signature [[Microstructure.rollSpread]] prices).
    *
    * All L lag columns come off ONE per-symbol bucket window; the lag
    * axis then unpivots through a single `explode` (the
    * [[EventAnalytics.funnelSummary]] stance — plan size constant in
    * `maxLag`, not N re-selects unioned). Six decimal sums per
    * (symbol, lag), raise-guarded BIGINT emission, and the identical
    * correlation chain as flowAutocorr. */
  def returnAcf(updates: DataFrame, seconds: Long = 60,
      maxLag: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxLag >= 1 && maxLag <= 32, "returnAcf needs 1 <= maxLag <= 32")
    val w = Window.partitionBy(col("symbol")).orderBy(col("start"))
    val g = guardedLong("returnAcf") _
    val lagged = (1 to maxLag).foldLeft(
      Microstructure.bucketReturns(updates, seconds)) { (df, l) =>
        df.withColumn(s"_l$l", lag(col("q"), l).over(w))
      }
    val stacked = lagged
      .select(col("symbol"), explode(array((1 to maxLag).map(l =>
        struct(lit(l).as("lag"), col(s"_l$l").as("x"),
          col("q").as("y"))): _*)).as("p"))
      .select(col("symbol"), col("p.lag").as("lag"),
        col("p.x").cast("decimal(15,0)").as("x"),
        col("p.y").cast("decimal(15,0)").as("y"))
      .where(col("x").isNotNull)
    stacked.groupBy(col("symbol"), col("lag"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("x")).as("_sx"),
        sum(col("y")).as("_sy"),
        sum(col("x") * col("y")).as("_sxy"),
        sum(col("x") * col("x")).as("_sxx"),
        sum(col("y") * col("y")).as("_syy"))
      .select(col("symbol"), col("lag"), col("n_pairs"),
        g(col("_sx"), "sum_x").as("sum_x"),
        g(col("_sy"), "sum_y").as("sum_y"),
        g(col("_sxy"), "sum_xy").as("sum_xy"),
        g(col("_sxx"), "sum_xx").as("sum_xx"),
        g(col("_syy"), "sum_yy").as("sum_yy"))
      .withColumn("_dx",
        col("n_pairs").cast("double") * col("sum_xx").cast("double") -
          col("sum_x").cast("double") * col("sum_x").cast("double"))
      .withColumn("_dy",
        col("n_pairs").cast("double") * col("sum_yy").cast("double") -
          col("sum_y").cast("double") * col("sum_y").cast("double"))
      .select(col("symbol"), col("lag"), col("n_pairs"), col("sum_x"),
        col("sum_y"), col("sum_xy"), col("sum_xx"), col("sum_yy"),
        when(col("_dx") =!= 0.0d && col("_dy") =!= 0.0d,
          (col("n_pairs").cast("double") * col("sum_xy").cast("double") -
            col("sum_x").cast("double") * col("sum_y").cast("double")) /
            (sqrt(col("_dx")) * sqrt(col("_dy"))))
          .as("acf"))
  }

  /** DuckDB twin of [[returnAcf]] — the oracle side unpivots via a
    * lag-table cross join (bounded: `maxLag` rows). */
  def returnAcfSql(seconds: Long = 60, maxLag: Int = 5): String = {
    val lagCols = (1 to maxLag).map(l =>
      s"lag(q, $l) OVER (PARTITION BY symbol ORDER BY start) AS l$l")
      .mkString(", ")
    val lagCase = (1 to maxLag).map(l =>
      s"WHEN $l THEN l$l").mkString(" ")
    s"""SELECT symbol, lag, n_pairs, sum_x, sum_y, sum_xy, sum_xx,
       | sum_yy,
       | CASE WHEN CAST(n_pairs AS DOUBLE) * CAST(sum_xx AS DOUBLE)
       |    - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE) <> 0.0
       |   AND CAST(n_pairs AS DOUBLE) * CAST(sum_yy AS DOUBLE)
       |    - CAST(sum_y AS DOUBLE) * CAST(sum_y AS DOUBLE) <> 0.0
       |  THEN (CAST(n_pairs AS DOUBLE) * CAST(sum_xy AS DOUBLE)
       |    - CAST(sum_x AS DOUBLE) * CAST(sum_y AS DOUBLE))
       |   / (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sum_xx AS DOUBLE)
       |      - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
       |    * sqrt(CAST(n_pairs AS DOUBLE) * CAST(sum_yy AS DOUBLE)
       |      - CAST(sum_y AS DOUBLE) * CAST(sum_y AS DOUBLE)))
       | END AS acf
       |FROM (
       | SELECT symbol, lag, count(*) AS n_pairs,
       |  CAST(SUM(x) AS BIGINT) AS sum_x,
       |  CAST(SUM(y) AS BIGINT) AS sum_y,
       |  CAST(SUM(x * y) AS BIGINT) AS sum_xy,
       |  CAST(SUM(x * x) AS BIGINT) AS sum_xx,
       |  CAST(SUM(y * y) AS BIGINT) AS sum_yy
       | FROM (
       |  SELECT symbol, lags.lag,
       |   CAST(CASE lags.lag $lagCase END AS HUGEINT) AS x,
       |   CAST(q AS HUGEINT) AS y
       |  FROM (
       |   SELECT symbol, q, $lagCols
       |   FROM (${Microstructure.bucketReturnsSql(seconds)}))
       |  CROSS JOIN (SELECT unnest(range(1, ${maxLag + 1})) AS lag)
       |   AS lags)
       | WHERE x IS NOT NULL
       | GROUP BY 1, 2)
       |ORDER BY symbol, lag""".stripMargin.replace('\n', ' ')
  }

  /** Aggregation levels for [[hurst]] and their log abscissae
    * (`Math.log` of the exact small integers, embedded as the same
    * literals in both engines — no runtime `ln` on the x axis). */
  private val HurstLevels: Seq[(Int, Double)] =
    Seq(1, 2, 4, 8).map(m => m -> math.log(m.toDouble))

  /** Aggregated-variance Hurst exponent per symbol: for
    * m ∈ {1, 2, 4, 8}, the population variance of NON-OVERLAPPING
    * m-bucket return sums (complete blocks only), then the
    * least-squares slope of `ln Var(Σ_m q)` against `ln m` — under
    * self-similarity `Var(Σ_m) ∝ m^{2H}`, so `H = slope / 2`
    * (H ≈ 0.5 random walk, > 0.5 trending, < 0.5 mean-reverting; the
    * multi-horizon cousin of [[Microstructure.varianceRatio]]).
    *
    * Exactness: block sums `Σ_m q` are exact longs; per-(symbol, m)
    * moment sums run in decimal and emit raise-guarded BIGINTs;
    * `Var_m` is the shared population-variance IEEE chain. The one
    * non-correctly-rounded call — `ln Var_m` — is floor-quantized to
    * 1e8 (`y_m`), and the regression runs over the FOUR fixed
    * abscissae in one fixed textual order, so every double is
    * bit-portable. `hurst` is null unless all four levels have ≥ 2
    * complete blocks and positive variance.
    *
    * Scale: the explode multiplies the BUCKET series by 4 — still
    * time-bounded per symbol — and everything downstream is hash
    * aggregation. */
  def hurst(updates: DataFrame, seconds: Long = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("symbol")).orderBy(col("start"))
    val g = guardedLong("hurst") _
    val qmDec = col("qm").cast("decimal(18,0)")
    val blocks = Microstructure.bucketReturns(updates, seconds)
      .withColumn("rn", row_number().over(w))
      .select(col("symbol"), col("rn"), col("q"),
        explode(array(HurstLevels.map(m => lit(m._1)): _*)).as("m"))
      .withColumn("grp", expr("CAST((rn - 1) DIV m AS BIGINT)"))
      .groupBy(col("symbol"), col("m"), col("grp"))
      .agg(sum(col("q")).as("qm"), count(lit(1)).as("cnt"))
      .where(col("cnt") === col("m"))
    val perLevel = blocks.groupBy(col("symbol"), col("m"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(qmDec).as("_s"), sum(qmDec * qmDec).as("_ss"))
      .select(col("symbol"), col("m"), col("n_blocks"),
        g(col("_s"), "sum_qm").as("sum_qm"),
        g(col("_ss"), "sum_qm2").as("sum_qm2"))
      .withColumn("var_m",
        col("sum_qm2").cast("double") / col("n_blocks") -
          (col("sum_qm").cast("double") / col("n_blocks")) *
          (col("sum_qm").cast("double") / col("n_blocks")))
      .withColumn("yq",
        when(col("n_blocks") >= 2L && col("var_m") > 0.0d,
          floor(log(col("var_m")) * 1e8d).cast("long")))
    // pivot the four fixed levels into one row per symbol — max of a
    // single value per (symbol, m) is that value; the fixed textual
    // order below makes every IEEE sum deterministic
    val wide = perLevel.groupBy(col("symbol"))
      .agg(
        max(when(col("m") === 1, col("yq"))).as("yq1"),
        max(when(col("m") === 2, col("yq"))).as("yq2"),
        max(when(col("m") === 4, col("yq"))).as("yq4"),
        max(when(col("m") === 8, col("yq"))).as("yq8"),
        max(when(col("m") === 1, col("n_blocks"))).as("n1"),
        max(when(col("m") === 8, col("n_blocks"))).as("n8"))
    val xs = HurstLevels.map(_._2)
    val sx = xs.reduce(_ + _)
    val sxx = xs.map(x => x * x).reduce(_ + _)
    def y(i: Int) = col(s"yq$i").cast("double") / 1e8d
    val sy = y(1) + y(2) + y(4) + y(8)
    val sxy = lit(xs(0)) * y(1) + lit(xs(1)) * y(2) +
      lit(xs(2)) * y(4) + lit(xs(3)) * y(8)
    val slope = (lit(4.0d) * sxy - lit(sx) * sy) /
      lit(4.0d * sxx - sx * sx)
    wide.select(col("symbol"), col("yq1"), col("yq2"), col("yq4"),
      col("yq8"), col("n1"), col("n8"),
      when(col("yq1").isNotNull && col("yq2").isNotNull &&
        col("yq4").isNotNull && col("yq8").isNotNull,
        slope / 2.0d).as("hurst"))
  }

  /** DuckDB twin of [[hurst]] — identical block construction,
    * HUGEINT moment sums, the same quantized-y fixed-order
    * regression. */
  def hurstSql(seconds: Long = 60): String = {
    val xs = HurstLevels.map(_._2)
    val sx = xs.reduce(_ + _)
    val denom = 4.0d * xs.map(x => x * x).reduce(_ + _) - sx * sx
    def y(i: Int) = s"(CAST(yq$i AS DOUBLE) / 1e8)"
    val sy = s"(${y(1)} + ${y(2)} + ${y(4)} + ${y(8)})"
    val sxy = s"(${xs(0)} * ${y(1)} + ${xs(1)} * ${y(2)}" +
      s" + ${xs(2)} * ${y(4)} + ${xs(3)} * ${y(8)})"
    s"""SELECT symbol, yq1, yq2, yq4, yq8, n1, n8,
       | CASE WHEN yq1 IS NOT NULL AND yq2 IS NOT NULL
       |   AND yq4 IS NOT NULL AND yq8 IS NOT NULL
       |  THEN (4.0 * $sxy - $sx * $sy) / $denom / 2.0 END AS hurst
       |FROM (
       | SELECT symbol,
       |  max(CASE WHEN m = 1 THEN yq END) AS yq1,
       |  max(CASE WHEN m = 2 THEN yq END) AS yq2,
       |  max(CASE WHEN m = 4 THEN yq END) AS yq4,
       |  max(CASE WHEN m = 8 THEN yq END) AS yq8,
       |  max(CASE WHEN m = 1 THEN n_blocks END) AS n1,
       |  max(CASE WHEN m = 8 THEN n_blocks END) AS n8
       | FROM (
       |  SELECT symbol, m, n_blocks, sum_qm, sum_qm2,
       |   CASE WHEN n_blocks >= 2 AND var_m > 0.0
       |    THEN CAST(floor(ln(var_m) * 1e8) AS BIGINT) END AS yq
       |  FROM (
       |   SELECT symbol, m, n_blocks, sum_qm, sum_qm2,
       |    CAST(sum_qm2 AS DOUBLE) / n_blocks
       |     - (CAST(sum_qm AS DOUBLE) / n_blocks)
       |       * (CAST(sum_qm AS DOUBLE) / n_blocks) AS var_m
       |   FROM (
       |    SELECT symbol, m, count(*) AS n_blocks,
       |     CAST(SUM(CAST(qm AS HUGEINT)) AS BIGINT) AS sum_qm,
       |     CAST(SUM(CAST(qm AS HUGEINT) * CAST(qm AS HUGEINT))
       |       AS BIGINT) AS sum_qm2
       |    FROM (
       |     SELECT symbol, m, grp, SUM(q) AS qm, count(*) AS cnt
       |     FROM (
       |      SELECT r.symbol, r.q, r.rn, ms.m, (r.rn - 1) // ms.m AS grp
       |      FROM (
       |       SELECT symbol, q, start, row_number() OVER (
       |         PARTITION BY symbol ORDER BY start) AS rn
       |       FROM (${Microstructure.bucketReturnsSql(seconds)})) r
       |      CROSS JOIN (SELECT unnest([1, 2, 4, 8]) AS m) ms)
       |     GROUP BY 1, 2, 3)
       |    WHERE cnt = m GROUP BY 1, 2)))
       | GROUP BY 1)
       |ORDER BY symbol""".stripMargin.replace('\n', ' ')
  }

  /** Two-scale realized variance per symbol (Zhang–Mykland–
    * Aït-Sahalia 2005): the microstructure-noise-ROBUST RV —
    * `TSRV = RV_avg(K) − (n̄/n)·RV_full` where `RV_avg(K)` averages
    * the K offset subgrids' realized variances (≡ the lag-K squared
    * returns divided by K) and the second term subtracts the noise
    * bias the full grid accumulates, `n̄ = (m−K+1)/K` with `m` the
    * bucket count and `n = m−1` the full-grid return count. The
    * corrective companion of [[volSignature]]'s diagnostic: the
    * signature plot SHOWS the noise, TSRV removes it. Slightly
    * negative values are the estimator's known small-sample behavior;
    * `tsrv_pos` clamps at 0.
    *
    * Exactness: both return scales quantize like
    * [[Microstructure.bucketReturns]] (`floor(ln(c_b/c_{b−j})·1e6)`,
    * loud |q| > 1e9 guards); `Σq²` runs in decimal with raise-guarded
    * BIGINT emission per scale; the estimator is one fixed IEEE chain
    * over the exact integers. Null without a subgrid return
    * (m ≤ K) or a full-grid pair (m ≤ 1). Lags step over PRESENT
    * buckets (the family convention — an empty bucket does not break
    * the series).
    *
    * Scale shape: one (symbol, bucket) partial aggregation, two
    * per-symbol lags over the ONE bucket-series window, one hash
    * aggregation. */
  def tsrv(updates: DataFrame, seconds: Long = 60, k: Int = 5)
      : DataFrame = {
    require(k > 1, "k must exceed 1 (K=1 degenerates to RV_full)")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("symbol")).orderBy(col("start"))
    def q(lagN: Int, what: String): Column = {
      val raw = floor(log(col("close") /
        lag(col("close"), lagN).over(w)) * 1e6).cast("long")
      when(raw.isNull, lit(null).cast("long"))
        .otherwise(when(abs(raw) > Microstructure.QuantizedReturnBound,
          raise_error(concat(lit(s"tsrv: $what outside double range " +
            "at symbol="), col("symbol"))).cast("long"))
          .otherwise(raw))
    }
    def g(c: Column, what: String): Column =
      when(abs(c) > lit(Long.MaxValue),
        raise_error(concat(lit(s"tsrv: $what overflows BIGINT at " +
          "symbol="), col("symbol"))).cast("long"))
        .otherwise(c.cast("long"))
    val mD = col("m").cast("double")
    val rvFull = col("sum_q2_1").cast("double") / 1e12d
    val avgRv = (col("sum_q2_k").cast("double") / 1e12d) / lit(k.toDouble)
    val nBar = (mD - lit(k.toDouble) + lit(1.0d)) / lit(k.toDouble)
    val est = avgRv - nBar / (mD - lit(1.0d)) * rvFull
    updates.where(col("is_trade") && col("price") > 0.0d)
      .groupBy(col("symbol"),
        graft.functions.timeBucket(graft.functions.tsSeconds(col("ts")),
          seconds).as("start"))
      .agg(max_by(Microstructure.finitePrice,
        struct(col("ts"), col("seq"))).as("close"))
      .withColumn("q1", q(1, "full-grid ratio"))
      .withColumn("qk", q(k, "subgrid ratio"))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("m"),
        sum(col("q1").cast("decimal(19,0)") *
          col("q1").cast("decimal(19,0)")).as("_s1"),
        sum(col("qk").cast("decimal(19,0)") *
          col("qk").cast("decimal(19,0)")).as("_sk"))
      .select({
        // q(lagN) is non-null on every bucket past the lag-N head, so
        // a null sum with enough buckets can ONLY be the decimal(38,0)
        // sum overflowing (non-ANSI → null) — raise instead of letting
        // the coalesce silently zero the variance (the jumpTest
        // stance); a null with m ≤ lagN is the legit no-pairs case
        def gz(c: Column, minM: Long, what: String): Column =
          when(col("m") > lit(minM) && c.isNull,
            raise_error(concat(lit(s"tsrv: $what outside the exact " +
              "decimal regime at symbol="), col("symbol")))
              .cast("long"))
            .otherwise(g(coalesce(c, lit(0)), what))
        Seq(col("symbol"), col("m"),
          gz(col("_s1"), 1L, "sum_q2_1").as("sum_q2_1"),
          gz(col("_sk"), k.toLong, "sum_q2_k").as("sum_q2_k"))
      }: _*)
      .withColumn("rv_full", when(col("m") > 1L, rvFull))
      .withColumn("tsrv", when(col("m") > lit(k.toLong), est))
      .withColumn("tsrv_pos",
        when(col("m") > lit(k.toLong), greatest(est, lit(0.0d))))
  }

  /** DuckDB twin of [[tsrv]] — identical kernel, lags, HUGEINT sums,
    * and IEEE chain order. */
  def tsrvSql(seconds: Long = 60, k: Int = 5): String = {
    val rvFull = "CAST(sum_q2_1 AS DOUBLE) / 1e12"
    val avgRv = s"(CAST(sum_q2_k AS DOUBLE) / 1e12) / ${k.toDouble}"
    val nBar = s"(CAST(m AS DOUBLE) - ${k.toDouble} + 1.0) / ${k.toDouble}"
    val est = s"$avgRv - $nBar / (CAST(m AS DOUBLE) - 1.0) * ($rvFull)"
    s"""SELECT symbol, m, sum_q2_1, sum_q2_k,
       | CASE WHEN m > 1 THEN $rvFull END AS rv_full,
       | CASE WHEN m > $k THEN $est END AS tsrv,
       | CASE WHEN m > $k THEN greatest($est, 0.0) END AS tsrv_pos
       |FROM (
       | SELECT symbol, count(*) AS m,
       |  COALESCE(CAST(SUM(CAST(q1 AS HUGEINT) * CAST(q1 AS HUGEINT))
       |    AS BIGINT), 0) AS sum_q2_1,
       |  COALESCE(CAST(SUM(CAST(qk AS HUGEINT) * CAST(qk AS HUGEINT))
       |    AS BIGINT), 0) AS sum_q2_k
       | FROM (
       |  SELECT symbol,
       |   CAST(floor(ln(close / lag(close, 1) OVER w) * 1e6)
       |     AS BIGINT) AS q1,
       |   CAST(floor(ln(close / lag(close, $k) OVER w) * 1e6)
       |     AS BIGINT) AS qk
       |  FROM (
       |   SELECT symbol, ((ts // 1000) // $seconds) * $seconds AS start,
       |    last(price ORDER BY ts, seq) AS close
       |   FROM updates WHERE is_trade AND price > 0.0
       |   GROUP BY 1, 2)
       |  WINDOW w AS (PARTITION BY symbol ORDER BY start))
       | GROUP BY 1)
       |ORDER BY symbol""".stripMargin.replace('\n', ' ')
  }

  /** CUSUM change-point statistic per symbol (Page 1954; the
    * Brownian-bridge standardization of Ploberger–Krämer): over the
    * bucket-return series, the centered partial sums
    * `S_k = Σ_{i≤k}(q_i − q̄)` peak where the return level SHIFTS —
    * the classic "did this feed change regime, and when" monitor
    * (a drifting venue, a symbol repricing, an ingest bug flipping
    * sign conventions all light it up). Emits the exact peak, the
    * earliest bucket attaining it, and the standardized statistic
    * `max_k |S_k| / (σ̂·√n)` whose null distribution is the Brownian
    * bridge sup (95% critical value 1.358 — the Kolmogorov constant),
    * plus the boolean flag against `threshold`.
    *
    * Exactness: everywhere-integer via the ×n clearing trick —
    * `S_k·n = n·Σ_{i≤k} q_i − k·Σq` is an EXACT decimal over the
    * kernel longs (no division touches the argmax), so `s_max =
    * max_k |n·S_k|` and its earliest bucket are exact selections;
    * `s_max` emits through the raise-guarded BIGINT cast, `Σq²`
    * through the family's one decimal→double cast (null with n ≥ 1
    * ⇒ decimal overflow ⇒ raise loud); the statistic
    * `s_max / (n·σ̂·√n)` — the ×n cleared form of
    * `max|S_k|/(σ̂√n)` — and the population σ̂ are one fixed IEEE
    * chain each. Null statistic without variance or a second return.
    *
    * Scale shape: one (symbol, bucket) partial aggregation, the
    * cumulative/total sums off per-symbol BUCKET-series windows
    * (time-bounded), one hash aggregation. Batch-only BY DEFINITION:
    * every S_k is centered on the FINAL mean, so a serve-current-
    * state streaming twin would need O(buckets) state per key — the
    * retrospective two-pass shape is the estimator's own (unlike the
    * foldable estimator family, which carries streaming twins). */
  def cusumChangePoint(updates: DataFrame, seconds: Long = 60,
      threshold: Double = 1.358d): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("symbol")).orderBy(col("start"))
    val wAll = Window.partitionBy(col("symbol"))
    val qDec = col("q").cast("decimal(18,0)")
    val base = Microstructure.bucketReturns(updates, seconds)
      .withColumn("k", row_number().over(w))
      .withColumn("cum", sum(qDec).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("tot", sum(qDec).over(wAll))
      .withColumn("sdev",
        col("n") * col("cum") - col("k") * col("tot"))
      .withColumn("smaxh", max(abs(col("sdev"))).over(wAll))
    val agg = base.groupBy(col("symbol"))
      .agg(max(col("n")).as("n_rets"),
        sum(qDec).as("_sq"),
        sum(qDec * qDec).as("_sq2"),
        max(abs(col("sdev"))).as("_sm"),
        min(when(abs(col("sdev")) === col("smaxh"), col("start")))
          .as("cp_start"))
    def raiseD(what: String) =
      raise_error(concat(lit(s"cusumChangePoint: $what outside the " +
        "exact decimal regime at symbol="), col("symbol")))
    val emitted = agg.select(col("symbol"), col("n_rets"),
      when(abs(col("_sq")) > lit(Long.MaxValue),
        raiseD("sum_q").cast("long"))
        .otherwise(col("_sq").cast("long")).as("sum_q"),
      // q is non-null on every kernel row, so with n ≥ 1 a null sum
      // can ONLY be decimal overflow — raise, never null through
      when(col("n_rets") >= 1L && col("_sq2").isNull,
        raiseD("sum_q2").cast("double"))
        .otherwise(col("_sq2").cast("double")).as("sum_q2"),
      when(col("n_rets") >= 1L && col("_sm").isNull,
        raiseD("s_max").cast("long"))
        .otherwise(when(col("_sm") > lit(Long.MaxValue),
          raiseD("s_max").cast("long"))
          .otherwise(col("_sm").cast("long"))).as("s_max"),
      col("cp_start"))
    val nD = col("n_rets").cast("double")
    val v = col("sum_q2") / nD -
      (col("sum_q").cast("double") / nD) *
      (col("sum_q").cast("double") / nD)
    val stat = col("s_max").cast("double") /
      (nD * sqrt(v) * sqrt(nD))
    emitted
      .withColumn("cusum_stat",
        when(col("n_rets") > 1L && v > 0.0d, stat))
      .withColumn("cp_flag",
        when(col("cusum_stat").isNotNull,
          col("cusum_stat") > lit(threshold)))
      .orderBy("symbol")
  }

  /** DuckDB twin of [[cusumChangePoint]] — identical kernel, HUGEINT
    * cleared partial sums, exact argmax selection, the same IEEE
    * chain and threshold literal. */
  def cusumChangePointSql(seconds: Long = 60,
      threshold: Double = 1.358d): String = {
    val varSql = "(sum_q2 / CAST(n_rets AS DOUBLE)" +
      " - (CAST(sum_q AS DOUBLE) / CAST(n_rets AS DOUBLE))" +
      " * (CAST(sum_q AS DOUBLE) / CAST(n_rets AS DOUBLE)))"
    val statSql = "CAST(s_max AS DOUBLE) / (CAST(n_rets AS DOUBLE)" +
      s" * sqrt($varSql) * sqrt(CAST(n_rets AS DOUBLE)))"
    s"""SELECT symbol, n_rets, sum_q, sum_q2, s_max, cp_start,
       | CASE WHEN n_rets > 1 AND $varSql > 0.0
       |  THEN $statSql END AS cusum_stat,
       | CASE WHEN n_rets > 1 AND $varSql > 0.0
       |  THEN $statSql > $threshold END AS cp_flag
       |FROM (
       | SELECT t.symbol, max(t.n) AS n_rets,
       |  CAST(SUM(CAST(t.q AS HUGEINT)) AS BIGINT) AS sum_q,
       |  CAST(SUM(CAST(t.q AS HUGEINT) * CAST(t.q AS HUGEINT))
       |    AS DOUBLE) AS sum_q2,
       |  CAST(max(abs(t.sdev)) AS BIGINT) AS s_max,
       |  min(CASE WHEN abs(t.sdev) = t.smaxh THEN t.start END)
       |   AS cp_start
       | FROM (
       |  SELECT symbol, start, q, n,
       |   CAST(n AS HUGEINT) * cum - CAST(k AS HUGEINT) * tot
       |    AS sdev,
       |   max(abs(CAST(n AS HUGEINT) * cum
       |     - CAST(k AS HUGEINT) * tot))
       |    OVER (PARTITION BY symbol) AS smaxh
       |  FROM (
       |   SELECT symbol, start, q,
       |    row_number() OVER w AS k,
       |    SUM(CAST(q AS HUGEINT)) OVER (PARTITION BY symbol
       |     ORDER BY start ROWS BETWEEN UNBOUNDED PRECEDING AND
       |     CURRENT ROW) AS cum,
       |    COUNT(*) OVER (PARTITION BY symbol) AS n,
       |    SUM(CAST(q AS HUGEINT)) OVER (PARTITION BY symbol) AS tot
       |   FROM (${Microstructure.bucketReturnsSql(seconds)})
       |   WINDOW w AS (PARTITION BY symbol ORDER BY start))) t
       | GROUP BY 1)
       |ORDER BY symbol""".stripMargin.replace('\n', ' ')
  }

  /** Parzen kernel weight `k(x)` (Barndorff-Nielsen–Hansen–Lunde–
    * Shephard 2008): `1 − 6x² + 6x³` on [0, ½], `2(1−x)³` on (½, 1].
    * Evaluated ONCE in Scala per lag and embedded as the identical
    * double literal in both engines (the HalfPi stance) — no runtime
    * libm anywhere near the kernel. */
  private[graft] def parzen(x: Double): Double =
    if (x <= 0.5d) 1.0d - 6.0d * x * x + 6.0d * x * x * x
    else 2.0d * (1.0d - x) * (1.0d - x) * (1.0d - x)

  /** Realized-kernel variance per symbol (Barndorff-Nielsen, Hansen,
    * Lunde & Shephard 2008): `RK = γ₀ + Σ_{h=1..H} k(h/(H+1))·2γ_h`
    * with the Parzen kernel — the autocovariance-corrected RV that is
    * robust to microstructure noise WITHOUT subsampling (the kernel
    * companion of [[tsrv]]: TSRV averages subgrids, RK reweights the
    * return autocovariances; Parzen weights keep the estimate
    * non-negative by construction). `γ_h = Σ q_b·q_{b−h}` over the
    * PRESENT-bucket return series.
    *
    * Exactness: the quantized kernel returns are
    * [[Microstructure.bucketReturns]]'s exact longs; every γ_h is an
    * exact decimal sum with raise-guarded BIGINT emission (the
    * returnAcf sum_xy stance); the Parzen weights are Scala-computed
    * double literals embedded identically in both engines, and the
    * estimate is ONE fixed IEEE chain `(γ₀ + c₁·γ₁ + … + c_H·γ_H)
    * / 1e12` with `c_h = 2·k(h/(H+1))` precomputed. Null when no
    * return exists; a lag with no pairs contributes a zero γ_h
    * (empty sum), exactly as the estimator's truncation prescribes.
    *
    * Scale shape: [[returnAcf]]'s verbatim — one (symbol, bucket)
    * partial aggregation, H lag columns off ONE per-symbol
    * bucket-series window, one hash aggregation. */
  def realizedKernel(updates: DataFrame, seconds: Long = 60,
      bandwidth: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bandwidth >= 1 && bandwidth <= 16,
      "realizedKernel needs 1 <= bandwidth <= 16")
    val w = Window.partitionBy(col("symbol")).orderBy(col("start"))
    val g = guardedLong("realizedKernel") _
    val qDec = col("q").cast("decimal(15,0)")
    val lagged = (1 to bandwidth).foldLeft(
      Microstructure.bucketReturns(updates, seconds)) { (df, h) =>
        df.withColumn(s"_l$h",
          lag(col("q"), h).over(w).cast("decimal(15,0)"))
      }
    val aggs =
      Seq(count(col("q")).as("n_rets"),
        sum(qDec * qDec).as("_g0")) ++
      (1 to bandwidth).map(h =>
        sum(qDec * col(s"_l$h")).as(s"_g$h"))
    val emitted = lagged.groupBy(col("symbol"))
      .agg(aggs.head, aggs.tail: _*)
      .select(
        Seq(col("symbol"), col("n_rets"),
          g(col("_g0"), "gamma0").as("gamma0")) ++
        (1 to bandwidth).map { h =>
          // q is non-null on every kernel row, so with more rows
          // than the lag depth a null γ_h can ONLY be the
          // decimal(38,0) sum overflowing — raise instead of letting
          // the coalesce silently zero the autocovariance (the tsrv
          // stance); null with n_rets ≤ h is the legit no-pairs case
          when(col("n_rets") > h.toLong && col(s"_g$h").isNull,
            raise_error(concat(lit(s"realizedKernel: gamma$h " +
              "outside the exact decimal regime at symbol="),
              col("symbol"))).cast("long"))
            .otherwise(coalesce(g(col(s"_g$h"), s"gamma$h"), lit(0L)))
            .as(s"gamma$h")
        }: _*)
    val rk = (1 to bandwidth).foldLeft(
      col("gamma0").cast("double")) { (acc, h) =>
        val c = 2.0d * parzen(h.toDouble / (bandwidth + 1).toDouble)
        acc + lit(c) * col(s"gamma$h").cast("double")
      } / 1e12d
    emitted
      .withColumn("rk_var", when(col("n_rets") > 0L, rk))
      .withColumn("rk_vol",
        when(col("n_rets") > 0L, sqrt(greatest(rk, lit(0.0d)))))
      .orderBy("symbol")
  }

  /** DuckDB twin of [[realizedKernel]] — identical kernel returns,
    * HUGEINT γ sums, the same embedded Parzen literals and IEEE
    * chain order. */
  def realizedKernelSql(seconds: Long = 60, bandwidth: Int = 4)
      : String = {
    require(bandwidth >= 1 && bandwidth <= 16,
      "realizedKernel needs 1 <= bandwidth <= 16")
    val lagCols = (1 to bandwidth).map(h =>
      s"lag(q, $h) OVER w AS l$h").mkString(", ")
    val gSums = (1 to bandwidth).map(h =>
      s"""COALESCE(CAST(SUM(CAST(q AS HUGEINT) * CAST(l$h AS HUGEINT))
         | AS BIGINT), 0) AS gamma$h""".stripMargin
        .replace('\n', ' ')).mkString(", ")
    // "+ a + b / 1e12" would misparse — wrap the weighted sum first
    val rkExpr = "(" + (1 to bandwidth).foldLeft(
      "CAST(gamma0 AS DOUBLE)") { (acc, h) =>
        val c = 2.0d * parzen(h.toDouble / (bandwidth + 1).toDouble)
        s"$acc + $c * CAST(gamma$h AS DOUBLE)"
      } + ") / 1e12"
    val gammaList = (1 to bandwidth).map(h => s"gamma$h").mkString(", ")
    s"""SELECT symbol, n_rets, gamma0, $gammaList,
       | CASE WHEN n_rets > 0 THEN $rkExpr END AS rk_var,
       | CASE WHEN n_rets > 0 THEN sqrt(greatest($rkExpr, 0.0)) END
       |  AS rk_vol
       |FROM (
       | SELECT symbol, count(q) AS n_rets,
       |  CAST(SUM(CAST(q AS HUGEINT) * CAST(q AS HUGEINT)) AS BIGINT)
       |   AS gamma0, $gSums
       | FROM (
       |  SELECT symbol, q, $lagCols
       |  FROM (${Microstructure.bucketReturnsSql(seconds)})
       |  WINDOW w AS (PARTITION BY symbol ORDER BY start))
       | GROUP BY 1)
       |ORDER BY symbol""".stripMargin.replace('\n', ' ')
  }
}
