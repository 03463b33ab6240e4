package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-user activity-dispersion statistics over the `events` table —
  * the burstiness diagnostics a clickstream pipeline runs next to the
  * [[EventAnalytics]] family (bot detection, engagement segmentation):
  * the Fano factor of hourly event counts and the Goh–Barabási
  * burstiness coefficient of inter-event times.
  *
  * The family contract ([[EventAnalytics]] class doc): timestamps are
  * exact integer microseconds (`unix_micros` ≡ the twins' `epoch_us`
  * under the pinned UTC session), every moment sum runs exact
  * (decimal/HUGEINT) and emits a raise-guarded BIGINT, and each
  * derived double is one short IEEE chain (+,-,*,/ and the
  * correctly-rounded sqrt) — bit-portable to DuckDB with no
  * tolerance and no libm exposure at all.
  *
  * Scale shape: both operators are a single user-keyed aggregation
  * (the Fano adds one (user, hour) pre-aggregation; burstiness adds
  * one user-keyed lag over each user's own events) — unbounded key
  * cardinality, skew-free, no global sort. */
object ActivityStats {

  private val HourMicros: Long = 3600L * 1000000L

  private def guardedLong(op: String)(c: Column, what: String): Column =
    when(abs(c) > lit(Long.MaxValue),
      raise_error(concat(lit(s"$op: $what overflows BIGINT at user_id="),
        col("user_id"))).cast("long"))
      .otherwise(c.cast("long"))

  /** Fano factor of hourly activity per user: over the user's PRESENT
    * hours (hours with ≥ 1 event), `fano = Var(c) / Mean(c)` of the
    * hourly event counts — 1 for a Poisson visitor, ≫ 1 for bursty
    * sessions-and-silence behavior, → 0 for metronomic bots. Mean is
    * always > 0 on present hours, so the ratio is total.
    *
    * Counts are exact longs; Σc and Σc² run in decimal and emit
    * raise-guarded BIGINTs; mean/variance/fano are the shared
    * population-moment IEEE chain. */
  def userFano(events: DataFrame): DataFrame = {
    val g = guardedLong("userFano") _
    val cDec = col("c").cast("decimal(18,0)")
    val mean = col("n_events").cast("double") / col("n_hours")
    val variance = col("sum_c2").cast("double") / col("n_hours") -
      (col("n_events").cast("double") / col("n_hours")) *
      (col("n_events").cast("double") / col("n_hours"))
    events
      .groupBy(col("user_id"),
        expr(s"CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV $HourMicros AS BIGINT)")
          .as("hour"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_hours"),
        sum(cDec).as("_s"), sum(cDec * cDec).as("_ss"))
      .select(col("user_id"), col("n_hours"),
        g(col("_s"), "sum_c").as("n_events"),
        g(col("_ss"), "sum_c2").as("sum_c2"))
      .withColumn("mean_c", mean)
      .withColumn("var_c", variance)
      .withColumn("fano", variance / mean)
  }

  /** DuckDB twin of [[userFano]]. Micros-floor note: `epoch_us // h`
    * and Spark's long division agree because event timestamps are
    * non-negative. */
  def userFanoSql(): String =
    s"""SELECT user_id, n_hours, n_events, sum_c2,
       | CAST(n_events AS DOUBLE) / n_hours AS mean_c,
       | CAST(sum_c2 AS DOUBLE) / n_hours
       |  - (CAST(n_events AS DOUBLE) / n_hours)
       |    * (CAST(n_events AS DOUBLE) / n_hours) AS var_c,
       | (CAST(sum_c2 AS DOUBLE) / n_hours
       |  - (CAST(n_events AS DOUBLE) / n_hours)
       |    * (CAST(n_events AS DOUBLE) / n_hours))
       |  / (CAST(n_events AS DOUBLE) / n_hours) AS fano
       |FROM (
       | SELECT user_id, count(*) AS n_hours,
       |  CAST(SUM(CAST(c AS HUGEINT)) AS BIGINT) AS n_events,
       |  CAST(SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS BIGINT)
       |   AS sum_c2
       | FROM (
       |  SELECT user_id, epoch_us(ts) // $HourMicros AS hour,
       |   count(*) AS c
       |  FROM events GROUP BY 1, 2)
       | GROUP BY 1)
       |ORDER BY user_id""".stripMargin.replace('\n', ' ')

  /** Goh–Barabási burstiness per user over inter-event times at
    * second resolution: `B = (σ − μ) / (σ + μ)` of the user's
    * consecutive-event gaps — −1 metronomic, 0 Poisson, → 1 bursty.
    * Gaps quantize to whole seconds (`Δµs // 1e6`, exact — second
    * resolution keeps Σg² within BIGINT for multi-year spans where
    * raw micros-squared would overflow a single summand). Ties on
    * `(ts, event_id)` order exactly as the family's sessionize lag.
    * Null when the user has < 2 events or σ + μ = 0 (a single gap of
    * zero seconds). */
  def burstiness(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tsu"), col("event_id"))
    val g = guardedLong("burstiness") _
    val gDec = col("gap_s").cast("decimal(18,0)")
    val mean = col("sum_g").cast("double") / col("n_gaps")
    val variance = col("sum_g2").cast("double") / col("n_gaps") -
      (col("sum_g").cast("double") / col("n_gaps")) *
      (col("sum_g").cast("double") / col("n_gaps"))
    val sigma = sqrt(variance)
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).cast("long").as("tsu"))
      .withColumn("prev_tsu", lag(col("tsu"), 1).over(w))
      .where(col("prev_tsu").isNotNull)
      .select(col("user_id"),
        expr("CAST((tsu - prev_tsu) DIV 1000000 AS BIGINT)")
          .as("gap_s"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(gDec).as("_s"), sum(gDec * gDec).as("_ss"))
      .select(col("user_id"), col("n_gaps"),
        g(col("_s"), "sum_g").as("sum_g"),
        g(col("_ss"), "sum_g2").as("sum_g2"))
      .withColumn("mean_g", mean)
      .withColumn("sigma_g", sigma)
      .withColumn("burstiness",
        when(sigma + mean =!= 0.0d, (sigma - mean) / (sigma + mean)))
  }

  /** DuckDB twin of [[burstiness]] — identical gap quantization and
    * IEEE chain. */
  def burstinessSql(): String =
    s"""SELECT user_id, n_gaps, sum_g, sum_g2, mean_g, sigma_g,
       | CASE WHEN sigma_g + mean_g <> 0.0
       |  THEN (sigma_g - mean_g) / (sigma_g + mean_g)
       | END AS burstiness
       |FROM (
       | SELECT user_id, n_gaps, sum_g, sum_g2,
       |  CAST(sum_g AS DOUBLE) / n_gaps AS mean_g,
       |  sqrt(CAST(sum_g2 AS DOUBLE) / n_gaps
       |   - (CAST(sum_g AS DOUBLE) / n_gaps)
       |     * (CAST(sum_g AS DOUBLE) / n_gaps)) AS sigma_g
       | FROM (
       |  SELECT user_id, count(*) AS n_gaps,
       |   CAST(SUM(CAST(gap_s AS HUGEINT)) AS BIGINT) AS sum_g,
       |   CAST(SUM(CAST(gap_s AS HUGEINT) * CAST(gap_s AS HUGEINT))
       |     AS BIGINT) AS sum_g2
       |  FROM (
       |   SELECT user_id, (tsu - prev_tsu) // 1000000 AS gap_s
       |   FROM (
       |    SELECT user_id, epoch_us(ts) AS tsu,
       |     lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
       |       ORDER BY epoch_us(ts), event_id) AS prev_tsu
       |    FROM events)
       |   WHERE prev_tsu IS NOT NULL)
       |  GROUP BY 1)
       | )
       |ORDER BY user_id""".stripMargin.replace('\n', ' ')

  /** Shannon entropy of each user's event-TYPE mix, plus the
    * ln(k)-normalized form — the navigation-predictability gauge
    * next to [[userFano]]/[[burstiness]] (a user who only ever fires
    * one type is fully predictable; a uniform mix over k types is
    * maximally unpredictable): `H = −Σ_i (c_i/n)·ln(c_i/n)` and
    * `norm = H / ln(k)` (null when k = 1 — no mix to normalize).
    *
    * Exactness (the [[graft.ext.TextOps.charEntropy]] lnQ pattern):
    * each term's `ln(c/n)` is floor-quantized at 1e12 (raw ln can
    * differ by 1 ulp across libms; the quantized integer cannot), the
    * `c·lnQ` products accumulate in decimal/HUGEINT exactly at any
    * partitioning, and entropy/norm are short IEEE chains over the
    * one emitted raise-guarded BIGINT. `ln(k)` is quantized the same
    * way, so `norm` is a division of two identically-derived doubles.
    *
    * Scale shape: one (user, type) aggregation, one user-keyed window
    * bounded by the TYPE cardinality per user, one user-keyed
    * aggregation — skew-free, no global sort. */
  def navEntropy(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
    val g = guardedLong("navEntropy") _
    val entropy = -(col("sum_clnq").cast("double")) / 1e12d /
      col("n_events").cast("double")
    events
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(w))
      .select(col("user_id"), col("n"),
        (col("c").cast("decimal(38,0)") *
          floor(log(col("c").cast("double") /
            col("n").cast("double")) * 1e12).cast("long")
            .cast("decimal(38,0)")).as("t"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_types"),
        max(col("n")).as("n_events"),
        sum(col("t")).as("_s"))
      .select(col("user_id"), col("n_types"), col("n_events"),
        g(col("_s"), "sum_clnq").as("sum_clnq"))
      .withColumn("entropy", entropy)
      .withColumn("norm_entropy",
        when(col("n_types") > 1L, entropy /
          (floor(log(col("n_types").cast("double")) * 1e12)
            .cast("long").cast("double") / 1e12d)))
  }

  /** DuckDB twin of [[navEntropy]] — identical lnQ quantization and
    * IEEE chains. */
  def navEntropySql(): String =
    s"""SELECT user_id, n_types, n_events, sum_clnq,
       | -CAST(sum_clnq AS DOUBLE) / 1e12 / CAST(n_events AS DOUBLE)
       |   AS entropy,
       | CASE WHEN n_types > 1 THEN
       |  (-CAST(sum_clnq AS DOUBLE) / 1e12 / CAST(n_events AS DOUBLE))
       |  / (CAST(CAST(floor(ln(CAST(n_types AS DOUBLE)) * 1e12)
       |      AS BIGINT) AS DOUBLE) / 1e12)
       | END AS norm_entropy
       |FROM (
       | SELECT user_id, count(*) AS n_types,
       |  CAST(max(n) AS BIGINT) AS n_events,
       |  CAST(SUM(CAST(c AS HUGEINT)
       |   * CAST(floor(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
       |      * 1e12) AS BIGINT)) AS BIGINT) AS sum_clnq
       | FROM (
       |  SELECT user_id, c, sum(c) OVER (PARTITION BY user_id) AS n
       |  FROM (
       |   SELECT user_id, event_type, count(*) AS c
       |   FROM events GROUP BY 1, 2))
       | GROUP BY 1)
       |ORDER BY user_id""".stripMargin.replace('\n', ' ')
  /** Daily activity anomaly per (event_type, day): the z-score of
    * each day's event count against that type's all-days population
    * moments — the operational "did something spike/break today"
    * monitor on the clickstream (the events-side mirror of the tick
    * family's return anomaly). Null z without cross-day variance.
    *
    * Exactness: daily counts are exact integers; `Σ n` and `Σ n²` run
    * in decimal with raise-guarded BIGINT emission; mean/var/z are
    * one fixed population-moment IEEE chain over those integers,
    * spelled identically in the twin.
    *
    * Scale shape: one (type, day) aggregation, a type-keyed window
    * over the AGGREGATED day table (time-bounded), per-row chain. */
  def dailyAnomaly(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayUs = 86400L * 1000000L
    val w = Window.partitionBy("event_type")
    // local guard: the shared one names user_id, absent in this frame
    def g(c: Column, what: String): Column =
      when(abs(c) > lit(Long.MaxValue),
        raise_error(concat(lit(s"dailyAnomaly: $what overflows " +
          "BIGINT at type="), col("event_type"))).cast("long"))
        .otherwise(c.cast("long"))
    val nD = col("n_days").cast("double")
    val mean = col("sum_n").cast("double") / nD
    val variance = col("sum_n2").cast("double") / nD - mean * mean
    val daily = events
      .select(col("event_type"),
        floor(unix_micros(col("ts").cast("timestamp")) / dayUs)
          .cast("long").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"))
    daily
      .withColumn("n_days", count(lit(1)).over(w))
      .withColumn("sum_n",
        g(sum(col("n").cast("decimal(20,0)")).over(w), "sum_n"))
      .withColumn("sum_n2",
        g(sum((col("n") * col("n")).cast("decimal(30,0)")).over(w),
          "sum_n2"))
      .select(col("event_type"), col("day"), col("n"), col("n_days"),
        col("sum_n"), col("sum_n2"),
        when(variance > 0.0d,
          (col("n").cast("double") - mean) / sqrt(variance)).as("z"))
      .orderBy("event_type", "day")
  }

  /** DuckDB twin of [[dailyAnomaly]] — identical day floor, HUGEINT
    * sums, population chain. */
  def dailyAnomalySql(): String = {
    val dayUs = 86400L * 1000000L
    val mean = "CAST(sum_n AS DOUBLE) / CAST(n_days AS DOUBLE)"
    val variance = s"CAST(sum_n2 AS DOUBLE) / CAST(n_days AS DOUBLE)" +
      s" - ($mean) * ($mean)"
    s"""SELECT event_type, day, n, n_days, sum_n, sum_n2,
       | CASE WHEN $variance > 0.0 THEN
       |  (CAST(n AS DOUBLE) - $mean) / sqrt($variance) END AS z
       |FROM (
       | SELECT event_type, day, n,
       |  CAST(count(*) OVER wt AS BIGINT) AS n_days,
       |  CAST(SUM(CAST(n AS HUGEINT)) OVER wt AS BIGINT) AS sum_n,
       |  CAST(SUM(CAST(n AS HUGEINT) * n) OVER wt AS BIGINT)
       |   AS sum_n2
       | FROM (
       |  SELECT event_type,
       |   CAST(floor(epoch_us(ts) / $dayUs) AS BIGINT) AS day,
       |   count(*) AS n
       |  FROM events GROUP BY 1, 2)
       | WINDOW wt AS (PARTITION BY event_type))
       |ORDER BY event_type, day""".stripMargin.replace('\n', ' ')
  }

  /** Engagement inequality per event type: the Gini coefficient of
    * per-user counts of that type — "is this interaction driven by a
    * few power users or spread broadly" (gini 0 = uniform, →1 = one
    * user dominates). Users who never emit the type are OUT of the
    * population by construction (no zero axis to densify from); the
    * twin is closed under the same convention.
    *
    * Exactness — the [[graft.ext.TextOps.lengthGini]] exact rank
    * identity: rank each user by `(cnt, user_id)` (deterministic under
    * ties), `G = (2·Σ r·cnt − (n+1)·Σ cnt) / (n·Σ cnt)` with the
    * rank-weighted sum in exact decimal and ONE IEEE chain at the end,
    * spelled identically in the twin.
    *
    * Scale shape: one (event_type, user) aggregation, then a rank
    * window over the AGGREGATED per-user table, one hash aggregation.
    * The window is keyed by event_type over users-per-type rows — at
    * extreme user counts the rank would dispatch to the salted exact
    * prefix-sum arm (the [[graft.ext.Pipeline]] unimaxApply pattern);
    * the window form IS the gate's shape, as [[lengthGini]]'s. */
  def activityGini(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("cnt", "user_id")
    val dec = "decimal(20,0)"
    events
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("r", row_number().over(w))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("cnt")).as("total_events"),
        sum(col("r").cast(dec) * col("cnt").cast(dec)).cast("double")
          .as("rank_weighted"))
      .withColumn("gini",
        when(col("total_events") > 0L,
          (lit(2.0d) * col("rank_weighted") -
            (col("n_users").cast("double") + lit(1.0d)) *
              col("total_events").cast("double")) /
            (col("n_users").cast("double") *
              col("total_events").cast("double"))))
      .orderBy("event_type")
  }

  /** DuckDB twin of [[activityGini]] — identical ranking and chain. */
  def activityGiniSql(): String =
    s"""SELECT event_type, n_users, total_events, rank_weighted,
       | CASE WHEN total_events > 0 THEN
       |  (2.0 * rank_weighted
       |    - (CAST(n_users AS DOUBLE) + 1.0)
       |      * CAST(total_events AS DOUBLE))
       |  / (CAST(n_users AS DOUBLE) * CAST(total_events AS DOUBLE))
       | END AS gini
       |FROM (
       | SELECT event_type, count(*) AS n_users,
       |  CAST(sum(cnt) AS BIGINT) AS total_events,
       |  CAST(SUM(CAST(r AS HUGEINT) * CAST(cnt AS HUGEINT))
       |    AS DOUBLE) AS rank_weighted
       | FROM (
       |  SELECT event_type, user_id, cnt,
       |   row_number() OVER (PARTITION BY event_type
       |     ORDER BY cnt, user_id) AS r
       |  FROM (
       |   SELECT event_type, user_id, count(*) AS cnt
       |   FROM events GROUP BY 1, 2))
       | GROUP BY 1)
       |ORDER BY event_type""".stripMargin.replace('\n', ' ')
}
