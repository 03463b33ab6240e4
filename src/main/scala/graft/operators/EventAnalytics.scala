package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Clickstream-style analytics over the driver's `events` table
  * (event_id, ts, user_id, event_type, value) — the downstream product
  * surface a tick engine's users build next: sessionization, ordered
  * funnels, retention cohorts, and transition matrices. A
  * beyond-reference capability family (like the general joins), kept
  * under the engine's exactness contract:
  *
  *  - every timestamp becomes INTEGER microseconds (`unix_micros` here,
  *    `epoch_us` in the DuckDB twins; Verify/Bench pin the session TZ
  *    to UTC so the parquet `timestamp[us]` values agree bit-for-bit),
  *    so every gap/bucket comparison is exact integer arithmetic;
  *  - the one double column (`value`) is summed as quantized integers
  *    (`floor(value·1e6)` — |value| ≤ ~1e3 in the data, so the
  *    quantized summand is ≤ ~1e9 and a session/bucket sum is far from
  *    2^63; OverflowAuditSpec drives the bound);
  *  - every ratio is one IEEE division of identically-derived exact
  *    operands — bit-portable with no tolerance.
  *
  * Scale shape: every window partitions by `user_id` (unbounded
  * cardinality — the opposite of the `lang` funnel retired in r11) and
  * every join keys on `user_id`, so the family is one co-partitioned
  * shuffle wide and skew-free for any real event stream. */
object EventAnalytics {

  /** Quantization scale for `value` sums (see class doc). */
  val ValueScale: Double = 1e6

  /** events with the exact integer-microsecond timestamp the whole
    * family computes on. The driver parquet reads as TIMESTAMP_NTZ
    * (no UTC adjustment flag); with the session TZ pinned to UTC the
    * NTZ→TIMESTAMP cast is the identity on the stored micros, so
    * `unix_micros` yields exactly DuckDB's `epoch_us(ts)`. */
  private def ev(events: DataFrame): DataFrame =
    events.select(col("event_id"), col("user_id"),
      unix_micros(col("ts").cast("timestamp")).as("tsu"),
      col("event_type"), col("value"))

  private def perUser = Window.partitionBy("user_id")
    .orderBy("tsu", "event_id")

  /** Per-user sessions under an inactivity gap: a new session starts
    * when the previous event is `gapSeconds` or more older (strictly
    * `diff >= gap`, so a diff of exactly the gap splits — the same rule
    * the streaming twin's state timeout applies). Emits one row per
    * session with exact start/end/duration micros, the event count, and
    * the quantized value sum.
    *
    * The running new-session flag sum uses an explicit ROWS frame: the
    * (tsu, event_id) order is unique per user, but spelling the frame
    * keeps Spark and DuckDB on identical semantics by construction. */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800): DataFrame =
    sessioned(events, gapSeconds)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("tsu")).as("session_start"),
        max(col("tsu")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(floor(col("value") * ValueScale).cast("long")).as("value_q"))
      .withColumn("duration_us", col("session_end") - col("session_start"))
      .orderBy("user_id", "session_idx")

  /** The event-level frame every session operator folds from: each
    * event tagged with its per-user `session_idx` (running sum of the
    * gap-split flag over the unique `(tsu, event_id)` order). */
  private def sessioned(events: DataFrame, gapSeconds: Long): DataFrame = {
    val gapUs = gapSeconds * 1000000L
    ev(events)
      .withColumn("prev_tsu", lag(col("tsu"), 1).over(perUser))
      .withColumn("new_session",
        when(col("prev_tsu").isNull ||
          col("tsu") - col("prev_tsu") >= gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_session")).over(
        perUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  def sessionizeSql(gapSeconds: Long = 1800): String = {
    val gapUs = gapSeconds * 1000000L
    s"""SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       | min(tsu) AS session_start,
       | max(tsu) AS session_end, count(*) AS n_events,
       | CAST(SUM(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT)
       |  AS value_q,
       | max(tsu) - min(tsu) AS duration_us
       |FROM (
       | SELECT user_id, tsu, value,
       |  SUM(new_session) OVER (PARTITION BY user_id
       |    ORDER BY tsu, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
       | FROM (
       |  SELECT user_id, event_id, tsu, value,
       |   CASE WHEN prev_tsu IS NULL OR tsu - prev_tsu >= $gapUs
       |    THEN 1 ELSE 0 END AS new_session
       |  FROM (
       |   SELECT user_id, event_id, epoch_us(ts) AS tsu, value,
       |    lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
       |      ORDER BY epoch_us(ts), event_id) AS prev_tsu
       |   FROM events)))
       |GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin.replace('\n', ' ')
  }

  /** Session path analysis: the frequency table of event-type paths —
    * each session rendered as its first `maxLen` event types in the
    * `(tsu, event_id)` total order joined with `>` — counted across all
    * sessions, heaviest first (ties broken by path, so the order is
    * total). The classic "top user journeys" query over [[sessioned]].
    *
    * Determinism: Spark's `collect_list` has no intra-group order, so
    * the path sorts `(tsu, event_id, event_type)` STRUCTS after
    * collection — `(tsu, event_id)` is unique per user, so the struct
    * sort IS the event order and the third field never compares. The
    * twin's `list(... ORDER BY tsu, event_id)` is ordered directly.
    *
    * Scale shape: the per-session array is bounded by session length
    * (inactivity-gap bounded, not data-volume bounded), and the path
    * table aggregates to distinct-path cardinality before the final
    * (small) total sort. */
  def sessionPaths(events: DataFrame, gapSeconds: Long = 1800,
      maxLen: Int = 8): DataFrame =
    sessioned(events, gapSeconds)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(sort_array(collect_list(
        struct(col("tsu"), col("event_id"), col("event_type"))))
        .as("_evs"))
      .select(array_join(
        transform(slice(col("_evs"), 1, maxLen),
          e => e.getField("event_type")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))

  def sessionPathsSql(gapSeconds: Long = 1800, maxLen: Int = 8): String = {
    val gapUs = gapSeconds * 1000000L
    s"""WITH base AS (
       | SELECT user_id, event_id, tsu, event_type,
       |  SUM(new_session) OVER (PARTITION BY user_id
       |    ORDER BY tsu, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |   AS session_idx
       | FROM (
       |  SELECT user_id, event_id, tsu, event_type,
       |   CASE WHEN prev_tsu IS NULL OR tsu - prev_tsu >= $gapUs
       |    THEN 1 ELSE 0 END AS new_session
       |  FROM (
       |   SELECT user_id, event_id, epoch_us(ts) AS tsu, event_type,
       |    lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
       |      ORDER BY epoch_us(ts), event_id) AS prev_tsu
       |   FROM events))),
       |p AS (
       | SELECT user_id, session_idx,
       |  array_to_string(list_slice(
       |    list(event_type ORDER BY tsu, event_id), 1, $maxLen), '>')
       |   AS path
       | FROM base GROUP BY 1, 2)
       |SELECT path, count(*) AS n_sessions FROM p GROUP BY 1
       |ORDER BY n_sessions DESC, path""".stripMargin.replace('\n', ' ')
  }

  /** Bounce rate per calendar period: of the sessions STARTING in each
    * `periodDays` bucket (the [[retentionCohorts]] period grid on
    * `session_start`), the fraction with exactly one event — one IEEE
    * division of two exact counts. Composes [[sessionize]]; the twin
    * literally wraps [[sessionizeSql]] as a CTE, so the two gates share
    * one session definition by construction. */
  def bounceRate(events: DataFrame, gapSeconds: Long = 1800,
      periodDays: Long = 7): DataFrame = {
    val periodUs = periodDays * 86400L * 1000000L
    sessionize(events, gapSeconds)
      .groupBy(floor(col("session_start") / periodUs).cast("long")
        .as("period"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1L, 1L).otherwise(0L))
          .as("n_bounce"))
      .withColumn("bounce_rate",
        col("n_bounce").cast("double") / col("n_sessions").cast("double"))
      .orderBy("period")
  }

  def bounceRateSql(gapSeconds: Long = 1800,
      periodDays: Long = 7): String = {
    val periodUs = periodDays * 86400L * 1000000L
    s"""WITH s AS (${sessionizeSql(gapSeconds)})
       |SELECT period, n_sessions, n_bounce,
       | CAST(n_bounce AS DOUBLE) / CAST(n_sessions AS DOUBLE)
       |  AS bounce_rate
       |FROM (
       | SELECT CAST(floor(session_start / $periodUs) AS BIGINT)
       |   AS period,
       |  count(*) AS n_sessions,
       |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |   AS n_bounce
       | FROM s GROUP BY 1)
       |ORDER BY period""".stripMargin.replace('\n', ' ')
  }

  /** Ordered funnel: for each user who performed `steps.head`, the
    * first time of each subsequent step STRICTLY after the previous
    * step's time and within `horizonSeconds` of step 1 (the
    * windowFunnel contract). One row per step-1 user: the step times
    * (null once the chain breaks — each join condition references the
    * previous step's time, so a broken chain nulls everything after it)
    * and the furthest step reached.
    *
    * Plan shape: one conditional-min aggregation per step, each a join
    * + hash agg keyed on `user_id` — co-partitioned after the first
    * shuffle, and the carried step times ride along as `max()` of a
    * per-user-constant column, so no re-sort. */
  def funnel(events: DataFrame, steps: Seq[String],
      horizonSeconds: Long = 7L * 86400): DataFrame = {
    require(steps.size >= 2, "funnel needs at least two steps")
    val horizonUs = horizonSeconds * 1000000L
    val e = ev(events).select("user_id", "tsu", "event_type")
    val s1 = e.where(col("event_type") === steps.head)
      .groupBy("user_id").agg(min(col("tsu")).as("t1"))
    val full = steps.indices.tail.foldLeft(s1) { (acc, i) =>
      val cand = e.where(col("event_type") === steps(i))
        .select(col("user_id").as("_u"), col("tsu").as("_cand"))
      val carried = (1 to i).map(j => max(col(s"t$j")).as(s"t$j"))
      acc.join(cand,
          acc("user_id") === cand("_u") &&
            col("_cand") > col(s"t$i") &&
            col("_cand") <= col("t1") + horizonUs, "left")
        .groupBy(col("user_id"))
        .agg(carried.head, carried.tail :+ min(col("_cand"))
          .as(s"t${i + 1}"): _*)
    }
    // fold ascending so the LAST wrap tests the deepest step first:
    // when(t_k)…otherwise(when(t_{k-1})…otherwise(1))
    val reach = steps.indices.tail
      .foldLeft(lit(1)) { (els, i) =>
        when(col(s"t${i + 1}").isNotNull, i + 1).otherwise(els)
      }
    full.withColumn("max_step", reach.cast("long")).orderBy("user_id")
  }

  def funnelSql(steps: Seq[String],
      horizonSeconds: Long = 7L * 86400): String = {
    val horizonUs = horizonSeconds * 1000000L
    val ctes = new StringBuilder(
      "WITH ev AS (SELECT user_id, epoch_us(ts) AS tsu, event_type" +
        " FROM events), s1 AS (SELECT user_id, min(tsu) AS t1 FROM ev" +
        s" WHERE event_type = '${steps.head}' GROUP BY 1)")
    for (i <- steps.indices.tail) {
      val carried = (1 to i).map(j => s"max(t$j) AS t$j").mkString(", ")
      ctes ++= s", s${i + 1} AS (SELECT s$i.user_id, $carried," +
        s" min(e.tsu) AS t${i + 1} FROM s$i LEFT JOIN ev e ON" +
        s" e.user_id = s$i.user_id AND e.event_type = '${steps(i)}'" +
        s" AND e.tsu > s$i.t$i AND e.tsu <= s$i.t1 + $horizonUs" +
        " GROUP BY 1)"
    }
    val caseArms = steps.indices.tail.reverse
      .map(i => s"WHEN t${i + 1} IS NOT NULL THEN ${i + 1}")
      .mkString(" ")
    val ts = (1 to steps.size).map(j => s"t$j").mkString(", ")
    ctes ++= s" SELECT user_id, $ts, CAST(CASE $caseArms ELSE 1 END" +
      s" AS BIGINT) AS max_step FROM s${steps.size} ORDER BY user_id"
    ctes.toString
  }

  /** Weekly retention cohorts: users bucketed by the period of their
    * FIRST event (`floor(first_tsu / period)` — exact integer), then
    * for each (cohort, periods-since-cohort offset) the count of
    * distinct users active in that period and the retained fraction of
    * the cohort (offset 0 is the cohort size by construction — every
    * user is active in their own first period).
    *
    * The cohort-size spread is a window over the AGGREGATED
    * (cohort, offset) table — dozens of rows, not a data-scale sort. */
  def retentionCohorts(events: DataFrame,
      periodDays: Long = 7): DataFrame = {
    val periodUs = periodDays * 86400L * 1000000L
    val e = ev(events).select("user_id", "tsu")
    val firsts = e.groupBy("user_id")
      .agg(floor(min(col("tsu")) / periodUs).cast("long").as("cohort"))
    val active = e
      .select(col("user_id"),
        floor(col("tsu") / periodUs).cast("long").as("period"))
      .distinct()
    val counts = active.join(firsts, "user_id")
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_users"))
    val wCohort = Window.partitionBy("cohort")
    counts
      .withColumn("cohort_size",
        max(when(col("offset") === 0L, col("n_users"))).over(wCohort))
      .withColumn("retained_frac",
        col("n_users").cast("double") / col("cohort_size").cast("double"))
      .orderBy("cohort", "offset")
  }

  def retentionCohortsSql(periodDays: Long = 7): String = {
    val periodUs = periodDays * 86400L * 1000000L
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS tsu FROM events),
       |firsts AS (SELECT user_id,
       |  CAST(floor(min(tsu) / $periodUs) AS BIGINT) AS cohort
       | FROM e GROUP BY 1),
       |active AS (SELECT DISTINCT user_id,
       |  CAST(floor(tsu / $periodUs) AS BIGINT) AS period FROM e),
       |counts AS (SELECT cohort, period - cohort AS "offset",
       |  count(*) AS n_users
       | FROM active JOIN firsts USING (user_id) GROUP BY 1, 2)
       |SELECT cohort, "offset", n_users, cohort_size,
       | CAST(n_users AS DOUBLE) / CAST(cohort_size AS DOUBLE)
       |  AS retained_frac
       |FROM (SELECT *, max(CASE WHEN "offset" = 0 THEN n_users END)
       |  OVER (PARTITION BY cohort) AS cohort_size FROM counts)
       |ORDER BY cohort, "offset"""".stripMargin.replace('\n', ' ')
  }

  /** First-order event-type transition matrix: consecutive event pairs
    * per user (the (tsu, event_id) total order), counted per
    * (from, to) with the row-normalized transition probability — one
    * IEEE division of two exact counts. */
  def transitions(events: DataFrame): DataFrame = {
    val wFrom = Window.partitionBy("event_type")
    ev(events)
      .withColumn("next_type", lead(col("event_type"), 1).over(perUser))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("from_total", sum(col("n")).over(wFrom))
      .withColumn("p",
        col("n").cast("double") / col("from_total").cast("double"))
      .orderBy("event_type", "next_type")
  }

  def transitionsSql: String =
    """SELECT event_type, next_type, count(*) AS n,
      | CAST(SUM(count(*)) OVER (PARTITION BY event_type) AS BIGINT)
      |  AS from_total,
      | CAST(count(*) AS DOUBLE)
      |  / CAST(SUM(count(*)) OVER (PARTITION BY event_type) AS DOUBLE)
      |  AS p
      |FROM (
      | SELECT user_id, event_type,
      |  lead(event_type, 1) OVER (PARTITION BY user_id
      |    ORDER BY epoch_us(ts), event_id) AS next_type
      | FROM events)
      |WHERE next_type IS NOT NULL
      |GROUP BY event_type, next_type
      |ORDER BY event_type, next_type""".stripMargin.replace('\n', ' ')
}
