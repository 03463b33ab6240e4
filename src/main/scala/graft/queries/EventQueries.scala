package graft.queries

import graft.Tables
import graft.operators.EventAnalytics

/** Correctness-gate entries for the clickstream analytics family over
  * the driver's `events` table (sessionization, funnels, retention,
  * transitions) — see [[graft.operators.EventAnalytics]] for the
  * exactness and scale contract. */
object EventQueries {

  private def events(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.table(s, dir, "events")

  /** The funnel the driver data supports: first page view, then a
    * click strictly after it, then a purchase — within a 7-day horizon
    * of the first view. */
  private val FunnelSteps = Seq("view", "click", "purchase")

  val all: Seq[Q] = Seq(

    // 30-minute inactivity sessions, exact micros + quantized value sums
    Q("q_sessionize",
      (s, dir) => EventAnalytics.sessionize(events(s, dir)),
      Some(EventAnalytics.sessionizeSql())),

    // view -> click -> purchase within 7 days of the first view
    Q("q_funnel",
      (s, dir) => EventAnalytics.funnel(events(s, dir), FunnelSteps),
      Some(EventAnalytics.funnelSql(FunnelSteps))),

    // weekly cohorts with retained fraction
    Q("q_retention",
      (s, dir) => EventAnalytics.retentionCohorts(events(s, dir)),
      Some(EventAnalytics.retentionCohortsSql())),

    // first-order event-type transition matrix
    Q("q_transitions",
      (s, dir) => EventAnalytics.transitions(events(s, dir)),
      Some(EventAnalytics.transitionsSql)),

    // PageRank over the type transition graph (quantized power
    // iteration, 20 fixed steps, leaky dangling convention)
    Q("q_type_pagerank",
      (s, dir) => EventAnalytics.typePagerank(events(s, dir)),
      Some(EventAnalytics.typePagerankSql())),

    // top session event-type paths (user journeys), heaviest first
    Q("q_session_paths",
      (s, dir) => EventAnalytics.sessionPaths(events(s, dir)),
      Some(EventAnalytics.sessionPathsSql())),

    // single-event-session fraction per weekly period of session start
    Q("q_bounce_rate",
      (s, dir) => EventAnalytics.bounceRate(events(s, dir)),
      Some(EventAnalytics.bounceRateSql())),

    // p25/p50/p75 inter-event dwell per type, distributed order stats
    Q("q_dwell_percentiles",
      (s, dir) => EventAnalytics.dwellPercentiles(events(s, dir)),
      Some(EventAnalytics.dwellPercentilesSql)),

    // recency/frequency/monetary tercile scores per user
    Q("q_rfm",
      (s, dir) => EventAnalytics.rfm(events(s, dir)),
      Some(EventAnalytics.rfmSql)),

    // user-grain co-occurrence support and independence lift per pair
    Q("q_event_lift",
      (s, dir) => EventAnalytics.eventLift(events(s, dir)),
      Some(EventAnalytics.eventLiftSql)),

    // per-step reach counts + stepwise conversion over the funnel
    Q("q_funnel_summary",
      (s, dir) => EventAnalytics.funnelSummary(events(s, dir), FunnelSteps),
      Some(EventAnalytics.funnelSummarySql(FunnelSteps))),

    // md5-deterministic A/B split, Welch z over per-user value sums
    Q("q_ab_test",
      (s, dir) => EventAnalytics.abTest(events(s, dir)),
      Some(EventAnalytics.abTestSql)),

    // p25/p50/p75 first-step-to-completion latency among converters
    Q("q_funnel_ttc",
      (s, dir) => EventAnalytics.funnelTimeToConvert(
        events(s, dir), FunnelSteps),
      Some(EventAnalytics.funnelTimeToConvertSql(FunnelSteps))),

    // Markov removal-effect attribution over user journeys: pure
    // integer truncated-absorption chain, per-channel conversion drop
    Q("q_markov_attribution",
      (s, dir) => EventAnalytics.markovAttribution(events(s, dir)),
      Some(EventAnalytics.markovAttributionSql())),

    // Fano factor of hourly activity per user (bursty vs metronomic)
    Q("q_user_fano",
      (s, dir) => graft.operators.ActivityStats.userFano(events(s, dir))
        .orderBy("user_id"),
      Some(graft.operators.ActivityStats.userFanoSql())),

    // Goh-Barabasi burstiness of inter-event times at second grain
    Q("q_burstiness",
      (s, dir) => graft.operators.ActivityStats.burstiness(events(s, dir))
        .orderBy("user_id"),
      Some(graft.operators.ActivityStats.burstinessSql())),

    // truncated expected steps to absorption over the journey chain
    Q("q_chain_hitting_time",
      (s, dir) => EventAnalytics.chainHittingTime(events(s, dir)),
      Some(EventAnalytics.chainHittingTimeSql())),

    // exact Shapley-value channel attribution over pre-conversion
    // coalitions (2^n lattice, loud maxChannels guard)
    Q("q_shapley_attribution",
      (s, dir) => EventAnalytics.shapleyAttribution(events(s, dir)),
      Some(EventAnalytics.shapleyAttributionSql())),

    // first/last/linear baseline attribution in one pass
    Q("q_touch_attribution",
      (s, dir) => EventAnalytics.touchAttribution(events(s, dir)),
      Some(EventAnalytics.touchAttributionSql())),

    // U-shaped 40/20/40 position credit, exact integer millionths
    Q("q_position_attribution",
      (s, dir) => EventAnalytics.positionAttribution(events(s, dir)),
      Some(EventAnalytics.positionAttributionSql())),

    // exponential time-decay credit via the pure-integer halving
    // ladder (no libm), exact journey shares in millionths
    Q("q_time_decay_attribution",
      (s, dir) => EventAnalytics.timeDecayAttribution(events(s, dir)),
      Some(EventAnalytics.timeDecayAttributionSql())),

    // per-user event-type entropy + ln(k)-normalized predictability
    Q("q_nav_entropy",
      (s, dir) => graft.operators.ActivityStats.navEntropy(events(s, dir))
        .orderBy("user_id"),
      Some(graft.operators.ActivityStats.navEntropySql())),

    // product-limit survival over user lifetimes, right-censored at
    // the corpus horizon; exact integer recursion at 1e12. Daily
    // grain: the driver corpus spans ~30 days, so weekly periods
    // would leave a ~4-step ladder
    Q("q_kaplan_meier",
      (s, dir) => EventAnalytics.kaplanMeier(events(s, dir),
        periodDays = 1, censorDays = 1),
      Some(EventAnalytics.kaplanMeierSql(periodDays = 1,
        censorDays = 1))),

    // cohort-day x age-day cumulative value per cohort user
    Q("q_cohort_ltv",
      (s, dir) => EventAnalytics.cohortLtv(events(s, dir),
        periodDays = 1),
      Some(EventAnalytics.cohortLtvSql(periodDays = 1))),

    // daily event-count anomaly z-scores per type (population moments)
    Q("q_daily_anomaly",
      (s, dir) => graft.operators.ActivityStats.dailyAnomaly(
        events(s, dir)),
      Some(graft.operators.ActivityStats.dailyAnomalySql())),

    // conditional next-step entropy per event type + entropy-rate
    // contributions over the transition chain
    Q("q_transition_entropy",
      (s, dir) => EventAnalytics.transitionEntropy(events(s, dir)),
      Some(EventAnalytics.transitionEntropySql)),

    // per-event-type engagement Gini: exact rank identity over
    // per-user counts
    Q("q_activity_gini",
      (s, dir) => graft.operators.ActivityStats.activityGini(
        events(s, dir)),
      Some(graft.operators.ActivityStats.activityGiniSql())),

    // DAU/MAU stickiness per calendar period — weekly grain in the
    // gate (the ~30-day driver corpus gives 28-day periods only one
    // full window)
    Q("q_stickiness",
      (s, dir) => EventAnalytics.stickiness(events(s, dir),
        periodDays = 7),
      Some(EventAnalytics.stickinessSql(periodDays = 7)))
  )
}
