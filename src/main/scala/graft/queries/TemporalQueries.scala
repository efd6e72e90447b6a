package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Temporal

/** Driver-checked queries for the temporal operator family (as-of
  * join, granule-bucketed interval join, sessionization) over the
  * events table. Each Spark side is the scale-safe composition in
  * `ops/Temporal.scala`; each oracle is the naive declarative
  * formulation (DuckDB native ASOF JOIN / bare range join / the same
  * gaps-and-islands windows), so the oracle checks that the
  * shuffle-friendly plan computes exactly the textbook semantics.
  */
object TemporalQueries {

  /** Events with the nanos-long `ts` converted to a proper timestamp
    * (micros, floor-div — identical to DuckDB's ns→us truncation). */
  private def events(s: SparkSession, d: String): DataFrame =
    graft.streaming.Events.normalize(Tables.events(s, d))

  // -------------------------------------------------------------------
  // q111: as-of join — every event annotated with the same user's most
  // recent purchase value at-or-before the event's timestamp.
  // Build side deduped to one row per (user, ts) first (max value):
  // ASOF tie order is undefined in every engine.
  // -------------------------------------------------------------------
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts")
      .agg(max(col("value")).as("purchase_value"))
    Temporal.asofJoin(
        ev.select("event_id", "user_id", "event_type", "ts"),
        purchases, "user_id", "ts", Seq("purchase_value"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("asof_purchase_value"), 6).as("asof_purchase_value"))
      .orderBy("event_id")
  }

  val asofJoinSql: String =
    """WITH p AS (
      |  SELECT user_id, ts, max(value) AS purchase_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
      |)
      |SELECT e.event_id, e.user_id, e.event_type,
      |       round(p.purchase_value, 6) AS asof_purchase_value
      |FROM events e ASOF LEFT JOIN p
      |  ON e.user_id = p.user_id AND e.ts >= p.ts
      |ORDER BY e.event_id""".stripMargin

  // -------------------------------------------------------------------
  // q112: interval-overlap (range) join with no equi key — for each
  // error event's 2-minute incident window, the count and value-sum of
  // ALL purchases (any user) inside the window. Spark side buckets
  // time into 120 s granules (equi-join, linear); the oracle is the
  // bare quadratic range join DuckDB can afford at sf0.01.
  // -------------------------------------------------------------------
  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val windows = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("window_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 2 MINUTES")).as("w_end"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("ts", "value")
    Temporal.rangeJoinCount(windows, purchases, "window_id",
        "w_start", "w_end", "ts", "value", granuleSec = 120L)
      .orderBy("window_id")
  }

  val rangeJoinSql: String =
    """WITH w AS (
      |  SELECT event_id AS window_id, ts AS w_start,
      |         ts + INTERVAL 2 MINUTE AS w_end
      |  FROM events WHERE event_type = 'error'
      |),
      |p AS (SELECT ts, value FROM events WHERE event_type = 'purchase')
      |SELECT window_id, count(p.ts) AS n_points,
      |       round(coalesce(CAST(sum(CAST(sign(value) * floor(abs(value) * 1000000 + 0.5) AS HUGEINT)) AS DOUBLE) / 1000000, 0), 6) AS sum_value
      |FROM w LEFT JOIN p ON p.ts >= w.w_start AND p.ts < w.w_end
      |GROUP BY window_id ORDER BY window_id""".stripMargin

  // -------------------------------------------------------------------
  // q113: sessionization — 30-minute-gap sessions per user with
  // count / bounds / exact microsecond duration / value sum.
  // -------------------------------------------------------------------
  def sessions(s: SparkSession, d: String): DataFrame =
    Temporal.sessionize(events(s, d), "user_id", "ts", "value",
        gapSec = 1800L)
      .select(col("user_id"), col("session"), col("n_events"),
        col("session_start"), col("session_end"), col("duration_us"),
        col("sum_value"))
      .orderBy("user_id", "session")

  val sessionsSql: String =
    """WITH o AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
      |        (PARTITION BY user_id ORDER BY ts) > 1800000000
      |      THEN 1 ELSE 0 END AS gap
      |  FROM events
      |),
      |s AS (
      |  SELECT user_id, ts, value,
      |    CAST(1 + sum(gap) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session
      |  FROM o
      |)
      |SELECT user_id, session, count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us,
      |  round(CAST(sum(CAST(sign(value) * floor(abs(value) * 1000000 + 0.5) AS HUGEINT)) AS DOUBLE) / 1000000, 6) AS sum_value
      |FROM s GROUP BY 1, 2 ORDER BY user_id, session""".stripMargin

  // -------------------------------------------------------------------
  // q125: forward as-of join with tolerance — every event annotated
  // with the same user's NEXT purchase value and the wait in integer
  // microseconds, masked to null when the next purchase is more than
  // 30 minutes away (merge_asof direction='forward', tolerance).
  // -------------------------------------------------------------------
  def asofForward(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts")
      .agg(max(col("value")).as("next_purchase_value"))
    Temporal.asofJoin(
        ev.select("event_id", "user_id", "event_type", "ts"),
        purchases, "user_id", "ts", Seq("next_purchase_value"),
        direction = "forward", toleranceSec = Some(1800L), emitBuildTs = true)
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("asof_next_purchase_value"), 6).as("next_purchase_value"),
        (unix_micros(col("asof_ts")) - unix_micros(col("ts"))).as("wait_us"))
      .orderBy("event_id")
  }

  val asofForwardSql: String =
    """WITH p AS (
      |  SELECT user_id, ts, max(value) AS pv
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
      |),
      |j AS (
      |  SELECT e.event_id, e.user_id, e.event_type, e.ts AS ets,
      |         p.ts AS pts, p.pv
      |  FROM events e ASOF LEFT JOIN p
      |    ON e.user_id = p.user_id AND e.ts <= p.ts
      |)
      |SELECT event_id, user_id, event_type,
      |  CASE WHEN pts IS NOT NULL AND epoch_us(pts) - epoch_us(ets) <= 1800000000
      |    THEN round(pv, 6) END AS next_purchase_value,
      |  CASE WHEN pts IS NOT NULL AND epoch_us(pts) - epoch_us(ets) <= 1800000000
      |    THEN epoch_us(pts) - epoch_us(ets) END AS wait_us
      |FROM j ORDER BY event_id""".stripMargin

  // -------------------------------------------------------------------
  // q117: leakage-safe rolling features — per event, the same user's
  // strictly-prior event count / value sum in the trailing hour plus
  // the lifetime prior count, all from one per-user window pass.
  // -------------------------------------------------------------------
  def rolling(s: SparkSession, d: String): DataFrame =
    Temporal.rollingFeatures(events(s, d), "user_id", "ts", "value",
        windowSec = 3600L)
      .select(col("event_id"), col("user_id"), col("n_prior_win"),
        col("sum_prior_win"), col("n_prior_total"))
      .orderBy("event_id")

  val rollingSql: String =
    """SELECT event_id, user_id,
      |  count(*) OVER w1h AS n_prior_win,
      |  round(coalesce(sum(value) OVER w1h, 0), 6) AS sum_prior_win,
      |  count(*) OVER wall AS n_prior_total
      |FROM events
      |WINDOW
      |  w1h AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |          RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING),
      |  wall AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |ORDER BY event_id""".stripMargin

  // -------------------------------------------------------------------
  // q135: event funnel — greedy-earliest view→click→purchase chain per
  // user with a 3-day per-step tolerance. Spark side is the bounded
  // per-key-frontier forward as-of composition (one key shuffle per
  // step); the oracle is the naive per-step LEFT JOIN + filtered min
  // DuckDB can afford at sf0.01 — the same greedy-earliest semantics
  // stated declaratively.
  // -------------------------------------------------------------------
  private val funnelWithinSec = 259200L // 3 days: sf0.01 yields a mix of
                                        // converted / broken / partial chains

  private def funnelFrame(s: SparkSession, d: String): DataFrame =
    graft.core.Memo.getOrElseUpdate(
        s"funnel:${s.sparkContext.applicationId}:$d") {
      Temporal.funnel(events(s, d), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), withinSec = funnelWithinSec)
        .localCheckpoint(false)
    }

  def funnel(s: SparkSession, d: String): DataFrame =
    funnelFrame(s, d).orderBy("user_id")

  /** q138: the canonical funnel-analytics deliverable — per-step reach
    * and conversion: how many keys completed each step, the rate from
    * the anchor, and the step-over-step rate. ONE aggregation pass over
    * the (per-key bounded) funnel frame; the 3-row result is built on
    * the driver. Rates round half-up on the 1e-6 grid = DuckDB round(). */
  def funnelRates(s: SparkSession, d: String): DataFrame = {
    val r = funnelFrame(s, d).agg(
      count(lit(1)).as("total"), count(col("t_1")).as("n1"),
      count(col("t_2")).as("n2"), count(col("t_3")).as("n3")).head()
    val total = r.getLong(0)
    val ns = Seq(r.getLong(1), r.getLong(2), r.getLong(3))
    def r6(x: Double) = graft.core.Round.r6(x)
    def rate(n: Long, den: Long) = if (den == 0) 0.0 else r6(n.toDouble / den)
    val spark = s
    import spark.implicits._
    (1 to 3).map { i =>
      val prev = if (i == 1) total else ns(i - 2)
      (i.toLong, ns(i - 1), rate(ns(i - 1), total), rate(ns(i - 1), prev))
    }.toDF("step", "n_reached", "rate_from_anchor", "rate_from_prev")
      .orderBy("step")
  }

  val funnelRatesSql: String =
    """WITH a AS (
      |  SELECT user_id, min(ts) AS t_1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1
      |),
      |s2 AS (
      |  SELECT a.user_id, a.t_1,
      |    min(e.ts) FILTER (WHERE e.ts >= a.t_1
      |      AND epoch_us(e.ts) - epoch_us(a.t_1) <= 259200000000) AS t_2
      |  FROM a LEFT JOIN events e
      |    ON e.user_id = a.user_id AND e.event_type = 'click'
      |  GROUP BY 1, 2
      |),
      |s3 AS (
      |  SELECT s2.user_id, s2.t_1, s2.t_2,
      |    min(e.ts) FILTER (WHERE s2.t_2 IS NOT NULL AND e.ts >= s2.t_2
      |      AND epoch_us(e.ts) - epoch_us(s2.t_2) <= 259200000000) AS t_3
      |  FROM s2 LEFT JOIN events e
      |    ON e.user_id = s2.user_id AND e.event_type = 'purchase'
      |  GROUP BY 1, 2, 3
      |),
      |agg AS (
      |  SELECT count(*) AS total, count(t_1) AS n1, count(t_2) AS n2,
      |         count(t_3) AS n3
      |  FROM s3
      |)
      |SELECT step, n_reached,
      |  CASE WHEN total = 0 THEN 0.0
      |       ELSE round(n_reached * 1.0 / total, 6) END AS rate_from_anchor,
      |  CASE WHEN prev = 0 THEN 0.0
      |       ELSE round(n_reached * 1.0 / prev, 6) END AS rate_from_prev
      |FROM (
      |  SELECT CAST(1 AS BIGINT) AS step, n1 AS n_reached, total, total AS prev FROM agg
      |  UNION ALL
      |  SELECT 2, n2, total, n1 FROM agg
      |  UNION ALL
      |  SELECT 3, n3, total, n2 FROM agg
      |)
      |ORDER BY step""".stripMargin

  /** The greedy-earliest chain CTEs shared by the q135 / q197 oracles
    * (q138 keeps its own copy inline). */
  private val funnelChainCtes: String =
    """a AS (
      |  SELECT user_id, min(ts) AS t_1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1
      |),
      |s2 AS (
      |  SELECT a.user_id, a.t_1,
      |    min(e.ts) FILTER (WHERE e.ts >= a.t_1
      |      AND epoch_us(e.ts) - epoch_us(a.t_1) <= 259200000000) AS t_2
      |  FROM a LEFT JOIN events e
      |    ON e.user_id = a.user_id AND e.event_type = 'click'
      |  GROUP BY 1, 2
      |),
      |s3 AS (
      |  SELECT s2.user_id, s2.t_1, s2.t_2,
      |    min(e.ts) FILTER (WHERE s2.t_2 IS NOT NULL AND e.ts >= s2.t_2
      |      AND epoch_us(e.ts) - epoch_us(s2.t_2) <= 259200000000) AS t_3
      |  FROM s2 LEFT JOIN events e
      |    ON e.user_id = s2.user_id AND e.event_type = 'purchase'
      |  GROUP BY 1, 2, 3
      |)""".stripMargin

  val funnelSql: String =
    s"""WITH $funnelChainCtes
      |SELECT user_id, t_1, t_2, t_3,
      |  CAST(1 + (t_2 IS NOT NULL)::INT + (t_3 IS NOT NULL)::INT AS BIGINT)
      |    AS steps_completed,
      |  t_3 IS NOT NULL AS converted
      |FROM s3 ORDER BY user_id""".stripMargin

  /** q197: funnel step-timing percentiles — the exact quartiles of the
    * wait between consecutive COMPLETED funnel steps (step 2 = t_2−t_1,
    * step 3 = t_3−t_2, integer µs), composing the memoized q135 chain
    * with `Percentiles.exact` (the sort-based distributed order
    * statistic — never Spark's map-merging percentile). Waits are
    * integer µs and the quartile fracs are quarters, so the linear
    * interpolation is exactly representable and both engines produce
    * identical bits with no rounding. Empty steps emit (n=0, nulls),
    * matching SQL aggregates over an empty set. */
  def funnelTiming(s: SparkSession, d: String): DataFrame = {
    val f = funnelFrame(s, d)
    def waits(a: String, b: String) =
      f.filter(col(b).isNotNull)
        .select((unix_micros(col(b)) - unix_micros(col(a)))
          .cast("double").as("w"))
    val spark = s
    import spark.implicits._
    Seq((2L, waits("t_1", "t_2")), (3L, waits("t_2", "t_3"))).map {
      case (step, df) =>
        val n = df.count()
        if (n == 0) (step, 0L, None: Option[Double], None: Option[Double],
          None: Option[Double])
        else {
          val ps = graft.ops.Percentiles.exact(df, "w", Seq(0.25, 0.5, 0.75))
          (step, n, Some(ps(0.25)), Some(ps(0.5)), Some(ps(0.75)))
        }
    }.toDF("step", "n", "p25_us", "p50_us", "p75_us").orderBy("step")
  }

  val funnelTimingSql: String =
    s"""WITH $funnelChainCtes,
      |w2 AS (SELECT epoch_us(t_2) - epoch_us(t_1) AS w FROM s3
      |       WHERE t_2 IS NOT NULL),
      |w3 AS (SELECT epoch_us(t_3) - epoch_us(t_2) AS w FROM s3
      |       WHERE t_3 IS NOT NULL)
      |SELECT CAST(2 AS BIGINT) AS step, count(w) AS n,
      |       quantile_cont(w, 0.25) AS p25_us,
      |       quantile_cont(w, 0.5) AS p50_us,
      |       quantile_cont(w, 0.75) AS p75_us
      |FROM w2
      |UNION ALL
      |SELECT 3, count(w), quantile_cont(w, 0.25), quantile_cont(w, 0.5),
      |       quantile_cont(w, 0.75)
      |FROM w3
      |ORDER BY step""".stripMargin

  /** q204: exact inter-event gap quartiles per event type — waits
    * between a user's consecutive events of the same type, quartiled
    * per type by the sort-based exact order statistic. */
  def gapPercentiles(s: SparkSession, d: String): DataFrame =
    Temporal.groupGapPercentiles(events(s, d), "event_type", "user_id",
        "ts", "event_id")
      .orderBy("event_type")

  val gapPercentilesSql: String =
    """WITH g AS (
      |  SELECT event_type AS grp,
      |         epoch_us(ts) - lag(epoch_us(ts)) OVER
      |           (PARTITION BY event_type, user_id ORDER BY ts, event_id)
      |           AS gap
      |  FROM events)
      |SELECT grp AS event_type, count(gap) AS n_gaps,
      |  -- CAST, not * 1.0: the 1.0 literal is DECIMAL in DuckDB and
      |  -- quantile_cont over DECIMAL truncates to the input scale
      |  quantile_cont(CAST(gap AS DOUBLE), 0.25) AS p25_us,
      |  quantile_cont(CAST(gap AS DOUBLE), 0.5) AS p50_us,
      |  quantile_cont(CAST(gap AS DOUBLE), 0.75) AS p75_us
      |FROM g WHERE gap IS NOT NULL GROUP BY 1 ORDER BY event_type""".stripMargin

  /** q213: peak session concurrency per day — the sweep-line over
    * 30-minute sessions' [start, end] intervals; max simultaneous
    * sessions at any boundary instant of each day. */
  def peakConcurrency(s: SparkSession, d: String): DataFrame =
    Temporal.peakConcurrency(events(s, d), "user_id", "ts", "value", 1800L)
      .orderBy("day")

  val peakConcurrencySql: String =
    """WITH o AS (
      |  SELECT user_id, ts,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
      |        (PARTITION BY user_id ORDER BY ts) > 1800000000
      |      THEN 1 ELSE 0 END AS gap
      |  FROM events),
      |s AS (SELECT user_id, ts,
      |        sum(gap) OVER (PARTITION BY user_id ORDER BY ts
      |          ROWS UNBOUNDED PRECEDING) AS sess
      |      FROM o),
      |iv AS (SELECT user_id, sess, min(epoch_us(ts)) AS st,
      |              max(epoch_us(ts)) AS en
      |       FROM s GROUP BY 1, 2),
      |dl AS (SELECT st AS t, 1 AS dd FROM iv
      |       UNION ALL SELECT en + 1, -1 FROM iv
      |       UNION ALL
      |       SELECT epoch_us(CAST(d AS TIMESTAMP)), 0 FROM (
      |         SELECT unnest(generate_series(
      |           CAST(make_timestamp((SELECT min(st) FROM iv)) AS DATE),
      |           CAST(make_timestamp((SELECT max(en) FROM iv)) AS DATE),
      |           INTERVAL 1 DAY)) AS d)),
      |g AS (SELECT t, sum(dd) AS dd FROM dl GROUP BY 1),
      |r AS (SELECT t, sum(dd) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS c
      |      FROM g)
      |SELECT strftime(CAST(make_timestamp(t) AS DATE), '%Y-%m-%d') AS day,
      |       CAST(max(c) AS BIGINT) AS peak_concurrency
      |FROM r GROUP BY 1 ORDER BY day""".stripMargin

  /** q151: exponential time-decay engagement feature — per event, the
    * same user's strictly-prior value sum half-life-weighted at 1 day;
    * the oracle replays the scaling-identity formulation verbatim. */
  def decayFeatures(s: SparkSession, d: String): DataFrame =
    Temporal.decayFeatures(events(s, d), "user_id", "ts", "value",
        halfLifeSec = 86400L)
      .select(col("event_id"), col("user_id"), col("decayed_sum"))
      .orderBy("event_id")

  val decayFeaturesSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, value, epoch_us(ts) AS us,
      |         min(epoch_us(ts)) OVER (PARTITION BY user_id) AS t0
      |  FROM events
      |),
      |w AS (
      |  SELECT event_id, user_id, us, t0,
      |    exp((ln(2)/86400) * ((us - t0) / 1000000.0)) * value AS wv
      |  FROM e
      |)
      |SELECT event_id, user_id,
      |  round(exp(-(ln(2)/86400) * ((us - t0) / 1000000.0)) *
      |        coalesce(sum(wv) OVER (PARTITION BY user_id ORDER BY us
      |          RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0), 6)
      |    AS decayed_sum
      |FROM w ORDER BY event_id""".stripMargin

  /** q144: weekly cohort retention over the events table — users
    * grouped by first-activity day, distinct-active counts per 7-day
    * period since that day. The oracle is the naive windowless SQL. */
  def cohortRetention(s: SparkSession, d: String): DataFrame =
    Temporal.cohortRetention(events(s, d), "user_id", "ts", periodDays = 7)
      // date → string: a DATE column round-trips as datetime.date from
      // Spark parquet but datetime64 from DuckDB — the hash compare
      // needs one unambiguous representation on both sides
      .withColumn("cohort", date_format(col("cohort"), "yyyy-MM-dd"))
      .orderBy("cohort", "period")

  val cohortRetentionSql: String =
    """WITH a AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
      |),
      |f AS (SELECT user_id, min(d) AS cs FROM a GROUP BY 1),
      |p AS (
      |  SELECT DISTINCT a.user_id, cs,
      |         CAST((d - cs) // 7 AS BIGINT) AS period
      |  FROM a JOIN f USING (user_id)
      |),
      |m AS (
      |  SELECT cs AS cohort, period, count(DISTINCT user_id) AS n_active
      |  FROM p GROUP BY 1, 2
      |),
      |s AS (SELECT cohort, n_active AS cohort_size FROM m WHERE period = 0)
      |SELECT CAST(cohort AS VARCHAR) AS cohort, period, n_active, cohort_size,
      |  round(CAST(n_active AS DOUBLE) / cohort_size, 6) AS retention
      |FROM m JOIN s USING (cohort)
      |ORDER BY cohort, period""".stripMargin

  /** q225: the horizon arm of cohort retention — q144's matrix under
    * `maxPeriods = 2`, the batch face of
    * `cohortRetentionStream(maxPeriods)` (whose stream==batch parity
    * is spec-pinned). The events table spans enough weeks that the
    * restriction ENGAGES (periods > 2 exist and are pruned), so the
    * oracle verifies the horizon cut, not a pass-through. */
  def cohortHorizon(s: SparkSession, d: String): DataFrame =
    Temporal.cohortRetention(events(s, d), "user_id", "ts",
        periodDays = 7, maxPeriods = Some(2L))
      .withColumn("cohort", date_format(col("cohort"), "yyyy-MM-dd"))
      .orderBy("cohort", "period")

  val cohortHorizonSql: String =
    """WITH a AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
      |),
      |f AS (SELECT user_id, min(d) AS cs FROM a GROUP BY 1),
      |p AS (
      |  SELECT DISTINCT a.user_id, cs,
      |         CAST((d - cs) // 7 AS BIGINT) AS period
      |  FROM a JOIN f USING (user_id)
      |  WHERE (d - cs) // 7 <= 2
      |),
      |m AS (
      |  SELECT cs AS cohort, period, count(DISTINCT user_id) AS n_active
      |  FROM p GROUP BY 1, 2
      |),
      |s AS (SELECT cohort, n_active AS cohort_size FROM m WHERE period = 0)
      |SELECT CAST(cohort AS VARCHAR) AS cohort, period, n_active, cohort_size,
      |  round(CAST(n_active AS DOUBLE) / cohort_size, 6) AS retention
      |FROM m JOIN s USING (cohort)
      |ORDER BY cohort, period""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q135_funnel" -> (funnel _),
    "q138_funnel_rates" -> (funnelRates _),
    "q197_funnel_timing" -> (funnelTiming _),
    "q204_gap_percentiles" -> (gapPercentiles _),
    "q213_peak_concurrency" -> (peakConcurrency _),
    "q144_cohort_retention" -> (cohortRetention _),
    "q225_cohort_horizon" -> (cohortHorizon _),
    "q151_decay_features" -> (decayFeatures _),
    "q111_asof_join" -> (asofJoin _),
    "q112_range_join" -> (rangeJoin _),
    "q113_sessions" -> (sessions _),
    "q117_rolling" -> (rolling _),
    "q125_asof_forward" -> (asofForward _))

  val oracles: Map[String, String] = Map(
    "q135_funnel" -> funnelSql,
    "q138_funnel_rates" -> funnelRatesSql,
    "q197_funnel_timing" -> funnelTimingSql,
    "q204_gap_percentiles" -> gapPercentilesSql,
    "q213_peak_concurrency" -> peakConcurrencySql,
    "q144_cohort_retention" -> cohortRetentionSql,
    "q225_cohort_horizon" -> cohortHorizonSql,
    "q151_decay_features" -> decayFeaturesSql,
    "q125_asof_forward" -> asofForwardSql,
    "q111_asof_join" -> asofJoinSql,
    "q112_range_join" -> rangeJoinSql,
    "q113_sessions" -> sessionsSql,
    "q117_rolling" -> rollingSql)
}
