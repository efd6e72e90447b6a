package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.ops.Temporal

/** Hand-computed cases + plan-shape guards for the temporal family:
  * as-of join (union-and-running-last), granule-bucketed interval
  * join, gaps-and-islands sessionization. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofJoin: backward match, exact-ts match, no-prior-build null") {
    val probes = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),  // after b1 -> 10.0
      (2L, 7L, ts("2024-01-01 12:00:00")),  // exactly at b2 -> 20.0
      (3L, 7L, ts("2024-01-01 09:00:00")),  // before any build -> null
      (4L, 8L, ts("2024-01-01 11:00:00")))  // other key, no build -> null
      .toDF("event_id", "user_id", "ts")
    val build = Seq(
      (7L, ts("2024-01-01 09:30:00"), 10.0),
      (7L, ts("2024-01-01 12:00:00"), 20.0))
      .toDF("user_id", "ts", "pval")
    val got = Temporal.asofJoin(probes, build, "user_id", "ts", Seq("pval"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got == Map(1L -> Some(10.0), 2L -> Some(20.0), 3L -> None, 4L -> None))
  }

  test("asofJoin: exactly one exchange (the key hash partition)") {
    val ev = graft.streaming.Events.normalize(core.Tables.events(spark, sf))
    val build = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("value").as("pval"))
    val df = Temporal.asofJoin(
      ev.select("event_id", "user_id", "ts"), build, "user_id", "ts", Seq("pval"))
    df.collect()
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // Read only the executed (final) AQE tree — the formatted dump
    // repeats nodes in the initial plan and the detail section.
    val finalTree = plan.split("== Initial Plan ==").head
    val exchanges = finalTree.linesIterator.count(_.contains("Exchange ("))
    // build-side dedup aggregates by (user_id, ts) and the union window
    // repartitions by user_id — nothing else may shuffle
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges:\n$finalTree")
    assert(!plan.contains("SinglePartition"), s"no global exchange:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"asof must never be a range join:\n$plan")
  }

  test("rangeJoinCount: containment boundaries and granule-spanning intervals") {
    // granule = 10 s. Interval A [00:05, 00:25) spans granules 0-2;
    // interval B [00:30, 00:40) exactly one granule.
    val intervals = Seq(
      (1L, ts("2024-01-01 00:00:05"), ts("2024-01-01 00:00:25")),
      (2L, ts("2024-01-01 00:00:30"), ts("2024-01-01 00:00:40")))
      .toDF("window_id", "w_start", "w_end")
    val points = Seq(
      (ts("2024-01-01 00:00:05"), 1.0),   // == A start -> inside A
      (ts("2024-01-01 00:00:24"), 2.0),   // inside A, third granule
      (ts("2024-01-01 00:00:25"), 4.0),   // == A end -> excluded
      (ts("2024-01-01 00:00:39"), 8.0),   // inside B
      (ts("2024-01-01 00:00:40"), 16.0))  // == B end -> excluded
      .toDF("ts", "value")
    val got = Temporal.rangeJoinCount(intervals, points, "window_id",
        "w_start", "w_end", "ts", "value", granuleSec = 10L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == Map(1L -> ((2L, 3.0)), 2L -> ((1L, 8.0))))
  }

  test("rangeJoinCount: the plan is an equi-join on the granule, never a nested loop") {
    val ev = graft.streaming.Events.normalize(core.Tables.events(spark, sf))
    val intervals = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("window_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 2 MINUTES")).as("w_end"))
    val points = ev.filter(col("event_type") === "purchase").select("ts", "value")
    val df = Temporal.rangeJoinCount(intervals, points, "window_id",
      "w_start", "w_end", "ts", "value", granuleSec = 120L)
    df.collect()
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"granule bucketing must make this an equi-join:\n$plan")
  }

  test("asofJoin forward + tolerance: nearest following match, exact-ts hit, tolerance mask") {
    val probes = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),  // next build 10:20 -> within 30 min
      (2L, 7L, ts("2024-01-01 10:20:00")),  // exact-ts build -> wait 0
      (3L, 7L, ts("2024-01-01 11:00:00")),  // next build 12:00 -> masked (40+ min)
      (4L, 7L, ts("2024-01-01 13:00:00")))  // nothing follows -> null
      .toDF("event_id", "user_id", "ts")
    val build = Seq(
      (7L, ts("2024-01-01 10:20:00"), 5.0),
      (7L, ts("2024-01-01 12:00:00"), 9.0))
      .toDF("user_id", "ts", "pval")
    val got = Temporal.asofJoin(probes, build, "user_id", "ts", Seq("pval"),
        direction = "forward", toleranceSec = Some(1800L), emitBuildTs = true)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)),
         if (r.isNullAt(4)) None else Some(r.getTimestamp(4)))).toMap
    assert(got(1L) == ((Some(5.0), Some(ts("2024-01-01 10:20:00")))))
    assert(got(2L) == ((Some(5.0), Some(ts("2024-01-01 10:20:00")))))
    assert(got(3L) == ((None, None)), "beyond tolerance must mask to null")
    assert(got(4L) == ((None, None)))
  }

  test("rollingFeatures: trailing window excludes current row and same-ts peers") {
    val ev = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, 7L, ts("2024-01-01 10:30:00"), 2.0),  // prior-1h: ev1
      (3L, 7L, ts("2024-01-01 11:15:00"), 4.0),  // prior-1h: ev2 + ev4 (ev1 aged out)
      (4L, 7L, ts("2024-01-01 11:00:00"), 8.0),  // exactly 1h after ev1: included (range is [-1h, -1us])
      (5L, 8L, ts("2024-01-01 10:00:00"), 16.0)) // other key
      .toDF("event_id", "user_id", "ts", "value")
    val got = graft.ops.Temporal.rollingFeatures(ev, "user_id", "ts", "value", 3600L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(4), r.getDouble(5), r.getLong(6))).toMap
    assert(got(1L) == ((0L, 0.0, 0L)))
    assert(got(2L) == ((1L, 1.0, 1L)))
    // ev4 at 11:00: window [10:00:00.000000, 10:59:59.999999] -> ev1 @10:00 in, ev2 in
    assert(got(4L) == ((2L, 3.0, 2L)))
    // ev3 at 11:15: window [10:15, 11:14:59.999999] -> ev2, ev4
    assert(got(3L) == ((2L, 10.0, 3L)))
    assert(got(5L) == ((0L, 0.0, 0L)))
  }

  test("sessionize: gap splits, duration, per-key independence") {
    val ev = Seq(
      (7L, ts("2024-01-01 10:00:00"), 1.0),
      (7L, ts("2024-01-01 10:10:00"), 2.0),   // 600 s gap -> same session
      (7L, ts("2024-01-01 11:00:00"), 4.0),   // 3000 s gap -> new session
      (8L, ts("2024-01-01 10:00:00"), 8.0))   // other key -> own session 1
      .toDF("user_id", "ts", "value")
    val got = Temporal.sessionize(ev, "user_id", "ts", "value", gapSec = 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(5), r.getDouble(6))).toMap
    assert(got == Map(
      (7L, 1L) -> ((2L, 600000000L, 3.0)),
      (7L, 2L) -> ((1L, 0L, 4.0)),
      (8L, 1L) -> ((1L, 0L, 8.0))))
  }

  test("sessionize: exactly a 1800 s gap does NOT split (strictly-greater rule)") {
    val ev = Seq(
      (7L, ts("2024-01-01 10:00:00"), 1.0),
      (7L, ts("2024-01-01 10:30:00"), 2.0))
      .toDF("user_id", "ts", "value")
    val got = Temporal.sessionize(ev, "user_id", "ts", "value", gapSec = 1800L)
      .collect()
    assert(got.length == 1 && got.head.getLong(2) == 2L)
  }

  test("funnel: greedy-earliest chain, break-and-propagate, equal-ts, tolerance mask") {
    val ev = Seq(
      // key 1: clean conversion — 10:00 view, 10:30 click, 11:00 purchase
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:30:00"), "click"),
      (1L, ts("2024-01-01 11:00:00"), "purchase"),
      // key 2: click beyond the 1 h tolerance breaks the chain, and the
      // later purchase must NOT resurrect it (break-and-propagate)
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 12:00:00"), "click"),
      (2L, ts("2024-01-01 12:30:00"), "purchase"),
      // key 3: click at EXACTLY the view's ts matches (at-or-after)
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:00:00"), "click"),
      (3L, ts("2024-01-01 10:59:00"), "purchase"),
      // key 4: no step-1 event -> no output row at all
      (4L, ts("2024-01-01 10:00:00"), "click"),
      (4L, ts("2024-01-01 10:10:00"), "purchase"),
      // key 5: purchase BEFORE the click must not match (forward-only)
      (5L, ts("2024-01-01 10:00:00"), "view"),
      (5L, ts("2024-01-01 10:10:00"), "purchase"),
      (5L, ts("2024-01-01 10:20:00"), "click"),
      // key 6: two candidate clicks -> greedy takes the EARLIEST (10:50),
      // and the purchase chains off that match
      (6L, ts("2024-01-01 10:00:00"), "view"),
      (6L, ts("2024-01-01 10:50:00"), "click"),
      (6L, ts("2024-01-01 10:55:00"), "click"),
      (6L, ts("2024-01-01 11:40:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = graft.ops.Temporal.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), withinSec = 3600L)
      .collect().map(r => r.getLong(0) ->
        ((1 to 3).map(i => Option(r.getTimestamp(i)).map(_.toString)),
          r.getLong(4), r.getBoolean(5))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 5L, 6L), s"anchors wrong: $got")
    assert(got(1L) == ((Seq(Some("2024-01-01 10:00:00.0"),
      Some("2024-01-01 10:30:00.0"), Some("2024-01-01 11:00:00.0")), 3L, true)))
    assert(got(2L) == ((Seq(Some("2024-01-01 10:00:00.0"), None, None), 1L, false)))
    assert(got(3L) == ((Seq(Some("2024-01-01 10:00:00.0"),
      Some("2024-01-01 10:00:00.0"), Some("2024-01-01 10:59:00.0")), 3L, true)))
    assert(got(5L) == ((Seq(Some("2024-01-01 10:00:00.0"),
      Some("2024-01-01 10:20:00.0"), None), 2L, false)))
    assert(got(6L) == ((Seq(Some("2024-01-01 10:00:00.0"),
      Some("2024-01-01 10:50:00.0"), Some("2024-01-01 11:40:00.0")), 3L, true)))
  }

  test("decayFeatures: exact half-life halvings, prior-only frame, per-key isolation") {
    // user 7, half-life 1 h: 10:00 v=4, 11:00 v=8, 12:00 v=2
    //   decayed(10:00) = 0 (no prior)
    //   decayed(11:00) = 4 * 2^-1          = 2.0
    //   decayed(12:00) = 4 * 2^-2 + 8 * 2^-1 = 5.0
    val ev = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00"), 4.0),
      (2L, 7L, ts("2024-01-01 11:00:00"), 8.0),
      (3L, 7L, ts("2024-01-01 12:00:00"), 2.0),
      (4L, 9L, ts("2024-01-01 12:00:00"), 100.0)) // other key: no bleed
      .toDF("event_id", "user_id", "ts", "value")
    val got = Temporal.decayFeatures(ev, "user_id", "ts", "value", 3600L)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("decayed_sum")).toMap
    assert(got == Map(1L -> 0.0, 2L -> 2.0, 3L -> 5.0, 4L -> 0.0), s"got $got")
  }

  test("cohortRetention: per-key period alignment, distinct users, partial periods") {
    val ev = Seq(
      // user 1: cohort 01-01; active days 01, 03 (period 0), 09 (p1), 20 (p2)
      (1L, ts("2024-01-01 08:00:00")), (1L, ts("2024-01-01 19:00:00")),
      (1L, ts("2024-01-03 10:00:00")), (1L, ts("2024-01-09 10:00:00")),
      (1L, ts("2024-01-20 10:00:00")),
      // user 2: cohort 01-01, never returns
      (2L, ts("2024-01-01 12:00:00")),
      // user 3: cohort 01-02; returns on 01-10 (8 days -> period 1)
      (3L, ts("2024-01-02 09:00:00")), (3L, ts("2024-01-10 23:00:00")))
      .toDF("user_id", "ts")
    val got = Temporal.cohortRetention(ev, "user_id", "ts", periodDays = 7)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == Map(
      ("2024-01-01", 0L) -> ((2L, 2L, 1.0)),
      ("2024-01-01", 1L) -> ((1L, 2L, 0.5)),
      ("2024-01-01", 2L) -> ((1L, 2L, 0.5)),
      ("2024-01-02", 0L) -> ((1L, 1L, 1.0)),
      ("2024-01-02", 1L) -> ((1L, 1L, 1.0))), s"got $got")
  }

  test("sessionize: no single-partition exchange at events scale") {
    val df = Temporal.sessionize(
      graft.streaming.Events.normalize(core.Tables.events(spark, sf)),
      "user_id", "ts", "value", gapSec = 1800L)
    df.collect()
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("SinglePartition"),
      s"sessionization must stay per-key partitioned:\n$plan")
  }

  test("rangeJoinCount: an interval with zero in-window points appears with (0, 0.0)") {
    val intervals = Seq(
      (1L, ts("2024-01-01 00:00:05"), ts("2024-01-01 00:00:25")),
      (2L, ts("2024-01-01 02:00:00"), ts("2024-01-01 02:10:00"))) // empty
      .toDF("window_id", "w_start", "w_end")
    val points = Seq((ts("2024-01-01 00:00:10"), 3.0)).toDF("ts", "value")
    val got = Temporal.rangeJoinCount(intervals, points, "window_id",
        "w_start", "w_end", "ts", "value", granuleSec = 10L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == Map(1L -> ((1L, 3.0)), 2L -> ((0L, 0.0))),
      s"empty interval must not vanish: $got")
  }

  test("rollingFeatures + decayFeatures: same-timestamp ties share the strictly-prior frame deterministically") {
    // two events of one key at the IDENTICAL timestamp: a ROWS frame
    // would give whichever sorts second n_prior_total = 1 and a
    // decayed sum including its peer — nondeterministically; the
    // strictly-prior RANGE frame gives BOTH the same prior state
    val ev = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, 7L, ts("2024-01-01 11:00:00"), 2.0), // tie A
      (3L, 7L, ts("2024-01-01 11:00:00"), 4.0), // tie B
      (4L, 7L, ts("2024-01-01 12:00:00"), 8.0))
      .toDF("event_id", "user_id", "ts", "value")
    val roll = graft.ops.Temporal.rollingFeatures(ev, "user_id", "ts", "value", 7200L)
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getDouble(5), r.getLong(6))).toMap
    assert(roll(2L) == ((1L, 1.0, 1L)) && roll(3L) == ((1L, 1.0, 1L)),
      s"tied rows must both see only the strictly-prior event: $roll")
    assert(roll(4L) == ((3L, 7.0, 3L)))
    val dec = graft.ops.Temporal.decayFeatures(ev, "user_id", "ts", "value", 3600L)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(dec(2L) == 0.5 && dec(3L) == 0.5,
      s"tied rows must share the prior decayed sum (1.0 halved over 1h): $dec")
    // the 12:00 row sees the tie group at half-life distance: (0.5+2+4)/2
    assert(dec(4L) == 3.25, s"later row must fold the whole tie group: $dec")
  }

  test("peakConcurrency: a day's peak carried in from open sessions is seen at midnight") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // two users whose sessions straddle midnight (events on both
    // sides within the 30-min gap): day 2's busiest instant is 00:00
    // with BOTH still active; its only boundary instants are session
    // ends (after which concurrency is 1 then 0) — without a midnight
    // evaluation point day 2 would read 1
    val df = Seq(
      (1L, t("2024-01-01 23:50:00"), 1.0), (1L, t("2024-01-02 00:10:00"), 1.0),
      (2L, t("2024-01-01 23:55:00"), 1.0), (2L, t("2024-01-02 00:02:00"), 1.0))
      .toDF("user_id", "ts", "value")
    val got = graft.ops.Temporal.peakConcurrency(df, "user_id", "ts",
        "value", 1800L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("2024-01-01" -> 2L, "2024-01-02" -> 2L),
      s"carried-over concurrency must count at day start: $got")
  }

  test("peakConcurrency: overlap counting with closed-interval boundaries") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      // u1 session [10:00, 10:10]; u2 [10:05, 10:05]; both active at
      // 10:05 -> day-1 peak 2. u3 [11:00] after u1 ended -> still 2.
      (1L, t("2024-01-01 10:00:00"), 1.0), (1L, t("2024-01-01 10:10:00"), 1.0),
      (2L, t("2024-01-01 10:05:00"), 1.0),
      (3L, t("2024-01-01 11:00:00"), 1.0),
      // u4 starts EXACTLY when u5's single-event session sits: closed
      // intervals -> both count at 09:00 on day 2
      (4L, t("2024-01-02 09:00:00"), 1.0),
      (5L, t("2024-01-02 09:00:00"), 1.0))
      .toDF("user_id", "ts", "value")
    val got = graft.ops.Temporal.peakConcurrency(df, "user_id", "ts",
        "value", 1800L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("2024-01-01" -> 2L, "2024-01-02" -> 2L))
  }
}
