package graft

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Randomized brute-force parity for the STATEFUL STREAMING operators —
  * the TemporalParitySpec discipline pointed at the
  * flatMapGroupsWithState machines. Each trial builds a seeded random
  * corpus (few keys → dense per-key interleavings; timestamps on a
  * coarse grid → exact ties, including across micro-batch boundaries;
  * values on a 0.25 grid → float sums exact in any fold order), feeds
  * it through MemoryStream cut at RANDOM batch boundaries, and
  * compares the flushed output against a direct in-memory reference of
  * the documented contract. Batch cuts vary per seed, so any
  * dependence of the output on micro-batch boundaries — double emission
  * on timeout vs data-driven flush, state dropped too early, carry
  * applied twice — shows up as a seed failure.
  *
  * TWO delivery regimes per operator (round 17): jitterSec = 0 feeds
  * in ASCENDING event-time order (ascending + a small watermark delay
  * ⇒ no row is ever late, while sessions/chains/ledgers finalize
  * MID-stream — the state-carry regime where the round-11 exactly-once
  * bugs lived); jitterSec > 0 perturbs the DELIVERY order by a bounded
  * amount STRICTLY BELOW the watermark delay (out of order but still
  * never late — the regime real streams deliver, where only the state
  * machines' in-state buffering/sorting can restore event-time order).
  */
class StreamingParitySpec extends SparkSpec {
  import spark.implicits._

  // 2024-03-01 00:00:00 UTC — day-aligned so cohort/KM day arithmetic
  // exercises real day boundaries
  private val baseSec = java.time.LocalDate.parse("2024-03-01")
    .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
  private def ts(off: Long) = new Timestamp((baseSec + off) * 1000L)
  private def us(off: Long) = (baseSec + off) * 1000000L
  private def dayOfUs(u: Long): java.time.LocalDate =
    java.time.Instant.ofEpochSecond(u / 1000000L)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
  private def r6hu(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Bounded out-of-order delivery: each row's delivery key is its
    * event time plus U[0, jitterSec] seconds, stable-sorted — so the
    * max event time delivered before any row exceeds that row's own
    * time by at most jitterSec, and with jitterSec strictly below the
    * watermark delay the watermark (maxT − delay) can never pass a
    * yet-undelivered row's timestamp: out of order, never late.
    * jitterSec = 0 is the ascending regime. */
  private def deliverJittered[T](rows: Seq[T], tsSec: T => Long,
      jitterSec: Long, rnd: Random): Seq[T] =
    if (jitterSec == 0L) rows
    else rows.map(r => (r, tsSec(r) + rnd.between(0L, jitterSec + 1)))
      .sortBy(_._2).map(_._1)

  /** Cut an ascending event sequence at random batch boundaries. */
  private def randomBatches[T](rows: Seq[T], rnd: Random): Seq[Seq[T]] = {
    val out = scala.collection.mutable.ListBuffer.empty[Seq[T]]
    var rest = rows
    while (rest.nonEmpty) {
      val k = 1 + rnd.nextInt(math.min(rest.size, 9))
      out += rest.take(k); rest = rest.drop(k)
    }
    out.toList
  }

  /** Run a streaming query over the batches, then two far-future
    * sentinel batches (advance the watermark, then fire the armed
    * event-time timeouts against it), and return the collected sink. */
  private def runStream[T <: Product : org.apache.spark.sql.Encoder](
      name: String, batches: Seq[Seq[T]], sentinels: Seq[Seq[T]],
      mk: DataFrame => DataFrame): Array[org.apache.spark.sql.Row] = {
    val input = MemoryStream[T](spark)
    val q = mk(input.toDF()).writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      sentinels.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).collect()
  }

  private val SENTINEL = 999999L

  test("sessionizeStream randomized parity: random corpora, random batch cuts, in-window redelivery, ordered + jittered, 5 seeds") {
    for (seed <- 1 to 5; jit <- Seq(0L, 9L)) {
      val rnd = new Random(2600L + seed)
      // 5 users, 80 events over 600s, gap 30s, watermark 10s: sessions
      // close continuously as the watermark advances
      val evs = (1 to 80).map { i =>
        (i.toLong, rnd.nextInt(5) + 1L, rnd.nextInt(600).toLong,
          rnd.nextInt(9) * 0.25)
      }.sortBy(_._3)
      // redeliver ~20% of events immediately after the original (same
      // ts keeps the feed ascending; within the watermark window, so
      // only in-state dedup can drop the copy)
      val fed = deliverJittered(
        evs.flatMap(e => if (rnd.nextInt(5) == 0) Seq(e, e) else Seq(e)),
        (e: (Long, Long, Long, Double)) => e._3, jit, rnd)
      val batches = randomBatches(
        fed.map(e => (e._1, e._2, ts(e._3), e._4)), rnd)
      val sent = Seq(Seq((SENTINEL, SENTINEL, ts(86400L * 30), 0.0)),
        Seq((SENTINEL + 1, SENTINEL, ts(86400L * 31), 0.0)))
      val got = runStream[(Long, Long, Timestamp, Double)](
        s"sess_par_${seed}_$jit", batches, sent,
        df => graft.streaming.Events.sessionizeStream(spark,
          df.toDF("event_id", "user_id", "ts", "value"),
          gapSec = 30L, watermark = "10 seconds",
          eventIdCol = Some("event_id")))
        .filter(_.getLong(0) != SENTINEL)
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime) ->
          ((r.getTimestamp(2).getTime, r.getLong(3), r.getLong(4),
            r.getDouble(5)))).toMap
      // reference: per user, sort, split on strictly-greater gap
      val want = evs.groupBy(_._2).flatMap { case (uid, es) =>
        val sorted = es.map(e => (e._3, e._4)).sortBy(_._1)
        val sessions = sorted.tail.foldLeft(List(List(sorted.head))) {
          case (acc, e) =>
            if (e._1 - acc.head.head._1 > 30L) List(e) :: acc
            else (e :: acc.head) :: acc.tail
        }.map(_.reverse).reverse
        sessions.map { s =>
          val (startS, endS) = (s.head._1, s.last._1)
          (uid, (baseSec + startS) * 1000L) ->
            (((baseSec + endS) * 1000L, s.size.toLong,
              (endS - startS) * 1000000L, r6hu(s.map(_._2).sum)))
        }
      }
      assert(got == want,
        s"sessionize seed=$seed jit=$jit\ngot=$got\nwant=$want")
    }
  }

  test("funnelStream randomized parity: greedy-earliest chains under random cuts, ordered + jittered, 5 seeds") {
    val steps = Seq("a", "b", "c")
    for (seed <- 1 to 5; jit <- Seq(0L, 9L)) {
      val rnd = new Random(2700L + seed)
      // noise type "zz" exercises the filter-before-watermark; withinSec
      // 40 over a 400s span, watermark 10s → deadlines pass mid-stream
      val types = Vector("a", "b", "c", "zz")
      val evs = (1 to 90).map { _ =>
        (rnd.nextInt(6) + 1L, rnd.nextInt(400).toLong,
          types(rnd.nextInt(4)))
      }.sortBy(_._2)
      val fed = deliverJittered(evs,
        (e: (Long, Long, String)) => e._2, jit, rnd)
      val batches = randomBatches(fed.map(e => (e._1, ts(e._2), e._3)), rnd)
      val sent = Seq(Seq((SENTINEL, ts(86400L * 30), "a")),
        Seq((SENTINEL, ts(86400L * 31), "a")))
      val got = runStream[(Long, Timestamp, String)](
        s"funnel_par_${seed}_$jit", batches, sent,
        df => graft.streaming.Events.funnelStream(spark,
          df.toDF("user_id", "ts", "event_type"),
          steps, withinSec = 40L, watermark = "10 seconds"))
        .filter(_.getLong(0) != SENTINEL)
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2),
          r.getSeq[Long](3).toList))).toMap
      val wUs = 40L * 1000000L
      val want = evs.groupBy(_._1).flatMap { case (uid, es) =>
        val byType = es.filter(_._3 != "zz")
          .map(e => (us(e._2), steps.indexOf(e._3))).groupBy(_._2)
        byType.get(0).map(_.map(_._1).min).map { anchor =>
          var chain = Vector(anchor); var broken = false
          for (i <- 1 until steps.size if !broken) {
            val cand = byType.getOrElse(i, Nil).map(_._1)
              .filter(t => t >= chain.last && t - chain.last <= wUs)
            if (cand.isEmpty) broken = true else chain :+= cand.min
          }
          uid -> ((chain.size.toLong, chain.size == steps.size, chain.toList))
        }
      }
      assert(got == want, s"funnel seed=$seed jit=$jit\ngot=$got\nwant=$want")
    }
  }

  test("funnelStream tombstone TTL: re-acquisition journeys under random cuts, ordered + jittered, 5 seeds") {
    val steps = Seq("a", "b")
    val withinSec = 20L
    val ttlSec = 30L
    val horizonUs = (steps.size - 1) * withinSec * 1000000L
    for (seed <- 1 to 5; jit <- Seq(0L, 9L)) {
      val rnd = new Random(3300L + seed)
      // few keys over a long span → several journeys per key, with
      // events inside the suppression window (deadline, deadline+ttl]
      val types = Vector("a", "a", "b")
      val evs = (1 to 80).map { _ =>
        (rnd.nextInt(3) + 1L, rnd.nextInt(600).toLong,
          types(rnd.nextInt(3)))
      }.sortBy(_._2)
      val fed = deliverJittered(evs,
        (e: (Long, Long, String)) => e._2, jit, rnd)
      val batches = randomBatches(fed.map(e => (e._1, ts(e._2), e._3)), rnd)
      val sent = Seq(Seq((SENTINEL, ts(86400L * 30), "a")),
        Seq((SENTINEL, ts(86400L * 31), "a")))
      val got = runStream[(Long, Timestamp, String)](
        s"funnel_ttl_${seed}_$jit", batches, sent,
        df => graft.streaming.Events.funnelStream(spark,
          df.toDF("user_id", "ts", "event_type"),
          steps, withinSec, watermark = "10 seconds",
          tombstoneTtlSec = Some(ttlSec)))
        .filter(_.getLong(0) != SENTINEL)
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
          r.getSeq[Long](3).toList))
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4))
          .sortBy(_._3.headOption.getOrElse(0L)).toList).toMap
      // reference: iterate journeys — chain from the earliest step-1
      // among remaining events; everything at or before deadline+ttl
      // is consumed; the rest starts the next journey
      val want = evs.groupBy(_._1).map { case (uid, es) =>
        val all = es.map(e => (us(e._2), steps.indexOf(e._3)))
        val rows = scala.collection.mutable.ListBuffer
          .empty[(Long, Boolean, List[Long])]
        var rest = all
        var going = true
        while (going) {
          val anchors = rest.collect { case (t, 0) => t }
          if (anchors.isEmpty) going = false
          else {
            val anchor = anchors.min
            val byType = rest.groupBy(_._2)
            var chain = Vector(anchor); var broken = false
            for (i <- 1 until steps.size if !broken) {
              val cand = byType.getOrElse(i, Nil).map(_._1)
                .filter(t => t >= chain.last &&
                  t - chain.last <= withinSec * 1000000L)
              if (cand.isEmpty) broken = true else chain :+= cand.min
            }
            rows += ((chain.size.toLong, chain.size == steps.size,
              chain.toList))
            val expiry = anchor + horizonUs + ttlSec * 1000000L
            rest = rest.filter(_._1 > expiry)
          }
        }
        uid -> rows.toList.sortBy(_._3.headOption.getOrElse(0L))
      }
      assert(got == want,
        s"funnel ttl seed=$seed jit=$jit\ngot=$got\nwant=$want")
      assert(got.values.exists(_.size > 1),
        s"fixture must produce at least one re-acquired journey: seed=$seed jit=$jit")
    }
  }

  test("decayStream randomized parity: O(1) carry recurrence under random cuts and redelivery, ordered + jittered, 5 seeds") {
    val halfLife = 20L
    val lam = math.log(2.0) / halfLife
    for (seed <- 1 to 5; jit <- Seq(0L, 9L)) {
      val rnd = new Random(2800L + seed)
      // coarse 5s time grid → same-timestamp TIES are dense (the
      // range-frame tie rule), values on 0.25 grid → tie-group sums
      // exact in any buffer order
      val evs = (1 to 70).map { i =>
        (i.toLong, rnd.nextInt(4) + 1L, rnd.nextInt(60) * 5L,
          rnd.nextInt(9) * 0.25)
      }.sortBy(_._3)
      val fed = deliverJittered(
        evs.flatMap(e => if (rnd.nextInt(5) == 0) Seq(e, e) else Seq(e)),
        (e: (Long, Long, Long, Double)) => e._3, jit, rnd)
      val batches = randomBatches(
        fed.map(e => (e._1, e._2, ts(e._3), e._4)), rnd)
      val sent = Seq(Seq((SENTINEL, SENTINEL, ts(86400L * 30), 0.0)),
        Seq((SENTINEL + 1, SENTINEL, ts(86400L * 31), 0.0)))
      val got = runStream[(Long, Long, Timestamp, Double)](
        s"decay_par_${seed}_$jit", batches, sent,
        df => graft.streaming.Events.decayStream(spark,
          df.toDF("event_id", "user_id", "ts", "value"),
          halfLifeSec = halfLife, watermark = "10 seconds"))
        .filter(_.getLong(1) != SENTINEL)
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      // reference: the same per-timestamp-group recurrence
      val want = evs.groupBy(_._2).flatMap { case (_, es) =>
        var carryUs = Long.MinValue; var carry = 0.0
        es.groupBy(_._3).toSeq.sortBy(_._1).flatMap { case (tOff, group) =>
          val tUs = us(tOff)
          val decayed = if (carryUs == Long.MinValue) 0.0
            else carry * math.exp(-lam * ((tUs - carryUs).toDouble / 1e6))
          carry = decayed + group.map(_._4).sum
          carryUs = tUs
          group.map(e => e._1 -> r6hu(decayed))
        }
      }
      assert(got == want, s"decay seed=$seed jit=$jit\ngot=$got\nwant=$want")
    }
  }

  test("cohortRetentionStream randomized parity: unbounded and horizon re-acquisition, ordered + jittered, 5 seeds") {
    val periodDays = 2
    // in-memory reference of the documented ledger loop: emit distinct
    // periods <= maxP from the first-activity cohort; beyond-horizon
    // activity re-enters as a FRESH cohort (re-acquisition semantics)
    def ref(timesUs: Seq[Long], maxP: Option[Long]): Set[(String, Long)] = {
      val out = scala.collection.mutable.Set.empty[(String, Long)]
      var rest = timesUs.sorted
      val mp = maxP.getOrElse(Long.MaxValue)
      while (rest.nonEmpty) {
        val cohortDay = dayOfUs(rest.head)
        val withP = rest.map(t => (t, java.time.temporal.ChronoUnit.DAYS
          .between(cohortDay, dayOfUs(t)) / periodDays))
        out ++= withP.filter(_._2 <= mp)
          .map(p => (cohortDay.toString, p._2)).toSet
        rest = if (maxP.isEmpty) Nil else withP.collect {
          case (t, p) if p > mp => t }
      }
      out.toSet
    }
    for (seed <- 1 to 5; maxP <- Seq(None, Some(1L)); jit <- Seq(0L, 3599L)) {
      val rnd = new Random(2900L + seed)
      // 6 users over 18 days; horizon (P+1)·periodDays = 4 days →
      // several re-acquisition generations per key
      val evs = (1 to 60).map { _ =>
        (rnd.nextInt(6) + 1L, rnd.nextInt(18 * 86400).toLong)
      }.sortBy(_._2)
      val fed = deliverJittered(evs, (e: (Long, Long)) => e._2, jit, rnd)
      val batches = randomBatches(fed.map(e => (e._1, ts(e._2))), rnd)
      val sent = Seq(Seq((SENTINEL, ts(86400L * 60))),
        Seq((SENTINEL, ts(86400L * 61))))
      val got = runStream[(Long, Timestamp)](
        s"cohort_par_${seed}_${maxP.isDefined}_$jit", batches, sent,
        df => graft.streaming.Events.cohortRetentionStream(spark,
          df.toDF("user_id", "ts"), periodDays = periodDays,
          watermark = "1 hour", maxPeriods = maxP))
        .filter(_.getLong(2) != SENTINEL)
        .map(r => (r.getLong(2), r.getString(0), r.getLong(1)))
      assert(got.length == got.toSet.size,
        s"cohort pairs must be exactly-once: seed=$seed maxP=$maxP jit=$jit")
      val gotSet = got.map(t => (t._1, t._2, t._3)).toSet
      val want = evs.groupBy(_._1).flatMap { case (uid, es) =>
        ref(es.map(e => us(e._2)), maxP).map(p => (uid, p._1, p._2))
      }.toSet
      assert(gotSet == want,
        s"cohort seed=$seed maxP=$maxP jit=$jit\ngot=$gotSet\nwant=$want")
    }
  }

  test("attributionStream randomized parity: trailing-window first/last touch under random cuts, ordered + jittered, 5 seeds") {
    val windowSec = 60L
    val wUs = windowSec * 1000000L
    for (seed <- 1 to 5; jit <- Seq(0L, 9L)) {
      val rnd = new Random(3100L + seed)
      val types = Vector("touch", "touch", "conv", "noise")
      val evs = (1 to 80).map { i =>
        (i.toLong, rnd.nextInt(5) + 1L, rnd.nextInt(500).toLong,
          types(rnd.nextInt(4)), rnd.nextInt(9) * 0.25)
      }.sortBy(_._3)
      // redeliver some conversions adjacent (same id): only the
      // in-state distinctBy can stop double attribution
      val fed = deliverJittered(
        evs.flatMap(e =>
          if (e._4 == "conv" && rnd.nextInt(3) == 0) Seq(e, e) else Seq(e)),
        (e: (Long, Long, Long, String, Double)) => e._3, jit, rnd)
      val batches = randomBatches(
        fed.map(e => (e._2, ts(e._3), e._1, e._4, e._5)), rnd)
      val sent = Seq(Seq((SENTINEL, ts(86400L * 30), SENTINEL, "touch", 0.0)),
        Seq((SENTINEL, ts(86400L * 31), SENTINEL + 1, "touch", 0.0)))
      val got = runStream[(Long, Timestamp, Long, String, Double)](
        s"attr_par_${seed}_$jit", batches, sent,
        df => graft.streaming.Events.attributionStream(spark,
          df.toDF("user_id", "ts", "event_id", "event_type", "value"),
          "conv", "touch", windowSec, watermark = "10 seconds"))
        .filter(_.getLong(1) != SENTINEL)
        .map(r => r.getLong(0) -> ((r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
      val want = evs.groupBy(_._2).flatMap { case (_, es) =>
        val touches = es.collect { case (_, _, off, "touch", _) => us(off) }
        es.collect { case (id, _, off, "conv", v) =>
          val cts = us(off)
          val in = touches.filter(t => t <= cts && t >= cts - wUs)
          id -> ((r6hu(v),
            if (in.isEmpty) None else Some(cts - in.min),
            if (in.isEmpty) None else Some(cts - in.max)))
        }
      }
      assert(got == want,
        s"attribution seed=$seed jit=$jit\ngot=$got\nwant=$want")
    }
  }

  test("cusumStream randomized parity: day-bar fold equals the in-memory recursion, ordered + jittered, 5 seeds") {
    val (mean, sd) = (4.0, 2.0)
    for (seed <- 1 to 5; jit <- Seq(0L, 3599L)) {
      val rnd = new Random(3200L + seed)
      // Poisson-ish day counts over 12 days with gaps
      val evs = (1 to 50).map { _ =>
        rnd.nextInt(12 * 86400).toLong
      }.sorted
      val fed = deliverJittered(evs, (o: Long) => o, jit, rnd)
      val batches = randomBatches(fed.map(o => Tuple1(ts(o))), rnd)
      val sent = Seq(Seq(Tuple1(ts(86400L * 60))), Seq(Tuple1(ts(86400L * 61))))
      val got = runStream[Tuple1[Timestamp]](
        s"cusum_par_${seed}_$jit", batches, sent,
        df => graft.streaming.Events.cusumStream(spark,
          df.toDF("ts"), mean, sd, watermark = "1 hour"))
        .filter(_.getString(0) < "2024-04-01")
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getBoolean(4)))).toMap
      def r6(x: Double) = graft.core.Round.r6(x)
      var sp = 0.0; var sn = 0.0
      val want = evs.groupBy(_ / 86400L).toSeq.sortBy(_._1).map {
        case (day, xs) =>
          val x = xs.size.toLong
          val (sp2, sn2, alarm) = graft.ops.EventAnalytics.cusumStep(
            sp, sn, x, mean, sd, 0.5, 4.0)
          sp = sp2; sn = sn2
          dayOfUs(us(day * 86400L)).toString -> ((x, r6(sp), r6(sn), alarm))
      }.toMap
      assert(got == want, s"cusum seed=$seed jit=$jit\ngot=$got\nwant=$want")
    }
  }

  test("kaplanMeierStream randomized parity: finality + tombstone under random cuts, ordered + jittered, 5 seeds") {
    val censorDay = "2024-03-11" // base + 10 days, inclusive
    val censorEndUs = us(86400L * 11) - 1L
    for (seed <- 1 to 5; jit <- Seq(0L, 3599L)) {
      val rnd = new Random(3000L + seed)
      val types = Vector("start", "conv", "noise")
      // starts/conversions over 16 days — some keys start after the
      // horizon (never emit), some convert only after it (censored)
      val evs = (1 to 70).map { _ =>
        (rnd.nextInt(8) + 1L, rnd.nextInt(16 * 86400).toLong,
          types(rnd.nextInt(3)))
      }.sortBy(_._2)
      val fed = deliverJittered(evs,
        (e: (Long, Long, String)) => e._2, jit, rnd)
      val batches = randomBatches(fed.map(e => (e._1, ts(e._2), e._3)), rnd)
      val sent = Seq(Seq((SENTINEL, ts(86400L * 60), "start")),
        Seq((SENTINEL, ts(86400L * 61), "start")))
      val rows = runStream[(Long, Timestamp, String)](
        s"km_par_${seed}_$jit", batches, sent,
        df => graft.streaming.Events.kaplanMeierStream(spark,
          df.toDF("user_id", "ts", "event_type"),
          "start", "conv", censorDay, watermark = "1 hour"))
        .filter(_.getLong(0) != SENTINEL)
      assert(rows.map(_.getLong(0)).distinct.length == rows.length,
        s"KM must emit at most one row per key: seed=$seed jit=$jit")
      val got = rows.map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
      val want = evs.groupBy(_._1).flatMap { case (uid, es) =>
        val starts = es.collect { case (_, t, "start") => us(t) }
        if (starts.isEmpty) None
        else {
          val t0 = starts.min
          if (t0 > censorEndUs) None
          else {
            val convs = es.collect { case (_, t, "conv") => us(t) }
              .filter(_ >= t0)
            val t1 = if (convs.isEmpty) Long.MaxValue else convs.min
            if (t1 <= censorEndUs)
              Some(uid -> ((java.time.temporal.ChronoUnit.DAYS
                .between(dayOfUs(t0), dayOfUs(t1)), 1)))
            else
              Some(uid -> ((java.time.temporal.ChronoUnit.DAYS
                .between(dayOfUs(t0), dayOfUs(censorEndUs)), 0)))
          }
        }
      }
      assert(got == want, s"km seed=$seed jit=$jit\ngot=$got\nwant=$want")
    }
  }
}
