package graft

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.ops.Temporal

/** Randomized brute-force parity for the temporal operators — the
  * test class that caught the streaming exactly-once bugs in round 11
  * (hand scenarios sample the semantics; seeded random corpora walk
  * the whole tie/null/boundary space). Each trial builds a small
  * random event set (few keys so collisions are dense, a narrow
  * timestamp range so exact ties occur, values on a 0.25 grid so
  * float sums are exact in any order) and compares the operator
  * against a direct in-memory reference implementation of the
  * documented contract.
  */
class TemporalParitySpec extends SparkSpec {
  import spark.implicits._

  private def t(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("asofJoin parity: backward/forward x tolerance x null payloads, 20 seeds") {
    for (seed <- 1 to 20) {
      val rnd = new Random(400L + seed)
      val probes = (1 to 30).map(i =>
        (rnd.nextInt(4) + 1, t(rnd.nextInt(120).toLong), i))
        .toDF("k", "pts", "probe_id")
      // build rows unique per (key, ts) — the operator's contract;
      // payload nulls exercised (skipped as "no observation")
      val buildRows = rnd.shuffle(
        (for (k <- 1 to 4; s <- 0 until 120) yield (k, s)).toList)
        .take(40)
        .map { case (k, s) =>
          (k, t(s.toLong), if (rnd.nextInt(5) == 0) null
            else java.lang.Double.valueOf(rnd.nextInt(8) / 4.0))
        }
      val build = buildRows.toDF("k", "pts", "v")
      val tol = if (rnd.nextBoolean()) Some(rnd.nextInt(30).toLong + 1L) else None
      for (dir <- Seq("backward", "forward")) {
        val got = Temporal.asofJoin(probes, build, "k", "pts", Seq("v"),
            direction = dir, toleranceSec = tol, emitBuildTs = true)
          .select("probe_id", "asof_v", "asof_ts")
          .collect().map(r => r.getInt(0) ->
            ((Option(r.get(1)).map(_.asInstanceOf[Double]),
              Option(r.get(2)).map(_.asInstanceOf[Timestamp].getTime))))
          .toMap
        val byKey = buildRows.groupBy(_._1)
        val want = probes.collect().map { r =>
          val (k, pts, id) = (r.getInt(0), r.getTimestamp(1).getTime, r.getInt(2))
          val cands = byKey.getOrElse(k, Nil)
            .filter(b => if (dir == "backward") b._2.getTime <= pts
              else b._2.getTime >= pts)
          // the matched ROW is the nearest by ts (payload-null rows
          // count as matches for asof_ts and the tolerance mask); the
          // VALUE is the nearest row with a non-null payload
          val rowTs =
            if (cands.isEmpty) None
            else Some(if (dir == "backward") cands.map(_._2.getTime).max
              else cands.map(_._2.getTime).min)
          val valTs = {
            val nn = cands.filter(_._3 != null)
            if (nn.isEmpty) None
            else Some(if (dir == "backward") nn.map(_._2.getTime).max
              else nn.map(_._2.getTime).min)
          }
          val within = rowTs.exists(bt =>
            tol.forall(tl => math.abs(bt - pts) <= tl * 1000L))
          val v = if (within)
            valTs.flatMap(vt => cands.find(_._2.getTime == vt).map(_._3))
              .flatMap(Option(_)).map(_.doubleValue())
          else None
          val bt = if (within) rowTs else None
          id -> (v, bt)
        }.toMap
        assert(got == want, s"asofJoin $dir tol=$tol seed=$seed")
      }
    }
  }

  test("sessionize parity: random timelines vs direct gaps-and-islands, 20 seeds") {
    for (seed <- 1 to 20) {
      val rnd = new Random(500L + seed)
      val events = (1 to 80).map(_ =>
        (rnd.nextInt(4) + 1, t(rnd.nextInt(400).toLong), rnd.nextInt(8) / 4.0))
      val gapSec = rnd.nextInt(20).toLong + 2L
      val got = Temporal.sessionize(events.toDF("k", "ts", "v"), "k", "ts", "v", gapSec)
        .collect().map(r => ((r.getInt(0), r.getLong(1)),
          (r.getLong(2), r.getTimestamp(3).getTime, r.getTimestamp(4).getTime,
            r.getLong(5), r.getDouble(6)))).toMap
      val want = events.groupBy(_._1).flatMap { case (k, evs) =>
        val sorted = evs.map(e => (e._2.getTime, e._3)).sortBy(_._1)
        // split strictly-greater gaps; ties and <= gap stay together
        val sessions = sorted.tail.foldLeft(Vector(Vector(sorted.head))) {
          case (acc, e) =>
            if (e._1 - acc.last.last._1 > gapSec * 1000L) acc :+ Vector(e)
            else acc.init :+ (acc.last :+ e)
        }
        sessions.zipWithIndex.map { case (s, i) =>
          val sum = math.floor(s.map(_._2).sum * 1e6 + 0.5) / 1e6
          (k, (i + 1).toLong) ->
            (s.size.toLong, s.head._1, s.last._1,
              (s.last._1 - s.head._1) * 1000L, sum)
        }
      }
      assert(got == want, s"sessionize gap=$gapSec seed=$seed")
    }
  }

  test("rollingFeatures parity: strictly-prior RANGE frames vs direct scan, 20 seeds") {
    for (seed <- 1 to 20) {
      val rnd = new Random(600L + seed)
      // dense ties: 60 events over 40 distinct seconds and 3 keys
      val events = (1 to 60).map(i =>
        (rnd.nextInt(3) + 1, t(rnd.nextInt(40).toLong), rnd.nextInt(8) / 4.0, i))
      val winSec = rnd.nextInt(12).toLong + 2L
      val got = Temporal.rollingFeatures(
          events.toDF("k", "ts", "v", "id"), "k", "ts", "v", winSec)
        .select("id", "n_prior_win", "sum_prior_win", "n_prior_total")
        .collect().map(r => r.getInt(0) ->
          (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
      val byKey = events.groupBy(_._1)
      val want = events.map { case (k, ts0, _, id) =>
        val us = ts0.getTime * 1000L
        val prior = byKey(k).filter(_._2.getTime * 1000L < us)
        val win = prior.filter(_._2.getTime * 1000L >= us - winSec * 1000000L)
        id -> (win.size.toLong,
          math.floor(win.map(_._3).sum * 1e6 + 0.5) / 1e6, prior.size.toLong)
      }.toMap
      assert(got == want, s"rollingFeatures win=$winSec seed=$seed")
    }
  }

  test("rangeJoinCount parity: granule equi-join vs direct containment scan, 20 seeds") {
    for (seed <- 1 to 20) {
      val rnd = new Random(800L + seed)
      val intervals = (1 to 25).map { i =>
        val s = rnd.nextInt(300)
        // zero-length and granule-spanning intervals both occur
        (i.toLong, t(s.toLong), t((s + rnd.nextInt(60)).toLong))
      }
      val points = (1 to 120).map(_ =>
        (t(rnd.nextInt(330).toLong), rnd.nextInt(8) / 4.0))
      val granule = rnd.nextInt(25).toLong + 1L
      val got = Temporal.rangeJoinCount(
          intervals.toDF("iid", "s", "e"), points.toDF("pt", "pv"),
          "iid", "s", "e", "pt", "pv", granule)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val want = intervals.map { case (iid, s, e) =>
        val in = points.filter(p =>
          p._1.getTime >= s.getTime && p._1.getTime < e.getTime)
        iid -> ((in.size.toLong, math.floor(in.map(_._2).sum * 1e6 + 0.5) / 1e6))
      }.toMap
      assert(got == want, s"rangeJoinCount granule=$granule seed=$seed")
    }
  }

  test("peakConcurrency parity: sweep line vs per-microsecond direct max, 12 seeds") {
    for (seed <- 1 to 12) {
      val rnd = new Random(900L + seed)
      // events across ~3 days so midnight carry-in occurs
      val events = (1 to 60).map(_ =>
        (rnd.nextInt(5) + 1, t(rnd.nextInt(260000).toLong), 1.0))
      val gapSec = rnd.nextInt(4000).toLong + 60L
      val got = Temporal.peakConcurrency(
          events.toDF("k", "ts", "v"), "k", "ts", "v", gapSec)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // reference: materialize sessions directly, then evaluate the
      // running concurrency at every session boundary and midnight
      val sessions = events.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
        val sorted = evs.map(_._2.getTime).sorted
        sorted.tail.foldLeft(Vector(Vector(sorted.head))) { case (acc, e) =>
          if (e - acc.last.last > gapSec * 1000L) acc :+ Vector(e)
          else acc.init :+ (acc.last :+ e)
        }.map(s => (s.head, s.last))
      }
      val d0 = sessions.map(_._1).min; val d1 = sessions.map(_._2).max
      val midnights = (d0 / 86400000L to d1 / 86400000L).map(_ * 86400000L)
      // starts + midnights suffice: concurrency only DECREASES at a
      // session end, so an end-side sample never sets a day's max —
      // and an end+1s sample was seed-fragile (a session ending in the
      // last second of a day attributed the post-end reading to a day
      // the operator never emits)
      val instants = (sessions.map(_._1) ++ midnights).distinct.sorted
      val want = instants.map { i =>
        val conc = sessions.count(s => s._1 <= i && i <= s._2)
        val day = java.time.Instant.ofEpochMilli(i)
          .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
        (day, conc.toLong)
      }.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).max }
      assert(got == want, s"peakConcurrency gap=$gapSec seed=$seed")
    }
  }

  test("cohortRetention parity: per-key period alignment vs direct scan, 15 seeds") {
    for (seed <- 1 to 15) {
      val rnd = new Random(1000L + seed)
      val events = (1 to 90).map(_ =>
        (rnd.nextInt(8) + 1, t(rnd.nextInt(40).toLong * 86400L + rnd.nextInt(86400).toLong)))
      val periodDays = rnd.nextInt(6) + 1
      val mp = if (rnd.nextBoolean()) Some(rnd.nextInt(4).toLong + 1L) else None
      val got = Temporal.cohortRetention(
          events.toDF("k", "ts"), "k", "ts", periodDays, mp)
        .collect().map(r => (r.getDate(0).toString, r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
      val byKey = events.groupBy(_._1)
      val pairs = byKey.toSeq.flatMap { case (k, evs) =>
        val days = evs.map(e => e._2.getTime / 86400000L).distinct
        val first = days.min
        days.map(d => (k, first, (d - first) / periodDays))
          .filter(p => mp.forall(p._3 <= _)).distinct
      }
      val matrix = pairs.groupBy(p => (p._2, p._3))
        .map { case ((c, per), xs) => (c, per) -> xs.map(_._1).distinct.size.toLong }
      val want = matrix.map { case ((c, per), n) =>
        val size = matrix((c, 0L))
        val day = java.time.LocalDate.ofEpochDay(c).toString
        (day, per) -> ((n, size, math.floor(n.toDouble / size * 1e6 + 0.5) / 1e6))
      }
      assert(got == want, s"cohortRetention period=$periodDays mp=$mp seed=$seed")
    }
  }

  test("funnel parity: greedy-earliest walk vs direct reference, 20 seeds") {
    val steps = Seq("a", "b", "c")
    for (seed <- 1 to 20) {
      val rnd = new Random(700L + seed)
      val events = (1 to 70).map(_ =>
        (rnd.nextInt(5) + 1, t(rnd.nextInt(60).toLong),
          steps(rnd.nextInt(3))))
      val within = rnd.nextInt(15).toLong + 1L
      val got = Temporal.funnel(
          events.toDF("k", "ts", "et"), "k", "ts", "et", steps, within)
        .collect().map(r => r.getInt(0) ->
          ((1 to 3).map(i => Option(r.getTimestamp(i)).map(_.getTime)),
            r.getLong(4), r.getBoolean(5))).toMap
      val byKey = events.groupBy(_._1)
      val want = byKey.flatMap { case (k, evs) =>
        val firstA = evs.filter(_._3 == "a").map(_._2.getTime)
        if (firstA.isEmpty) None
        else {
          var times = Vector[Option[Long]](Some(firstA.min))
          for (st <- steps.tail) {
            val next = times.last.flatMap { prev =>
              val cand = evs.filter(e => e._3 == st && e._2.getTime >= prev)
                .map(_._2.getTime)
              cand.minOption.filter(c => c - prev <= within * 1000L)
            }
            times :+= next
          }
          Some(k -> (times.map(_.map(identity)),
            times.count(_.isDefined).toLong, times.last.isDefined))
        }
      }
      assert(got == want, s"funnel within=$within seed=$seed")
    }
  }
}
