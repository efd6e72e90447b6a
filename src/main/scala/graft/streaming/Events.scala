package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2.11 extension: incremental scoring of the `events` table with
  * Structured Streaming. The reference is batch-only (no streaming
  * anywhere in FastMLFramework — SURVEY §2.11), so this family is
  * additive: the same aggregations the batch engine computes, expressed
  * as an incremental plan with watermarked state cleanup.
  *
  * The events parquet's `ts` encoding has varied across testdata
  * generations — TIMESTAMP(NANOS) (read as epoch-nanos long under
  * `nanosAsLong`, Sessions.scala) vs plain timestamp[us] (read as
  * TIMESTAMP_NTZ) — so `normalize` adapts to whatever schema the scan
  * presents and every downstream consumer sees one canonical
  * micro-precision TimestampType column.
  */
// Serializable: the stateful handlers below call the object-level
// µs/day/rounding helpers, so the executor closures capture this
// module reference
object Events extends Serializable {

  /** Canonicalize `ts` to TimestampType at micro precision, whatever
    * the parquet encoding. Schema-adaptive:
    *  - LongType (epoch nanos via `nanosAsLong`): integer floor-div,
    *    NOT `/ 1000` — epoch nanos (~1.7e18) exceed a double's 53-bit
    *    mantissa, so float division drifts by ±1 µs. DuckDB's ns→us
    *    parquet read truncates the same way.
    *  - TIMESTAMP_NTZ (timestamp[us], no tz): cast to TimestampType;
    *    the session timezone is pinned UTC (Sessions.scala) so the
    *    instant is unchanged and DuckDB reads the identical value.
    *  - TimestampType: already canonical. */
  def normalize(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case org.apache.spark.sql.types.TimestampNTZType =>
      df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    case org.apache.spark.sql.types.TimestampType => df
    case other =>
      throw new IllegalArgumentException(
        s"events.ts: unsupported type $other (expected long nanos or timestamp)")
  }

  /** Hourly per-type windowed aggregate with a 1-hour watermark:
    * identical semantics batch or stream (run it on `readStream` for
    * incremental execution; state for closed windows is dropped by the
    * watermark). */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      // exact micro-unit sum (q1-family): an (hour, type) cell sums a
      // whole event type's hourly volume — order-independent integers
      // keep batch, stream, and any replaying engine bit-equal
      .agg(count(lit(1)).as("n_events"),
        round(graft.core.ExactSum.micro(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming dedup for at-least-once delivery: duplicate events
    * (same key columns) arriving within the watermark horizon are
    * dropped; state for keys older than the watermark is evicted, so
    * memory is bounded by the horizon x key arrival rate — the
    * incremental counterpart of the batch exact-dedup family
    * (graft.dedup.Dedup.exact). Works on batch frames too (falls back
    * to plain dropDuplicates semantics over the bounded input). */
  def dedupWithinWatermark(
      events: DataFrame, keyCols: Seq[String], watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  // ---- redelivery-dedup id columns -----------------------------------
  // The in-state distinctBy guards (sessionize/decay/attribution) key on
  // a Long identity. A blind cast("long") is a foot-gun: a string/UUID
  // id casts to NULL, every buffered event then shares one identity and
  // distinctBy drops all but one — silent data loss worse than the
  // redelivery bug the dedup fixes. These helpers make the contract
  // explicit instead.

  private def isIntegral(df: DataFrame, name: String): Boolean =
    df.schema(name).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }

  /** Runtime fail-fast on null ids: a null identity would collapse the
    * whole dedup buffer into one event. */
  private def guardNull(raw: Column, idExpr: Column, name: String): Column =
    when(raw.isNull, raise_error(lit(
      s"graft: dedup id column '$name' contains a null — a null " +
        "identity would collapse every buffered event into one and " +
        "silently drop data; ids must be non-null and unique per event")))
      .otherwise(idExpr)

  /** Epoch microseconds of a timestamp — THE event-time unit every
    * stateful handler below buffers and compares in (one definition:
    * a per-operator local copy would let a truncation or tie rule
    * drift between operators). */
  private def usOf(t: java.sql.Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  /** UTC calendar day of an epoch-µs instant (cohort / survival day
    * arithmetic — matches the batch operators' date_trunc). */
  private def dayOf(us: Long): java.time.LocalDate =
    java.time.Instant.ofEpochSecond(us / 1000000L)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate

  /** Emission rounding for JVM-computed doubles: BigDecimal HALF_UP at
    * 6 decimals — deliberately NOT [[graft.core.Round.r6]] (whose
    * float path differs on half-µ ties); the parity specs compare
    * these rounded values against the batch operators'. */
  private def r6hu(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Identity for [[sessionizeStream]]'s `eventIdCol` (never emitted):
    * integral ids pass through exactly; any other type — string, UUID,
    * binary, decimal — is fingerprinted with xxhash64 over the RAW
    * value, so dedup works instead of silently null-casting. */
  private def dedupIdentity(df: DataFrame, name: String): Column = {
    val raw = col(name)
    guardNull(raw,
      if (isIntegral(df, name)) raw.cast("long") else xxhash64(raw), name)
  }

  /** Identity for streams that EMIT `event_id` in their output rows
    * (decay, attribution). Integral ids pass through exactly. String
    * ids parse as longs (numeric-typed-as-string sources keep their
    * ids verbatim — restores the pre-round-13 behavior the blanket
    * fail-fast briefly broke); a string that does NOT parse (UUIDs)
    * fails loudly at runtime with the remedy in the message, never
    * silently null-collapsing the dedup. With `fingerprint = true`
    * (the shipped remedy) any non-integral id is xxhash64-fingerprinted
    * over the raw value — dedup is correct and the OUTPUT's event_id
    * is then a 64-bit fingerprint of the source id, not the id itself
    * (documented on the operators). Other non-integral types (decimal,
    * double, binary) without the opt-in still fail fast at plan
    * time: a lossy cast would silently merge distinct ids.
    *
    * The string parse is `try_cast` + a round-trip compare, for two
    * reasons: a plain `cast` throws CAST_INVALID_INPUT under Spark 4's
    * default ANSI mode before the remedy message could ever fire
    * (try_cast yields null instead), and under non-ANSI sessions a
    * plain cast TRUNCATES ('7.5' and '7.4' both become 7, '042'
    * collides with '42') — silently merging distinct ids, the exact
    * loss this contract forbids. The round-trip (parsed back to string
    * equals the raw id) admits only ids that ARE canonical longs. */
  private def emittedId(df: DataFrame, name: String, op: String,
      fingerprint: Boolean): Column = {
    val raw = col(name)
    if (isIntegral(df, name)) guardNull(raw, raw.cast("long"), name)
    else if (fingerprint) guardNull(raw, xxhash64(raw), name)
    else df.schema(name).dataType match {
      case org.apache.spark.sql.types.StringType =>
        val parsed = raw.try_cast("long")
        when(raw.isNull || parsed.isNull || parsed.cast("string") =!= raw,
          raise_error(lit(
            s"graft: $op emits '$name' and needs integral ids; a string " +
              "id was null or was not a canonical long - pass " +
              "fingerprintIds=true to emit xxhash64 fingerprints instead")))
          .otherwise(parsed)
      case other =>
        throw new IllegalArgumentException(
          s"graft: $op emits '$name' in its output and requires an " +
            s"integral id type, got ${other.simpleString}; pass " +
            "fingerprintIds=true to emit xxhash64 fingerprints, or " +
            "fingerprint upstream")
    }
  }

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserState(user_id: Long, n_events: Long, total_value: Double)

  final case class SessEvent(user_id: Long, ts: java.sql.Timestamp,
      value: Double, event_id: Long = 0L)
  /** Per-user open buffer: (epoch_us, value, event_id) triples of
    * events not yet attributable to a CLOSED session (event_id is 0
    * when the stream carries no identity). Bounded by the watermark
    * horizon: every timeout flushes all sessions whose end sits a
    * full gap below the watermark. */
  final case class SessBuffer(events: List[(Long, Double, Long)])
  final case class SessionRow(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, duration_us: Long,
      sum_value: Double)

  /** Streaming sessionization — the incremental counterpart of
    * `graft.ops.Temporal.sessionize`, same strictly-greater gap rule.
    * Events buffer per user in flatMapGroupsWithState; an event-time
    * timeout at (newest buffered event + gap) fires once the watermark
    * proves no event can extend the trailing session, at which point
    * every closed session is emitted exactly once and its events leave
    * state. Output rows match the batch operator's (keyed by start
    * time rather than a 1-based index, which a stream cannot know
    * until the user's history ends).
    *
    * Delivery contract: with `eventIdCol` set, redeliveries WITHIN the
    * watermark window are deduped in-state by event id (the same
    * `distinctBy` remedy as the attribution and decay streams), and
    * redeliveries of an already-closed session's events arrive behind
    * the watermark (a session closes only once the watermark sits a
    * full gap past its last event) so Spark's late-row filter drops
    * them — exactly-once output under at-least-once input. Without
    * `eventIdCol` the events carry no identity and a redelivery
    * inflates n_events/value sums (unlike the idempotent min/set/
    * greedy folds of the cohort, KM and funnel streams): feed
    * exactly-once input, or dedup upstream with
    * `withWatermark(...).dropDuplicates("event_id")` — the canonical
    * Structured Streaming remedy.
    *
    * Id contract: `eventIdCol` values must be NON-NULL and UNIQUE per
    * logical event (two distinct events sharing an id are merged as if
    * redelivered). Integral ids are used as-is; any other type
    * (string/UUID/binary) is fingerprinted with xxhash64 of the raw
    * value; a null id fails the query with a clear error instead of
    * silently collapsing the buffer.
    */
  def sessionizeStream(spark: SparkSession, events: DataFrame,
      gapSec: Long, watermark: String = "1 hour",
      eventIdCol: Option[String] = None): DataFrame = {
    import spark.implicits._
    val gapUs = gapSec * 1000000L
    val idCol = eventIdCol.map(dedupIdentity(events, _)).getOrElse(lit(0L))
    val typed = events.withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"),
        col("value").cast("double"), idCol.as("event_id"))
      .as[SessEvent]
    val hasId = eventIdCol.isDefined

    def sessionsOf(buf: List[(Long, Double, Long)]): List[List[(Long, Double, Long)]] = {
      val sorted = buf.sortBy(_._1)
      val out = scala.collection.mutable.ListBuffer.empty[List[(Long, Double, Long)]]
      var cur = scala.collection.mutable.ListBuffer.empty[(Long, Double, Long)]
      sorted.foreach { e =>
        if (cur.nonEmpty && e._1 - cur.last._1 > gapUs) {
          out += cur.toList; cur = scala.collection.mutable.ListBuffer.empty
        }
        cur += e
      }
      if (cur.nonEmpty) out += cur.toList
      out.toList
    }
    def emit(uid: Long, s: List[(Long, Double, Long)]): SessionRow = {
      val startUs = s.head._1; val endUs = s.last._1
      SessionRow(uid,
        java.sql.Timestamp.from(java.time.Instant.EPOCH.plus(
          java.time.Duration.ofNanos(startUs * 1000L))),
        java.sql.Timestamp.from(java.time.Instant.EPOCH.plus(
          java.time.Duration.ofNanos(endUs * 1000L))),
        s.size.toLong, endUs - startUs,
        r6hu(s.map(_._2).sum))
    }

    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessBuffer, SessionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[SessBuffer]) =>
          val merged = state.getOption.map(_.events).getOrElse(Nil) ++
            rows.map(e => (usOf(e.ts), e.value, e.event_id)).toList
          // distinctBy event_id (state first, so redelivered copies
          // drop): an at-least-once redelivery within the watermark
          // window would otherwise inflate n_events and the value sum
          // — the attribution/decay lesson. Closed sessions need no
          // guard: their events sit a full gap below the watermark,
          // so redelivered copies are late rows Spark already drops.
          val buf = if (hasId) merged.distinctBy(_._3) else merged
          if (buf.isEmpty) { state.remove(); Iterator.empty }
          else {
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val sessions = sessionsOf(buf)
            // a session is provably closed once the watermark sits a
            // full gap past its last event — nothing can extend it
            val (closed, open) = sessions.partition(s => s.last._1 + gapUs <= wmUs)
            if (open.isEmpty) state.remove()
            else {
              val flat = open.flatten
              state.update(SessBuffer(flat))
              // fire when the watermark passes newest-event + gap
              state.setTimeoutTimestamp(flat.map(_._1).max / 1000L +
                gapSec * 1000L + 1L)
            }
            closed.map(emit(uid, _)).iterator
          }
      }.toDF()
  }

  final case class FunnelEv(user_id: Long, ts: java.sql.Timestamp, step: Int)
  final case class FunnelBuf(events: List[(Long, Int)],
      done: Boolean = false, expiryUs: Long = Long.MaxValue)
  final case class FunnelRow(user_id: Long, steps_completed: Long,
      converted: Boolean, step_ts_us: Seq[Long])

  /** Streaming funnel — the incremental counterpart of
    * `Temporal.funnel` with identical greedy-earliest semantics
    * (asserted batch-vs-stream in PipelineStreamingSpec). Output per
    * anchored key, emitted EXACTLY ONCE when the result is provably
    * final: (user_id, steps_completed, converted, matched step
    * timestamps as epoch-µs — always a prefix, because a broken chain
    * propagates).
    *
    * Finality and state bounds: the chain is a function of the key's
    * events in [anchor, anchor + (s−1)·withinSec] where anchor = the
    * key's earliest step-1 event. Once the watermark passes that
    * deadline nothing can change the result (a later-arriving EARLIER
    * anchor is impossible: its timestamp would be below the watermark
    * and is dropped), so the row is emitted via the event-time timeout
    * and the key's state collapses to an exactly-once TOMBSTONE: a
    * step-1 event arriving after the deadline must not re-anchor and
    * emit a second row (the batch operator reports ONE chain per key,
    * from its earliest anchor). The tombstone is O(1) per emitted key
    * and, by default, lives for the life of the query — the
    * cohort-ledger trade, inherent to exact-once per-key output over
    * an unbounded stream; bound it operationally by restarting per
    * report epoch, or set `tombstoneTtlSec`.
    *
    * `tombstoneTtlSec = Some(T)` bounds tombstone STATE the way
    * `cohortRetentionStream(maxPeriods)` bounds its ledger: a key's
    * tombstone drops — via event-time timeout, no activity needed —
    * once the watermark passes its journey's deadline + T, and the
    * key's LATER activity starts a NEW funnel journey that emits its
    * own row (re-acquisition semantics: one row per journey, journeys
    * separated by at least T of event time; events inside the
    * suppression window (deadline, deadline+T] are swallowed). The
    * trade is DETERMINISTIC with respect to micro-batch boundaries:
    * beyond-expiry activity arriving while the tombstone is alive is
    * buffered (never dropped with it) and restarts the instant the
    * watermark retires it, exactly as if it had arrived a batch later
    * — an event at or before the expiry always arrives while the
    * tombstone is alive (its ts would otherwise be behind the
    * watermark), so its fate never depends on the cut either. Until
    * finality the buffer keeps only events in
    * [min(anchor, watermark), deadline]; keys with no anchor yet keep
    * only post-watermark events (a future chain's anchor must be ≥ the
    * watermark, so nothing older can ever participate). State is
    * horizon-bounded per key, never the key's full history. */
  def funnelStream(spark: SparkSession, events: DataFrame,
      steps: Seq[String], withinSec: Long,
      watermark: String = "1 hour",
      tombstoneTtlSec: Option[Long] = None): DataFrame = {
    require(steps.size >= 2, s"funnel needs >= 2 steps, got $steps")
    require(tombstoneTtlSec.forall(_ >= 0), "tombstoneTtlSec must be >= 0")
    import spark.implicits._
    val wUs = withinSec * 1000000L
    val horizon = (steps.size - 1).toLong * wUs
    // events carry their DISTINCT-type index, and the chain walks the
    // funnel positions through stepIdx — with a repeated step type
    // (view -> click -> view) a per-position mapping would be
    // last-match-wins and the earlier position could never anchor
    // (silent empty output); matching positions by TYPE is exactly the
    // batch Temporal.funnel semantics (each asofJoin filters by type)
    val distinctSteps = steps.distinct
    val stepIdx: Seq[Int] =
      steps.map(distinctSteps.zipWithIndex.toMap)
    // type index via a column expression, not a typed map — a typed map
    // would drop the watermark tag the event-time timeout requires
    val stepCol = distinctSteps.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (s, i)) => when(col("event_type") === s, lit(i)).otherwise(acc)
    }
    // filter BEFORE the watermark: the watermark must track the funnel
    // event types themselves (a filter placed after it can be pushed
    // below the watermark node, and rows it drops would then never
    // advance event time)
    val typed = events
      .filter(col("event_type").isin(steps.map(lit): _*))
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        stepCol.as("step"))
      .withWatermark("ts", watermark)
      .as[FunnelEv]


    // the SAME greedy-earliest chain as Temporal.funnel, over the
    // buffered (ts, step) pairs
    def chainOf(evts: List[(Long, Int)]): Seq[Long] = {
      val byType = evts.groupBy(_._2)
      byType.get(stepIdx.head).map(_.map(_._1).min) match {
        case None => Nil
        case Some(anchor) =>
          var chain = Vector(anchor)
          var i = 1
          var broken = false
          while (i < steps.size && !broken) {
            val prev = chain.last
            val cand = byType.getOrElse(stepIdx(i), Nil).map(_._1)
              .filter(t => t >= prev && t - prev <= wUs)
            if (cand.isEmpty) broken = true else chain :+= cand.min
            i += 1
          }
          chain
      }
    }

    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBuf, FunnelRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[FunnelBuf]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val prev = state.getOption.getOrElse(FunnelBuf(Nil))
          // Loop instead of a single pass (the cohort-ledger idiom):
          // when the watermark retires a tombstone that still buffers
          // beyond-expiry activity, that activity restarts as a FRESH
          // journey in the same invocation — and a long-gapped key can
          // resolve several complete journeys at once. Output is
          // identical whether an event lands in the batch that retires
          // the tombstone or any later one.
          val out = scala.collection.mutable.ListBuffer.empty[FunnelRow]
          var buf = prev.events ++ rows.map(e => (usOf(e.ts), e.step)).toList
          var done = prev.done
          var expiry = prev.expiryUs
          var finished = false
          while (!finished) {
            if (done) {
              // exactly-once tombstone: this key's chain was already
              // emitted as final. A step-1 event arriving AFTER the
              // deadline must not re-create the state and emit a
              // second row while the tombstone is alive (caught by
              // the randomized parity net, round 16); events beyond
              // the expiry belong to the NEXT journey and are
              // buffered, never dropped with the tombstone.
              buf = buf.filter(_._1 > expiry)
              if (wmUs >= expiry) { done = false; expiry = Long.MaxValue }
              else {
                state.update(FunnelBuf(buf, done = true, expiry))
                if (expiry != Long.MaxValue)
                  state.setTimeoutTimestamp(
                    math.max(expiry / 1000L, wmUs / 1000L) + 1L)
                finished = true
              }
            } else {
              val anchors =
                buf.collect { case (t, s) if s == stepIdx.head => t }
              if (anchors.isEmpty) {
                // no chain can ever anchor before the watermark now
                val kept = buf.filter(_._1 >= wmUs)
                if (kept.isEmpty) state.remove()
                else state.update(FunnelBuf(kept))
                finished = true
              } else {
                val anchor = anchors.min
                val deadline = anchor + horizon
                if (wmUs > deadline) {
                  // chain final: emit, then collapse to the tombstone
                  // (post-deadline events can't extend the chain: a
                  // step-i candidate sits within i·withinSec of the
                  // anchor, inside the deadline by construction)
                  val chain = chainOf(buf)
                  out += FunnelRow(uid, chain.size.toLong,
                    chain.size == steps.size, chain)
                  done = true
                  expiry = tombstoneTtlSec
                    .map(t => deadline + t * 1000000L)
                    .getOrElse(Long.MaxValue)
                } else {
                  // an earlier anchor may still arrive (>= wm), so keep
                  // everything from min(anchor, wm); nothing past the
                  // current deadline can extend any chain (a future
                  // earlier anchor only shrinks the deadline) — but
                  // with a tombstone TTL, beyond-deadline events are
                  // the NEXT journey's and must be retained (bounded
                  // by the watermark delay: an event's ts never runs
                  // more than the delay ahead of the watermark)
                  val lo = math.min(anchor, wmUs)
                  val hi = if (tombstoneTtlSec.isDefined) Long.MaxValue
                    else deadline
                  state.update(FunnelBuf(buf.filter(e =>
                    e._1 >= lo && e._1 <= hi)))
                  state.setTimeoutTimestamp(deadline / 1000L + 1L)
                  finished = true
                }
              }
            }
          }
          out.iterator
      }.toDF()
  }

  /** Streaming funnel step-timing — the incremental counterpart of
    * the q197 read-out: per finalized key, the wait between each pair
    * of consecutive COMPLETED funnel steps, as (user_id, step,
    * wait_us) with step = the 2-based index of the later step
    * (matching the batch quartile frame's step labels). Purely a
    * stateless projection over [[funnelStream]]'s exactly-once
    * finality rows (the matched-step timestamps are always a prefix),
    * so each wait row is itself emitted EXACTLY once, when the key's
    * chain is provably final under the watermark. The live quartiles
    * are then a downstream aggregate over these rows (the
    * cohortRetentionStream pattern: exact-once pairs out of Append
    * mode; fold the matrix under Complete/Update or in batch) — an
    * Append-mode stream cannot emit a forever-revisable global order
    * statistic, but the pair stream it folds from is exact. Parity:
    * waits folded through `Percentiles.exact` equal the batch q197
    * quartiles (PipelineStreamingSpec). */
  def funnelTimingStream(spark: SparkSession, events: DataFrame,
      steps: Seq[String], withinSec: Long,
      watermark: String = "1 hour",
      tombstoneTtlSec: Option[Long] = None): DataFrame =
    funnelStream(spark, events, steps, withinSec, watermark, tombstoneTtlSec)
      .filter(size(col("step_ts_us")) >= 2)
      .select(col("user_id"), posexplode(zip_with(
        slice(col("step_ts_us"), lit(2), size(col("step_ts_us")) - 1),
        slice(col("step_ts_us"), lit(1), size(col("step_ts_us")) - 1),
        (b, a) => b - a)))
      .select(col("user_id"), (col("pos") + 2).cast("long").as("step"),
        col("col").cast("long").as("wait_us"))

  /** Stream-stream interval join with watermark-bounded state: every
    * left-side window row (`window_id`, `ts` — e.g. an error's
    * `windowLenSec`-long incident window) is joined to every right-side
    * point event (`ts`, `value`) falling inside [ts, ts+len).
    *
    * Structured Streaming refuses a stream-stream join without an
    * equality predicate (state would be all-pairs), so this reuses the
    * SAME granule trick as the batch `Temporal.rangeJoinCount`: windows
    * explode to every `granuleSec` bucket they overlap, points carry
    * their own bucket, and the join is bucket-equality plus the exact
    * range predicate — a point matches only in its own bucket, so no
    * pair can double-match. The range condition also bounds event time
    * in both directions relative to the watermarks, which is what lets
    * Spark evict join state once the watermark passes a row's horizon;
    * state is horizon x arrival rate, never all-pairs. Pair semantics
    * equal the batch operator's, asserted in PipelineStreamingSpec. */
  def intervalJoinStream(windows: DataFrame, points: DataFrame,
      windowLenSec: Long, watermark: String = "1 hour",
      granuleSec: Long = 0L): DataFrame = {
    val gSec = if (granuleSec > 0L) granuleSec else windowLenSec
    val g = lit(gSec * 1000000L)
    val lenUs = windowLenSec * 1000000L
    val w = windows.select(col("window_id"), col("ts").as("w_start"))
      .withWatermark("w_start", watermark)
      .withColumn("__wg", explode(sequence(
        floor(unix_micros(col("w_start")) / g).cast("long"),
        floor((unix_micros(col("w_start")) + lit(lenUs - 1L)) / g).cast("long"))))
    val p = points.select(col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", watermark)
      .withColumn("__pg", floor(unix_micros(col("p_ts")) / g).cast("long"))
    w.join(p, col("__wg") === col("__pg") &&
        expr(s"p_ts >= w_start AND p_ts < w_start + INTERVAL $windowLenSec SECONDS"))
      .drop("__wg", "__pg")
  }

  final case class DecayEvent(event_id: Long, user_id: Long,
      ts: java.sql.Timestamp, value: Double)
  /** Per-key decay state: the carried recurrence value AT `carryUs`
    * (decayed-sum-plus-own-value of the last finalized event) plus the
    * buffer of not-yet-final events — bounded by the watermark
    * horizon, while the carried scalar folds the ENTIRE earlier
    * history into O(1) state. */
  final case class DecayBuf(carryUs: Long, carry: Double,
      pending: List[(Long, Long, Double)])
  final case class DecayRow(event_id: Long, user_id: Long,
      decayed_sum: Double)

  /** Streaming counterpart of [[graft.ops.Temporal.decayFeatures]]:
    * per event, the same key's strictly-prior half-life-weighted value
    * sum, via the O(1) decay recurrence
    *   s' = (s + v) · 2^(−Δt/H)
    * carried across micro-batches in mapGroupsWithState. An event is
    * emitted only once the watermark passes its timestamp — no earlier
    * event can still arrive, so its prior-sum is provably final
    * (exactly-once emission, the funnelStream discipline). Unlike the
    * session/funnel buffers, state here never grows with history: the
    * recurrence folds everything older than the watermark into one
    * scalar, which is why the decay feature is THE canonical
    * streaming-state engagement signal. Associativity of the
    * recurrence differs from the batch anchored-sum formulation by
    * float ulps (compare rounded values, as the parity spec does).
    *
    * Id contract (output carries `event_id`): integral ids and
    * long-parseable string ids pass through exactly; with
    * `fingerprintIds = true` any other id type is emitted as its
    * xxhash64 fingerprint (redelivery dedup keys on the raw value;
    * the output id is then a fingerprint, not the source id). */
  def decayStream(spark: SparkSession, events: DataFrame,
      halfLifeSec: Long, watermark: String = "1 hour",
      fingerprintIds: Boolean = false): DataFrame = {
    import spark.implicits._
    val lam = math.log(2.0) / halfLifeSec
    val typed = events.withWatermark("ts", watermark)
      .select(emittedId(events, "event_id", "decayStream",
        fingerprintIds).as("event_id"),
        col("user_id").cast("long"),
        col("ts"), col("value").cast("double"))
      .as[DecayEvent]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[DecayBuf, DecayRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[DecayBuf]) =>
          val prev = state.getOption.getOrElse(DecayBuf(Long.MinValue, 0.0, Nil))
          // rows at-or-before the finalized frontier are late beyond the
          // watermark: their prior-sums were already emitted, so they are
          // dropped (the standard watermark contract), never back-applied
          // distinctBy event_id: an at-least-once redelivery within
          // the watermark window would otherwise enter the pending
          // buffer twice — emitting the event twice AND inflating
          // every later prior-sum (the attributionStream lesson)
          val buf = (prev.pending ++
            rows.map(e => (usOf(e.ts), e.event_id, e.value))
              .filter(_._1 > prev.carryUs)).distinctBy(_._2).sortBy(_._1)
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, still) = buf.span(_._1 <= wmUs)
          var carryUs = prev.carryUs
          var carry = prev.carry
          // fold per TIMESTAMP GROUP, not per row: the batch operator's
          // strictly-prior (t_i < t) RANGE frame gives every member of
          // a same-timestamp tie the SAME prior sum (ties exclude each
          // other); a per-row fold would hand the second tied event the
          // first at full weight, in buffer order — nondeterministic
          // and diverging from batch
          val out = ready.groupBy(_._1).toSeq.sortBy(_._1)
            .flatMap { case (tUs, evs) =>
              val decayed =
                if (carryUs == Long.MinValue) 0.0
                else carry * math.exp(-lam * ((tUs - carryUs).toDouble / 1e6))
              carry = decayed + evs.map(_._3).sum
              carryUs = tUs
              evs.sortBy(_._2).map { case (_, id, _) =>
                DecayRow(id, uid, r6hu(decayed)) }
            }
          if (still.isEmpty && carryUs == Long.MinValue) state.remove()
          else {
            state.update(DecayBuf(carryUs, carry, still))
            // arm a timeout ONLY while events are pending: the carry
            // needs no wake-up (a later event invokes the handler and
            // reads it; until then there is nothing to emit), and
            // not re-setting the timeout here CLEARS the previous one
            // (GroupStateImpl starts each invocation unset and the
            // exec persists the change). A watermark+1 re-arm on an
            // empty buffer would wake EVERY key that ever emitted on
            // every micro-batch forever — O(historical keys) no-op
            // state rewrites per batch on a long-running stream.
            if (still.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(still.head._1 / 1000L + 1L, wmUs / 1000L + 1L))
          }
          out.iterator
      }.toDF()
  }

  /** Streaming daily OHLC — the incremental counterpart of
    * [[graft.ops.EventAnalytics.dailyOhlc]]: a watermarked 1-day
    * windowed aggregate whose open/close ride deterministic
    * struct-min/max under the (ts, tie) order, exactly the batch
    * formulation. Append mode emits each (day, group) bar exactly once
    * when the watermark closes the day; state is one struct per open
    * (day, group) — bounded by the day span x group cardinality inside
    * the horizon, never row-scale. */
  def dailyOhlcStream(events: DataFrame, tsCol: String, tieCol: String,
      groupCol: String, valueCol: String,
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 day").as("__w"), col(groupCol).as("grp"))
      .agg(
        min(struct(col(tsCol), col(tieCol), col(valueCol).as("v"))).as("__omin"),
        max(struct(col(tsCol), col(tieCol), col(valueCol).as("v"))).as("__omax"),
        round(max(col(valueCol)), 6).as("high"),
        round(min(col(valueCol)), 6).as("low"),
        // expression-identical to EventAnalytics.dailyOhlc's volume
        // (stream==batch parity): exact micro-unit sum, q1-family
        round(graft.core.ExactSum.micro(col(valueCol)), 6).as("volume"),
        count(lit(1)).as("n"))
      .select(date_format(col("__w.start"), "yyyy-MM-dd").as("day"),
        col("grp").as(groupCol),
        round(col("__omin.v"), 6).as("open"), col("high"), col("low"),
        round(col("__omax.v"), 6).as("close"), col("volume"), col("n"))

  final case class AttrEvent(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, event_type: String, value: Double)
  /** Per-key attribution state: touch timestamps still inside any
    * future conversion's window (tts >= watermark − windowSec) plus
    * conversions not yet finalized (cts > watermark) — both
    * horizon-bounded, never the key's full history. */
  final case class AttrBuf(touches: List[Long],
      pending: List[(Long, Long, Double)])
  final case class AttrRow(event_id: Long, user_id: Long, value: Double,
      first_touch_wait_us: Option[Long], last_touch_wait_us: Option[Long])

  /** Streaming first/last-touch attribution — the incremental
    * counterpart of [[graft.ops.EventAnalytics.attribution]], same
    * trailing-window semantics. A conversion's result is provably
    * final once the watermark passes its timestamp: any touch inside
    * its window has ts <= cts <= watermark and must already have
    * arrived, so the row is emitted exactly once (the funnel/decay
    * finality discipline). Touches older than (watermark − windowSec)
    * can never serve a future conversion (whose cts >= watermark) and
    * leave state — the bounded forward-join shape. Id contract as
    * [[decayStream]]: long-parseable strings pass through; other
    * types need `fingerprintIds = true` (emitted event_id is then an
    * xxhash64 fingerprint of the raw id). */
  def attributionStream(spark: SparkSession, events: DataFrame,
      conversionType: String, touchType: String, windowSec: Long,
      watermark: String = "1 hour",
      fingerprintIds: Boolean = false): DataFrame = {
    import spark.implicits._
    val wUs = windowSec * 1000000L
    // filter BEFORE the watermark so event time tracks exactly the
    // participating types (the funnelStream lesson)
    val typed = events
      .filter(col("event_type").isin(conversionType, touchType))
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        emittedId(events, "event_id", "attributionStream",
          fingerprintIds).as("event_id"),
        col("event_type"),
        col("value").cast("double").as("value"))
      .withWatermark("ts", watermark)
      .as[AttrEvent]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[AttrBuf, AttrRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[AttrBuf]) =>
          val prev = state.getOption.getOrElse(AttrBuf(Nil, Nil))
          val rs = rows.toList
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val touches = prev.touches ++
            rs.filter(_.event_type == touchType).map(e => usOf(e.ts))
          // distinctBy event_id: an at-least-once source can redeliver
          // a conversion WITHIN the watermark window (behind-watermark
          // duplicates are dropped by Spark's late-row filter), and a
          // duplicate pending entry would attribute twice. Touches
          // need no dedup — min/max over in-window touch times is
          // idempotent under duplicates.
          val pending = (prev.pending ++
            rs.filter(_.event_type == conversionType)
              .map(e => (usOf(e.ts), e.event_id, e.value)))
            .distinctBy(_._2)
          val (ready, still) = pending.partition(_._1 <= wmUs)
          val out = ready.map { case (cts, id, v) =>
            val in = touches.filter(t => t <= cts && t >= cts - wUs)
            AttrRow(id, uid, r6hu(v),
              if (in.isEmpty) None else Some(cts - in.min),
              if (in.isEmpty) None else Some(cts - in.max))
          }
          // touches older than wm − windowSec can never reach a future
          // conversion (its cts >= wm); keep the rest
          val keptTouches = touches.filter(_ >= wmUs - wUs)
          if (still.isEmpty && keptTouches.isEmpty) state.remove()
          else {
            state.update(AttrBuf(keptTouches, still))
            // wake when the earliest pending conversion finalizes, or —
            // touches only — once the horizon fully ages them out
            val nextUs = still.map(_._1).minOption
              .getOrElse(keptTouches.max + wUs)
            state.setTimeoutTimestamp(
              math.max(nextUs / 1000L, wmUs / 1000L) + 1L)
          }
          out.iterator
      }.toDF()
  }

  /** Custom stateful op: running per-user totals via
    * mapGroupsWithState — the KeyValueGroupedDataset state API the
    * brief calls for; state survives across micro-batches. */
  def runningUserTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = events.select(
      col("user_id").cast("long"), col("event_type"), col("value").cast("double"))
      .as[UserEvent]
    typed.groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserState](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { e => n += 1; tot += e.value }
          val next = UserState(uid, n, tot)
          state.update(next)
          next
      }.toDF()
  }

  final case class CusumDayBar(dayTs: java.sql.Timestamp, x: Long)
  /** CUSUM carry across finalized days: last emitted day (µs) plus the
    * two running sums — three scalars, never a buffer. */
  final case class CusumCarry(lastDayUs: Long, sp: Double, sn: Double)
  final case class CusumRow(day: String, n_events: Long, cusum_pos: Double,
      cusum_neg: Double, is_alarm: Boolean)

  /** Streaming CUSUM drift monitor — the incremental counterpart of
    * [[graft.ops.EventAnalytics.cusumDaily]], sharing its
    * `cusumStep` recursion bit-for-bit. Reference (mean, sd) is a
    * CALIBRATION parameter: the sequential-monitoring formulation
    * (Page 1954) scores deviations against a known in-control level,
    * which is exactly what a stream has (the batch operator, able to
    * see the whole series, derives the reference from its own exact
    * moments — pass those in for stream==batch parity).
    *
    * Shape: a watermarked 1-day windowed count (distributed, partial
    * aggregation map-side, append-finalized exactly once per day)
    * chains into a single-key flatMapGroupsWithState that folds the
    * DAY frame through the recursion — the chained-stateful-operator
    * plan (Spark 3.4+). The serial stage sees one row per day (the
    * funnelRates/cusumDaily day-frame discipline), never row-scale
    * data; its state is three scalars. Day bars from the upstream
    * append aggregate are final, so each day is folded exactly once:
    * within a micro-batch bars may surface unordered and are sorted;
    * across batches the watermark only moves forward, so later
    * batches can only deliver later days. */
  def cusumStream(spark: SparkSession, events: DataFrame, mean: Double,
      sd: Double, slackSigma: Double = 0.5, alarmSigma: Double = 4.0,
      watermark: String = "1 hour"): DataFrame = {
    import spark.implicits._
    val daily = events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("__w"))
      .agg(count(lit(1)).as("x"))
      .select(col("__w").getField("start").as("dayTs"), col("x"))
      .as[CusumDayBar]
    def r6(x: Double) = graft.core.Round.r6(x)
    daily.groupByKey(_ => 0)
      .flatMapGroupsWithState[CusumCarry, CusumRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, bars, state: GroupState[CusumCarry]) =>
          val prev = state.getOption.getOrElse(CusumCarry(Long.MinValue, 0.0, 0.0))
          val ordered = bars.map(b => (usOf(b.dayTs), b.x)).toSeq
            .filter(_._1 > prev.lastDayUs).sortBy(_._1)
          var sp = prev.sp
          var sn = prev.sn
          var last = prev.lastDayUs
          val out = ordered.map { case (dUs, x) =>
            val (sp2, sn2, alarm) = graft.ops.EventAnalytics.cusumStep(
              sp, sn, x, mean, sd, slackSigma, alarmSigma)
            sp = sp2; sn = sn2; last = dUs
            CusumRow(
              java.time.Instant.ofEpochSecond(dUs / 1000000L)
                .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString,
              x, r6(sp), r6(sn), alarm)
          }
          if (ordered.nonEmpty) state.update(CusumCarry(last, sp, sn))
          out.iterator
      }.toDF()
  }

  final case class CohortEvent(user_id: Long, ts: java.sql.Timestamp)
  /** Per-key cohort state: the candidate first-activity time (final
    * once the watermark passes it — accepted rows always have
    * ts > watermark, so no future row can precede it), activity
    * timestamps buffered until that finality (horizon-bounded: only
    * until the watermark crosses the key's FIRST event), and the
    * periods already emitted (bounded by time span / periodDays). */
  final case class CohortBuf(cohortUs: Long, pending: List[Long],
      emitted: List[Long])
  final case class CohortPair(cohort: String, period: Long, user_id: Long)

  /** Streaming cohort-retention pairs — the incremental counterpart of
    * [[graft.ops.Temporal.cohortRetention]]. Emits each (cohort,
    * period, key) activity pair EXACTLY once, as soon as the key's
    * cohort (its first-activity day) is final under the watermark;
    * `pairs.groupBy("cohort", "period").count()` is then the live
    * retention matrix (aggregation after Append-mode
    * flatMapGroupsWithState — counts grow as periods fill, so read
    * the matrix under Complete/Update mode; each underlying pair is
    * exact-once, so the count equals the batch exact distinct).
    * Rows at or before the watermark are late and dropped (the
    * decayStream contract) — the same rows a watermarked aggregate
    * would drop.
    *
    * State lifetime: period dedup requires remembering which periods
    * each key already emitted, so WITHOUT a horizon a finalized key's
    * state (cohort day + emitted-period list, O(time span /
    * periodDays) longs) is kept for the LIFE of the query — total
    * state is O(distinct keys × emitted periods), unlike the
    * watermark-horizon-bounded buffers of the sibling streams. That is
    * inherent to exact-once period pairs over an unbounded activity
    * stream; bound it operationally by restarting the query per
    * retention-report epoch — or set `maxPeriods`.
    *
    * `maxPeriods = Some(P)` bounds both the MATRIX (pairs with
    * period > P are never emitted) and the STATE: a key's ledger drops
    * — via event-time timeout, no activity needed — once the watermark
    * passes cohortDay + (P+1)·periodDays, the instant no admissible
    * event can still land in a period ≤ P. State is then
    * O(keys active inside their own (P+1)-period horizon), not
    * keys-for-life. The trade: a key that REAPPEARS after its horizon
    * is indistinguishable from a new key and re-enters as a NEW cohort
    * (its post-horizon first-activity day) — re-acquisition semantics,
    * pinned in the parity spec, and DETERMINISTIC with respect to
    * micro-batch boundaries: beyond-horizon activity arriving while
    * the old ledger is still alive is buffered (never dropped with the
    * ledger) and restarts as the fresh cohort the moment the watermark
    * retires it, exactly as if it had arrived a batch later. The
    * unbounded operator has no such rows; a batch matrix restricted to
    * period ≤ P matches exactly for every key whose activity stays
    * inside its horizon.
    *
    * Note: chaining this operator's output into a streaming aggregate
    * trips Spark's STATIC global-watermark correctness check (pairs
    * are by design emitted once the watermark passes their cohort,
    * i.e. "late" relative to it). With an UNwatermarked downstream
    * aggregate read under Complete/Update mode no row can be
    * discarded, so that chain is safe — disable
    * `spark.sql.streaming.statefulOperator.checkCorrectness.enabled`
    * for the query, as the parity spec does. */
  def cohortRetentionStream(spark: SparkSession, events: DataFrame,
      periodDays: Int = 7, watermark: String = "1 hour",
      maxPeriods: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val maxP = maxPeriods.getOrElse(Long.MaxValue)
    val typed = events.withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"))
      .as[CohortEvent]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[CohortBuf, CohortPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[CohortBuf]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val prev = state.getOption.getOrElse(
            CohortBuf(Long.MaxValue, Nil, Nil))
          // Loop instead of single pass: when the horizon closes a
          // ledger that still buffers beyond-horizon activity, that
          // activity restarts as a FRESH cohort in the same invocation
          // (remove-then-reinsert equivalence) — output is identical
          // whether a beyond-horizon event lands in the batch that
          // retires the ledger or any later one, so re-acquisition
          // rows never depend on micro-batch boundaries.
          var cohortUs = prev.cohortUs
          var pending = prev.pending ++
            rows.map(e => usOf(e.ts)).filter(_ > wmUs).toList
          var emitted = prev.emitted.toSet
          val out = scala.collection.mutable.ListBuffer.empty[CohortPair]
          var done = false
          while (!done) {
            cohortUs = (cohortUs :: pending).min
            if (cohortUs == Long.MaxValue) { state.remove(); done = true }
            else if (wmUs < cohortUs) {
              // cohort not yet final: buffer and wake at its finality
              state.update(CohortBuf(cohortUs, pending, emitted.toList))
              state.setTimeoutTimestamp(cohortUs / 1000L + 1L)
              done = true
            } else {
              // cohort final: flush in-horizon activity into period
              // pairs (each period once); beyond-horizon activity is
              // RETAINED, never silently dropped — it re-enters as a
              // new cohort when this ledger closes (bounded like any
              // pending buffer: only events above the watermark enter,
              // and they release once the watermark passes the
              // horizon)
              val cohortDay = dayOf(cohortUs)
              val withPeriod = pending.sorted.map { tUs =>
                (tUs, java.time.temporal.ChronoUnit.DAYS
                  .between(cohortDay, dayOf(tUs)) / periodDays)
              }
              withPeriod.foreach { case (_, p) =>
                if (p <= maxP && !emitted.contains(p)) {
                  emitted += p
                  out += CohortPair(cohortDay.toString, p, uid)
                }
              }
              val beyond = withPeriod.collect { case (t, p) if p > maxP => t }
              // with a horizon, the ledger drops the instant the
              // watermark proves no admissible event can still land
              // in a period ≤ maxP (every later event is either late —
              // dropped upstream — or in a period > maxP); the timeout
              // makes the drop happen even if the key never reappears
              val endUsOpt = maxPeriods.map { mp =>
                cohortDay.plusDays((mp + 1L) * periodDays)
                  .atStartOfDay(java.time.ZoneOffset.UTC)
                  .toInstant.getEpochSecond * 1000000L
              }
              endUsOpt match {
                case Some(endUs) if wmUs >= endUs =>
                  // ledger closes now; buffered beyond-horizon events
                  // restart the loop as a fresh cohort (or the key
                  // leaves state entirely)
                  cohortUs = Long.MaxValue
                  pending = beyond
                  emitted = Set.empty
                  if (beyond.isEmpty) { state.remove(); done = true }
                case other =>
                  state.update(CohortBuf(cohortUs, beyond, emitted.toList))
                  other.foreach(endUs =>
                    state.setTimeoutTimestamp(endUs / 1000L + 1L))
                  done = true
              }
            }
          }
          out.iterator
      }.toDF()
  }

  final case class KmEvent(user_id: Long, ts: java.sql.Timestamp,
      event_type: String)
  /** Per-key survival state: the candidate start time (final once the
    * watermark passes it), conversion-event times buffered while they
    * might still precede a yet-lower start (horizon-bounded: only
    * until the watermark crosses the key's first start), and the best
    * eligible conversion time so far. */
  final case class KmState(t0Us: Long, pending: List[Long], t1Us: Long,
      done: Boolean)
  final case class KmDuration(user_id: Long, duration_days: Long, event: Int)

  /** Streaming Kaplan-Meier duration rows — the incremental
    * counterpart of [[graft.ops.EventAnalytics.kaplanMeier]] with an
    * EXPLICIT censor horizon (`censorDay`, inclusive; the batch
    * operator censors at the corpus max day, which a stream cannot
    * know). Emits one (key, duration_days, event) row per key,
    * exactly once, as soon as its outcome is final under the
    * watermark: event=1 with duration to the FIRST conversion at or
    * after the key's first start (and inside the horizon), or event=0
    * censored at `censorDay` when the watermark passes the horizon
    * without one. The survival
    * curve is then the standard KM recursion over these rows — the
    * same grouped day frame the batch operator folds, so
    * stream-then-fold equals batch (parity spec). Rows at or before
    * the watermark are late and dropped (the decayStream contract);
    * starts after the horizon never emit. */
  def kaplanMeierStream(spark: SparkSession, events: DataFrame,
      startType: String, eventType: String, censorDay: String,
      watermark: String = "1 hour"): DataFrame = {
    import spark.implicits._
    val censorEndUs = java.time.LocalDate.parse(censorDay)
      .plusDays(1).atStartOfDay(java.time.ZoneOffset.UTC)
      .toInstant.getEpochSecond * 1000000L - 1L
    val typed = events.withWatermark("ts", watermark)
      .filter(col("event_type").isin(startType, eventType))
      .select(col("user_id").cast("long"), col("ts"), col("event_type"))
      .as[KmEvent]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[KmState, KmDuration](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[KmState]) =>
          val prev = state.getOption.getOrElse(
            KmState(Long.MaxValue, Nil, Long.MaxValue, done = false))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          if (prev.done) {
            // already emitted: swallow the key's further events as a
            // tombstone until the horizon passes — removing the state
            // early would let a LATER signup recreate it and emit a
            // second (censored) row (caught by the parity property)
            if (wmUs >= censorEndUs) state.remove()
            else {
              state.update(prev)
              state.setTimeoutTimestamp(censorEndUs / 1000L + 1L)
            }
            Iterator.empty
          } else {
          val fresh = rows.filter(e => usOf(e.ts) > wmUs).toList
          val t0 = (prev.t0Us ::
            fresh.filter(_.event_type == startType).map(e => usOf(e.ts))).min
          // conversion candidates: eligible (>= the current start
          // candidate) go straight to the running min — a later, LOWER
          // start only widens eligibility; the rest stay buffered
          // until the start is final
          val conv = prev.pending ++
            fresh.filter(_.event_type == eventType).map(e => usOf(e.ts))
          val (elig, pending) = conv.partition(_ >= t0)
          val t1 = (prev.t1Us :: elig).min
          if (t0 == Long.MaxValue || t0 > censorEndUs) {
            // no start yet (conversions alone never emit), or the
            // start lies beyond the horizon (not at risk): hold until
            // the horizon passes — an even-lower start may still
            // arrive while t0 > watermark (but any future start is
            // > wm >= censorEndUs, i.e. also beyond the horizon) —
            // then discard the key
            if (wmUs >= censorEndUs) {
              state.remove(); Iterator.empty
            } else {
              state.update(KmState(t0, pending, t1, done = false))
              state.setTimeoutTimestamp(censorEndUs / 1000L + 1L)
              Iterator.empty
            }
          } else if (wmUs >= t0 && t1 <= wmUs && t1 <= censorEndUs) {
            // converted within the horizon, and no future row (always
            // > watermark) can beat t1 or lower t0: duration is final.
            // Tombstone (not remove) until the horizon passes, so the
            // key's later events cannot re-emit.
            if (wmUs >= censorEndUs) state.remove()
            else {
              state.update(KmState(t0, Nil, t1, done = true))
              state.setTimeoutTimestamp(censorEndUs / 1000L + 1L)
            }
            Iterator.single(KmDuration(uid,
              java.time.temporal.ChronoUnit.DAYS
                .between(dayOf(t0), dayOf(t1)), 1))
          } else if (wmUs >= censorEndUs) {
            // horizon passed without an eligible in-horizon conversion;
            // any future row is beyond the horizon and cannot emit, so
            // plain removal is safe here
            state.remove()
            Iterator.single(KmDuration(uid,
              java.time.temporal.ChronoUnit.DAYS.between(dayOf(t0),
                dayOf(censorEndUs)), 0))
          } else {
            state.update(KmState(t0, if (wmUs >= t0) Nil else pending, t1,
              done = false))
            // wake at whichever finality comes first: the conversion
            // candidate, or the censor horizon
            state.setTimeoutTimestamp(
              (math.min(t1, censorEndUs) / 1000L + 1L)
                .max(wmUs / 1000L + 1L))
            Iterator.empty
          }
          }
      }.toDF()
  }
}
