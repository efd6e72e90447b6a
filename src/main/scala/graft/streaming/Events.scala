package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2.11 extension: incremental scoring of the `events` table with
  * Structured Streaming. The reference is batch-only (no streaming
  * anywhere in FastMLFramework — SURVEY §2.11), so this family is
  * additive: the same aggregations the batch engine computes, expressed
  * as an incremental plan with watermarked state cleanup.
  *
  * The events parquet carries TIMESTAMP(NANOS) which Spark reads as
  * epoch-nanos long under `nanosAsLong` (Sessions.scala) — `normalize`
  * converts once.
  */
object Events {

  /** epoch-nanos long -> timestamp (micro precision). */
  def normalize(df: DataFrame): DataFrame =
    // Integer floor-div, NOT `/ 1000`: epoch nanos (~1.7e18) exceed a
    // double's 53-bit mantissa, so float division drifts by ±1 µs.
    // DuckDB's ns→us parquet read truncates the same way.
    df.withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Hourly per-type windowed aggregate with a 1-hour watermark:
    * identical semantics batch or stream (run it on `readStream` for
    * incremental execution; state for closed windows is dropped by the
    * watermark). */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
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

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserState(user_id: Long, n_events: Long, total_value: Double)

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
}
