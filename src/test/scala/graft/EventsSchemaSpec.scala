package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.streaming.Events

/** Round-7 regression, pinned forever: the events parquet's `ts`
  * encoding is a driver choice that has already changed once
  * (TIMESTAMP(NANOS) read as epoch-nanos long under `nanosAsLong` →
  * plain timestamp[us] read as TIMESTAMP_NTZ), and the swap silently
  * broke every temporal/streaming consumer at analysis time.
  * `Events.normalize` is now schema-adaptive; this spec writes the SAME
  * events out under each encoding the reader can encounter and asserts
  * every operator in the family produces identical output on all of
  * them.
  */
class EventsSchemaSpec extends SparkSpec {

  // Small deterministic slice — enough rows for sessions/windows to be
  // non-trivial, small enough that three full parquet round-trips and
  // four operators stay fast.
  private lazy val encodings: Map[String, DataFrame] = {
    val base = Events.normalize(core.Tables.events(spark, sf))
      .filter(col("user_id") < 40)
      .select("event_id", "user_id", "event_type", "ts", "value")
    val dir = Files.createTempDirectory("graft-events-enc").toString
    // ltz: TimestampType → parquet TIMESTAMP(MICROS, adjustedToUTC)
    base.write.mode("overwrite").parquet(s"$dir/ltz")
    // ntz: TIMESTAMP_NTZ → parquet timestamp[us] (the current testdata)
    base.withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/ntz")
    // nanos-long: epoch-nanos BIGINT — exactly what the reader saw from
    // the old TIMESTAMP(NANOS) testdata under nanosAsLong=true
    base.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      .write.mode("overwrite").parquet(s"$dir/nanos")
    Map(
      "ltz" -> spark.read.parquet(s"$dir/ltz"),
      "ntz" -> spark.read.parquet(s"$dir/ntz"),
      "nanos" -> spark.read.parquet(s"$dir/nanos"))
  }

  test("normalize canonicalizes every encoding to TimestampType micros") {
    assert(encodings("ntz").schema("ts").dataType == TimestampNTZType)
    assert(encodings("nanos").schema("ts").dataType == LongType)
    encodings.foreach { case (name, df) =>
      val out = Events.normalize(df)
      assert(out.schema("ts").dataType == TimestampType,
        s"$name must normalize to TimestampType")
    }
    // and the instants are identical, not just the types
    val micros = encodings.map { case (name, df) =>
      name -> Events.normalize(df)
        .select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(micros("ntz") == micros("ltz") && micros("nanos") == micros("ltz"),
      "normalize must yield the same epoch-micros under every encoding")
  }

  private def assertSameRows(op: String, f: DataFrame => DataFrame): Unit = {
    val outs = encodings.map { case (name, df) =>
      name -> f(Events.normalize(df)).collect().map(_.toString).sorted.toSeq
    }
    assert(outs("ntz") == outs("ltz"),
      s"$op: timestamp[us] encoding diverges from TimestampType")
    assert(outs("nanos") == outs("ltz"),
      s"$op: int64-nanos encoding diverges from TimestampType")
    assert(outs("ltz").nonEmpty, s"$op: vacuous comparison (0 rows)")
  }

  test("temporal + streaming operators are encoding-invariant") {
    assertSameRows("hourlyTypeCounts", Events.hourlyTypeCounts)
    assertSameRows("sessionize", ev =>
      graft.ops.Temporal.sessionize(ev, "user_id", "ts", "value", gapSec = 1800L))
    assertSameRows("rollingFeatures", ev =>
      graft.ops.Temporal.rollingFeatures(ev, "user_id", "ts", "value", windowSec = 3600L))
    assertSameRows("asofJoin", { ev =>
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max(col("value")).as("pval"))
      graft.ops.Temporal.asofJoin(
        ev.select("event_id", "user_id", "ts"), purchases, "user_id", "ts", Seq("pval"))
    })
  }
}
