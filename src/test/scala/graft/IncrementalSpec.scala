package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{EventAnalytics, Incremental}

/** Exactness + hand cases for the incremental-pipeline family
  * (`ops/Incremental.scala`) and rolling distinct counts. */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def finishRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6)))).toMap

  test("finish: hand-computed moments") {
    val df = Seq(("k", 1.5), ("k", 2.5)).toDF("g", "v")
    val got = finishRows(Incremental.finish(Incremental.aggState(df, "g", "v")))
    assert(got("k") == ((2L, 4.0, 2.0, 0.25, 1.5, 2.5)))
  }

  test("merge(state(A), state(B)) == state(A ∪ B), bit-for-bit, any merge order") {
    val rnd = new scala.util.Random(19)
    val rows = (1 to 900).map(i =>
      (s"g${i % 4}", math.floor(rnd.nextDouble() * 500 * 1e6) / 1e6))
    val Seq(a, b, c) = Seq(0, 1, 2).map(k =>
      rows.zipWithIndex.collect { case (r, i) if i % 3 == k => r }.toDF("g", "v"))
    val whole = finishRows(Incremental.finish(
      Incremental.aggState(rows.toDF("g", "v"), "g", "v")))
    val m1 = finishRows(Incremental.finish(Incremental.mergeState(
      Incremental.mergeState(Incremental.aggState(a, "g", "v"),
        Incremental.aggState(b, "g", "v")),
      Incremental.aggState(c, "g", "v"))))
    val m2 = finishRows(Incremental.finish(Incremental.mergeState(
      Incremental.aggState(a, "g", "v"),
      Incremental.mergeState(Incremental.aggState(b, "g", "v"),
        Incremental.aggState(c, "g", "v")))))
    assert(m1 == whole) // exact equality, not tolerance
    assert(m2 == whole)
  }

  test("mergeState: one-sided keys pass through unchanged") {
    val a = Incremental.aggState(Seq(("only_a", 1.0)).toDF("g", "v"), "g", "v")
    val b = Incremental.aggState(Seq(("only_b", 2.0)).toDF("g", "v"), "g", "v")
    val got = finishRows(Incremental.finish(Incremental.mergeState(a, b)))
    assert(got("only_a") == ((1L, 1.0, 1.0, 0.0, 1.0, 1.0)))
    assert(got("only_b") == ((1L, 2.0, 2.0, 0.0, 2.0, 2.0)))
  }

  test("snapshotDiff: added / removed / changed, unchanged rows absent") {
    val old = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "payload")
    val nw = Seq((2L, "y"), (3L, "zz"), (4L, "w")).toDF("id", "payload")
    val got = Incremental.snapshotDiff(old, nw, Seq("id"), Seq("payload"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("snapshotDiff: a delimiter INSIDE a value must not mask a change") {
    // a raw separator-joined digest is injectable: ('a|b', 'c') and
    // ('a', 'b|c') concat to the same string — the JSON-struct digest
    // keeps escaped per-field boundaries so the change is seen
    val old = Seq((1L, "a|b", "c")).toDF("id", "c1", "c2")
    val nw = Seq((1L, "a", "b|c")).toDF("id", "c1", "c2")
    val got = Incremental.snapshotDiff(old, nw, Seq("id"), Seq("c1", "c2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "changed"),
      s"pipe-injected column shift must register as changed: $got")
  }

  test("snapshotDiff: a value moving between columns via NULL is a change") {
    // concat_ws alone skips NULLs, so ('a', NULL, 'b') and ('a', 'b',
    // NULL) would share a digest and the change would be missed; the
    // JSON-struct digest keeps one named field per compare column
    val old = Seq((1L, Some("a"), None: Option[String], Some("b")),
      (2L, Some("x"), Some("y"), None: Option[String]))
      .toDF("id", "c1", "c2", "c3")
    val nw = Seq((1L, Some("a"), Some("b"), None: Option[String]),
      (2L, Some("x"), Some("y"), None: Option[String]))
      .toDF("id", "c1", "c2", "c3")
    val got = Incremental.snapshotDiff(old, nw, Seq("id"),
        Seq("c1", "c2", "c3"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "changed"))
  }

  test("aggState: values past the long-square boundary (|v| >= ~3038) stay exact") {
    // vi = 5000.5e6 squares to 2.5e19 > Long.MaxValue; a long multiply
    // would silently wrap s2 and corrupt var_v
    val df = Seq(("k", 5000.5), ("k", 10000.25)).toDF("g", "v")
    val r = finishRows(Incremental.finish(Incremental.aggState(df, "g", "v")))
    val (n, sum_v, mean_v, var_v, mn, mx) = r("k")
    assert(n == 2L && sum_v == 15000.75 && mean_v == 7500.375)
    assert(mn == 5000.5 && mx == 10000.25)
    // pop var of {a, b} = ((a - b) / 2)^2 = 2499.875^2
    assert(math.abs(var_v - 6249375.015625) < 1e-3, s"s2 wrapped: var=$var_v")
  }

  test("scd2Intervals: interval chain with equal-ts tie-break") {
    def t(s: Long) = new Timestamp(s * 1000L)
    val df = Seq((1L, 7L, t(100)), (2L, 7L, t(200)), (3L, 7L, t(200)),
      (4L, 8L, t(50))).toDF("event_id", "user_id", "ts")
    val got = Incremental.scd2Intervals(df, "user_id", "ts", "event_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getBoolean(4)))).toMap
    assert(got(1L) == ((100000000L, Some(200000000L), false)))
    assert(got(2L) == ((200000000L, Some(200000000L), false))) // tie: id 2 before 3
    assert(got(3L) == ((200000000L, None, true)))
    assert(got(4L) == ((50000000L, None, true)))
  }

  test("Contracts: range, uniqueness, and referential checks count violations") {
    import graft.ops.Contracts._
    val child = Seq((1L, 5.0), (2L, -1.0), (2L, 99.0), (9L, 1.0)).toDF("fk", "v")
    val parent = Seq(Tuple1(1L), Tuple1(2L)).toDF("pk")
    val got = report(Seq(
        predicateCheck(child, "v_range", col("v") < 0 || col("v") > 50),
        uniquenessCheck(child, "fk_unique", Seq("fk")),
        referentialCheck(child, parent, "fk_orphan", "fk", "pk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("v_range" -> 2L, "fk_unique" -> 1L, "fk_orphan" -> 1L))
  }

  test("exactCentroids: hand means, bit-identical under repartition") {
    val df = Seq((0, Seq(1.0f, 2.0f)), (0, Seq(3.0f, 6.0f)), (1, Seq(5.0f, 0.5f)))
      .toDF("label", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.sim.Similarity.exactCentroids(d, "label", "embedding")
        .collect().map(r => (r.getInt(0), r.getInt(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
    val got = run(df)
    assert(got((0, 0)) == ((2L, 2.0)) && got((0, 1)) == ((2L, 4.0)))
    assert(got((1, 0)) == ((1L, 5.0)) && got((1, 1)) == ((1L, 0.5)))
    assert(run(df.repartition(5)) == got)
  }

  test("centroidDistances: hand L2 between exact centroids") {
    // label 0 centroid (1, 0); label 1 centroid (0, 4) -> d = sqrt(17)
    val df = Seq((1L, Seq(0.0f, 0.0f), 0), (2L, Seq(2.0f, 0.0f), 0),
      (3L, Seq(0.0f, 3.0f), 1), (4L, Seq(0.0f, 5.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = graft.sim.Similarity.centroidDistances(df, "label", "embedding")
      .head()
    assert(r.getInt(0) == 0 && r.getInt(1) == 1)
    assert(r.getDouble(2) == math.floor(math.sqrt(17.0) * 1e6 + 0.5) / 1e6)
  }

  test("labelConfusion: a planted mislabeled vector is the only flag") {
    // (0,4) labeled 0 sits on label 1's centroid; every other vector
    // is nearest its own (centroids shift to (2/3, 4/3) and (0, 4))
    val df = Seq((1L, Seq(0.0f, 0.0f), 0), (2L, Seq(2.0f, 0.0f), 0),
      (5L, Seq(0.0f, 4.0f), 0), // mislabeled
      (3L, Seq(0.0f, 3.0f), 1), (4L, Seq(0.0f, 5.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = graft.sim.Similarity.labelConfusion(df, "vec_id", "label",
        "embedding")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(got == Map(5L -> ((0, 1))), s"only the planted flag: $got")
  }

  test("aggState parity: a streaming aggregation over deltas equals the batch state") {
    // the state is exact integer sums, so a streaming groupBy-agg over
    // arriving micro-batches must land on the SAME state as one batch
    // pass — the incremental-pipeline claim, proven on the stream path
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(23)
    val rows = (1 to 300).map(i =>
      (s"g${i % 3}", math.floor(rnd.nextDouble() * 400 * 1e6) / 1e6))
    val input = MemoryStream[(String, Double)](spark)
    val vi = floor(col("_2") * 1000000.0 + 0.5).cast("long")
    val agg = input.toDF()
      .select(col("_1").as("key"), vi.as("__vi"))
      .select(col("key"), col("__vi"),
        (col("__vi").cast("decimal(38,0)") * col("__vi").cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("__vi2"))
      .groupBy("key").agg(
        count(lit(1)).as("n"),
        sum(col("__vi").cast("decimal(38,0)")).as("s1"),
        sum(col("__vi2")).as("s2"),
        min(col("__vi")).as("mn"), max(col("__vi")).as("mx"))
    val q = agg.writeStream.format("memory").queryName("inc_state")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete()).start()
    try {
      input.addData(rows.take(120)); q.processAllAvailable()
      input.addData(rows.drop(120)); q.processAllAvailable()
      val streamed = finishRows(Incremental.finish(spark.table("inc_state")))
      val batch = finishRows(Incremental.finish(
        Incremental.aggState(rows.toDF("g", "v"), "g", "v")))
      assert(streamed == batch) // bit-for-bit, not tolerance
    } finally q.stop()
  }

  test("imageHistogram: hand 2x1 PPM bins; corrupt payload emits nothing") {
    val header = "P6\n2 1\n255\n".getBytes("US-ASCII")
    val px = Array[Byte](0, 0, 0, -1, -1, -1) // (0,0,0) and (255,255,255)
    val good = (1L, header ++ px)
    val bad = (2L, Array[Byte](1, 2, 3))
    val df = Seq(good, bad).toDF("id", "payload")
    val got = graft.multimodal.Multimodal.imageHistogram(df, "payload", 16)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(3)).toMap
    assert(got == Map((1L, 0) -> 1L, (1L, 15) -> 1L))
    // degenerate params fail fast at plan build, not as an executor AIOOBE
    intercept[IllegalArgumentException] {
      graft.multimodal.Multimodal.imageHistogram(df, "payload", 0)
    }
    intercept[IllegalArgumentException] {
      graft.multimodal.Multimodal.resizePayload(df, "payload", 0)
    }
  }

  test("imageContrast: hand min/max/range and RMS = half-range for a binary image") {
    val header = "P6\n2 1\n255\n".getBytes("US-ASCII")
    val px = Array[Byte](0, 0, 0, -1, -1, -1)
    val df = Seq((1L, header ++ px)).toDF("id", "payload")
    val r = graft.multimodal.Multimodal.imageContrast(df, "payload").head()
    assert(r.getInt(2) == 0 && r.getInt(3) == 255 && r.getInt(4) == 255)
    assert(r.getDouble(5) == 127.5) // std of {0, 255}
  }

  test("resampleAudio: hand 2-sample mono clip, 8k -> 12k linear interp") {
    // samples [0, 300] at 8 kHz -> 2 outputs at 12 kHz: k=0 reads 0;
    // k=1 sits at source pos 2/3 -> 0·(1/3) + 300·(2/3) = 200
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    val body =
      Array[Byte]('f', 'm', 't', ' ') ++ le32(16) ++ le16(1) ++ le16(1) ++
        le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16) ++
      Array[Byte]('d', 'a', 't', 'a') ++ le32(4) ++ le16(0) ++ le16(300)
    val wav = Array[Byte]('R', 'I', 'F', 'F') ++ le32(4 + body.length) ++
      Array[Byte]('W', 'A', 'V', 'E') ++ body
    val df = Seq((1L, wav)).toDF("id", "payload")
    val got = graft.multimodal.Multimodal.resampleAudio(df, "payload", 12000)
      .collect().map(r => (r.getInt(2), r.getInt(3)) -> r.getDouble(4)).toMap
    assert(got == Map((0, 0) -> 0.0, (0, 1) -> 200.0), s"got $got")
  }

  test("rollingDistinct: hand-computed 7-day active counts") {
    def ts(day: Int): Timestamp = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    val df = Seq((ts(1), 1L), (ts(3), 2L), (ts(10), 1L)).toDF("ts", "u")
    val got = EventAnalytics.rollingDistinct(df, "ts", "u", 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "2024-01-01" -> 1L,  // {1}
      "2024-01-03" -> 2L,  // {1 (from day 1), 2}
      "2024-01-10" -> 1L)) // day-1 user aged out; {1 again}
  }
}
