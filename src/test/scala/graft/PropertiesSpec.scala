package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.ops.{Misc, Percentiles, RowOps}

/** Property-style checks for the pure operators (seeded scalacheck
  * generators, fixed trial count — the scalatest/scalacheck bridge
  * artifact is not on the offline classpath): row-wise mode against a
  * reference implementation, percentile parity with np.percentile
  * interpolation, binning invariants.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(1000L + i)))

  private def scipyMode(xs: Seq[Double]): Double =
    xs.groupBy(identity).toSeq
      .map { case (v, g) => (g.size, v) }
      .sortBy { case (cnt, v) => (-cnt, v) }
      .head._2

  test("image codec property: decode . encodeNetpbm is the identity on rasters") {
    import graft.multimodal.Multimodal
    val gen = for {
      w <- Gen.choose(1, 9)
      h <- Gen.choose(1, 9)
      ch <- Gen.oneOf(1, 3)
      data <- Gen.listOfN(w * h * ch, Gen.choose(0, 255))
    } yield Multimodal.Raster(if (ch == 3) "ppm" else "pgm", w, h, ch,
      data.map(_.toByte).toArray)
    for (r <- samples(gen, 60)) {
      val back = Multimodal.imageRaster(Multimodal.encodeNetpbm(r))
      assert(back.nonEmpty, s"re-decode failed for ${r.w}x${r.h}x${r.channels}")
      val b = back.get
      assert(b.w == r.w && b.h == r.h && b.channels == r.channels &&
        java.util.Arrays.equals(b.data, r.data),
        s"round-trip mismatch at ${r.w}x${r.h}x${r.channels}")
    }
  }

  test("image codec property: NN resize preserves the value set bounds and w==outW identity") {
    import graft.multimodal.Multimodal
    val gen = for {
      w <- Gen.choose(1, 8)
      h <- Gen.choose(1, 8)
      data <- Gen.listOfN(w * h * 3, Gen.choose(0, 255))
    } yield Multimodal.Raster("ppm", w, h, 3, data.map(_.toByte).toArray)
    for (r <- samples(gen, 40)) {
      // same-size resize is the identity (sx = x, sy = y exactly)
      val same = Multimodal.resizeRaster(r, r.w, r.h)
      assert(java.util.Arrays.equals(same.data, r.data), "identity resize changed pixels")
      // every output pixel of any resize is a source pixel (NN never interpolates)
      val res = Multimodal.resizeRaster(r, 3, 3)
      val srcPixels = r.data.grouped(3).map(_.toSeq).toSet
      assert(res.data.grouped(3).map(_.toSeq).forall(srcPixels.contains),
        "NN resize must only ever copy source pixels")
    }
  }

  test("codec corruption fuzz: truncated/bit-flipped payloads never throw, " +
      "decode to null or no rows") {
    import graft.multimodal.Multimodal
    // real payloads from the synthetic generators, then truncate at
    // every-ish offset and flip a byte — a corrupt corpus must degrade
    // to nulls/empties, never to a task failure
    val ids = (0L until 6L).toDF("doc_id")
    def payloads(df: org.apache.spark.sql.DataFrame): Seq[Array[Byte]] =
      df.collect().map(_.getAs[Array[Byte]]("payload")).toSeq
    val wavs = payloads(Multimodal.syntheticWav(ids, "doc_id", "payload"))
    val y4ms = payloads(Multimodal.syntheticY4m(ids, "doc_id", "payload"))
    val ppms = payloads(Multimodal.syntheticPpm(ids, "doc_id", "payload"))
    val rnd = new scala.util.Random(13)
    val corrupt = (wavs ++ y4ms ++ ppms).flatMap { p =>
      val cuts = Seq(1, 3, 7, p.length / 3, p.length / 2, p.length - 1)
        .filter(n => n > 0 && n < p.length).map(p.take)
      val flipped = p.clone()
      flipped(rnd.nextInt(p.length)) = (rnd.nextInt(256) - 128).toByte
      cuts :+ flipped
    }
    val df = corrupt.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "payload")
    // none of these may throw; outputs are null rows or no rows
    Multimodal.decodeImages(df, "payload").collect()
    Multimodal.decodeAudio(df, "payload").collect()
    Multimodal.decodeVideo(df, "payload").collect()
    Multimodal.audioFrames(df, "payload", 8).collect()
    Multimodal.audioSpectrum(df, "payload", Seq(1)).collect()
    Multimodal.sceneChanges(df, "payload", 10.0).collect()
    val hashes = Multimodal.imageDHash(df, "payload").collect()
    assert(hashes.length == corrupt.size, "dHash keeps one row per input")
  }

  test("divergence/score properties on random corpora: KL >= 0, " +
      "stupid-backoff log-scores <= 0, tfidf scores >= 0") {
    val word = Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")
    val doc = Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val src = Gen.oneOf("s1", "s2", "s3")
    val gen = Gen.zip(doc, src)
    val rows = samples(gen, 40).zipWithIndex
      .map { case ((t, s), i) => (i.toLong, s, t) }
    val df = rows.toDF("id", "source", "txt")
    // KL(p_g || q) is nonnegative by Gibbs' inequality, finite because
    // every group token is a corpus token
    val kl = graft.text.Curation.groupKlDivergence(df, "source", "txt")
      .collect().map(_.getDouble(2))
    assert(kl.nonEmpty && kl.forall(k => k >= 0.0 && !k.isNaN && !k.isInfinite),
      s"KL violated Gibbs: ${kl.toSeq}")
    // every stupid-backoff score S is in (0, 1]: seen arm c(pair)<=c(prev),
    // backoff arm alpha*c/N < 1 -> mean log10 <= 0
    val sb = graft.text.Curation.bigramLogProb(df, "id", "txt")
      .collect().map(_.getDouble(2))
    assert(sb.nonEmpty && sb.forall(_ <= 0.0), s"S>1 leaked: ${sb.toSeq}")
    // tf*ln(N/df) >= 0 (df <= N always) and ranks stay within k
    val kw = graft.text.TextOps.tfidfKeywords(df, "id", "txt", k = 2)
      .collect()
    assert(kw.nonEmpty && kw.forall(r => r.getDouble(3) >= 0.0 &&
      r.getInt(1) >= 1 && r.getInt(1) <= 2))
  }

  test("cohort retention property: period 0 is always exactly 1.0, rates in (0,1]") {
    val gen = Gen.zip(Gen.choose(1L, 12L), Gen.choose(0, 27))
    val rows = samples(gen, 80).map { case (u, day) =>
      (u, java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 10:00:00")) }
    val df = rows.toDF("user_id", "ts")
    val got = graft.ops.Temporal.cohortRetention(df, "user_id", "ts", 7)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (period, ret) = (r.getLong(1), r.getDouble(4))
      assert(ret > 0.0 && ret <= 1.0, s"retention out of range: $r")
      if (period == 0L) assert(ret == 1.0, s"period-0 must be the cohort itself: $r")
      assert(r.getLong(2) <= r.getLong(3), "active never exceeds cohort size")
    }
  }

  test("round-10 invariants on random event streams: entropy/transitivity/" +
      "CUSUM/winsorized bounds") {
    import java.sql.Timestamp
    val rnd = new scala.util.Random(71)
    val types = Seq("a", "b", "c", "d")
    val rows = (1 to 800).map { i =>
      (rnd.nextInt(40).toLong,
        Timestamp.valueOf(f"2024-01-${1 + rnd.nextInt(28)}%02d " +
          f"${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"),
        i.toLong, types(rnd.nextInt(types.size)),
        math.floor(rnd.nextDouble() * 5000) / 100.0)
    }
    val df = rows.toDF("user_id", "ts", "event_id", "event_type", "value")
    // entropy ∈ [0, ln(#types)]
    val ent = graft.ops.EventAnalytics.typeEntropy(df, "user_id", "event_type")
      .collect()
    assert(ent.forall { r =>
      val h = r.getDouble(3)
      h >= -1e-9 && h <= math.log(types.size.toDouble) + 1e-9
    })
    // CUSUM sides are non-negative; alarms only where a side exceeds 4σ > 0
    val cs = graft.ops.EventAnalytics.cusumDaily(df, "ts").collect()
    assert(cs.forall(r => r.getDouble(2) >= 0 && r.getDouble(3) >= 0))
    assert(cs.filter(_.getBoolean(4))
      .forall(r => math.max(r.getDouble(2), r.getDouble(3)) > 0))
    // winsorized mean sits inside [p_lo, p_hi]; raw mean can escape
    val w = graft.ops.Stats.winsorizedMeans(df, "event_type", "value")
      .collect()
    assert(w.forall(r => r.getDouble(4) >= r.getDouble(2) - 1e-9 &&
      r.getDouble(4) <= r.getDouble(3) + 1e-9))
    // KM survival is non-increasing in [0, 1]
    val km = graft.ops.EventAnalytics.kaplanMeier(df, "user_id", "ts",
        "event_type", "a", "b")
      .orderBy("duration_days").collect().map(_.getDouble(3))
    assert(km.forall(s => s >= -1e-9 && s <= 1 + 1e-9))
    assert(km.zip(km.drop(1)).forall { case (x, y) => y <= x + 1e-9 })
    // transitivity ∈ [0, 1] on a random co-occurrence graph
    val baskets = (1 to 300).map(i =>
      (rnd.nextInt(60).toLong, rnd.nextInt(30).toLong)).toDF("b", "i")
    val tri = graft.ops.Graph.triangleStats(
      graft.ops.Graph.coOccurrenceEdges(baskets, "b", "i")).head()
    assert(tri.getDouble(4) >= 0 && tri.getDouble(4) <= 1 + 1e-9)
  }

  test("hammingNearDup property: banding equals brute force under the pigeonhole bound") {
    val rnd = new scala.util.Random(5)
    // clustered fingerprints: 12 base hashes, each with noisy variants
    val bases = (1 to 12).map(_ =>
      (1 to 64).map(_ => if (rnd.nextBoolean()) '1' else '0').mkString)
    val rows = (0 until 120).map { i =>
      val base = bases(i % bases.size)
      val flips = rnd.nextInt(5) // 0..4 flips keeps many pairs <= 6
      val h = (1 to flips).foldLeft(base) { (acc, _) =>
        val p = rnd.nextInt(64)
        acc.updated(p, if (acc(p) == '0') '1' else '0')
      }
      (i.toLong, h)
    }
    val df = rows.toDF("doc_id", "dhash")
    val got = graft.dedup.Dedup.hammingNearDup(df, "doc_id", "dhash",
        maxDistance = 6, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val brute = (for {
      (a, ha) <- rows; (b, hb) <- rows if a < b
      d = ha.zip(hb).count { case (x, y) => x != y } if d <= 6
    } yield (a, b) -> d).toMap
    assert(got == brute,
      s"banding missed/invented pairs: got ${got.size} vs brute ${brute.size}")
  }

  test("resampleAudio property: target == source rate is the identity") {
    // at ratio 1 every output index k maps exactly onto source frame k
    // with zero fraction, so the resampled stream must equal the
    // decoded samples bit-for-bit
    val docs = (0L until 25L).map(Tuple1(_)).toDF("doc_id")
    val wav = graft.multimodal.Multimodal.syntheticWav(docs, "doc_id", "payload")
    val got = graft.multimodal.Multimodal.resampleAudio(wav, "payload", 8000)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3)) -> r.getDouble(4))
      .toMap
    // closed-form synthetic source: s(t, c) = ((id·37 + t·11 + c·5) % 4096) − 2048
    for (id <- 0L until 25L) {
      val nch = (1 + id % 2).toInt
      val n = (20 + id % 7).toInt
      for (t <- 0 until n; c <- 0 until nch)
        assert(got((id, c, t)) == ((id * 37 + t * 11 + c * 5) % 4096 - 2048).toDouble,
          s"identity broken at id=$id t=$t c=$c")
    }
    assert(got.size == (0L until 25L).map(id =>
      (20 + id % 7).toInt * (1 + id % 2).toInt).sum)
  }

  test("classificationReport matches hand-computed sklearn values") {
    // labels: a,a,a,b,b,c  preds: a,a,b,b,b,b
    // a: tp=2 support=3 pred=2 -> P=1.0    R=0.666667 F=0.8
    // b: tp=2 support=2 pred=4 -> P=0.5    R=1.0      F=0.666667
    // c: tp=0 support=1 pred=0 -> P=0      R=0        F=0
    val df = Seq(("a","a"),("a","a"),("a","b"),("b","b"),("b","b"),("c","b"))
      .toDF("label", "pred")
    val rep = graft.ops.Stats.classificationReport(df, "label", "pred")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(rep("a") == ((1.0, 0.666667, 0.8, 3L)))
    assert(rep("b") == ((0.5, 1.0, 0.666667, 2L)))
    assert(rep("c") == ((0.0, 0.0, 0.0, 1L)))
    assert(rep("macro avg") == ((0.5, 0.555556, 0.488889, 6L)))
    // weighted: P=(1*3+0.5*2)/6=0.666667 R=(0.666667*3+1*2)/6=0.666667
    // F=(0.8*3+0.666667*2)/6=0.622222
    assert(rep("weighted avg") == ((0.666667, 0.666667, 0.622222, 6L)))
  }

  test("transformSkewed: abs branch, log1p-on-zeros branch, threshold gate") {
    import graft.ops.Preprocess
    // neg: all values <= 0 -> abs applied in place; the abs'd column is
    // exponential-ish (right-skewed) so LOG wins.
    // zeroed: contains 0 -> LOG1P candidate; wins on the same shape.
    // flat: near-uniform -> nothing beats the 0.15 threshold.
    val n = 400
    val rows = (1 to n).map { i =>
      val e = math.exp(i % 7 + (i % 13) * 0.5) // right-skewed positive
      (-e, if (i == 1) 0.0 else e, i.toDouble % 50)
    }
    val df = rows.toDF("neg", "zeroed", "flat")
    val r = Preprocess.transformSkewed(df, Seq("neg", "zeroed", "flat"))
    assert(r.appliedAbs == Seq("neg"))
    assert(r.transformed("neg") == "neg_LOG", s"got ${r.transformed}")
    assert(r.transformed("zeroed") == "zeroed_LOG1P")
    assert(!r.transformed.contains("flat"))
    assert(r.data.columns.toSet ==
      Set("neg", "zeroed", "flat", "neg_LOG", "zeroed_LOG1P"))
    // abs applied in place: the output column is nonnegative
    assert(r.data.filter(col("neg") < 0).isEmpty)
    val summ = r.summary.collect().map(x => x.getString(0) -> x.getString(2)).toMap
    assert(summ == Map("neg" -> "neg_LOG", "zeroed" -> "zeroed_LOG1P", "flat" -> "none"))
  }

  test("rowMode matches scipy mode (max count, smallest-value tie-break)") {
    val gen = Gen.listOfN(40, Gen.listOfN(5, Gen.chooseNum(0, 3).map(_.toDouble)))
    samples(gen, 5).foreach { data =>
      val df = data.map(l => (l(0), l(1), l(2), l(3), l(4)))
        .toDF("a", "b", "c", "d", "e")
      val got = df.select(RowOps.rowMode(
        Seq(col("a"), col("b"), col("c"), col("d"), col("e"))).as("m"))
        .collect().map(_.getDouble(0)).toSeq
      val want = data.map(scipyMode(_))
      assert(got == want)
    }
  }

  private def npPercentile(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    val r = (s.size - 1) * p
    val (lo, hi) = (math.floor(r).toInt, math.ceil(r).toInt)
    s(lo) * (1 - (r - lo)) + s(hi) * (r - lo)
  }

  test("sort-based exact percentile matches np.percentile interpolation") {
    val gen = Gen.listOfN(150, Gen.chooseNum(-1e6, 1e6))
    samples(gen, 4).foreach { xs =>
      val df = xs.toDF("v")
      val got = Percentiles.exact(df, "v", Seq(0.25, 0.5, 0.9))
      Seq(0.25, 0.5, 0.9).foreach { p =>
        assert(math.abs(got(p) - npPercentile(xs, p)) < 1e-6,
          s"p=$p got=${got(p)} want=${npPercentile(xs, p)}")
      }
    }
  }

  test("histogramCut covers every row exactly once with bins in range") {
    val gen = Gen.listOfN(200, Gen.chooseNum(0.0, 1000.0))
    samples(gen, 4).foreach { xs =>
      if (xs.distinct.size > 1) {
        val df = xs.map(x => (x, if (x > 500) "a" else "b")).toDF("v", "cls")
        val out = Misc.histogramCut(df, "v", "cls", 8).collect()
        assert(out.map(_.getLong(2)).sum == xs.size, "counts cover all rows")
        assert(out.forall { r => val b = r.getInt(0); b >= 0 && b < 8 })
      }
    }
  }

  test("salted aggregation equals direct groupBy; salted join equals plain join") {
    import graft.ops.Skew
    val li = core.Tables.lineitem(spark, sf)
    val salted = Skew.saltedAgg(li, Seq("l_returnflag"),
      Seq(Skew.SaltedSum("l_quantity", "sq"), Skew.SaltedCount("n"),
        Skew.SaltedAvg("l_discount", "ad")), buckets = 8)
      .select(col("l_returnflag"), round(col("sq"), 6).as("sq"), col("n"),
        round(col("ad"), 6).as("ad"))
    val direct = li.groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 6).as("sq"), count(lit(1)).as("n"),
        round(avg("l_discount"), 6).as("ad"))
    assert(salted.except(direct).isEmpty && direct.except(salted).isEmpty)

    val nat = core.Tables.nation(spark, sf)
    val plain = li.join(nat, li("l_suppkey") % 25 === nat("n_nationkey"))
      .groupBy("n_name").count()
    val saltedJ = Skew.saltedBroadcastJoin(
        li.withColumn("__k", col("l_suppkey") % 25),
        nat.withColumnRenamed("n_nationkey", "__k"), "__k")
      .groupBy("n_name").count()
    assert(saltedJ.except(plain).isEmpty && plain.except(saltedJ).isEmpty)
  }

  test("column-name surgery: uppercase, prefix, suffix strip (F5/F6)") {
    val df = Seq((1, 2.0)).toDF("id", "score_OOF")
    assert(Misc.upperCaseColumns(df).columns.toSeq == Seq("ID", "SCORE_OOF"))
    assert(Misc.addPrefix(df, "m1_", except = Set("id")).columns.toSeq ==
      Seq("id", "m1_score_OOF"))
    assert(Misc.stripSuffix(df, "_OOF").columns.toSeq == Seq("id", "score"))
  }

  test("weightedMean normalizes weights") {
    val df = Seq((1.0, 3.0)).toDF("x", "y")
    val got = df.select(RowOps.weightedMean(Seq(col("x"), col("y")), Seq(2.0, 6.0)).as("m"))
      .head().getDouble(0)
    assert(math.abs(got - (1.0 * 0.25 + 3.0 * 0.75)) < 1e-12)
  }
}
