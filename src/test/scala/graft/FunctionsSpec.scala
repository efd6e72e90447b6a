package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Native CosineSimilarity expression: value parity with the
  * higher-order-function formulation, codegen path, null handling,
  * and SQL registry resolution. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pairs = Seq(
    (Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),
    (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (Array(1.0f, 2.0f, 3.0f), Array(-1.0f, 0.5f, 2.0f)),
    (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))).toDF("a", "b")

  test("matches the composed higher-order-function cosine") {
    val hof = {
      val ad = transform(col("a"), _.cast("double"))
      val bd = transform(col("b"), _.cast("double"))
      val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      val na = sqrt(aggregate(ad, lit(0.0), (acc, x) => acc + x * x))
      val nb = sqrt(aggregate(bd, lit(0.0), (acc, x) => acc + x * x))
      dot / (na * nb)
    }
    // composed form divides by zero on the zero-vector row (ANSI mode
    // error) — the native expression returns null there instead
    val nonZero = pairs.filter(aggregate(col("a"),
      lit(0.0), (acc, x) => acc + x * x) > 0)
    val rows = nonZero.select(
      GraftFunctions.cosineSim(spark, col("a"), col("b")).as("native"),
      hof.as("composed")).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12,
        s"native=${r.get(0)} composed=${r.get(1)}")
    }
    assert(rows(0).getDouble(0) == 1.0)
    assert(rows(1).getDouble(0) == 0.0)
    val zeroRow = pairs.except(nonZero)
      .select(GraftFunctions.cosineSim(spark, col("a"), col("b"))).collect()
    assert(zeroRow.length == 1 && zeroRow(0).isNullAt(0),
      "zero vector -> null (composed form raises DIVIDE_BY_ZERO under ANSI)")
  }

  test("resolves via SQL through the injected registry function") {
    GraftFunctions.register(spark)
    pairs.createOrReplaceTempView("__cs_pairs")
    val r = spark.sql(
      "SELECT round(cosine_sim(a, b), 6) AS c FROM __cs_pairs").collect()
    assert(r(0).getDouble(0) == 1.0)
  }

  test("null and length-mismatch inputs yield null") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), None: Option[Array[Float]]),
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0f, 2.0f, 3.0f)))).toDF("a", "b")
    val out = df.select(GraftFunctions.cosineSim(spark, col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("double arrays accepted; wrong types rejected at analysis") {
    val d = Seq((Array(1.0, 2.0), Array(2.0, 4.0))).toDF("a", "b")
    val v = d.select(GraftFunctions.cosineSim(spark, col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
    val bad = Seq(("x", 1)).toDF("a", "b")
    intercept[Exception] {
      bad.select(GraftFunctions.cosineSim(spark, col("a"), col("b"))).collect()
    }
  }

  test("hashed_ngrams equals the substr+xxhash64 formulation per window") {
    // parity across ASCII and multi-byte text, short strings, exact n
    val texts = Seq("abcdef", "abcde", "abcd", "", "héllo wörld",
      "你好世界啊", "a b a b a")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val n = 5
    val native = df.select(col("id"),
      GraftFunctions.hashedNgrams(spark, col("t"), n).as("h"))
    val composed = df.select(col("id"),
      when(length(col("t")) >= n,
        transform(sequence(lit(1), length(col("t")) - n + 1),
          i => xxhash64(col("t").substr(i, lit(n)))))
        .otherwise(array().cast("array<bigint>")).as("h"))
    val a = native.orderBy("id").collect().map(_.getSeq[Long](1))
    val b = composed.orderBy("id").collect().map(_.getSeq[Long](1))
    assert(a.toSeq == b.toSeq)
  }

  test("hashed_ngrams resolves via SQL and nulls propagate") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT hashed_ngrams('abc', 2) AS h, hashed_ngrams(CAST(NULL AS STRING), 2) AS hn").head()
    assert(r.getSeq[Long](0).length == 2 && r.isNullAt(1))
  }

  test("hashed_shingles: window count, whitespace invariance, order sensitivity") {
    GraftFunctions.register(spark)
    def sh(t: String, k: Int): Seq[Long] =
      spark.sql(s"SELECT hashed_shingles('$t', $k) AS h").head().getSeq[Long](0)
    assert(sh("a b c d", 3).length == 2)   // numTokens - k + 1
    assert(sh("a b", 3).isEmpty)           // too short
    assert(sh("a  b\tc", 2) == sh("a b c", 2),   // \s-run normalization
      "multiple whitespace must shingle like single spaces")
    assert(sh("a b c", 2) != sh("a c b", 2), "token order must matter")
    assert(sh("a b c", 3) != sh("x y z", 3))
    val r = spark.sql("SELECT hashed_shingles(CAST(NULL AS STRING), 2) AS h").head()
    assert(r.isNullAt(0))
  }

  test("sorted_intersect_count matches array_intersect size on random sets") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(50))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(50))(rnd.nextInt(40).toLong).distinct.sorted
      (a, b, a.toSet.intersect(b.toSet).size.toLong)
    }
    val df = rows.toDF("a", "b", "expect")
    val got = df.select(
      GraftFunctions.sortedIntersectCount(spark, col("a"), col("b")).as("got"),
      col("expect")).collect()
    assert(got.forall(r => r.getLong(0) == r.getLong(1)))
    // empty and null behavior
    val e = spark.sql(
      "SELECT sorted_intersect_count(CAST(array() AS ARRAY<BIGINT>), array(1L, 2L)) AS z, " +
      "sorted_intersect_count(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS n, " +
      // null ELEMENTS (sorted first, as sort_array places them) match
      // nothing and are skipped, not misread as garbage longs
      "sorted_intersect_count(array(NULL, 1L, 2L), array(CAST(NULL AS BIGINT), 2L)) AS s").head()
    assert(e.getLong(0) == 0L && e.isNullAt(1) && e.getLong(2) == 1L)
  }

  test("sorted_intersect_count SQL-caller contract: unsorted input undercounts, sort_array repairs it") {
    GraftFunctions.register(spark)
    // The documented precondition (SortedIntersectCount scaladoc): the
    // merge pass assumes ascending runs and silently undercounts on
    // disorder — callers must sort_array first. Pin both halves of the
    // contract so a future "helpful" reorder of the kernel can't
    // silently change SQL-visible behavior.
    val r = spark.sql(
      "SELECT sorted_intersect_count(array(3L, 1L, 2L), array(1L, 2L, 3L)) AS raw, " +
      "sorted_intersect_count(sort_array(array(3L, 1L, 2L)), array(1L, 2L, 3L)) AS fixed").head()
    assert(r.getLong(0) < 3L, "unsorted input must undercount (documented GIGO)")
    assert(r.getLong(1) == 3L, "sort_array upstream restores the exact count")
  }

  test("hashed_ngrams: randomized unicode parity with the substr formulation") {
    GraftFunctions.register(spark)
    val alphabet = "ab χψω 漢字 é€ \t"
    val rnd = new scala.util.Random(11)
    val texts = (1 to 60).map { _ =>
      (1 to rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    for (n <- Seq(2, 5)) {
      val native = df.select(col("id"),
        GraftFunctions.hashedNgrams(spark, col("t"), n).as("h"))
        .orderBy("id").collect().map(_.getSeq[Long](1))
      val composed = df.select(col("id"),
        when(length(col("t")) >= n,
          transform(sequence(lit(1), length(col("t")) - n + 1),
            i => xxhash64(col("t").substr(i, lit(n)))))
          .otherwise(array().cast("array<bigint>")).as("h"))
        .orderBy("id").collect().map(_.getSeq[Long](1))
      assert(native.toSeq == composed.toSeq, s"n=$n parity failed")
    }
  }

  test("nfc_normalize: composes decomposed sequences, ASCII fast path, nulls, SQL") {
    val rows = Seq(
      ("cafe\u0301", "caf\u00e9"),   // e + combining acute -> \u00e9
      ("u\u0308ber", "\u00fcber"),   // u + combining diaeresis -> \u00fc
      ("plain ascii 123", "plain ascii 123"), // NFC-invariant, fast path
      ("d\u00e9j\u00e0", "d\u00e9j\u00e0")) // already composed: unchanged
      .toDF("s", "want")
    val got = rows.select(
      GraftFunctions.nfcNormalize(spark, col("s")).as("got"), col("want"))
      .collect()
    got.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"NFC(${r.getString(0)}) != ${r.getString(1)}")
    }
    // length shrinks by exactly the composed-pair count
    val lens = rows.select(length(col("s")).as("raw"),
      length(GraftFunctions.nfcNormalize(spark, col("s"))).as("nfc")).collect()
    assert(lens(0).getInt(0) - lens(0).getInt(1) == 1)
    assert(lens(2).getInt(0) == lens(2).getInt(1))
    // null propagates; SQL registry path resolves
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT nfc_normalize(CAST(NULL AS STRING)), nfc_normalize('é')")
      .head()
    assert(viaSql.isNullAt(0))
    assert(viaSql.getString(1) == "é")
  }

  test("mg_sketch: no false negatives above N/(cap+1), counters are underestimates") {
    import graft.functions.MgSketch
    // adversarial stream: heavy item interleaved with a churn of
    // distinct singletons that constantly trigger decrements
    val heavy = Seq.fill(400)("hot")
    val churn = (0 until 3000).map(i => s"one_$i")
    val rnd = new scala.util.Random(7)
    val stream = rnd.shuffle(heavy ++ churn)
    val df = stream.toDF("t").repartition(7) // force partials + merges
    val out = df.agg(MgSketch.sketchCol(col("t"), 16).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.item"), col("e.count_lower"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = stream.size
    // freq(hot)=400 > N/(cap+1)=3400/17=200 -> must be present
    assert(out.contains("hot"), s"guaranteed heavy item missing from $out")
    assert(out("hot") <= 400L, "counter must underestimate")
    assert(out("hot") >= 400L - n / 17 - 1, "error bound exceeded")
    assert(out.size <= 16, "summary must respect capacity")
  }

  test("cms: row sums conserve the stream, estimates never undercount, " +
      "lone key exact") {
    import graft.ops.Cms
    val rnd = new scala.util.Random(11)
    val stream = (0 until 2000).map(_ => s"k${rnd.nextInt(300)}")
    val df = stream.toDF("t").repartition(5)
    val depth = 3; val width = 64
    val sk = Cms.sketch(df, "t", depth, width)
    // each sketch row counts every stream item exactly once
    val rowSums = sk.groupBy("__r").agg(sum("__c").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rowSums == (0 until depth).map(_ -> stream.size.toLong).toMap)
    assert(sk.count() <= depth.toLong * width, "sketch must stay bounded")
    // estimates are upper bounds on the exact counts for EVERY key
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val keys = exact.keys.toSeq.toDF("t")
    val est = Cms.estimate(sk, keys, "t", depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.forall { case (k, c) => est(k) >= c },
      s"CMS must never undercount")
    // a stream with one distinct key has no colliders: estimate exact
    val lone = Seq.fill(37)("solo").toDF("t")
    val loneEst = Cms.estimate(Cms.sketch(lone, "t", depth, width),
      Seq("solo").toDF("t"), "t", depth, width).head().getLong(1)
    assert(loneEst == 37L)
  }

  test("heavyHitters: equals the exact full-count answer") {
    val docs = core.Tables.documents(spark, sf)
    val exact = docs
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("t"))
    val n = exact.count()
    val truth = exact.groupBy("t").count()
      .filter(col("count") >= lit(0.001) * lit(n.toDouble))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = graft.text.TextOps.heavyHitters(docs, "text", phi = 0.001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == truth, s"sketch-verified heavies differ from exact: " +
      s"missing=${truth.keySet -- got.keySet} extra=${got.keySet -- truth.keySet}")
    assert(truth.nonEmpty, "fixture should have heavy hitters")
  }

  test("groupHeavyHitters: equals the exact per-group answer") {
    val docs = core.Tables.documents(spark, sf)
    val toks = docs.select(col("source"),
      explode(graft.text.TextOps.tokens(col("text"))).as("t"))
    val totals = toks.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = toks.groupBy("source", "t").count().collect()
      .filter(r => r.getLong(2) >= 0.002 * totals(r.getString(0)))
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = graft.text.TextOps.groupHeavyHitters(docs, "source", "text", phi = 0.002)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == truth, s"per-group sketch-verified heavies differ from exact: " +
      s"missing=${truth.keySet -- got.keySet} extra=${got.keySet -- truth.keySet}")
    assert(truth.nonEmpty && truth.keys.map(_._1).toSet.size > 1,
      "fixture should have heavy hitters in more than one group")
  }

  test("bloom: no false negatives, FP rate near the design point, codegen parity") {
    import graft.functions.Bloom
    val rnd = new scala.util.Random(27)
    val memberSet = scala.collection.mutable.LongMap.empty[Unit]
    val members = Array.fill(20000)(rnd.nextLong())
    members.foreach(memberSet.update(_, ()))
    val bf = Bloom.build(members, bitsPerKey = 10)
    // no false negatives, ever
    assert(members.forall(bf.mightContain), "bloom lost a member")
    // FP rate at 10 bits/key is ~0.8%; assert under 3x design
    val probes = Array.fill(50000)(rnd.nextLong()).filterNot(memberSet.contains)
    val fp = probes.count(bf.mightContain).toDouble / probes.length
    assert(fp < 0.025, s"false-positive rate $fp is far above the 10-bits/key design")
    // the column expression (codegen path) agrees with the driver kernel
    val df = members.take(500).toSeq.toDF("h")
      .unionByName(probes.take(500).toSeq.toDF("h"))
    val got = df.select(col("h"), Bloom.mightContainCol(bf, col("h")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    got.foreach { case (h, m) =>
      assert(m == bf.mightContain(h), s"codegen/driver mismatch for $h")
    }
  }

  test("minhash_signature equals the aggregate min(xxhash64(lit(j), s)) form bit-for-bit") {
    // the round-17 scan-local signature must reproduce the exploded
    // aggregate formulation exactly: same candidates, same recall, same
    // committed answers. Random multisets (duplicates included), plus
    // the empty/null edge cases the exploded form expressed as "no rows".
    val rnd = new scala.util.Random(20260817L)
    val rows = (0L until 40L).map { id =>
      val n = 1 + rnd.nextInt(50)
      (id, Seq.fill(n)(rnd.nextLong(1000))) // small space => duplicates
    }
    val df = rows.toDF("id", "gs")
    val numHashes = 8
    val native = df.select(col("id"),
        GraftFunctions.minhashSignature(spark, col("gs"), numHashes).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val aggCols = (0 until numHashes).map(j =>
      min(xxhash64(lit(j), col("s"))).as(s"h$j"))
    val exploded = df.select(col("id"), explode(col("gs")).as("s"))
      .groupBy("id").agg(aggCols.head, aggCols.tail: _*)
    val agg = exploded.collect()
      .map(r => r.getLong(0) -> (0 until numHashes).map(j =>
        r.getLong(r.fieldIndex(s"h$j"))).toSeq).toMap
    assert(native == agg, "scan-local minhash diverges from the aggregate form")
    // empty and null arrays carry no signature (the exploded form
    // produced no rows for such docs)
    val edge = Seq((0L, Some(Seq.empty[Long])), (1L, None))
      .toDF("id", "gs")
      .select(col("id"),
        GraftFunctions.minhashSignature(spark, col("gs"), numHashes).as("sig"))
      .collect()
    assert(edge.forall(_.isNullAt(1)))
  }

  test("l2_sq equals the aggregate(zip_with) formulation bit-for-bit") {
    val rnd = new scala.util.Random(20260818L)
    val rows = (0L until 50L).map { id =>
      (id, Seq.fill(16)(rnd.nextDouble() * 4 - 2),
        Seq.fill(16)(rnd.nextDouble() * 4 - 2))
    }
    val df = rows.toDF("id", "a", "b")
    val native = df.select(col("id"),
        GraftFunctions.l2Sq(spark, col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val composed = df.select(col("id"),
        aggregate(zip_with(col("a"), col("b"),
          (x, y) => (x - y) * (x - y)), lit(0.0), _ + _).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(native == composed, "native l2_sq diverges from the HOF fold")
    // float arrays accepted; empty arrays fold to 0.0 like the HOF form
    val f = Seq((Array(1.0f, 2.0f), Array(2.0f, 4.0f))).toDF("a", "b")
      .select(GraftFunctions.l2Sq(spark, col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(f - 5.0) < 1e-12)
    val e = Seq((Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
      .select(GraftFunctions.l2Sq(spark, col("a"), col("b"))).head().getDouble(0)
    assert(e == 0.0)
  }
}
