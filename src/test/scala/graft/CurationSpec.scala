package graft

import org.apache.spark.sql.functions._
import graft.text.Curation

/** Hand-computed cases for the corpus-curation operators (Gopher
  * repetition rules, PII redaction, decontamination, token chunking).
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats: bigram counts and Gopher fractions by hand") {
    // "a b a b a": bigrams = [a b, b a, a b, b a] -> n=4, distinct=2,
    // top=2, dup_frac = 1 - 2/4 = 0.5, top_frac = 2/4 = 0.5
    // "x y z":     bigrams = [x y, y z]           -> all distinct
    val df = Seq((1L, "a b a b a"), (2L, "x y z")).toDF("id", "txt")
    val got = Curation.repetitionStats(df, "id", "txt", n = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got(1L) == ((4L, 2L, 2L, 0.5, 0.5)))
    assert(got(2L) == ((2L, 2L, 1L, 0.0, 0.5)))
  }

  test("shuffleShards: a seeded permutation — dense per-shard positions, seed-sensitive, write round-trips") {
    val n = 500
    val df = (1 to n).map(i => (i.toLong, s"doc $i")).toDF("id", "txt")
    val out = Curation.shuffleShards(df, "id", seed = 7L, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // every doc exactly once, shard in range, positions dense 1..|shard|
    assert(out.map(_._1).toSet == (1L to n).map(identity).toSet)
    assert(out.forall(t => t._2 >= 0 && t._2 < 8))
    out.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.size).toSeq,
        s"shard $sh positions not dense")
    }
    // shards roughly uniform under the md5 prefix (500/8 = 62.5)
    val sizes = out.groupBy(_._2).view.mapValues(_.size)
    assert(sizes.values.forall(s => s > 30 && s < 95), s"skew: ${sizes.toMap}")
    // deterministic for a seed; a different seed permutes
    val again = Curation.shuffleShards(df, "id", seed = 7L, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(again.toSet == out.toSet)
    val other = Curation.shuffleShards(df, "id", seed = 8L, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(other.toSet != out.toSet, "seed must change the permutation")
    // writer round-trip: the shard-partitioned layout read back by
    // (shard, pos) reproduces the operator's permutation exactly
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    Curation.writeShuffledShards(df, "id", seed = 7L, nShards = 8, dir)
    val back = spark.read.parquet(dir)
      .select(col("id"), col("shard").cast("long"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(back.toSet == out.toSet, "written shards must match the plan")
  }

  test("repetitionStats: documents shorter than n produce no grams") {
    val df = Seq((1L, "only"), (2L, "two words")).toDF("id", "txt")
    val got = Curation.repetitionStats(df, "id", "txt", n = 2).collect()
    assert(got.map(_.getLong(0)).toSet == Set(2L))
  }

  test("redactPii masks emails and IPv4 literals and counts them") {
    val df = Seq(
      (1L, "write to a.user+tag@sub.example.org from 192.168.0.1 now"),
      (2L, "no pii here at all")).toDF("id", "txt")
    val got = Curation.redactPii(df, "id", "txt")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(got(1L) == ((1, 1, "write to <EMAIL> from <IP> now")))
    assert(got(2L) == ((0, 0, "no pii here at all")))
  }

  test("decontaminate flags exactly the train docs sharing an n-gram") {
    // 3-grams; train doc 10 shares "c d e" with the benchmark doc,
    // train doc 11 shares nothing, train doc 12 is too short to gram.
    val train = Seq(
      (10L, "a b c d e f"), (11L, "p q r s t"), (12L, "u v")).toDF("id", "txt")
    val bench = Seq((90L, "z c d e z")).toDF("id", "txt")
    val got = Curation.decontaminate(train, bench, "id", "txt", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got(10L) == ((1L, true)))
    assert(got(11L) == ((0L, false)))
    assert(got(12L) == ((0L, false))) // still present, just unflagged
  }

  test("lineDedup: drops corpus-duplicated lines, reassembles in order") {
    // "footer" occurs in all three docs (dropped); each "body N" line is
    // unique (kept); doc 3's body duplicates doc 1's (both dropped).
    val df = Seq(
      (1L, "body one\nfooter\nextra one"),
      (2L, "body two\nfooter"),
      (3L, "body one\nfooter")).toDF("id", "txt")
    val got = Curation.lineDedup(df, "id", "txt")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(4))).toMap
    assert(got(1L) == ((3L, 2L, "extra one")))
    assert(got(2L) == ((2L, 1L, "body two")))
    assert(got(3L) == ((2L, 2L, ""))) // every line duplicated -> empty doc
  }

  test("lineDedup: minCount raises the drop threshold") {
    val df = Seq(
      (1L, "twice\nunique a"), (2L, "twice\nunique b")).toDF("id", "txt")
    val keep2 = Curation.lineDedup(df, "id", "txt", minCount = 3)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(keep2(1L) == "twice\nunique a") // 2 occurrences < minCount 3
  }

  test("selfLineDedup: keeps first occurrence in order, zero Exchange semantics") {
    val df = Seq(
      (1L, "nav\nbody a\nnav\nbody b\nnav"),
      (2L, "only\nlines")).toDF("id", "txt")
    val got = Curation.selfLineDedup(df, "id", "txt")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got(1L) == ((5L, 3L, 2L, "nav\nbody a\nbody b")))
    assert(got(2L) == ((2L, 2L, 0L, "only\nlines")))
  }

  test("quality classifier: separates planted junk from clean docs; score is the dumped model's sigmoid") {
    import graft.text.QualityClassifier
    // clean: diverse words, plausible lengths; junk: one repeated short
    // token plus punctuation storms -> low diversity + punct scores
    val clean = (0 until 30).map(i =>
      (i.toLong, s"alpha bravo charlie delta echo foxtrot golf hotel item$i juliet kilo lima", 1))
    val junk = (100 until 130).map(i =>
      (i.toLong, "x x x x x x x x x x !!! ??? !!! ??? !!! ???", 0))
    val df = (clean ++ junk).toDF("id", "txt", "label")
    val model = QualityClassifier.train(df, "id", "txt", "label")
    val coefs = model.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(coefs.size == 5 && coefs.contains("__intercept"))
    val scores = QualityClassifier.score(df, model, "id", "txt")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val cleanMin = clean.map(c => scores(c._1)).min
    val junkMax = junk.map(j => scores(j._1)).max
    assert(cleanMin > junkMax,
      s"classifier failed to separate: cleanMin=$cleanMin junkMax=$junkMax")
    assert(scores.values.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("decontaminateBloom: identical output to the exact decontaminate") {
    val base = core.Tables.documents(spark, sf)
    val train = base.filter(col("doc_id") % 50 =!= 0)
    val bench = base.filter(col("doc_id") % 50 === 0)
    val exact = Curation.decontaminate(train, bench, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val bloomed = Curation.decontaminateBloom(train, bench, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(bloomed == exact)
    assert(exact.values.exists(_._2), "fixture should contain contaminated docs")
  }

  test("dupSpans: duplicated windows merge into maximal 0-based spans") {
    // k=2: docs 1 and 2 share "a b" and "b c" (windows 0,1 in both) ->
    // merged span [0,2]. Doc 1's "x y" repeats within doc 1 (windows 5
    // and 7, gap 2 = k -> contiguous coverage, merged) -> span [5,8];
    // the 4-window gap between 1 and 5 separates the islands. "y x"
    // (window 6) occurs once and is not part of any duplicated window,
    // yet lands inside the span via the merge. Doc 3 shares nothing.
    val df = Seq(
      (1L, "a b c m n x y x y"),
      (2L, "a b c"),
      (3L, "p q r s")).toDF("id", "txt")
    val got = Curation.dupSpans(df, "id", "txt", k = 2)
      .orderBy("id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 0L, 2L, 3L, 2L),
      (1L, 5L, 8L, 4L, 2L),
      (2L, 0L, 2L, 3L, 2L)))
  }

  test("dsirSelect: target-vocabulary docs outrank off-target docs") {
    // Raw corpus: 40 docs over vocab {aa..dd} and 40 over {ww..zz};
    // target speaks only {aa..dd}. The selection must be dominated by
    // the target-like half, and log weights must be higher for every
    // target-like doc than every off-target doc.
    val talk = Seq("aa", "bb", "cc", "dd")
    val noise = Seq("ww", "xx", "yy", "zz")
    def doc(words: Seq[String], i: Int): String =
      (0 until 12).map(j => words((i + j) % 4)).mkString(" ")
    val raw = ((0 until 40).map(i => (i.toLong, doc(talk, i))) ++
      (40 until 80).map(i => (i.toLong, doc(noise, i)))).toDF("id", "txt")
    val target = (0 until 10).map(i => (1000L + i, doc(talk, i))).toDF("id", "txt")
    val sel = Curation.dsirSelect(raw, target, "id", "txt",
      buckets = 1000, k = 40).collect()
    assert(sel.length == 40)
    val ids = sel.map(_.getLong(0)).toSet
    assert(ids.count(_ < 40) >= 35, s"selection should be mostly target-like: $ids")
    val again = Curation.dsirSelect(raw, target, "id", "txt",
      buckets = 1000, k = 40).collect().map(_.getLong(0)).toSet
    assert(again == ids, "selection is deterministic")
  }

  test("bpe: classic dictionary learns the expected merges in order") {
    // Sennrich et al. 2016 §3.2's worked dictionary:
    // low:5 lower:2 newest:6 widest:3. Pair counts round 1:
    // (e,s)=9, (s,t)=9, (t,</w>)=9, (w,e)=8(newest6+lower2)... wait
    // (w,e): newest 6 + lower 2 = 8; (l,o)=7; tie among the three 9s
    // breaks lexicographically: (e,s) < (s,t) < (t,</w>).
    val dict = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val table = graft.text.Bpe.trainOnDict(dict, nMerges = 4)
    val got = table.pairs.toSeq
    assert(got(0) == (("e", "s")), s"merge 1: ${got(0)}")
    assert(got(1) == (("es", "t")), s"merge 2: ${got(1)}")
    assert(got(2) == (("est", "</w>")), s"merge 3: ${got(2)}")
    // round 4: (l,o) count 7 beats (n,e)/(w,i)=6 etc.
    assert(got(3) == (("l", "o")), s"merge 4: ${got(3)}")
  }

  test("bpe: encode applies merges greedily by rank; concat identity holds") {
    import org.apache.spark.sql.Row
    val dict = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val table = graft.text.Bpe.trainOnDict(dict, nMerges = 10)
    val df = Seq((1L, "newest lowest low")).toDF("id", "txt")
    val enc = graft.text.Bpe.encodeDocs(df, "id", "txt", table)
    val pieces = enc.head().getSeq[String](1)
    // every word's pieces concatenate back to word + </w>
    val rejoined = pieces.mkString("").split("</w>", -1).filter(_.nonEmpty)
    assert(rejoined.toSeq == Seq("newest", "lowest", "low"))
    // "newest" is fully merged after 10 rounds (freq-6 word)
    assert(pieces.contains("newest</w>"),
      s"newest should be a single piece in $pieces")
    val stats = graft.text.Bpe.pieceStats(df, "id", "txt", table).head()
    assert(stats.getLong(1) == 3L) // n_words
    assert(stats.getLong(2) == pieces.length.toLong)
  }

  test("bpe: unseen characters survive as singleton pieces") {
    val table = graft.text.Bpe.trainOnDict(Array(("abc", 3L)), nMerges = 5)
    val df = Seq((1L, "xyz")).toDF("id", "txt")
    val pieces = graft.text.Bpe.encodeDocs(df, "id", "txt", table)
      .head().getSeq[String](1)
    assert(pieces == Seq("x", "y", "z", "</w>"))
  }

  test("chunkTokens: ragged final chunk, exact token coverage") {
    val df = Seq((1L, "t1 t2 t3 t4 t5")).toDF("id", "txt")
    val got = Curation.chunkTokens(df, "id", "txt", chunkSize = 2)
      .orderBy("chunk_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq((0L, 2L, "t1 t2"), (1L, 2L, "t3 t4"), (2L, 1L, "t5")))
  }

  test("packOffsets: concat-and-split window spans by hand") {
    // window=4; concat order: "a b c"(3) "d e"(2) "f g h i j"(5)
    // offsets 0,3,5; windows: [0,0], [0,1], [1,2]
    val df = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g h i j")).toDF("id", "txt")
    val got = Curation.packOffsets(df, "id", "txt", window = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) == ((3L, 0L, 0L, 0L)))
    assert(got(2L) == ((2L, 3L, 0L, 1L)))
    assert(got(3L) == ((5L, 5L, 1L, 2L)))
  }

  test("packSequences: slice contributions cover each doc exactly once") {
    // window=4; concat: "a b c"(3) "d e"(2) "f g h i j"(5) -> 10 tokens,
    // sequences 0..2. Doc 1 -> seq 0 [0,3); doc 2 -> seq 0 pos 3 (1 tok)
    // + seq 1 pos 0 (1 tok); doc 3 -> seq 1 pos 1 (3 toks) + seq 2 (2).
    val df = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g h i j")).toDF("id", "txt")
    val got = Curation.packSequences(df, "id", "txt", window = 4)
      .orderBy("seq_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 1L, 0L, 0L, 3L),
      (0L, 2L, 0L, 3L, 1L),
      (1L, 2L, 1L, 0L, 1L),
      (1L, 3L, 0L, 1L, 3L),
      (2L, 3L, 3L, 0L, 2L)))
    // coverage identity: per doc, slice lengths sum to n_tokens
    val byDoc = got.groupBy(_._2).view.mapValues(_.map(_._5).sum).toMap
    assert(byDoc == Map(1L -> 3L, 2L -> 2L, 3L -> 5L))
  }

  test("packOffsets: distributed prefix sum matches driver-side cumsum") {
    // Enough rows to span several range partitions; compare against a
    // sequential fold over the same id order.
    val docs = (0L until 500L).map(i => (i, ("tok " * (1 + (i % 7).toInt)).trim))
    val df = docs.toDF("id", "txt").repartition(13)
    val got = Curation.packOffsets(df, "id", "txt", window = 16)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var cum = 0L
    docs.zip(got).foreach { case ((id, txt), (gid, n, start)) =>
      val expectN = txt.split(" ").length.toLong
      assert(gid == id && n == expectN && start == cum,
        s"doc $id: got ($n, $start), expected ($expectN, $cum)")
      cum += expectN
    }
  }

  test("quantizeStats: codes, checksum and error bound by hand") {
    // [0, 2, 1]: vmin=0 vmax=2 scale=2/255; codes [0, 255, 128]
    // (round(127.5) rounds half up) -> code_sum 383;
    // max err = |128 * 2/255 - 1| = 1/255 (exactly scale/2, the bound)
    val df = Seq((7L, Seq(0.0f, 2.0f, 1.0f))).toDF("id", "emb")
    val r = graft.sim.Quantize.quantizeStats(df, "id", "emb").head()
    assert(r.getLong(0) == 7L)
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 2.0)
    assert(r.getLong(3) == 383L)
    val scale = 2.0 / 255
    // output is rounded to 6 decimals -> compare at 5e-7
    assert(math.abs(r.getDouble(4) - 1.0 / 255) < 5e-7)
    assert(r.getDouble(4) <= scale / 2 + 5e-7) // reconstruction bound
  }

  test("quantizeStats: constant vector quantizes to zero codes") {
    val df = Seq((1L, Seq(3.5f, 3.5f, 3.5f))).toDF("id", "emb")
    val r = graft.sim.Quantize.quantizeStats(df, "id", "emb").head()
    assert(r.getLong(3) == 0L && r.getDouble(4) == 0.0)
  }

  test("mixBySource: binding source kept whole, others thinned to rate") {
    // A: 100 docs x 10 tokens, B: same; targets 0.8/0.2 ->
    // budget = min(1000/0.8, 1000/0.2) = 1250; rA = 1.0, rB = 0.25
    val docs = (0 until 100).map(i => (i.toLong, "A", ("t " * 10).trim)) ++
      (100 until 200).map(i => (i.toLong, "B", ("t " * 10).trim))
    val df = docs.toDF("id", "src", "txt")
    val got = Curation.mixBySource(df, "id", "txt", "src",
      Map("A" -> 0.8, "B" -> 0.2))
    val bySrc = got.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("A") == 100L, s"binding source must be kept whole: $bySrc")
    assert(bySrc("B") > 5 && bySrc("B") < 50,
      s"B should thin to ~25 of 100 docs: $bySrc")
    // deterministic: same membership on a second run
    val again = Curation.mixBySource(df, "id", "txt", "src",
      Map("A" -> 0.8, "B" -> 0.2)).select("id").collect().map(_.getLong(0)).toSet
    assert(again == got.select("id").collect().map(_.getLong(0)).toSet)
    // untargeted sources are dropped entirely
    val withC = df.union(Seq((500L, "C", "x y z")).toDF("id", "src", "txt"))
    val keptC = Curation.mixBySource(withC, "id", "txt", "src",
      Map("A" -> 0.8, "B" -> 0.2)).filter(col("src") === "C").count()
    assert(keptC == 0L)
  }

  test("temperatureMix: head downsampled by hand-computed rate, tail kept whole, alpha=1 is identity") {
    // A: 400 docs x 10 tokens (4000), B: 100 x 10 (1000). alpha=0.5:
    // q ∝ sqrt(t) -> qA = 2/3, qB = 1/3; budget = min(4000/(2/3),
    // 1000/(1/3)) = 3000; rA = (2/3)*3000/4000 = 0.5, rB = 1.0.
    val docs = (0 until 400).map(i => (i.toLong, "A", ("t " * 10).trim)) ++
      (400 until 500).map(i => (i.toLong, "B", ("t " * 10).trim))
    val df = docs.toDF("id", "src", "txt")
    val got = Curation.temperatureMix(df, "id", "txt", "src", alpha = 0.5)
    val rates = got.select("src", "keep_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("A") == 0.5 && rates("B") == 1.0, s"hand-computed rates: $rates")
    val bySrc = got.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("B") == 100L, "smallest source must be kept whole")
    assert(bySrc("A") > 150 && bySrc("A") < 250,
      s"head should thin to ~200 of 400 docs: $bySrc")
    // deterministic membership
    val again = Curation.temperatureMix(df, "id", "txt", "src", alpha = 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == got.select("id").collect().map(_.getLong(0)).toSet)
    // alpha = 1 reproduces the natural distribution: every rate is 1.0
    val id = Curation.temperatureMix(df, "id", "txt", "src", alpha = 1.0)
    assert(id.count() == 500L && id.select("keep_rate").distinct()
      .collect().map(_.getDouble(0)).toSeq == Seq(1.0))
  }

  test("chunkDupStats: corpus-wide chunk counts by hand") {
    // cs=2: doc1 -> ["a b", "c d"], doc2 -> ["a b", "x y"];
    // "a b" occurs twice corpus-wide -> each doc: 1 of 2 chunks dup
    val df = Seq((1L, "a b c d"), (2L, "a b x y")).toDF("id", "txt")
    val got = Curation.chunkDupStats(df, "id", "txt", chunkSize = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((2L, 1L, 0.5)))
    assert(got(2L) == ((2L, 1L, 0.5)))
  }

  test("unigramLogProb: corpus unigram probabilities by hand") {
    // corpus tokens: a a a b -> p(a)=3/4, p(b)=1/4
    // doc1 = "a a a": avg log10(0.75) = -0.124939 (rounded)
    // doc2 = "b":     log10(0.25)     = -0.602060
    val df = Seq((1L, "a a a"), (2L, "b")).toDF("id", "txt")
    val got = Curation.unigramLogProb(df, "id", "txt")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L) == ((3L, -0.124939)))
    assert(got(2L) == ((1L, -0.60206)))
  }

  test("bigramLogProb: seen bigram, backoff arm, OOV skip, self-scoring identity") {
    // train = "a b a": uni a=2 b=1 (N=3); bigrams "a b"=1, "b a"=1.
    // score "a b c a a":
    //   (a,b)  seen      -> 1/2
    //   (b,c)  c OOV     -> skipped (inner unigram join)
    //   (c,a)  c OOV     -> skipped
    //   (a,a)  unseen    -> backoff 0.4 * 2/3
    val train = Seq((0L, "a b a")).toDF("id", "txt")
    val df = Seq((1L, "a b c a a"), (2L, "z")).toDF("id", "txt")
    val got = Curation.bigramLogProb(df, "id", "txt", alpha = 0.4,
        train = Some(train))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set(1L), "one-token and all-OOV docs drop out")
    val (n, score) = got(1L)
    assert(n == 2L)
    val want = (math.log10(0.5) + math.log10(0.4 * 2.0 / 3.0)) / 2.0
    assert(math.abs(score - want) < 1e-6, s"score $score != $want")
    // self-scoring: every bigram of a single-doc corpus is seen with
    // c(pair) = c(prev), so every S = 1 and the mean log-score is 0.
    val solo = Seq((9L, "x y z")).toDF("id", "txt")
    val self = Curation.bigramLogProb(solo, "id", "txt").collect()
    assert(self.length == 1 && self.head.getLong(1) == 2L &&
      self.head.getDouble(2) == 0.0)
  }

  test("groupKlDivergence: hand-computed divergence, identical group = 0") {
    // corpus: s1 = "a a b", s2 = "a b b c".  Corpus: a=3,b=3,c=1 (N=7).
    // s1 (n=3): p(a)=2/3, p(b)=1/3; q(a)=q(b)=3/7
    //   KL = 2/3 ln((2/3)/(3/7)) + 1/3 ln((1/3)/(3/7))
    val df = Seq((1L, "s1", "a a b"), (2L, "s2", "a b b c"))
      .toDF("id", "source", "txt")
    val got = Curation.groupKlDivergence(df, "source", "txt")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val want1 = 2.0 / 3 * math.log((2.0 / 3) / (3.0 / 7)) +
      1.0 / 3 * math.log((1.0 / 3) / (3.0 / 7))
    assert(got("s1")._1 == 3L)
    assert(math.abs(got("s1")._2 - want1) < 1e-6, s"got ${got("s1")._2} want $want1")
    // a group that IS the corpus distribution diverges by zero
    val same = Seq((1L, "x", "a b"), (2L, "y", "a b")).toDF("id", "source", "txt")
    val zeros = Curation.groupKlDivergence(same, "source", "txt")
      .collect().map(_.getDouble(2))
    assert(zeros.forall(_ == 0.0), s"identical distributions must give 0: ${zeros.toSeq}")
  }

  test("compressionRatio: repetition compresses, deterministic, utf-8 bytes, empty guard") {
    val rnd = new scala.util.Random(3)
    val diverse = (0 until 200).map(_ => rnd.alphanumeric.take(8).mkString).mkString(" ")
    val df = Seq(
      (1L, Seq.fill(200)("spam").mkString(" ")),
      (2L, diverse),
      (3L, ""),
      (4L, "é")).toDF("id", "txt")
    def run() = Curation.compressionRatio(df, "id", "txt").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    val got = run()
    assert(got(1L)._3.get < 0.1, s"repeated text must compress hard: $got")
    assert(got(2L)._3.get > 0.5, s"high-entropy text must not: $got")
    assert(got(1L)._3.get < got(2L)._3.get)
    assert(got(3L) == ((0, got(3L)._2, None)), "empty text -> null ratio")
    assert(got(4L)._1 == 2, "raw size counts UTF-8 bytes")
    assert(run() == got, "deflate must be deterministic")
  }

  test("fightinWords: distinctive tokens surface, two-group antisymmetry") {
    // A = "x x y y", B = "y z z": x is A's distinctive token, z is B's,
    // y occurs in both (relatively more in A). With two groups,
    // rest(A) = B, so for a token present in both delta_A = -delta_B
    // with equal variances -> z_A(y) = -z_B(y); absent tokens are not
    // scored (no zero-count rows by design).
    val df = Seq((1L, "A", "x x y y"), (2L, "B", "y z z"))
      .toDF("id", "source", "txt")
    val got = Curation.fightinWords(df, "source", "txt", alpha0 = 1.0, k = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(2)) -> ((r.getInt(1), r.getDouble(3))))
      .toMap
    assert(got.keySet == Set(("A", "x"), ("A", "y"), ("B", "y"), ("B", "z")),
      s"only occurring tokens are scored: $got")
    assert(got(("A", "x"))._1 == 1, s"x must top A: $got")
    assert(got(("B", "z"))._1 == 1, s"z must top B: $got")
    assert(math.abs(got(("A", "y"))._2 + got(("B", "y"))._2) < 1e-5,
      s"two-group z-scores must be antisymmetric at y: $got")
    assert(got(("A", "y"))._2 > 0, s"y leans A (2/4 vs 1/3): $got")
    assert(got(("A", "x"))._2 > 0 && got(("B", "y"))._2 < 0)
  }

  test("ccnetBuckets: per-source thirds, head = highest LM score") {
    import spark.implicits._
    // source A: 9 docs with strictly ordered scores (unique rare-word
    // mixes); source B: 3 docs. Bucket sizes per source must be ~n/3
    // and the head bucket must hold the highest-scoring docs.
    val common = "the and of to in" // 5 common tokens, high unigram prob
    val docs = ((1 to 9).map { i =>
      // i rare singleton tokens -> monotonically WORSE (lower) lm_score
      val rares = (1 to i).map(j => s"rare${i}_$j").mkString(" ")
      (i.toLong, s"$common $rares", "A")
    } ++ (10 to 12).map { i =>
      val rares = (1 to (i - 9)).map(j => s"rare${i}_$j").mkString(" ")
      (i.toLong, s"$common $rares", "B")
    }).toDF("doc_id", "text", "source")
    val r = graft.text.Curation.ccnetBuckets(docs, "doc_id", "text", "source")
      .collect().map(x => x.getLong(0) -> (x.getString(1), x.getString(4))).toMap
    val aHead = (1 to 9).filter(i => r(i.toLong)._2 == "head").map(_.toLong)
    val aTail = (1 to 9).filter(i => r(i.toLong)._2 == "tail").map(_.toLong)
    // doc 1 has the fewest rare tokens -> best score -> head;
    // doc 9 the most -> tail
    assert(aHead.contains(1L) && !aHead.contains(9L), s"head=$aHead")
    assert(aTail.contains(9L) && !aTail.contains(1L), s"tail=$aTail")
    // per-source split: every bucket non-empty for A, B split 1/1/1
    val aBuckets = (1 to 9).map(i => r(i.toLong)._2).groupBy(identity)
    assert(aBuckets.keySet == Set("head", "middle", "tail"))
    val bBuckets = (10 to 12).map(i => r(i.toLong)._2)
    assert(bBuckets.toSet == Set("head", "middle", "tail"),
      s"3 docs in B split one per bucket, got $bBuckets")
  }

  test("ccnetBuckets: cardinality guard auto-falls-back to the sketch") {
    import spark.implicits._
    val common = "the and of to in"
    val docs = (1 to 9).map { i =>
      val rares = (1 to i).map(j => s"rare${i}_$j").mkString(" ")
      (i.toLong, s"$common $rares", "A")
    }.toDF("doc_id", "text", "source")
    // maxDistinctScores=1 cannot hold 9 distinct scores → the guard
    // must pick approx_percentile; membership stays a full 3-way split
    // (approx quantiles over 9 values are still ~thirds) and no exact
    // counts-map buffer is ever built
    val guarded = graft.text.Curation.ccnetBuckets(docs, "doc_id", "text",
        "source", exact = true, maxDistinctScores = 1L)
      .collect().map(x => x.getLong(0) -> x.getString(4)).toMap
    assert(guarded.values.toSet.subsetOf(Set("head", "middle", "tail")))
    assert(guarded.values.toSet.size >= 2, s"degenerate split: $guarded")
    // below the threshold the exact arm is chosen: thresholds are the
    // exact interpolated percentiles, so doc 1 (best score) is head
    // and doc 9 (worst) is tail — same pins as the main spec
    val exact = graft.text.Curation.ccnetBuckets(docs, "doc_id", "text",
        "source", exact = true, maxDistinctScores = 1000000L)
      .collect().map(x => x.getLong(0) -> x.getString(4)).toMap
    assert(exact(1L) == "head" && exact(9L) == "tail")
    // both arms run end-to-end on an empty frame (guard probe included)
    val empty = docs.filter(col("doc_id") < 0)
    assert(graft.text.Curation.ccnetBuckets(empty, "doc_id", "text",
      "source").count() == 0)
  }

  test("topNgrams: BPE-style pair counts with deterministic tie-break") {
    // bigrams: "a b" x3, then "b a"/"b c"/"c a" all x1 — the k=3 cut
    // falls inside the tie, so the lexicographic tie-break decides
    val df = Seq((1L, "a b a b"), (2L, "a b c a")).toDF("id", "txt")
    val got = Curation.topNgrams(df, "txt", n = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("normalizeText: lowercase, strip, collapse, trim by hand") {
    val df = Seq(
      (1L, "  Hello,   WORLD!! (v2.0) "),
      (2L, "already clean text")).toDF("id", "txt")
    val got = Curation.normalizeText(df, "id", "txt")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(1L) == "hello world v2 0")
    assert(got(2L) == "already clean text")
  }

  test("hot-key skew: chunkDupStats exact on a degenerate corpus; salted fallback bit-identical") {
    // adversarial fixture: one chunk text repeated 3000x concentrates a
    // single aggregation key — the shape a pathological corpus (boiler-
    // plate pages, license headers) produces at 100 TB
    val hot = "x1 x2 x3 x4"
    val docs = ((1 to 3000).map(i => (i.toLong, hot)) ++
      (3001 to 3200).map(i => (i.toLong, s"u$i a$i b$i c$i")))
      .toDF("doc_id", "text").repartition(8)
    val stats = Curation.chunkDupStats(docs, "doc_id", "text", chunkSize = 4)
    val agg = stats.agg(sum("n_dup_chunks").as("d"), sum("n_chunks").as("n")).head()
    assert(agg.getLong(0) == 3000 && agg.getLong(1) == 3200,
      "hot-key corpus must count exactly: 3000 duplicated chunks of 3200")

    // the corpus-wide chunk count behind it partial-aggregates BEFORE
    // the shuffle: the hot key crosses the wire as one partial row per
    // map task, not 3000 rows — the property that makes the aggregate
    // immune to key concentration
    val chunks = Curation.chunkTokens(docs, "doc_id", "text", 4)
      .select(col("doc_id"), col("chunk"))
    val counts = chunks.groupBy("chunk").agg(count(lit(1)).as("cnt"))
    counts.collect() // finalize AQE so the executed plan is the real one
    val plan = counts.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"chunk count must map-side combine (partial+final HashAggregate):\n${plan.take(400)}")

    // and the two-phase salted fallback (Skew.saltedAgg) — the manual
    // escape hatch when a hot key does reach one reducer — merges to
    // bit-identical counts on the same degenerate corpus
    val direct = counts.orderBy("chunk").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val salted = graft.ops.Skew.saltedAgg(chunks, Seq("chunk"),
        Seq(graft.ops.Skew.SaltedCount("cnt")), buckets = 16)
      .orderBy("chunk").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(direct.sameElements(salted),
      "salted two-phase aggregation must be bit-identical to direct groupBy")
  }

  test("ngrams helper: guard keeps short docs empty, order preserved") {
    val df = Seq((1L, "a b c")).toDF("id", "txt")
    val grams = df.select(
      Curation.ngrams(graft.text.TextOps.tokens(col("txt")), 2).as("g"))
      .as[Seq[String]].head()
    assert(grams == Seq("a b", "b c"))
  }
}
