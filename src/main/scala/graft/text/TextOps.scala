package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (LLM-data
  * extension family): token statistics, heuristic language ID, quality
  * scoring, and content fingerprinting. Every operator is a pure
  * column expression (codegen-friendly, no UDFs) whose math is
  * SQL-expressible for the DuckDB oracle.
  *
  * Each operator materializes the token array (and trimmed text) in
  * its own projection before the consuming expressions: the consumers
  * reference it many times, and letting CollapseProject inline the
  * regex split into every reference re-tokenizes the document per
  * reference (measured ~6x slowdown on the dedup shingle path).
  */
object TextOps {

  /** Whitespace tokenization. The trim is a REGEX trim over all
    * whitespace, not functions.trim (which strips only ASCII space
    * 0x20): a document starting with a tab or newline would otherwise
    * yield a phantom empty first token that corrupts block keys,
    * shingles, and distinct token sets. Every tokenizing oracle
    * mirrors this with regexp_replace(..., '^\s+|\s+$', '', 'g'). */
  def tokens(text: Column): Column =
    split(regexp_replace(text, "^\\s+|\\s+$", ""), "\\s+")

  /** Token statistics per document: counts, distinct counts, mean token
    * length, type-token ratio. */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol), tokens(col(textCol)).as("__w"))
    val w = col("__w")
    tok.select(
      col(idCol),
      size(w).as("n_tokens"),
      size(array_distinct(w)).as("n_distinct"),
      round(aggregate(w, lit(0.0), (acc, x) => acc + length(x)) / size(w), 6)
        .as("mean_token_len"),
      round(size(array_distinct(w)).cast("double") / size(w), 6).as("type_token_ratio"))
  }

  /** Stopword marker lists per language — the signal a real n-gram
    * language identifier keys on (tiny closed-class words). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des"),
    "es" -> Seq("el", "la", "los", "las", "es", "un", "una", "y"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  /** Per-language stopword hit rate; predicted language = argmax with
    * deterministic lexicographic tie-break (ties go to the earlier
    * language code — makes the heuristic a pure function). */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol), tokens(col(textCol)).as("__w"))
    val w = col("__w")
    val scoreCols = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      val hits = size(filter(w, t => t.isin(words.map(lit): _*)))
      (lang, (hits.cast("double") / size(w)).as(s"score_$lang"))
    }
    val scored = tok.select(col(idCol) +: scoreCols.map(_._2): _*)
    // argmax by (score desc, lang asc) without exploding: fold over a
    // struct accumulator
    val best = scoreCols.map(_._1).map(l => struct(col(s"score_$l").as("s"), lit(l).as("l")))
      .reduce((a, b) => when(b.getField("s") > a.getField("s"), b).otherwise(a))
    scored.withColumn("pred_lang", best.getField("l"))
      .select(col(idCol), col("pred_lang"),
        round(greatest(scoreCols.map(c => col(s"score_${c._1}")): _*), 6).as("best_score"))
  }

  /** Heuristic quality score in [0,1]: combines length adequacy,
    * punctuation sparsity, token diversity, and mean-token-length
    * plausibility — the shape of production quality filters
    * (length/punct/stopword-ratio features). */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), trim(col(textCol)).as("__t"),
        tokens(col(textCol)).as("__w"))
      .select(col(idCol), qualityCol(col("__t"), col("__w")).as("quality"))

  /** The quality expression over a pre-projected trimmed text `t` and
    * token array `w` (projected once — the token array is reused by
    * four sub-scores). Shared by the batch scorer above and the
    * streaming corpus slice (Corpus.prepareStream), so both paths
    * apply bit-identical thresholds. */
  def qualityCol(t: Column, w: Column): Column =
    round((lenScoreCol(w) + punctScoreCol(t) + diversityCol(w) +
      lenPlausCol(w)) / 4.0, 6)

  /** The four quality sub-scores, exposed individually so the trained
    * quality classifier (`QualityClassifier`) uses bit-identical
    * feature definitions (and the same DuckDB SQL formulations the
    * q44 oracle already pins). */
  def lenScoreCol(w: Column): Column =
    least(size(w).cast("double") / 50.0, lit(1.0))
  def punctScoreCol(t: Column): Column = {
    val punct = length(t) - length(regexp_replace(t, "[^\\w\\s]", ""))
    val punctRatio = punct.cast("double") / greatest(length(t), lit(1)).cast("double")
    lit(1.0) - least(punctRatio * 5.0, lit(1.0))
  }
  def diversityCol(w: Column): Column =
    size(array_distinct(w)).cast("double") / size(w).cast("double")
  def lenPlausCol(w: Column): Column = {
    val meanLen = aggregate(w, lit(0.0), (acc, x) => acc + length(x)) /
      size(w).cast("double")
    when(meanLen >= 3 && meanLen <= 10, 1.0).otherwise(0.5)
  }

  /** Order-insensitive content fingerprint: md5 of the sorted distinct
    * token set — a deterministic document identity for exact-dedup
    * manifests that survives token reordering. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      md5(concat_ws(" ", array_sort(array_distinct(tokens(col(textCol))))).cast("binary"))
        .as("fingerprint"))

  /** Deterministic weighted sampling: keep a row with probability
    * `probCol` (in [0,1]) decided by a content-hash coin — the
    * building block of quality-filtered corpus construction (keep
    * high-quality docs with higher probability), reproducible across
    * runs/cluster layouts and SQL-recomputable (md5-derived coin, no
    * RNG state). */
  def weightedSample(df: DataFrame, idCol: String, probCol: String): DataFrame = {
    val coin = conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long").mod(1000000) / 1000000.0
    df.filter(coin < col(probCol))
  }

  /** GPT-style pre-tokenizer count (the "BPE-ish regex" token counter):
    * counts contractions, letter runs, digit runs, punctuation runs —
    * the units a byte-pair encoder would merge within. Whitespace
    * tokens and this count together bracket real tokenizer output. */
  val bpePattern: String = "'(?:s|d|m|t|ll|ve|re)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s']+"

  def bpeTokenCount(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol), trim(col(textCol)).as("__t"),
      tokens(col(textCol)).as("__w"))
    // call_function avoids SQL-literal escaping of the regex (backslash
    // classes survive verbatim)
    tok.select(col(idCol),
      size(col("__w")).as("n_ws_tokens"),
      size(call_function("regexp_extract_all", col("__t"), lit(bpePattern), lit(0)))
        .as("n_bpe_tokens"))
  }

  /** Distinct character n-gram count — a size proxy used by char-level
    * near-dup shingling. Counts distinct 64-bit window hashes via the
    * native hashed_ngrams expression instead of materializing gram
    * strings (collision shortfall probability ~ grams^2 / 2^65 per doc
    * — immaterial, and the string-gram DuckDB oracle still matches). */
  /** BM25 ranked keyword search (Robertson & Sparck Jones's Okapi
    * weighting, with the Lucene-style `ln(1 + (N-df+0.5)/(df+0.5))`
    * IDF that never goes negative): score every document containing at
    * least one query term and return the top `topK` by score, ties on
    * id.
    *
    * Distributed shape: one pass projects each document's length and
    * its query-term occurrences — `filter(w, isin(query))` runs inside
    * the scan, so ONLY postings for the query's terms ever explode or
    * shuffle (a |query|-term search over 100 TB moves |matching
    * postings|, not the corpus). Document frequencies and the corpus
    * (N, avgdl) statistics are term-count- and 1-row-sized aggregates
    * broadcast back; the final top-k is TakeOrdered, never a full
    * sort. */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    val tok = df.select(col(idCol), tokens(col(textCol)).as("__w"))
    val stats = tok.agg(
      count(lit(1)).cast("double").as("__n"),
      avg(size(col("__w"))).as("__avgdl"))
    val tf = tok
      .select(col(idCol), size(col("__w")).cast("double").as("__dl"),
        explode(filter(col("__w"), t => t.isInCollection(query))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("double").as("__tf"), max(col("__dl")).as("__dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("__df"))
    val idf = log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5))
    val tfNorm = col("__tf") * lit(k1 + 1) /
      (col("__tf") + lit(k1) * (lit(1 - b) + lit(b) * col("__dl") / col("__avgdl")))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol)).agg(
        round(sum(idf * tfNorm), 6).as("bm25"),
        sum(col("__tf")).cast("long").as("n_matches"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(topK)
  }

  /** GPT-2-style pre-tokenizer split pattern (Radford et al. 2019 —
    * the released gpt2 encoder's regex, with the `\s+(?!\S)`
    * trailing-space branch dropped because RE2 engines (the oracle's)
    * have no lookahead; contractions, space-prefixed letter runs,
    * digit runs, punctuation runs, then whitespace): the unit BPE
    * actually runs on, where " the" and "the" are different symbols.
    * This is the piece whitespace tokenization gets wrong when
    * estimating real tokenizer costs. */
  val gpt2SplitPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** All GPT-2 pretokens of `text`, in order (leading spaces kept —
    * they ARE part of the symbol). Codegen'd regexp extraction,
    * scan-local. */
  def gpt2Pretokens(text: Column): Column =
    regexp_extract_all(text, lit(gpt2SplitPattern), lit(0))

  /** Per-document TF-IDF keyword extraction: each document's top-k
    * tokens by tf·idf with idf = ln(N/df) (classic Salton weighting;
    * Spärck Jones 1972), the standard per-doc keyword/tag deliverable
    * complementing [[bm25]]'s query-side search. Ranking uses the
    * ROUNDED (1e-6) score with the token text as tie-break, so the
    * order is deterministic and cross-engine replayable (unrounded
    * doubles can differ by an ulp of ln between engines and flip
    * ranks). Tokens present in every document score ln(1) = 0 but
    * still rank by tie-break.
    *
    * Distributed shape: document frequencies are one vocabulary-sized
    * hash aggregate over distinct (doc, token) pairs; per-doc term
    * counts are a (doc, token)-keyed aggregate — both map-side
    * combinable with keys as fine as the data; the doc total N rides
    * along as a broadcast 1-row frame, and the top-k is a per-doc
    * window (`partitionBy(doc)`) that the group-limit optimization
    * bounds. No corpus-wide sort, no collect. */
  def tfidfKeywords(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val tok = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val tf = tok.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("__df"))
    val total = df.agg(count(lit(1)).cast("double").as("__n"))
    val scored = tf.join(dfreq, "token")
      .crossJoin(broadcast(total))
      .withColumn("score",
        round(col("__tf") * log(col("__n") / col("__df")), 6))
    val byDoc = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("token").asc)
    scored.withColumn("rnk", row_number().over(byDoc))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("rnk"), col("token"), col("score"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009): fuse
    * bounded candidate lists from heterogeneous retrievers (keyword
    * BM25, embedding ANN, ...) by summing 1/(kRrf + rank) per system —
    * rank-only fusion needs no score calibration across systems, which
    * is why it is the standard hybrid-retrieval combiner. Each input
    * frame carries (idCol, rank) with rank 1-based, best first; items
    * missing from a list contribute nothing for it. Output: (idCol,
    * rrf), topK rows by (rrf desc, id asc).
    *
    * Scale note: inputs are top-N results (bounded by construction),
    * so the full-outer fusion join and final sort run on candidate-set
    * cardinality, never corpus cardinality. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String,
      kRrf: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val tagged = lists.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol),
        (lit(1.0) / (lit(kRrf.toDouble) + col("rank"))).as(s"__c$i"))
    }
    val joined = tagged.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = tagged.indices.map(i => coalesce(col(s"__c$i"), lit(0.0)))
      .reduce(_ + _)
    joined.select(col(idCol), round(score, 6).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol)).limit(topK)
  }

  /** Top-k collocations by pointwise mutual information over adjacent
    * token pairs (Church & Hanks 1990): PMI(w1,w2) =
    * ln( p(w1,w2) / (p(w1)·p(w2)) ) with pair probability over all
    * adjacent positions and word probabilities over all tokens.
    * Pairs below `minCount` are dropped (PMI's well-known rare-pair
    * instability).
    *
    * Distributed shape: two map-side-combinable counts (pairs, words)
    * keyed as fine as the data, one 1-row totals aggregate broadcast
    * back, and the pair table equi-joins the word counts on each side
    * — word counts are vocabulary-sized, far smaller than the corpus,
    * and AQE broadcasts them when they fit. The final top-k is
    * TakeOrdered. */
  def pmiCollocations(df: DataFrame, textCol: String,
      minCount: Long = 5L, topK: Int = 20): DataFrame = {
    val tok = df.select(tokens(col(textCol)).as("__w"))
    val totals = tok.agg(
      sum(size(col("__w"))).cast("double").as("__n_uni"),
      sum(greatest(size(col("__w")) - 1, lit(0))).cast("double").as("__n_bi"))
    val uni = tok.select(explode(col("__w")).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("double").as("__c"))
    val bi = tok
      .select(explode(Curation.ngrams(col("__w"), 2)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minCount)
      .select(element_at(split(col("gram"), " "), 1).as("w1"),
        element_at(split(col("gram"), " "), 2).as("w2"),
        col("pair_count"))
    bi
      .join(uni.withColumnRenamed("word", "w1").withColumnRenamed("__c", "__c1"), "w1")
      .join(uni.withColumnRenamed("word", "w2").withColumnRenamed("__c", "__c2"), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("pair_count"),
        round(log((col("pair_count") / col("__n_bi")) /
          ((col("__c1") / col("__n_uni")) * (col("__c2") / col("__n_uni")))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Exact heavy hitters via the Misra-Gries sketch: tokens with
    * frequency >= phi·N, with EXACT counts. Two passes: (1) the
    * mergeable `mg_sketch` aggregate (`functions/MgSketch.scala`)
    * produces a candidate set with no false negatives for any item
    * above N/(capacity+1) < phi·N; (2) one broadcast-filtered
    * aggregation recounts ONLY the candidates exactly. The full
    * token-frequency table — the thing that shuffles every distinct
    * token of a 100 TB corpus — is never built; pass 1 moves
    * fixed-size summaries, pass 2 moves <= capacity keys. */
  def heavyHitters(df: DataFrame, textCol: String, phi: Double = 0.001): DataFrame = {
    require(phi > 0 && phi < 1, s"phi must be in (0,1), got $phi")
    val capacity = math.max(16, math.ceil(2.0 / phi).toInt)
    val toks = df.select(explode(tokens(col(textCol))).as("token"))
    val summary = toks.agg(
      graft.functions.MgSketch.sketchCol(col("token"), capacity).as("__mg"),
      count(lit(1)).as("__n"))
    val cands = summary.select(col("__n"),
      explode(col("__mg")).as("__e")).select(col("__n"), col("__e.item").as("token"))
    toks.join(broadcast(cands), "token")
      .groupBy(col("token"), col("__n"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= lit(phi) * col("__n"))
      .select(col("token"), col("cnt"))
      .orderBy(col("cnt").desc, col("token"))
  }

  /** Per-group exact heavy hitters: for EVERY group at once, the tokens
    * with in-group frequency >= phi * group_total (e.g. the dominant
    * vocabulary per source/domain — the per-domain counterpart of
    * `heavyHitters`). Pass 1 computes one bounded Misra-Gries summary
    * AND the token total per group in a single aggregation (both
    * map-side combinable, so the shuffle carries groups x capacity
    * fixed-size states — never the token vocabulary); the MG
    * no-false-negative guarantee (capacity >= 2/phi > 1/phi) makes each
    * group's candidate list a superset of its answer, so pass 2's
    * recount of only the candidate (group, token) pairs — a broadcast
    * semi-join inside the token scan — returns the EXACT answer. */
  def groupHeavyHitters(df: DataFrame, groupCol: String, textCol: String,
      phi: Double = 0.001): DataFrame = {
    require(phi > 0 && phi < 1, s"phi must be in (0,1), got $phi")
    val capacity = math.max(16, math.ceil(2.0 / phi).toInt)
    val toks = df.select(col(groupCol), explode(tokens(col(textCol))).as("token"))
    val summary = toks.groupBy(groupCol).agg(
      graft.functions.MgSketch.sketchCol(col("token"), capacity).as("__mg"),
      count(lit(1)).as("__n"))
    val cands = summary
      .select(col(groupCol), col("__n"), explode(col("__mg")).as("__e"))
      .select(col(groupCol), col("__n"), col("__e.item").as("token"))
    toks.join(broadcast(cands), Seq(groupCol, "token"))
      .groupBy(col(groupCol), col("token"), col("__n"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= lit(phi) * col("__n"))
      .select(col(groupCol), col("token"), col("cnt"))
      .orderBy(col(groupCol), col("cnt").desc, col("token"))
  }

  /** Corpus-level vocabulary richness per group: token count, type
    * (distinct-token) count, type-token ratio, hapax legomena count
    * and fraction (tokens occurring exactly once — the standard
    * vocabulary-growth / OCR-noise signal in corpus curation). Two
    * hash aggregates over (group, token) — keys as fine as the
    * vocabulary, everything map-side combinable, no windows. */
  def vocabularyRichness(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val tf = df
      .select(col(groupCol).as("__g"), explode(tokens(col(textCol))).as("__tok"))
      .filter(col("__tok") =!= "")
      .groupBy("__g", "__tok").agg(count(lit(1)).as("__c"))
    tf.groupBy("__g").agg(
        sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("__g").as(groupCol), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens"), 6)
          .as("type_token_ratio"),
        col("n_hapax"),
        round(col("n_hapax").cast("double") / col("n_types"), 6)
          .as("hapax_fraction"))
  }

  /** Zipf rank-frequency slope per group: OLS of ln(frequency) on
    * ln(rank) over the group's `topK` most frequent tokens (rank by
    * count desc, token asc — deterministic), via the exact-integer
    * `Stats.groupOls` construction on micro-unit ln values. A healthy
    * natural-language source sits near slope −1 (Zipf 1949); heavily
    * duplicated or templated text flattens or steepens the curve —
    * the corpus-pathology screen. The per-group rank window is
    * group-limited (rn <= topK bounds the shuffle), and the OLS is
    * one hash aggregate over topK×groups rows. */
  def zipfSlope(df: DataFrame, groupCol: String, textCol: String,
      topK: Int = 100): DataFrame = {
    val tf = df
      .select(col(groupCol).as("__g"), explode(tokens(col(textCol))).as("__tok"))
      .filter(col("__tok") =!= "")
      .groupBy("__g", "__tok").agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy("__g").orderBy(col("__c").desc, col("__tok"))
    val ranked = tf.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= topK)
    graft.ops.Stats.groupOls(
        ranked.select(col("__g"), log(col("__rn")).as("__lx"),
          log(col("__c")).as("__ly")),
        "__g", "__lx", "__ly")
      .withColumnRenamed("__g", groupCol)
  }

  def charNgramCount(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val tok = df.select(col(idCol), trim(col(textCol)).as("__t"))
    tok.select(col(idCol),
      size(array_distinct(graft.functions.GraftFunctions.hashedNgrams(
        df.sparkSession, col("__t"), n))).as("n_char_ngrams"))
  }
}
