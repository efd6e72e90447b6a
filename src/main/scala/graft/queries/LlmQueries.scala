package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.dedup.Dedup
import graft.sim.Similarity
import graft.text.TextOps

/** Driver-checked queries for the LLM-data-pipeline operator families:
  * dedup (exact / MinHash near-dup / SimHash / embedding-cosine /
  * SemDeDup), similarity search, text analysis, corpus curation
  * (quality rules, PII, decontamination, packing, mixing, NFC
  * canonicalization, CCNet bucketing) and embedding quantization.
  * Every query here has a full DuckDB oracle or a dump-replay pair —
  * near-dup verification is exact (MinHash only prunes candidates, so
  * the oracle's all-pairs Jaccard at sf0.01 must agree with the banded
  * pipeline's output; miss probability at the 0.5 threshold with
  * r=2,b=16 is < 1e-17 for the qualifying pairs, which all sit at
  * J>=0.97 in this corpus).
  */
object LlmQueries {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)
  private def emb(s: SparkSession, d: String): DataFrame = Tables.embeddings(s, d)

  // -------------------------------------------------------------------
  // q33: exact dedup — duplicate the corpus, dedup by full content
  // -------------------------------------------------------------------
  def dedupExact(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d)
    Dedup.exact(base.unionByName(base), base.columns.toSeq)
      .select("doc_id", "lang", "source", "n_chars").orderBy("doc_id")
  }

  val dedupExactSql: String =
    """SELECT doc_id, lang, source, n_chars FROM (
      |  SELECT DISTINCT * FROM (
      |    SELECT * FROM documents UNION ALL SELECT * FROM documents)
      |) ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q47: keep-first dedup on a genuinely duplicated key (lineitem's
  // composite key repeats) under an explicit deterministic order
  // -------------------------------------------------------------------
  def dedupFirst(s: SparkSession, d: String): DataFrame =
    Dedup.keepFirst(Tables.lineitem(s, d),
        Seq("l_orderkey", "l_linenumber"),
        Seq(col("l_extendedprice"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_discount"), col("l_tax"),
          col("l_returnflag"), col("l_linestatus"), col("l_shipdate")))
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  val dedupFirstSql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice
      |FROM lineitem
      |QUALIFY row_number() OVER (
      |  PARTITION BY l_orderkey, l_linenumber
      |  ORDER BY l_extendedprice, l_partkey, l_suppkey, l_quantity,
      |           l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate) = 1
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // -------------------------------------------------------------------
  // q34: MinHash near-dup with exact-Jaccard verify (threshold 0.5,
  // word 3-shingles). Oracle computes all-pairs Jaccard — fine at
  // sf0.01, exactly what the banded pipeline avoids at scale.
  // -------------------------------------------------------------------
  /** Memoized per session+dir: q66's cluster pass consumes these exact
    * pairs, so it reuses the materialized frame instead of re-running
    * shingle→minhash→band→verify. Lazy localCheckpoint — whichever
    * query evaluates first pays the compute once. */
  private def minhashPairs(s: SparkSession, d: String): DataFrame =
    graft.core.Memo.getOrElseUpdate(
        s"q34_minhash_pairs:${s.sparkContext.applicationId}:$d") {
      Dedup.minHashNearDup(docs(s, d), "doc_id", "text", threshold = 0.5)
        .localCheckpoint(false)
    }

  def dedupNear(s: SparkSession, d: String): DataFrame =
    minhashPairs(s, d)
      .select(col("id_1"), col("id_2"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_1", "id_2")

  // -------------------------------------------------------------------
  // q124: INCREMENTAL near-dup against a persisted band index — the
  // corpus-growth path. Even doc_ids stand in for the already-indexed
  // corpus (shingled/hashed exactly once, at index-write time); odd
  // doc_ids are the incoming batch, verified against the stored gram
  // arrays. Oracle: all-pairs exact Jaccard across the two halves.
  // -------------------------------------------------------------------
  private def bandIndexPath(s: SparkSession, d: String): String =
    graft.core.Memo.getOrElseUpdate(
        s"band_index:${s.sparkContext.applicationId}:$d") {
      val p = java.nio.file.Files.createTempDirectory("graft_bandidx").toString
      Dedup.writeBandIndex(docs(s, d).filter(col("doc_id") % 2 === 0),
        "doc_id", "text", p)
      p
    }

  def dedupIncremental(s: SparkSession, d: String): DataFrame =
    Dedup.nearDupAgainstIndex(s,
        docs(s, d).filter(col("doc_id") % 2 === 1), "doc_id", "text",
        bandIndexPath(s, d), threshold = 0.5)
      .select(col("id_1"), col("id_2"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_1", "id_2")

  val dedupIncrementalSql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w FROM documents
      |),
      |idx AS (SELECT doc_id, w, unnest(range(1, len(w)-1)) AS i FROM tok),
      |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM idx),
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_1, b.doc_id AS id_2, count(*) AS i
      |  FROM sh a JOIN sh b ON a.s = b.s
      |  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
      |  GROUP BY 1, 2)
      |SELECT id_1, id_2,
      |       round(i * 1.0 / (ca.n + cb.n - i), 6) AS jaccard
      |FROM inter
      |JOIN cnt ca ON ca.doc_id = id_1
      |JOIN cnt cb ON cb.doc_id = id_2
      |WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.5
      |ORDER BY id_1, id_2""".stripMargin

  val dedupNearSql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w FROM documents
      |),
      |idx AS (SELECT doc_id, w, unnest(range(1, len(w)-1)) AS i FROM tok),
      |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM idx),
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_1, b.doc_id AS id_2, count(*) AS i
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id_1, id_2,
      |       round(i * 1.0 / (ca.n + cb.n - i), 6) AS jaccard
      |FROM inter
      |JOIN cnt ca ON ca.doc_id = id_1
      |JOIN cnt cb ON cb.doc_id = id_2
      |WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.5
      |ORDER BY id_1, id_2""".stripMargin

  // -------------------------------------------------------------------
  // q40: SimHash signatures (32 bits from md5-derived token hashes)
  // -------------------------------------------------------------------
  private val simHashBits = 32

  def simhash(s: SparkSession, d: String): DataFrame =
    Dedup.simHash(docs(s, d), "doc_id", "text", simHashBits)
      .withColumnRenamed("id", "doc_id").orderBy("doc_id")

  val simhashSql: String = {
    val sums = (0 until simHashBits).map(i =>
      s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i").mkString(",\n      |    ")
    val bits = (0 until simHashBits).map(i =>
      s"CASE WHEN b$i >= 0 THEN ${1L << i} ELSE 0 END").mkString(" + ")
    s"""WITH tok AS (
      |  SELECT DISTINCT doc_id, unnest(string_split_regex(regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+')) AS w
      |  FROM documents
      |),
      |hashed AS (
      |  SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h FROM tok
      |),
      |sums AS (
      |  SELECT doc_id,
      |    $sums
      |  FROM hashed GROUP BY doc_id
      |)
      |SELECT doc_id, CAST($bits AS BIGINT) AS simhash
      |FROM sums ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // q41: embedding-cosine near-dup, blocked by label (threshold 0.35)
  // -------------------------------------------------------------------
  def embedDedup(s: SparkSession, d: String): DataFrame =
    Dedup.embeddingNearDup(emb(s, d), "vec_id", "embedding", "label", 0.35)
      .select(col("id_1"), col("id_2"), round(col("cosine"), 6).as("cosine"))
      .orderBy("id_1", "id_2")

  val embedDedupSql: String =
    """SELECT a.vec_id AS id_1, b.vec_id AS id_2,
      |       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
      |FROM embeddings a
      |JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
      |ORDER BY id_1, id_2""".stripMargin

  // -------------------------------------------------------------------
  // q35: brute-force cosine top-k (k=5) for a 20-probe set — the exact
  // baseline the LSH path is recall-tested against.
  // -------------------------------------------------------------------
  def annTopK(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 20), "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
      .orderBy("query_id", "neighbor_id")
  }

  val annTopKSql: String =
    """SELECT query_id, neighbor_id, round(cos, 6) AS cosine FROM (
      |  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
      |         list_cosine_similarity(p.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos
      |  FROM embeddings p JOIN embeddings c ON p.vec_id <> c.vec_id
      |  WHERE p.vec_id < 20
      |  QUALIFY row_number() OVER (PARTITION BY p.vec_id ORDER BY cos DESC, c.vec_id) <= 5
      |) ORDER BY query_id, neighbor_id""".stripMargin

  // -------------------------------------------------------------------
  // q219: prefix-dimension recall (the Matryoshka-embedding
  // diagnostic) — exact top-10 by cosine over the FIRST 16 of 64
  // dimensions, scored against the full-dimension exact top-10 per
  // probe. High recall means truncated embeddings are a viable
  // first-pass index; the measurement itself is two brute-force
  // top-ks + a bounded intersection count.
  // -------------------------------------------------------------------
  def prefixRecall(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val full = Similarity.bruteForceTopK(
        e, e.filter(col("vec_id") < 20), "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val eP = e.select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding"))
    val pref = Similarity.bruteForceTopK(
        eP, eP.filter(col("vec_id") < 20), "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val hits = full.join(pref, Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    full.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_hits"))
      .select(col("query_id"), col("n_hits"),
        round(col("n_hits") / 10.0, 6).as("recall"))
      .orderBy("query_id")
  }

  val prefixRecallSql: String =
    """WITH full_tk AS (
      |  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id
      |  FROM embeddings p JOIN embeddings c ON p.vec_id <> c.vec_id
      |  WHERE p.vec_id < 20
      |  QUALIFY row_number() OVER (PARTITION BY p.vec_id ORDER BY
      |    list_cosine_similarity(p.embedding::DOUBLE[],
      |                           c.embedding::DOUBLE[]) DESC,
      |    c.vec_id) <= 10
      |),
      |pre AS (
      |  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id
      |  FROM embeddings p JOIN embeddings c ON p.vec_id <> c.vec_id
      |  WHERE p.vec_id < 20
      |  QUALIFY row_number() OVER (PARTITION BY p.vec_id ORDER BY
      |    list_cosine_similarity(p.embedding[1:16]::DOUBLE[],
      |                           c.embedding[1:16]::DOUBLE[]) DESC,
      |    c.vec_id) <= 10
      |),
      |h AS (SELECT f.query_id, count(*) AS n_hits
      |      FROM full_tk f JOIN pre USING (query_id, neighbor_id)
      |      GROUP BY 1)
      |SELECT q.query_id, coalesce(h.n_hits, 0) AS n_hits,
      |       round(coalesce(h.n_hits, 0) / 10.0, 6) AS recall
      |FROM (SELECT DISTINCT vec_id AS query_id FROM embeddings
      |      WHERE vec_id < 20) q
      |LEFT JOIN h USING (query_id) ORDER BY query_id""".stripMargin

  // -------------------------------------------------------------------
  // q69: character-n-gram Jaccard near-dup — the MinHash/band/verify
  // pipeline over char-5-gram sets at threshold 0.5. Gram width and
  // band shape are tuned to the similarity distribution: char 3-grams
  // are so common in English that ordinary doc pairs sit at j~0.5-0.7
  // and the default 2-row bands turn the candidate set into all-pairs
  // (measured: 156 s at sf0.1); 5-grams push ordinary pairs below 0.3
  // while true near-dups stay at j>=0.9, and 8 bands x 4 rows put the
  // s-curve midpoint at 0.6 — candidate probability 0.3% for the dense
  // j~0.25 mass, miss probability 2e-4 at j=0.9 — so the all-pairs
  // oracle agrees exactly and the candidate set stays tiny.
  // -------------------------------------------------------------------
  /** Memoized per session+dir: q222's budgeted view consumes the same
    * verified pairs, so it reuses the materialized frame instead of
    * re-running gram→minhash→band→verify (the q34/q66 pattern). */
  private def ngramPairs(s: SparkSession, d: String): DataFrame =
    graft.core.Memo.getOrElseUpdate(
        s"q69_ngram_pairs:${s.sparkContext.applicationId}:$d") {
      Dedup.ngramJaccardNearDup(docs(s, d), "doc_id", "text", threshold = 0.5,
          n = 5, bands = 8, rowsPerBand = 4)
        .localCheckpoint(false)
    }

  def ngramJaccard(s: SparkSession, d: String): DataFrame =
    ngramPairs(s, d)
      .select(col("id_1"), col("id_2"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_1", "id_2")

  // -------------------------------------------------------------------
  // q222: output-budgeted near-dup pairs — the answer-volume knob for
  // the output-bound pair family (VERDICT r12 #4). At 100 TB, true
  // C(k,2) pair output can exceed storage even with linear plans;
  // budgetPairs keeps the top `budget` pairs per anchor (similarity
  // desc, id_2 asc — deterministic at the 6-dp grain both engines
  // share) and counts the truncation on every kept row. budget=1
  // ENGAGES at sf0.01 (anchors there carry up to 2 pairs), so the
  // oracle verifies the cap, not just the pass-through.
  // -------------------------------------------------------------------
  def pairBudget(s: SparkSession, d: String): DataFrame =
    Dedup.budgetPairs(
        ngramPairs(s, d).select(col("id_1"), col("id_2"),
          round(col("jaccard"), 6).as("jaccard")),
        "jaccard", budget = 1)
      .orderBy("id_1", "id_2")

  val pairBudgetSql: String =
    """WITH t AS (
      |  SELECT doc_id, trim(text) AS txt FROM documents
      |),
      |g AS (
      |  SELECT DISTINCT doc_id,
      |         substr(txt, CAST(i AS INT), 5) AS s
      |  FROM t, unnest(range(1, len(txt) - 3)) AS u(i)
      |  WHERE len(txt) >= 5
      |),
      |cnt AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_1, b.doc_id AS id_2, count(*) AS i
      |  FROM g a JOIN g b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_1, id_2,
      |         round(i * 1.0 / (ca.n + cb.n - i), 6) AS jaccard
      |  FROM inter
      |  JOIN cnt ca ON ca.doc_id = id_1
      |  JOIN cnt cb ON cb.doc_id = id_2
      |  WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.5)
      |SELECT id_1, id_2, jaccard,
      |       greatest(0, cnt - 1) AS n_dropped
      |FROM (SELECT *,
      |        row_number() OVER (PARTITION BY id_1
      |                           ORDER BY jaccard DESC, id_2) AS rn,
      |        count(*) OVER (PARTITION BY id_1) AS cnt
      |      FROM pairs) z
      |WHERE rn <= 1 ORDER BY id_1, id_2""".stripMargin

  val ngramJaccardSql: String =
    """WITH t AS (
      |  SELECT doc_id, trim(text) AS txt FROM documents
      |),
      |g AS (
      |  SELECT DISTINCT doc_id,
      |         substr(txt, CAST(i AS INT), 5) AS s
      |  FROM t, unnest(range(1, len(txt) - 3)) AS u(i)
      |  WHERE len(txt) >= 5
      |),
      |cnt AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_1, b.doc_id AS id_2, count(*) AS i
      |  FROM g a JOIN g b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id_1, id_2,
      |       round(i * 1.0 / (ca.n + cb.n - i), 6) AS jaccard
      |FROM inter
      |JOIN cnt ca ON ca.doc_id = id_1
      |JOIN cnt cb ON cb.doc_id = id_2
      |WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.5
      |ORDER BY id_1, id_2""".stripMargin

  // -------------------------------------------------------------------
  // q71: the north-star composition — end-to-end corpus preparation
  // (language filter -> quality filter -> exact dedup keep-min-id ->
  // near-dup removal keep-smaller-id -> per-source accounting), every
  // stage replayed exactly by the oracle.
  // -------------------------------------------------------------------
  def corpusPrep(s: SparkSession, d: String): DataFrame =
    graft.text.Corpus.prepare(docs(s, d), "doc_id", "text",
        langs = Seq("en", "de", "fr"), minQuality = 0.5, jaccard = 0.5)
      .stats
      .select(col("source"), col("n_docs"), col("total_tokens"))

  val corpusPrepSql: String =
    """WITH t0 AS (
      |  SELECT doc_id, trim(text) AS txt,
      |         string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
      |  FROM documents
      |),
      |q AS (
      |  SELECT doc_id,
      |    round((least(len(w) / 50.0, 1.0)
      |      + 1.0 - least(((len(txt) - len(regexp_replace(txt, '[^\w\s]', '', 'g'))) * 1.0
      |                     / greatest(len(txt), 1)) * 5.0, 1.0)
      |      + len(list_distinct(w)) * 1.0 / len(w)
      |      + CASE WHEN list_sum(list_transform(w, x -> len(x))) * 1.0 / len(w)
      |             BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END) / 4.0, 6) AS quality
      |  FROM t0
      |),
      |kept AS (
      |  SELECT d.* FROM documents d JOIN q USING (doc_id)
      |  WHERE d.lang IN ('en', 'de', 'fr') AND q.quality >= 0.5
      |),
      |exact AS (
      |  SELECT * FROM kept
      |  QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
      |),
      |tok AS (SELECT doc_id, string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w FROM exact),
      |idx AS (SELECT doc_id, w, unnest(range(1, len(w)-1)) AS i FROM tok),
      |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM idx),
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_1, b.doc_id AS id_2, count(*) AS i
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |drops AS (
      |  SELECT DISTINCT id_2 FROM inter
      |  JOIN cnt ca ON ca.doc_id = id_1
      |  JOIN cnt cb ON cb.doc_id = id_2
      |  WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.5),
      |final AS (
      |  SELECT * FROM exact WHERE doc_id NOT IN (SELECT id_2 FROM drops)
      |)
      |SELECT source, count(*) AS n_docs,
      |       CAST(sum(len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'))) AS BIGINT) AS total_tokens
      |FROM final GROUP BY source ORDER BY source""".stripMargin

  // -------------------------------------------------------------------
  // q67: IVF top-k with nProbe = nCells — probing every cell drives the
  // whole IVF machinery (KMeans coarse quantizer, cell assignment,
  // probe-cell ranking, candidate join, exact re-rank) while making the
  // result provably identical to exact brute force, so the plain
  // brute-force SQL is an exact oracle. The approximate (nProbe <
  // nCells) path is recall-tested in LlmOpsSpec.
  // -------------------------------------------------------------------
  def ivfTopK(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    Similarity.ivfTopK(e, e.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, nCells = 8, nProbe = 8, seed = 27L)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
      .orderBy("query_id", "neighbor_id")
  }

  val ivfTopKSql: String = annTopKSql

  // -------------------------------------------------------------------
  // q60: SimHash near-dup pairs via lossless banding (pigeonhole:
  // hamming<=3 over 32 bits split into 4 bands guarantees a shared
  // band, so the bucketed candidate set has perfect recall and the
  // all-pairs oracle must agree exactly)
  // -------------------------------------------------------------------
  def simhashNear(s: SparkSession, d: String): DataFrame =
    Dedup.simHashNearDup(docs(s, d), "doc_id", "text", maxHamming = 3)
      .orderBy("id_1", "id_2")

  val simhashNearSql: String =
    s"""WITH sig AS ($simhashSql)
      |SELECT a.doc_id AS id_1, b.doc_id AS id_2,
      |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
      |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      |ORDER BY id_1, id_2""".stripMargin

  // -------------------------------------------------------------------
  // q42: token statistics
  // -------------------------------------------------------------------
  def tokenStats(s: SparkSession, d: String): DataFrame =
    TextOps.tokenStats(docs(s, d), "doc_id", "text").orderBy("doc_id")

  val tokenStatsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w FROM documents
      |)
      |SELECT doc_id,
      |  len(w) AS n_tokens,
      |  len(list_distinct(w)) AS n_distinct,
      |  round(list_sum(list_transform(w, x -> len(x))) * 1.0 / len(w), 6) AS mean_token_len,
      |  round(len(list_distinct(w)) * 1.0 / len(w), 6) AS type_token_ratio
      |FROM tok ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q43: heuristic language ID by stopword hit rate
  // -------------------------------------------------------------------
  def langId(s: SparkSession, d: String): DataFrame =
    TextOps.langId(docs(s, d), "doc_id", "text").orderBy("doc_id")

  val langIdSql: String = {
    val langs = TextOps.stopwords.toSeq.sortBy(_._1)
    val scoreDefs = langs.map { case (l, ws) =>
      val inList = ws.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(w, x -> x IN ($inList))) * 1.0 / len(w) AS score_$l"
    }.mkString(",\n      |  ")
    // strict > fold, earlier language wins ties — mirrors TextOps.langId
    val best = langs.map(_._1).map(l => s"score_$l")
      .reduceLeft((a, b) => s"CASE WHEN $b > $a THEN $b ELSE $a END")
    val pick = {
      val cases = langs.map(_._1)
        .map(l => s"WHEN score_$l = __best THEN '$l'").mkString(" ")
      s"CASE $cases END"
    }
    s"""WITH tok AS (
      |  SELECT doc_id, string_split_regex(regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+') AS w FROM documents
      |),
      |scored AS (
      |  SELECT doc_id,
      |  $scoreDefs
      |  FROM tok
      |),
      |withbest AS (
      |  SELECT *, $best AS __best FROM scored
      |)
      |SELECT doc_id, $pick AS pred_lang, round(__best, 6) AS best_score
      |FROM withbest ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // q44: quality score
  // -------------------------------------------------------------------
  def quality(s: SparkSession, d: String): DataFrame =
    TextOps.qualityScore(docs(s, d), "doc_id", "text").orderBy("doc_id")

  val qualitySql: String =
    """WITH t AS (
      |  SELECT doc_id, trim(text) AS txt,
      |         string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
      |  FROM documents
      |),
      |f AS (
      |  SELECT doc_id,
      |    least(len(w) / 50.0, 1.0) AS len_score,
      |    1.0 - least(((len(txt) - len(regexp_replace(txt, '[^\w\s]', '', 'g'))) * 1.0
      |                 / greatest(len(txt), 1)) * 5.0, 1.0) AS punct_score,
      |    len(list_distinct(w)) * 1.0 / len(w) AS diversity,
      |    CASE WHEN list_sum(list_transform(w, x -> len(x))) * 1.0 / len(w)
      |              BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END AS len_plaus
      |  FROM t
      |)
      |SELECT doc_id,
      |       round((len_score + punct_score + diversity + len_plaus) / 4.0, 6) AS quality
      |FROM f ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q45: order-insensitive content fingerprint
  // -------------------------------------------------------------------
  def fingerprint(s: SparkSession, d: String): DataFrame =
    TextOps.fingerprint(docs(s, d), "doc_id", "text").orderBy("doc_id")

  val fingerprintSql: String =
    """SELECT doc_id,
      |  md5(array_to_string(list_sort(list_distinct(
      |      string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'))), ' ')) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q46: distinct char 3-gram counts
  // -------------------------------------------------------------------
  def charNgrams(s: SparkSession, d: String): DataFrame =
    TextOps.charNgramCount(docs(s, d), "doc_id", "text", 3).orderBy("doc_id")

  val charNgramsSql: String =
    """SELECT doc_id,
      |  CASE WHEN len(trim(text)) >= 3 THEN
      |    len(list_distinct([substr(trim(text), CAST(i AS INT), 3)
      |                       for i in range(1, len(trim(text)) - 1)]))
      |  ELSE 0 END AS n_char_ngrams
      |FROM documents ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q66: duplicate clusters — connected components over the MinHash
  // near-dup pairs with min-id canonical labels. Oracle = recursive-CTE
  // transitive closure over the same (exactly SQL-recomputable) pairs.
  // -------------------------------------------------------------------
  def dupClusters(s: SparkSession, d: String): DataFrame =
    Dedup.duplicateClusters(minhashPairs(s, d))
      .withColumnRenamed("id", "doc_id").orderBy("doc_id")

  val dupClustersSql: String = {
    val pairsCte = dedupNearSql
      .replace("ORDER BY id_1, id_2", "")
    s"""WITH RECURSIVE pairs AS ($pairsCte),
      |edges AS (
      |  SELECT id_1 AS src, id_2 AS dst FROM pairs
      |  UNION ALL SELECT id_2, id_1 FROM pairs
      |),
      |reach(id, lbl) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id
      |)
      |SELECT id AS doc_id, min(lbl) AS cluster
      |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // q64: quality-weighted corpus sampling — keep each doc with
  // probability = its quality score, via a deterministic md5 coin.
  // -------------------------------------------------------------------
  def weightedSample(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d)
    val quality = TextOps.qualityScore(base, "doc_id", "text")
    TextOps.weightedSample(base.join(quality, "doc_id"), "doc_id", "quality")
      .select("doc_id", "quality").orderBy("doc_id")
  }

  val weightedSampleSql: String =
    s"""WITH q AS ($qualitySql)
      |SELECT doc_id, quality FROM q
      |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000000
      |        / 1000000.0 < quality
      |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q65: BPE-style pre-tokenizer counts next to whitespace counts
  // -------------------------------------------------------------------
  def bpeTokens(s: SparkSession, d: String): DataFrame =
    TextOps.bpeTokenCount(docs(s, d), "doc_id", "text").orderBy("doc_id")

  val bpeTokensSql: String =
    """SELECT doc_id,
      |  len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS n_ws_tokens,
      |  len(regexp_extract_all(trim(text),
      |      '''(?:s|d|m|t|ll|ve|re)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s'']+', 0)) AS n_bpe_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q76: Gopher/MassiveText repetition quality rules — per-doc token
  // bigram repetition fractions (Rae et al. 2021 §A1.1 filters
  // threshold on exactly these columns).
  // -------------------------------------------------------------------
  def gopherRepetition(s: SparkSession, d: String): DataFrame =
    graft.text.Curation.repetitionStats(docs(s, d), "doc_id", "text", n = 2)
      .orderBy("doc_id")

  val gopherRepetitionSql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w FROM documents
      |),
      |grams AS (
      |  SELECT doc_id,
      |         unnest(list_transform(range(1, len(w)),
      |                               i -> w[i] || ' ' || w[i+1])) AS gram
      |  FROM tok WHERE len(w) >= 2
      |),
      |counts AS (SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY doc_id, gram)
      |SELECT doc_id,
      |  CAST(sum(c) AS BIGINT) AS n_grams,
      |  count(*) AS n_distinct_grams,
      |  CAST(max(c) AS BIGINT) AS top_gram_cnt,
      |  round(1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
      |    AS dup_gram_frac,
      |  round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS top_gram_frac
      |FROM counts GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q90: word-level Gopher/MassiveText quality rules (Rae 2021 §A1.1 —
  // the non-repetition filter set q76 left out). The synthetic corpus
  // is single-line prose, so both sides first append deterministic
  // bullet / ellipsis / symbol lines keyed on doc_id — making the line
  // fractions and symbol ratio real computations the oracle replays,
  // not constants.
  // -------------------------------------------------------------------
  def gopherWord(s: SparkSession, d: String): DataFrame = {
    val injected = docs(s, d).select(
      col("doc_id"),
      concat(
        col("text"), lit("\n"),
        when(col("doc_id") % 3 === 0, lit("- bullet item"))
          .otherwise(lit("plain line")),
        lit("\n"),
        when(col("doc_id") % 4 === 0, lit("to be continued..."))
          .otherwise(lit("the end")),
        when(col("doc_id") % 5 === 0, lit(" ## #")).otherwise(lit(""))
      ).as("text"))
    graft.text.Curation.wordQualityStats(injected, "doc_id", "text")
      .orderBy("doc_id")
  }

  val gopherWordSql: String =
    """WITH inj AS (
      |  SELECT doc_id,
      |    text || chr(10)
      |      || CASE WHEN doc_id % 3 = 0 THEN '- bullet item' ELSE 'plain line' END
      |      || chr(10)
      |      || CASE WHEN doc_id % 4 = 0 THEN 'to be continued...' ELSE 'the end' END
      |      || CASE WHEN doc_id % 5 = 0 THEN ' ## #' ELSE '' END AS t
      |  FROM documents
      |),
      |arr AS (
      |  SELECT doc_id, t,
      |         string_split_regex(regexp_replace(t, '^\s+|\s+$', '', 'g'), '\s+') AS w,
      |         string_split(t, chr(10)) AS lines
      |  FROM inj
      |),
      |stat AS (
      |  SELECT doc_id,
      |    len(w) AS n_words,
      |    list_sum(list_transform(w, x -> len(x))) * 1.0 / len(w) AS mean_word_len,
      |    len(regexp_extract_all(t, '#|\.\.\.|…')) * 1.0 / len(w) AS symbol_word_ratio,
      |    len(lines) AS n_lines,
      |    len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]')))
      |      * 1.0 / len(lines) AS bullet_line_frac,
      |    len(list_filter(lines,
      |          l -> ends_with(trim(l), '...') OR ends_with(trim(l), '…')))
      |      * 1.0 / len(lines) AS ellipsis_line_frac,
      |    len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
      |      * 1.0 / len(w) AS alpha_word_frac
      |  FROM arr
      |)
      |SELECT doc_id,
      |  CAST(n_words AS BIGINT) AS n_words,
      |  round(mean_word_len, 6) AS mean_word_len,
      |  round(symbol_word_ratio, 6) AS symbol_word_ratio,
      |  CAST(n_lines AS BIGINT) AS n_lines,
      |  round(bullet_line_frac, 6) AS bullet_line_frac,
      |  round(ellipsis_line_frac, 6) AS ellipsis_line_frac,
      |  round(alpha_word_frac, 6) AS alpha_word_frac,
      |  (n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3 AND 10
      |   AND symbol_word_ratio <= 0.1 AND bullet_line_frac <= 0.9
      |   AND ellipsis_line_frac <= 0.3 AND alpha_word_frac >= 0.8)
      |    AS passes_gopher_word
      |FROM stat ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q77: PII redaction. The synthetic corpus carries no PII, so both
  // sides inject a deterministic email + IPv4 per document first —
  // making the redaction path (count + mask) a real transformation the
  // oracle replays, not a no-op over clean text.
  // -------------------------------------------------------------------
  def piiRedact(s: SparkSession, d: String): DataFrame = {
    val injected = docs(s, d).select(
      col("doc_id"),
      concat(col("text"), lit(" reach user"), col("doc_id"),
        lit("@example.com or 10.1."), col("doc_id") % 256,
        lit(".9 end")).as("text"))
    graft.text.Curation.redactPii(injected, "doc_id", "text")
      .select(col("doc_id"), col("n_emails").cast("long").as("n_emails"),
        col("n_ips").cast("long").as("n_ips"), col("redacted"))
      .orderBy("doc_id")
  }

  val piiRedactSql: String = {
    // Java regex and RE2 agree on these patterns; DuckDB standard
    // single-quoted literals pass backslashes through verbatim.
    val email = graft.text.Curation.emailRe
    val ip = graft.text.Curation.ipv4Re
    s"""WITH inj AS (
      |  SELECT doc_id,
      |         text || ' reach user' || doc_id || '@example.com or 10.1.'
      |              || (doc_id % 256) || '.9 end' AS t
      |  FROM documents
      |)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(t, '$ip')) AS BIGINT) AS n_ips,
      |  regexp_replace(regexp_replace(t, '$email', '<EMAIL>', 'g'),
      |                 '$ip', '<IP>', 'g') AS redacted
      |FROM inj ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // q78: benchmark decontamination — docs with doc_id % 50 == 0 stand
  // in for the held-out benchmark; every training doc is scored by its
  // distinct shared-8-gram count (GPT-3 §C overlap check). The corpus's
  // planted near-duplicates make the expected flags non-trivial.
  // -------------------------------------------------------------------
  def decontaminate(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d)
    graft.text.Curation.decontaminate(
      base.filter(col("doc_id") % 50 =!= 0),
      base.filter(col("doc_id") % 50 === 0),
      "doc_id", "text", n = 8)
      .orderBy("doc_id")
  }

  val decontaminateSql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w FROM documents
      |),
      |grams AS (
      |  SELECT doc_id,
      |         unnest(list_transform(range(1, len(w) - 6), i ->
      |           w[i]   || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
      |           w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7])) AS gram
      |  FROM tok WHERE len(w) >= 8
      |),
      |traing AS (SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 50 <> 0),
      |benchg AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0),
      |shared AS (
      |  SELECT doc_id, count(*) AS n_shared
      |  FROM traing JOIN benchg USING (gram) GROUP BY doc_id
      |)
      |SELECT d.doc_id,
      |       CAST(coalesce(s.n_shared, 0) AS BIGINT) AS n_shared,
      |       coalesce(s.n_shared, 0) > 0 AS contaminated
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
      |LEFT JOIN shared s USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q79: fixed-size token chunking — each doc split into 32-token
  // chunks (final chunk ragged), the pre-packing step of a training
  // tokenization pipeline.
  // -------------------------------------------------------------------
  def chunkDocs(s: SparkSession, d: String): DataFrame =
    graft.text.Curation.chunkTokens(docs(s, d), "doc_id", "text", chunkSize = 32)
      .orderBy("doc_id", "chunk_id")

  val chunkDocsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w FROM documents
      |),
      |ch AS (
      |  SELECT doc_id,
      |         unnest(list_transform(range(0, CAST(ceil(len(w) / 32.0) AS INT)),
      |           i -> {'chunk_id': i,
      |                 'chunk': array_to_string(w[i*32+1 : i*32+32], ' ')})) AS u
      |  FROM tok
      |)
      |SELECT doc_id,
      |       CAST(u.chunk_id AS BIGINT) AS chunk_id,
      |       CAST(len(string_split(u.chunk, ' ')) AS BIGINT) AS n_chunk_tokens,
      |       u.chunk AS chunk
      |FROM ch ORDER BY doc_id, chunk_id""".stripMargin

  // -------------------------------------------------------------------
  // q80: GPT-style sequence-packing offsets — concatenate-in-id-order
  // token offsets and 512-token window spans per document, computed as
  // a distributed prefix sum (never a single-partition window).
  // -------------------------------------------------------------------
  def packOffsets(s: SparkSession, d: String): DataFrame =
    graft.text.Curation.packOffsets(docs(s, d), "doc_id", "text", window = 512)
      .orderBy("doc_id")

  // -------------------------------------------------------------------
  // q105: packed-sequence materialization — each document's slice
  // contributions to its fixed-512-token training sequences, the
  // assembly table a training loader consumes. Oracle replays q80's
  // window math plus the slice intersection arithmetic.
  // -------------------------------------------------------------------
  def packSequences(s: SparkSession, d: String): DataFrame =
    graft.text.Curation.packSequences(docs(s, d), "doc_id", "text", window = 512)
      .orderBy("seq_id", "doc_id")

  val packSequencesSql: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |         CAST(len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents
      |),
      |c AS (
      |  SELECT doc_id, n_tokens,
      |         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |           AS s
      |  FROM tok
      |),
      |x AS (
      |  SELECT doc_id, n_tokens, s,
      |         unnest(range(s // 512, (s + n_tokens - 1) // 512 + 1)) AS seq_id
      |  FROM c
      |)
      |SELECT seq_id, doc_id,
      |  greatest(seq_id * 512 - s, 0) AS doc_tok_start,
      |  greatest(s - seq_id * 512, 0) AS seq_tok_start,
      |  least((seq_id + 1) * 512, s + n_tokens) - greatest(seq_id * 512, s)
      |    AS n_tokens_in_seq
      |FROM x ORDER BY seq_id, doc_id""".stripMargin

  val packOffsetsSql: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |         CAST(len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents
      |),
      |c AS (
      |  SELECT doc_id, n_tokens,
      |         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |           AS start_offset
      |  FROM tok
      |)
      |SELECT doc_id, n_tokens, start_offset,
      |       CAST(start_offset // 512 AS BIGINT) AS start_window,
      |       CAST((start_offset + n_tokens - 1) // 512 AS BIGINT) AS end_window
      |FROM c ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q81: per-vector uint8 linear quantization of the embedding corpus —
  // range metadata, integer-exact code checksum, and the (order-
  // independent) worst reconstruction error per vector.
  // -------------------------------------------------------------------
  def embedQuantize(s: SparkSession, d: String): DataFrame =
    graft.sim.Quantize.quantizeStats(emb(s, d), "vec_id", "embedding", levels = 255)
      .orderBy("vec_id")

  val embedQuantizeSql: String =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings
      |),
      |s AS (
      |  SELECT vec_id, x,
      |         list_aggregate(x, 'min') AS vmin,
      |         list_aggregate(x, 'max') AS vmax
      |  FROM e
      |),
      |q AS (SELECT *, (vmax - vmin) / 255.0 AS scale FROM s)
      |SELECT vec_id,
      |  round(vmin, 6) AS vmin,
      |  round(vmax, 6) AS vmax,
      |  CAST(list_sum(list_transform(x,
      |    v -> CASE WHEN scale > 0
      |              THEN CAST(round((v - vmin) / scale) AS BIGINT)
      |              ELSE 0 END)) AS BIGINT) AS code_sum,
      |  round(list_aggregate(list_transform(x,
      |    v -> abs(vmin + CASE WHEN scale > 0
      |                        THEN CAST(round((v - vmin) / scale) AS BIGINT)
      |                        ELSE 0 END * scale - v)),
      |    'max'), 6) AS max_abs_err
      |FROM q ORDER BY vec_id""".stripMargin

  // -------------------------------------------------------------------
  // q82: training-mixture sampling — thin three chosen sources to
  // 50/25/25 token proportions; membership is a deterministic md5 coin
  // so the oracle replays it exactly (same coin as q64).
  // -------------------------------------------------------------------
  def mixBySource(s: SparkSession, d: String): DataFrame =
    graft.text.Curation.mixBySource(docs(s, d), "doc_id", "text", "source",
      Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25))
      .orderBy("doc_id")

  val mixBySourceSql: String =
    """WITH tok AS (
      |  SELECT doc_id, source,
      |         CAST(len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents
      |),
      |tgt AS (SELECT * FROM (VALUES
      |  ('src0', CAST(0.5 AS DOUBLE)),
      |  ('src1', CAST(0.25 AS DOUBLE)),
      |  ('src2', CAST(0.25 AS DOUBLE))) AS v(source, p)),
      |tot AS (
      |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS t
      |  FROM tok JOIN tgt USING (source) GROUP BY source
      |),
      |b AS (SELECT min(t / p) AS budget FROM tot JOIN tgt USING (source)),
      |rates AS (
      |  SELECT source, least(CAST(1.0 AS DOUBLE),
      |                       p * (SELECT budget FROM b) / t) AS r
      |  FROM tot JOIN tgt USING (source)
      |)
      |SELECT doc_id, source, n_tokens
      |FROM tok JOIN rates USING (source)
      |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000000
      |        / 1000000.0 < r
      |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q129: temperature-smoothed source mixture — q_i ∝ (n_i/N)^alpha
  // keep rates (alpha=0.5) with the deterministic md5 coin; the oracle
  // recomputes weights, budget, rates and the coin entirely in SQL.
  // -------------------------------------------------------------------
  def temperatureMixQ(s: SparkSession, d: String): DataFrame =
    graft.text.Curation.temperatureMix(docs(s, d), "doc_id", "text", "source",
      alpha = 0.5)
      .orderBy("doc_id")

  val temperatureMixSql: String =
    """WITH tok AS (
      |  SELECT doc_id, source,
      |         CAST(len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents
      |),
      |tot AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS t
      |        FROM tok GROUP BY source),
      |q AS (SELECT source, t,
      |             pow(t, 0.5) / sum(pow(t, 0.5)) OVER () AS qi FROM tot),
      |b AS (SELECT min(t / qi) AS budget FROM q),
      |rates AS (
      |  SELECT source, round(least(CAST(1.0 AS DOUBLE),
      |                 qi * (SELECT budget FROM b) / t), 6) AS keep_rate
      |  FROM q
      |)
      |SELECT doc_id, source, n_tokens, keep_rate
      |FROM tok JOIN rates USING (source)
      |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000000
      |        / 1000000.0 < keep_rate
      |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q83: C4-style chunk-level duplication stats — per doc, how many of
  // its 16-token chunks occur more than once corpus-wide.
  // -------------------------------------------------------------------
  def chunkDupStats(s: SparkSession, d: String): DataFrame =
    graft.text.Curation.chunkDupStats(docs(s, d), "doc_id", "text", chunkSize = 16)
      .orderBy("doc_id")

  val chunkDupStatsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w FROM documents
      |),
      |ch AS (
      |  SELECT doc_id,
      |         unnest(list_transform(range(0, CAST(ceil(len(w) / 16.0) AS INT)),
      |           i -> array_to_string(w[i*16+1 : i*16+16], ' '))) AS chunk
      |  FROM tok
      |),
      |cnt AS (SELECT chunk, count(*) AS c FROM ch GROUP BY chunk)
      |SELECT doc_id,
      |  count(*) AS n_chunks,
      |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
      |  round(CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |        / count(*), 6) AS dup_chunk_frac
      |FROM ch JOIN cnt USING (chunk)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q98: line-level corpus dedup (CCNet/RefinedWeb boilerplate strip).
  // The synthetic corpus is single-line, so both sides first reshape
  // each document into lines: the original text, one of two repeated
  // boilerplate footers (dropped — each occurs ~250x), and a
  // per-document unique line (kept). The original line is dropped
  // exactly when the whole document text is an exact corpus duplicate.
  // -------------------------------------------------------------------
  def lineDedup(s: SparkSession, d: String): DataFrame = {
    val injected = docs(s, d).select(
      col("doc_id"),
      concat(
        col("text"), lit("\n"),
        when(col("doc_id") % 2 === 0, lit("all rights reserved"))
          .otherwise(lit("subscribe to the newsletter")),
        lit("\nunique footer line "), col("doc_id")).as("text"))
    graft.text.Curation.lineDedup(injected, "doc_id", "text")
      .orderBy("doc_id")
  }

  val lineDedupSql: String =
    """WITH inj AS (
      |  SELECT doc_id,
      |    text || chr(10)
      |      || CASE WHEN doc_id % 2 = 0 THEN 'all rights reserved'
      |              ELSE 'subscribe to the newsletter' END
      |      || chr(10) || 'unique footer line ' || doc_id AS t
      |  FROM documents
      |),
      |arr AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM inj),
      |lines AS (
      |  SELECT doc_id, generate_subscripts(ls, 1) AS pos, unnest(ls) AS line
      |  FROM arr
      |),
      |cnt AS (SELECT md5(line) AS h, count(*) AS c FROM lines GROUP BY 1)
      |SELECT doc_id,
      |  count(*) AS n_lines,
      |  CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_lines,
      |  round(CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
      |        / count(*), 6) AS dup_line_frac,
      |  coalesce(string_agg(CASE WHEN c < 2 THEN line END, chr(10)
      |                      ORDER BY pos), '') AS kept_text
      |FROM lines JOIN cnt ON md5(line) = h
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q99: exact-substring duplicate spans (Lee et al. 2021 stand-in).
  // Every document gets a shared 12-token boilerplate tail, so the
  // 6-token windows inside the tail are corpus-duplicated and merge
  // into one maximal span per document; any genuinely repeated 6-grams
  // in the synthetic bodies surface as additional spans. Both sides
  // compute 0-based inclusive token indices.
  // -------------------------------------------------------------------
  def dupSpans(s: SparkSession, d: String): DataFrame = {
    val injected = docs(s, d).select(
      col("doc_id"),
      concat(col("text"),
        lit(" standard legal boilerplate text follows here twelve shared tokens exactly now")
      ).as("text"))
    graft.text.Curation.dupSpans(injected, "doc_id", "text", k = 6)
      .orderBy("doc_id", "span_start")
  }

  val dupSpansSql: String =
    """WITH inj AS (
      |  SELECT doc_id, text ||
      |    ' standard legal boilerplate text follows here twelve shared tokens exactly now'
      |    AS t
      |  FROM documents
      |),
      |tok AS (SELECT doc_id, string_split_regex(regexp_replace(t, '^\s+|\s+$', '', 'g'), '\s+') AS w FROM inj),
      |gr AS (
      |  SELECT doc_id,
      |         generate_subscripts(gs, 1) - 1 AS pos,
      |         unnest(gs) AS gram
      |  FROM (SELECT doc_id,
      |          list_transform(range(0, greatest(len(w) - 5, 0)),
      |            i -> array_to_string(w[i+1 : i+6], ' ')) AS gs
      |        FROM tok)
      |),
      |cnt AS (SELECT md5(gram) AS h, count(*) AS c FROM gr GROUP BY 1),
      |dup AS (
      |  SELECT doc_id, pos FROM gr JOIN cnt ON md5(gram) = h WHERE c >= 2
      |),
      |gap AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 6
      |         THEN 1 ELSE 0 END AS g
      |  FROM dup
      |),
      |isl AS (
      |  SELECT doc_id, pos,
      |    sum(g) OVER (PARTITION BY doc_id ORDER BY pos
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM gap
      |)
      |SELECT doc_id,
      |  CAST(min(pos) AS BIGINT) AS span_start,
      |  CAST(max(pos) + 5 AS BIGINT) AS span_end,
      |  CAST(max(pos) + 5 - min(pos) + 1 AS BIGINT) AS span_tokens,
      |  count(*) AS n_windows
      |FROM isl GROUP BY doc_id, island
      |ORDER BY doc_id, span_start""".stripMargin

  // -------------------------------------------------------------------
  // q100: BM25 ranked keyword search over the corpus for a fixed
  // three-term query; top-20 by score with id tie-break. The oracle
  // replays the exact Okapi math (Lucene-style non-negative IDF).
  // -------------------------------------------------------------------
  def bm25Search(s: SparkSession, d: String): DataFrame =
    graft.text.TextOps.bm25(docs(s, d), "doc_id", "text",
      query = Seq("hash", "join", "window"), topK = 20)

  // -------------------------------------------------------------------
  // q134: hybrid retrieval — BM25 keyword candidates fused with
  // embedding-cosine candidates by reciprocal-rank fusion. documents
  // and embeddings share the 0..N-1 id space, so the fusion is a real
  // two-modality ranking of the same corpus; the oracle replays BOTH
  // retrievers (the q100 BM25 math, list_cosine_similarity) and the
  // RRF combination entirely in SQL.
  // -------------------------------------------------------------------
  def hybridRrf(s: SparkSession, d: String): DataFrame = {
    val wRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id").asc)
    // bounded candidate lists (<= 50 rows): the global rank window is
    // over a top-N result, never the corpus
    val text = graft.text.TextOps.bm25(docs(s, d), "doc_id", "text",
        query = Seq("hash", "join", "window"), topK = 50)
      .select(col("doc_id"), col("bm25").as("score"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
    val qv = emb(s, d).filter(col("vec_id") === 7)
      .select(col("embedding").as("__q"))
    val vec = emb(s, d)
      .crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        round(graft.functions.GraftFunctions.cosineSim(
          s, col("embedding"), col("__q")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(50)
      .withColumn("rank", row_number().over(wRank).cast("long"))
    val fused = graft.text.TextOps.rrfFuse(Seq(text, vec), "doc_id",
      kRrf = 60, topK = 10)
    fused
      .join(text.select(col("doc_id"), col("rank").as("text_rank")), Seq("doc_id"), "left")
      .join(vec.select(col("doc_id"), col("rank").as("vec_rank")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("text_rank"), col("vec_rank"), col("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
  }

  val hybridRrfSql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w FROM documents
      |),
      |stats AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n, avg(len(w)) AS avgdl FROM tok
      |),
      |tf AS (
      |  SELECT doc_id, term,
      |         CAST(count(*) AS DOUBLE) AS tf,
      |         CAST(max(dl) AS DOUBLE) AS dl
      |  FROM (SELECT doc_id, len(w) AS dl,
      |          unnest(list_filter(w, t -> t IN ('hash', 'join', 'window'))) AS term
      |        FROM tok)
      |  GROUP BY doc_id, term
      |),
      |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
      |bm AS (
      |  SELECT doc_id,
      |    round(sum(ln(1.0 + (n - df + 0.5) / (df + 0.5)) *
      |      tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS score
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
      |  GROUP BY doc_id
      |  ORDER BY score DESC, doc_id LIMIT 50
      |),
      |t AS (
      |  SELECT doc_id,
      |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
      |  FROM bm
      |),
      |cos AS (
      |  SELECT e.vec_id AS doc_id,
      |    round(list_cosine_similarity(e.embedding::DOUBLE[],
      |      q.embedding::DOUBLE[]), 6) AS score
      |  FROM embeddings e CROSS JOIN (SELECT embedding FROM embeddings
      |                                WHERE vec_id = 7) q
      |  ORDER BY score DESC, doc_id LIMIT 50
      |),
      |v AS (
      |  SELECT doc_id,
      |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
      |  FROM cos
      |),
      |fused AS (
      |  SELECT COALESCE(t.doc_id, v.doc_id) AS doc_id,
      |    t.rank AS text_rank, v.rank AS vec_rank,
      |    round(COALESCE(1.0 / (60 + t.rank), 0) +
      |          COALESCE(1.0 / (60 + v.rank), 0), 6) AS rrf
      |  FROM t FULL OUTER JOIN v ON t.doc_id = v.doc_id
      |)
      |SELECT doc_id, text_rank, vec_rank, rrf FROM fused
      |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin

  val bm25SearchSql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w FROM documents
      |),
      |stats AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n, avg(len(w)) AS avgdl FROM tok
      |),
      |tf AS (
      |  SELECT doc_id, term,
      |         CAST(count(*) AS DOUBLE) AS tf,
      |         CAST(max(dl) AS DOUBLE) AS dl
      |  FROM (SELECT doc_id, len(w) AS dl,
      |          unnest(list_filter(w, t -> t IN ('hash', 'join', 'window'))) AS term
      |        FROM tok)
      |  GROUP BY doc_id, term
      |),
      |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term)
      |SELECT doc_id,
      |  round(sum(ln(1.0 + (n - df + 0.5) / (df + 0.5))
      |            * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS bm25,
      |  CAST(sum(tf) AS BIGINT) AS n_matches,
      |  count(*) AS n_terms
      |FROM tf JOIN dfreq USING (term) CROSS JOIN stats
      |GROUP BY doc_id
      |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin

  // -------------------------------------------------------------------
  // q101: DSIR importance resampling — select the 100 most src0-like
  // documents from the whole corpus by hashed-ngram importance weight
  // with the deterministic Gumbel-top-k. The oracle replays the full
  // chain: bucket hash, both smoothed bag-of-words models, per-doc
  // log-weight, Gumbel perturbation, top-k.
  // -------------------------------------------------------------------
  def dsirSelect(s: SparkSession, d: String): DataFrame = {
    val all = docs(s, d)
    graft.text.Curation.dsirSelect(
      all, all.filter(col("source") === "src0"), "doc_id", "text",
      buckets = 10000, k = 100)
  }

  val dsirSelectSql: String =
    """WITH tok AS (
      |  SELECT doc_id, source, string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
      |  FROM documents
      |),
      |gr AS (
      |  SELECT doc_id, source,
      |    unnest(w || list_transform(range(1, len(w)),
      |                               i -> w[i] || ' ' || w[i+1])) AS gram
      |  FROM tok
      |),
      |gb AS (
      |  SELECT doc_id, source,
      |    ('0x' || substr(md5(gram), 1, 15))::BIGINT % 10000 AS bucket
      |  FROM gr
      |),
      |qc AS (SELECT bucket, count(*) AS qcnt FROM gb GROUP BY 1),
      |pc AS (SELECT bucket, count(*) AS pcnt FROM gb WHERE source = 'src0'
      |       GROUP BY 1),
      |tot AS (SELECT (SELECT sum(qcnt) FROM qc) AS tq,
      |               (SELECT coalesce(sum(pcnt), 0) FROM pc) AS tp),
      |model AS (
      |  SELECT q.bucket,
      |    ln((coalesce(p.pcnt, 0) + 1.0) / (tp + 10000))
      |      - ln((q.qcnt + 1.0) / (tq + 10000)) AS ld
      |  FROM qc q LEFT JOIN pc p USING (bucket) CROSS JOIN tot
      |),
      |sc AS (
      |  SELECT doc_id, count(*) AS n_grams, sum(ld) AS lw
      |  FROM gb JOIN model USING (bucket) GROUP BY doc_id
      |),
      |g AS (
      |  SELECT doc_id, n_grams, lw,
      |    -ln(-ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000000
      |             + 0.5) / 1000000.0)) AS gum
      |  FROM sc
      |)
      |SELECT doc_id, n_grams,
      |  round(lw, 6) AS log_weight,
      |  round(lw + gum, 6) AS gumbel_key
      |FROM g
      |ORDER BY gumbel_key DESC, doc_id LIMIT 100""".stripMargin

  // -------------------------------------------------------------------
  // q109: within-document line dedup (self-repetition strip). The
  // injection plants an intra-doc repeated line plus a unique line, so
  // both sides drop exactly the second occurrence.
  // -------------------------------------------------------------------
  def selfLineDedup(s: SparkSession, d: String): DataFrame = {
    val injected = docs(s, d).select(
      col("doc_id"),
      concat(col("text"),
        lit("\nnav menu home about\nunique line "), col("doc_id"),
        lit("\nnav menu home about")).as("text"))
    graft.text.Curation.selfLineDedup(injected, "doc_id", "text")
      .orderBy("doc_id")
  }

  val selfLineDedupSql: String =
    """WITH inj AS (
      |  SELECT doc_id,
      |    text || chr(10) || 'nav menu home about'
      |         || chr(10) || 'unique line ' || doc_id
      |         || chr(10) || 'nav menu home about' AS t
      |  FROM documents
      |),
      |arr AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM inj),
      |lines AS (
      |  SELECT doc_id, generate_subscripts(ls, 1) AS pos, unnest(ls) AS line
      |  FROM arr
      |),
      |kept AS (
      |  SELECT doc_id, pos, line FROM lines
      |  QUALIFY row_number() OVER (PARTITION BY doc_id, line ORDER BY pos) = 1
      |),
      |tot AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY 1),
      |k AS (
      |  SELECT doc_id, count(*) AS n_kept,
      |         string_agg(line, chr(10) ORDER BY pos) AS kept_text
      |  FROM kept GROUP BY doc_id
      |)
      |SELECT doc_id, n_lines, n_kept,
      |  n_lines - n_kept AS n_self_dup, kept_text
      |FROM tot JOIN k USING (doc_id) ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q110: fuzzy-dedup application — keep each near-dup cluster's
  // representative (the min-id member q66 labels) plus all singletons,
  // reported as per-source kept/dropped counts and kept token mass.
  // Oracle reads q66's verified cluster dump.
  // -------------------------------------------------------------------
  def fuzzyDedupApply(s: SparkSession, d: String): DataFrame = {
    val dropIds = dupClusters(s, d)
      .filter(col("doc_id") =!= col("cluster"))
      .select(col("doc_id"), lit(true).as("__dropped"))
    docs(s, d)
      .select(col("doc_id"), col("source"),
        size(graft.text.TextOps.tokens(col("text"))).cast("long").as("__nt"))
      .join(dropIds, Seq("doc_id"), "left")
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("__dropped"), 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("__dropped").isNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__dropped").isNull, col("__nt")).otherwise(0L))
          .as("n_kept_tokens"))
      .orderBy("source")
  }

  val fuzzyDedupApplySql: String =
    """WITH cl AS (
      |  SELECT doc_id, cluster
      |  FROM read_parquet('__VERIFY_OUT__/q66_dup_clusters/*.parquet')
      |),
      |d AS (
      |  SELECT doc_id, source,
      |         CAST(len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS BIGINT) AS nt
      |  FROM documents
      |),
      |j AS (
      |  SELECT d.source, d.nt,
      |         (cl.doc_id IS NOT NULL AND cl.doc_id <> cl.cluster) AS is_drop
      |  FROM d LEFT JOIN cl USING (doc_id)
      |)
      |SELECT source,
      |  count(*) AS n_docs,
      |  CAST(sum(CASE WHEN is_drop THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
      |  CAST(sum(CASE WHEN is_drop THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
      |  CAST(sum(CASE WHEN is_drop THEN 0 ELSE nt END) AS BIGINT) AS n_kept_tokens
      |FROM j GROUP BY source ORDER BY source""".stripMargin

  // -------------------------------------------------------------------
  // q118: top-k collocations by PMI over adjacent token pairs (Church
  // & Hanks 1990) — the classic phrase-mining statistic.
  // -------------------------------------------------------------------
  def pmiTopK(s: SparkSession, d: String): DataFrame =
    TextOps.pmiCollocations(docs(s, d), "text", minCount = 5L, topK = 20)

  val pmiTopKSql: String =
    """WITH tok AS (
      |  SELECT string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w FROM documents
      |),
      |tot AS (
      |  SELECT CAST(sum(len(w)) AS DOUBLE) AS n_uni,
      |         CAST(sum(greatest(len(w) - 1, 0)) AS DOUBLE) AS n_bi
      |  FROM tok
      |),
      |uni AS (
      |  SELECT word, CAST(count(*) AS DOUBLE) AS c
      |  FROM (SELECT unnest(w) AS word FROM tok) GROUP BY 1
      |),
      |bi AS (
      |  SELECT w1, w2, count(*) AS pair_count FROM (
      |    SELECT unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
      |           unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS w2
      |    FROM tok WHERE len(w) >= 2)
      |  GROUP BY 1, 2 HAVING count(*) >= 5
      |)
      |SELECT b.w1, b.w2, b.pair_count,
      |  round(ln((b.pair_count / t.n_bi) /
      |    ((u1.c / t.n_uni) * (u2.c / t.n_uni))), 6) AS pmi
      |FROM bi b
      |JOIN uni u1 ON b.w1 = u1.word
      |JOIN uni u2 ON b.w2 = u2.word, tot t
      |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin

  // -------------------------------------------------------------------
  // q122/q123: trained quality-classifier filter (CCNet/GPT-3 LR
  // pattern) — q122 dumps the rounded (feature, coef) model (rows-only,
  // model-driven); q123's oracle recomputes the four q44-pinned
  // features in DuckDB and replays the sigmoid scoring from the dump.
  // Label: lang == 'en' (the langid+quality filter composition).
  // -------------------------------------------------------------------
  private def qualityLrModel(s: SparkSession, d: String): DataFrame =
    graft.core.Memo.getOrElseUpdate(
        s"quality_lr_model:${s.sparkContext.applicationId}:$d") {
      graft.text.QualityClassifier.train(
          docs(s, d).withColumn("is_en", (col("lang") === "en").cast("int")),
          "doc_id", "text", "is_en")
        .localCheckpoint(false)
    }

  def qualityLrDump(s: SparkSession, d: String): DataFrame =
    qualityLrModel(s, d).orderBy("feature")

  def qualityLrScores(s: SparkSession, d: String): DataFrame =
    graft.text.QualityClassifier.score(docs(s, d), qualityLrModel(s, d),
        "doc_id", "text")
      .orderBy("doc_id")

  val qualityLrScoresSql: String =
    """WITH m AS (
      |  SELECT feature, coef
      |  FROM read_parquet('__VERIFY_OUT__/q122_quality_model/*.parquet')
      |),
      |t AS (
      |  SELECT doc_id, trim(text) AS txt,
      |         string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
      |  FROM documents
      |),
      |f AS (
      |  SELECT doc_id,
      |    round(least(len(w) / 50.0, 1.0), 6) AS len_score,
      |    round(1.0 - least(((len(txt) - len(regexp_replace(txt, '[^\w\s]', '', 'g'))) * 1.0
      |                 / greatest(len(txt), 1)) * 5.0, 1.0), 6) AS punct_score,
      |    round(len(list_distinct(w)) * 1.0 / len(w), 6) AS diversity,
      |    round(CASE WHEN list_sum(list_transform(w, x -> len(x))) * 1.0 / len(w)
      |              BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END, 6) AS len_plaus
      |  FROM t
      |),
      |c AS (
      |  SELECT
      |    (SELECT coef FROM m WHERE feature = '__intercept') AS b,
      |    (SELECT coef FROM m WHERE feature = 'len_score')   AS w1,
      |    (SELECT coef FROM m WHERE feature = 'punct_score') AS w2,
      |    (SELECT coef FROM m WHERE feature = 'diversity')   AS w3,
      |    (SELECT coef FROM m WHERE feature = 'len_plaus')   AS w4
      |)
      |SELECT doc_id,
      |  round(1.0 / (1.0 + exp(-(b + len_score * w1 + punct_score * w2
      |    + diversity * w3 + len_plaus * w4))), 6) AS quality_prob
      |FROM f, c ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q148: per-document TF-IDF keywords — top-3 tokens per doc by the
  // classic tf*ln(N/df) weight, ranked on the rounded score with token
  // tie-break so DuckDB replays the exact ordering.
  // -------------------------------------------------------------------
  def tfidfKeywords(s: SparkSession, d: String): DataFrame =
    graft.text.TextOps.tfidfKeywords(docs(s, d), "doc_id", "text", k = 3)
      .orderBy("doc_id", "rnk")

  val tfidfKeywordsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS token
      |  FROM documents
      |),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
      |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
      |scored AS (
      |  SELECT doc_id, token, round(tf * ln(n / df), 6) AS score
      |  FROM tf JOIN dfreq USING (token) CROSS JOIN n
      |),
      |r AS (
      |  SELECT doc_id, token, score,
      |    row_number() OVER (PARTITION BY doc_id
      |                       ORDER BY score DESC, token) AS rnk
      |  FROM scored)
      |SELECT doc_id, CAST(rnk AS INT) AS rnk, token, score
      |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  // -------------------------------------------------------------------
  // q149: per-source KL divergence from the corpus token distribution —
  // the mixture-QA diagnostic reviewed before setting source weights.
  // -------------------------------------------------------------------
  def sourceKl(s: SparkSession, d: String): DataFrame =
    graft.text.Curation.groupKlDivergence(docs(s, d), "source", "text")
      .orderBy("source")

  val sourceKlSql: String =
    """WITH tok AS (
      |  SELECT source, unnest(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS w
      |  FROM documents
      |),
      |gc AS (SELECT source, w, count(*) AS gcnt FROM tok GROUP BY 1, 2),
      |cc AS (SELECT w, count(*) AS ccnt FROM tok GROUP BY 1),
      |gt AS (SELECT source, sum(gcnt) AS gtot FROM gc GROUP BY 1),
      |n AS (SELECT sum(ccnt) AS n FROM cc)
      |SELECT source, CAST(max(gtot) AS BIGINT) AS n_tokens,
      |  round(sum((CAST(gcnt AS DOUBLE) / gtot)
      |        * ln((CAST(gcnt AS DOUBLE) / gtot)
      |              / (CAST(ccnt AS DOUBLE) / n))), 6) AS kl_divergence
      |FROM gc JOIN cc USING (w) JOIN gt USING (source) CROSS JOIN n
      |GROUP BY source ORDER BY source""".stripMargin

  // -------------------------------------------------------------------
  // q150: distinctive tokens per source — Monroe et al. 2008 log-odds
  // with informative Dirichlet prior, variance-standardized; ranked on
  // the rounded z with token tie-break for a deterministic replay.
  // -------------------------------------------------------------------
  def fightinWords(s: SparkSession, d: String): DataFrame =
    graft.text.Curation.fightinWords(docs(s, d), "source", "text",
        alpha0 = 10.0, k = 3)
      .orderBy("source", "rnk")

  val fightinWordsSql: String =
    """WITH tok AS (
      |  SELECT source, unnest(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS w
      |  FROM documents
      |),
      |gc AS (SELECT source, w, count(*) AS gcnt FROM tok GROUP BY 1, 2),
      |cc AS (SELECT w, count(*) AS ccnt FROM tok GROUP BY 1),
      |gt AS (SELECT source, sum(gcnt) AS gtot FROM gc GROUP BY 1),
      |n AS (SELECT sum(ccnt) AS n FROM cc),
      |j AS (
      |  SELECT source, w, gcnt, ccnt, gtot, n,
      |         10.0 * CAST(ccnt AS DOUBLE) / n AS aw
      |  FROM gc JOIN cc USING (w) JOIN gt USING (source) CROSS JOIN n
      |),
      |sc AS (
      |  SELECT source, w,
      |    round((ln((gcnt + aw) / (CAST(gtot AS DOUBLE) + 10.0 - gcnt - aw))
      |         - ln(((ccnt - gcnt) + aw)
      |               / (CAST(n - gtot AS DOUBLE) + 10.0 - (ccnt - gcnt) - aw)))
      |      / sqrt(1.0 / (gcnt + aw) + 1.0 / ((ccnt - gcnt) + aw)), 6)
      |      AS z_score
      |  FROM j
      |),
      |r AS (
      |  SELECT source, w, z_score,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY z_score DESC, w) AS rnk
      |  FROM sc)
      |SELECT source, CAST(rnk AS INT) AS rnk, w AS token, z_score
      |FROM r WHERE rnk <= 3 ORDER BY source, rnk""".stripMargin

  // -------------------------------------------------------------------
  // q84: corpus-unigram LM score — mean log10 token probability under
  // the corpus's own unigram distribution (CCNet-style quality signal).
  // -------------------------------------------------------------------
  def unigramLm(s: SparkSession, d: String): DataFrame =
    graft.text.Curation.unigramLogProb(docs(s, d), "doc_id", "text")
      .orderBy("doc_id")

  val unigramLmSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS w
      |  FROM documents
      |),
      |counts AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
      |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM counts)
      |SELECT doc_id,
      |  count(*) AS n_tokens,
      |  round(avg(log10(CAST(cnt AS DOUBLE) / (SELECT total FROM tot))), 6)
      |    AS lm_score
      |FROM tok JOIN counts USING (w)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q143: stupid-backoff bigram LM score (Brants et al. 2007) — counts
  // trained on the English subset, every document scored against them;
  // non-English docs hit the backoff branch constantly, which is the
  // held-out shape that actually exercises S(cur|prev)'s else-arm.
  // -------------------------------------------------------------------
  def bigramLm(s: SparkSession, d: String): DataFrame = {
    val all = docs(s, d)
    graft.text.Curation.bigramLogProb(all, "doc_id", "text",
        alpha = 0.4, train = Some(all.filter(col("lang") === "en")))
      .orderBy("doc_id")
  }

  val bigramLmSql: String =
    """WITH t AS (
      |  SELECT doc_id, lang, string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
      |  FROM documents
      |),
      |uni AS (
      |  SELECT tok, count(*) AS uc FROM (
      |    SELECT unnest(w) AS tok FROM t WHERE lang = 'en')
      |  GROUP BY 1
      |),
      |big AS (
      |  SELECT g, count(*) AS bc FROM (
      |    SELECT unnest(list_transform(range(1, len(w)),
      |                                 i -> w[i] || ' ' || w[i+1])) AS g
      |    FROM t WHERE lang = 'en' AND len(w) >= 2)
      |  GROUP BY g
      |),
      |tot AS (SELECT CAST(sum(uc) AS DOUBLE) AS n FROM uni),
      |pairs AS (
      |  SELECT doc_id, g,
      |         split_part(g, ' ', 1) AS prev,
      |         substr(g, len(split_part(g, ' ', 1)) + 2) AS cur
      |  FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(w)),
      |                                         i -> w[i] || ' ' || w[i+1])) AS g
      |    FROM t WHERE len(w) >= 2)
      |),
      |scored AS (
      |  SELECT doc_id,
      |    CASE WHEN bc IS NOT NULL THEN CAST(bc AS DOUBLE) / pc
      |         ELSE 0.4 * CAST(cc AS DOUBLE) / (SELECT n FROM tot) END AS s
      |  FROM pairs
      |  LEFT JOIN big USING (g)
      |  JOIN (SELECT tok, uc AS pc FROM uni) up ON pairs.prev = up.tok
      |  JOIN (SELECT tok, uc AS cc FROM uni) uc2 ON pairs.cur = uc2.tok
      |)
      |SELECT doc_id, count(*) AS n_bigrams,
      |       round(avg(log10(s)), 6) AS sb_score
      |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q154: corpus-wide top-20 GPT-2 pretokens — the real BPE input
  // units (space-prefixed symbols distinct from bare ones), counted
  // with the same TakeOrdered shape as q85. The oracle runs the SAME
  // published split regex through DuckDB's RE2.
  // -------------------------------------------------------------------
  def gpt2Pretokens(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(explode(graft.text.TextOps.gpt2Pretokens(col("text")))
        .as("pretoken"))
      .groupBy("pretoken").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("pretoken"))
      .limit(20)

  val gpt2PretokensSql: String =
    """WITH p AS (
      |  SELECT unnest(regexp_extract_all(text,
      |    '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'))
      |    AS pretoken
      |  FROM documents
      |)
      |SELECT pretoken, count(*) AS cnt FROM p
      |GROUP BY pretoken ORDER BY cnt DESC, pretoken LIMIT 20""".stripMargin

  // -------------------------------------------------------------------
  // q85: corpus-wide top-20 token bigrams — the BPE-round-one pair
  // statistic, as a global TakeOrdered aggregate.
  // -------------------------------------------------------------------
  def topBigrams(s: SparkSession, d: String): DataFrame =
    graft.text.Curation.topNgrams(docs(s, d), "text", n = 2, k = 20)

  val topBigramsSql: String =
    """WITH tok AS (
      |  SELECT string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w FROM documents
      |),
      |grams AS (
      |  SELECT unnest(list_transform(range(1, len(w)),
      |                               i -> w[i] || ' ' || w[i+1])) AS gram
      |  FROM tok WHERE len(w) >= 2
      |)
      |SELECT gram, count(*) AS cnt FROM grams
      |GROUP BY gram ORDER BY cnt DESC, gram LIMIT 20""".stripMargin

  // -------------------------------------------------------------------
  // q86: text normalization — lowercase, strip to letters/digits/space,
  // collapse whitespace; the canonical-form step before exact dedup.
  // PII is injected first (as in q77) so the strip path has real work.
  // -------------------------------------------------------------------
  def normalizeText(s: SparkSession, d: String): DataFrame = {
    val injected = docs(s, d).select(
      col("doc_id"),
      concat(col("text"), lit(" See: User"), col("doc_id"),
        lit("@Example.COM!! (tel. 555-01"), col("doc_id") % 100,
        lit(")")).as("text"))
    graft.text.Curation.normalizeText(injected, "doc_id", "text")
      .select(col("doc_id"), col("n_chars_raw").cast("long").as("n_chars_raw"),
        col("n_chars_norm").cast("long").as("n_chars_norm"), col("normalized"))
      .orderBy("doc_id")
  }

  val normalizeTextSql: String =
    """WITH inj AS (
      |  SELECT doc_id,
      |         text || ' See: User' || doc_id || '@Example.COM!! (tel. 555-01'
      |              || (doc_id % 100) || ')' AS t
      |  FROM documents
      |)
      |SELECT doc_id,
      |  CAST(len(t) AS BIGINT) AS n_chars_raw,
      |  CAST(len(trim(regexp_replace(regexp_replace(lower(t),
      |    '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS BIGINT)
      |    AS n_chars_norm,
      |  trim(regexp_replace(regexp_replace(lower(t),
      |    '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS normalized
      |FROM inj ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q92: Unicode NFC normalization (native nfc_normalize expression)
  // on CONSTRUCTED non-ASCII content — the corpus is ASCII, so each doc
  // gets a deterministic decomposed suffix (e + COMBINING ACUTE, u +
  // COMBINING DIAERESIS) that NFC composes to é/ü: the pre-NFC length
  // shrinks by exactly the two composed pairs. DuckDB's nfc_normalize
  // is the oracle for the JDK Normalizer kernel.
  // -------------------------------------------------------------------
  def nfcNormalizeQuery(s: SparkSession, d: String): DataFrame = {
    val injected = docs(s, d).select(
      col("doc_id"),
      // decomposed on purpose: e+U+0301, u+U+0308, i+U+0308 — NFC fuses
      // each pair, so n_chars_nfc = n_chars_raw - 3 row-for-row
      concat(col("text"), lit(" cafe\u0301 u\u0308ber nai\u0308ve"),
        (col("doc_id") % 7).cast("string")).as("text"))
    val nfc = graft.functions.GraftFunctions.nfcNormalize(s, col("text"))
    injected.select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_raw"),
        length(nfc).cast("long").as("n_chars_nfc"),
        substring(nfc, -24, 24).as("tail_nfc"))
      .orderBy("doc_id")
  }

  val nfcNormalizeSql: String =
    """WITH inj AS (
      |  SELECT doc_id,
      |         text || ' cafe' || chr(769) || ' u' || chr(776) || 'ber nai'
      |              || chr(776) || 've' || CAST(doc_id % 7 AS VARCHAR) AS t
      |  FROM documents
      |)
      |SELECT doc_id,
      |  CAST(len(t) AS BIGINT) AS n_chars_raw,
      |  CAST(len(nfc_normalize(t)) AS BIGINT) AS n_chars_nfc,
      |  CASE WHEN len(nfc_normalize(t)) >= 24
      |       THEN right(nfc_normalize(t), 24) ELSE nfc_normalize(t) END AS tail_nfc
      |FROM inj ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q102/q103/q104: product-quantization ANN (Jégou 2011). q102 dumps
  // the trained per-subspace codebooks (model-driven → rows-only, the
  // q89 pattern); q103's oracle re-derives every vector's codes from
  // the dumped codebook in DuckDB (argmin over rounded subspace
  // distances, code tie-break); q104's oracle replays the ADC top-k
  // search from the two dumps. Probes = vec_id < 20, matching q35/q67.
  // m=4 here bounds the bench's KMeans fit count; parity is
  // m-independent, and the m=16 quality config (NN-in-shortlist
  // recall 0.8) is pinned in LlmOpsSpec.
  // -------------------------------------------------------------------
  private val pqM = 4
  private def pqCodebook(s: SparkSession, d: String): DataFrame =
    graft.core.Memo.getOrElseUpdate(
        s"pq_codebook:${s.sparkContext.applicationId}:$d") {
      graft.sim.Pq.train(emb(s, d), "vec_id", "embedding",
          m = pqM, ks = 16, seed = 27L)
        .localCheckpoint(false)
    }

  private def pqCodes(s: SparkSession, d: String): DataFrame =
    graft.core.Memo.getOrElseUpdate(
        s"pq_codes:${s.sparkContext.applicationId}:$d") {
      graft.sim.Pq.encode(emb(s, d), pqCodebook(s, d), "vec_id", "embedding",
          m = pqM)
        .localCheckpoint(false)
    }

  /** Codebook dump exploded to scalar rows (sub, code, pos, w): the
    * driver's checker canon-sorts dumped frames and crashes on array
    * cells (ndarray is unhashable in pandas), so the centroid array is
    * flattened here and rebuilt with `list(w ORDER BY pos)` in the
    * consuming oracle SQL (q103/q104). */
  def pqCodebookDump(s: SparkSession, d: String): DataFrame =
    pqCodebook(s, d)
      .select(col("sub"), col("code"),
        posexplode(col("centroid")).as(Seq("pos", "w")))
      .orderBy("sub", "code", "pos")

  def pqCodesQuery(s: SparkSession, d: String): DataFrame =
    pqCodes(s, d).orderBy("vec_id", "sub")

  val pqCodesSql: String =
    """WITH cb AS (
      |  SELECT sub, code, list(w ORDER BY pos) AS centroid
      |  FROM read_parquet('__VERIFY_OUT__/q102_pq_codebook/*.parquet')
      |  GROUP BY sub, code
      |),
      |e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
      |sr AS (
      |  SELECT vec_id, t.sub, x[t.sub*16+1 : t.sub*16+16] AS subvec
      |  FROM e CROSS JOIN (SELECT unnest(range(4)) AS sub) t
      |),
      |d AS (
      |  SELECT vec_id, sr.sub, cb.code,
      |    round(list_sum(list_transform(range(1, 17),
      |      i -> (subvec[i] - centroid[i]) * (subvec[i] - centroid[i]))), 6) AS dist
      |  FROM sr JOIN cb ON sr.sub = cb.sub
      |)
      |SELECT vec_id, sub, code, dist FROM d
      |QUALIFY row_number() OVER (PARTITION BY vec_id, sub
      |                           ORDER BY dist, code) = 1
      |ORDER BY vec_id, sub""".stripMargin

  // -------------------------------------------------------------------
  // q130-q133: IVF-PQ composite ANN (IVFADC — coarse inverted lists +
  // PQ on residuals). q130/q132 dump the two trained models (KMeans
  // outputs — rows-only, exploded to scalars); q131's oracle replays
  // cell assignment + residual encoding from those dumps, and q133's
  // replays the full search (probe-cell selection, per-cell residual
  // ADC tables, candidate scoring, top-k) — the entire composite index
  // is exact math over its own dumps, like the flat-PQ q102-q104 chain.
  // -------------------------------------------------------------------
  private val ivfpqCells = 16
  private def ivfpqCoarse(s: SparkSession, d: String): DataFrame =
    graft.core.Memo.getOrElseUpdate(
        s"ivfpq_coarse:${s.sparkContext.applicationId}:$d") {
      graft.sim.IvfPq.trainCoarse(emb(s, d), "embedding",
          nCells = ivfpqCells, seed = 27L)
        .localCheckpoint(false)
    }

  private def ivfpqCodebook(s: SparkSession, d: String): DataFrame =
    graft.core.Memo.getOrElseUpdate(
        s"ivfpq_codebook:${s.sparkContext.applicationId}:$d") {
      graft.sim.IvfPq.trainCodebook(emb(s, d), ivfpqCoarse(s, d),
          "vec_id", "embedding", m = pqM, ks = 16, seed = 27L)
        .localCheckpoint(false)
    }

  private def ivfpqCodes(s: SparkSession, d: String): DataFrame =
    graft.core.Memo.getOrElseUpdate(
        s"ivfpq_codes:${s.sparkContext.applicationId}:$d") {
      graft.sim.IvfPq.encode(emb(s, d), ivfpqCoarse(s, d),
          ivfpqCodebook(s, d), "vec_id", "embedding", m = pqM)
        .localCheckpoint(false)
    }

  def ivfpqCoarseDump(s: SparkSession, d: String): DataFrame =
    ivfpqCoarse(s, d)
      .select(col("cell"), posexplode(col("centroid")).as(Seq("pos", "w")))
      .orderBy("cell", "pos")

  def ivfpqCodebookDump(s: SparkSession, d: String): DataFrame =
    ivfpqCodebook(s, d)
      .select(col("sub"), col("code"),
        posexplode(col("centroid")).as(Seq("pos", "w")))
      .orderBy("sub", "code", "pos")

  def ivfpqCodesQuery(s: SparkSession, d: String): DataFrame =
    ivfpqCodes(s, d).orderBy("vec_id", "sub")

  val ivfpqCodesSql: String =
    """WITH coarse AS (
      |  SELECT cell, list(w ORDER BY pos) AS ccent
      |  FROM read_parquet('__VERIFY_OUT__/q130_ivfpq_coarse/*.parquet')
      |  GROUP BY cell
      |),
      |cb AS (
      |  SELECT sub, code, list(w ORDER BY pos) AS centroid
      |  FROM read_parquet('__VERIFY_OUT__/q132_ivfpq_codebook/*.parquet')
      |  GROUP BY sub, code
      |),
      |e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
      |ad AS (
      |  SELECT vec_id, cell, x, ccent,
      |    round(list_sum(list_transform(range(1, len(x) + 1),
      |      i -> (x[i] - ccent[i]) * (x[i] - ccent[i]))), 6) AS cd
      |  FROM e CROSS JOIN coarse
      |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cd, cell) = 1
      |),
      |sr AS (
      |  SELECT vec_id, cell, t.sub,
      |    list_transform(range(1, 17),
      |      i -> x[t.sub*16 + i] - ccent[t.sub*16 + i]) AS rsub
      |  FROM ad CROSS JOIN (SELECT unnest(range(4)) AS sub) t
      |),
      |d AS (
      |  SELECT vec_id, cell, sr.sub, cb.code,
      |    round(list_sum(list_transform(range(1, 17),
      |      i -> (rsub[i] - centroid[i]) * (rsub[i] - centroid[i]))), 6) AS dist
      |  FROM sr JOIN cb ON sr.sub = cb.sub
      |)
      |SELECT vec_id, cell, sub, code FROM d
      |QUALIFY row_number() OVER (PARTITION BY vec_id, sub
      |                           ORDER BY dist, code) = 1
      |ORDER BY vec_id, sub""".stripMargin

  def ivfpqTopK(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    graft.sim.IvfPq.search(ivfpqCodes(s, d), ivfpqCoarse(s, d),
        ivfpqCodebook(s, d), e.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 5, nProbe = 2, m = pqM)
      .orderBy("query_id", "neighbor_id")
  }

  val ivfpqTopKSql: String =
    """WITH coarse AS (
      |  SELECT cell, list(w ORDER BY pos) AS ccent
      |  FROM read_parquet('__VERIFY_OUT__/q130_ivfpq_coarse/*.parquet')
      |  GROUP BY cell
      |),
      |cb AS (
      |  SELECT sub, code, list(w ORDER BY pos) AS centroid
      |  FROM read_parquet('__VERIFY_OUT__/q132_ivfpq_codebook/*.parquet')
      |  GROUP BY sub, code
      |),
      |codes AS (
      |  SELECT vec_id, cell, sub, code
      |  FROM read_parquet('__VERIFY_OUT__/q131_ivfpq_codes/*.parquet')
      |),
      |p AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings
      |      WHERE vec_id < 20),
      |pc AS (
      |  SELECT vec_id AS query_id, cell, x, ccent,
      |    round(list_sum(list_transform(range(1, len(x) + 1),
      |      i -> (x[i] - ccent[i]) * (x[i] - ccent[i]))), 6) AS cd
      |  FROM p CROSS JOIN coarse
      |  QUALIFY row_number() OVER (PARTITION BY vec_id
      |                             ORDER BY cd, cell) <= 2
      |),
      |rq AS (
      |  SELECT query_id, cell, t.sub,
      |    list_transform(range(1, 17),
      |      i -> x[t.sub*16 + i] - ccent[t.sub*16 + i]) AS rsub
      |  FROM pc CROSS JOIN (SELECT unnest(range(4)) AS sub) t
      |),
      |qd AS (
      |  SELECT query_id, rq.cell, rq.sub, cb.code,
      |    round(list_sum(list_transform(range(1, 17),
      |      i -> (rsub[i] - centroid[i]) * (rsub[i] - centroid[i]))), 6) AS qd
      |  FROM rq JOIN cb ON rq.sub = cb.sub
      |),
      |scored AS (
      |  SELECT query_id, c.vec_id AS neighbor_id, round(sum(qd), 6) AS adist
      |  FROM codes c
      |  JOIN qd ON c.cell = qd.cell AND c.sub = qd.sub AND c.code = qd.code
      |  WHERE c.vec_id <> query_id
      |  GROUP BY 1, 2
      |)
      |SELECT query_id, neighbor_id, adist FROM scored
      |QUALIFY row_number() OVER (PARTITION BY query_id
      |                           ORDER BY adist, neighbor_id) <= 5
      |ORDER BY query_id, neighbor_id""".stripMargin

  // -------------------------------------------------------------------
  // q136: IVFADC exact re-rank (Jégou 2011 §IV-C) — the q133 chain with
  // a 20-candidate ADC shortlist re-scored by exact L2 against the raw
  // embeddings, top-5 kept. The oracle replays the ENTIRE chain
  // (probe-cell selection → residual ADC tables → shortlist → exact
  // re-rank) from the q130-q132 model dumps plus the embeddings table.
  // -------------------------------------------------------------------
  def ivfpqRerank(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    graft.sim.IvfPq.searchRerank(ivfpqCodes(s, d), ivfpqCoarse(s, d),
        ivfpqCodebook(s, d), e.filter(col("vec_id") < 20), e,
        "vec_id", "embedding", k = 5, kShort = 20, nProbe = 2, m = pqM)
      .orderBy("query_id", "neighbor_id")
  }

  val ivfpqRerankSql: String =
    """WITH coarse AS (
      |  SELECT cell, list(w ORDER BY pos) AS ccent
      |  FROM read_parquet('__VERIFY_OUT__/q130_ivfpq_coarse/*.parquet')
      |  GROUP BY cell
      |),
      |cb AS (
      |  SELECT sub, code, list(w ORDER BY pos) AS centroid
      |  FROM read_parquet('__VERIFY_OUT__/q132_ivfpq_codebook/*.parquet')
      |  GROUP BY sub, code
      |),
      |codes AS (
      |  SELECT vec_id, cell, sub, code
      |  FROM read_parquet('__VERIFY_OUT__/q131_ivfpq_codes/*.parquet')
      |),
      |p AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings
      |      WHERE vec_id < 20),
      |pc AS (
      |  SELECT vec_id AS query_id, cell, x, ccent,
      |    round(list_sum(list_transform(range(1, len(x) + 1),
      |      i -> (x[i] - ccent[i]) * (x[i] - ccent[i]))), 6) AS cd
      |  FROM p CROSS JOIN coarse
      |  QUALIFY row_number() OVER (PARTITION BY vec_id
      |                             ORDER BY cd, cell) <= 2
      |),
      |rq AS (
      |  SELECT query_id, cell, t.sub,
      |    list_transform(range(1, 17),
      |      i -> x[t.sub*16 + i] - ccent[t.sub*16 + i]) AS rsub
      |  FROM pc CROSS JOIN (SELECT unnest(range(4)) AS sub) t
      |),
      |qd AS (
      |  SELECT query_id, rq.cell, rq.sub, cb.code,
      |    round(list_sum(list_transform(range(1, 17),
      |      i -> (rsub[i] - centroid[i]) * (rsub[i] - centroid[i]))), 6) AS qd
      |  FROM rq JOIN cb ON rq.sub = cb.sub
      |),
      |short AS (
      |  SELECT query_id, c.vec_id AS neighbor_id, round(sum(qd), 6) AS adist
      |  FROM codes c
      |  JOIN qd ON c.cell = qd.cell AND c.sub = qd.sub AND c.code = qd.code
      |  WHERE c.vec_id <> query_id
      |  GROUP BY 1, 2
      |  QUALIFY row_number() OVER (PARTITION BY query_id
      |                             ORDER BY adist, neighbor_id) <= 20
      |),
      |ev AS (SELECT vec_id, embedding::DOUBLE[] AS y FROM embeddings),
      |ex AS (
      |  SELECT s.query_id, s.neighbor_id,
      |    round(list_sum(list_transform(range(1, len(p.x) + 1),
      |      i -> (p.x[i] - ev.y[i]) * (p.x[i] - ev.y[i]))), 6) AS edist
      |  FROM short s
      |  JOIN p ON p.vec_id = s.query_id
      |  JOIN ev ON ev.vec_id = s.neighbor_id
      |)
      |SELECT query_id, neighbor_id, edist FROM ex
      |QUALIFY row_number() OVER (PARTITION BY query_id
      |                           ORDER BY edist, neighbor_id) <= 5
      |ORDER BY query_id, neighbor_id""".stripMargin

  def pqAdcTopK(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    graft.sim.Pq.adcTopK(pqCodes(s, d), pqCodebook(s, d),
        e.filter(col("vec_id") < 20), "vec_id", "embedding", k = 5, m = pqM)
      .orderBy("query_id", "neighbor_id")
  }

  val pqAdcTopKSql: String =
    """WITH cb AS (
      |  SELECT sub, code, list(w ORDER BY pos) AS centroid
      |  FROM read_parquet('__VERIFY_OUT__/q102_pq_codebook/*.parquet')
      |  GROUP BY sub, code
      |),
      |codes AS (
      |  SELECT vec_id, sub, code
      |  FROM read_parquet('__VERIFY_OUT__/q103_pq_codes/*.parquet')
      |),
      |p AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings
      |      WHERE vec_id < 20),
      |psr AS (
      |  SELECT vec_id AS query_id, t.sub, x[t.sub*16+1 : t.sub*16+16] AS subvec
      |  FROM p CROSS JOIN (SELECT unnest(range(4)) AS sub) t
      |),
      |qd AS (
      |  SELECT query_id, psr.sub, cb.code,
      |    round(list_sum(list_transform(range(1, 17),
      |      i -> (subvec[i] - centroid[i]) * (subvec[i] - centroid[i]))), 6) AS qd
      |  FROM psr JOIN cb ON psr.sub = cb.sub
      |),
      |scored AS (
      |  SELECT query_id, c.vec_id AS neighbor_id, round(sum(qd), 6) AS adist
      |  FROM codes c JOIN qd ON c.sub = qd.sub AND c.code = qd.code
      |  WHERE c.vec_id <> query_id
      |  GROUP BY 1, 2
      |)
      |SELECT query_id, neighbor_id, adist FROM scored
      |QUALIFY row_number() OVER (PARTITION BY query_id
      |                           ORDER BY adist, neighbor_id) <= 5
      |ORDER BY query_id, neighbor_id""".stripMargin

  // -------------------------------------------------------------------
  // q106/q107/q108: BPE tokenizer. q106 dumps the learned merge table
  // (the training loop is driver-side over the bounded word dictionary
  // — rows-only; its round-1 pick is independently oracle-checked by
  // q85's top-bigram). q107 segments every DISTINCT word and its
  // oracle replays the full greedy merge loop in DuckDB as a RECURSIVE
  // CTE over q106's dump (boundary-padded separator matching; one
  // merge application per recursion step converges to the same
  // fixpoint as the kernel's merge-all — the chosen pair stays the
  // rank-minimum until exhausted). q108's per-doc stats oracle joins
  // the corpus against q107's verified segmentation.
  // -------------------------------------------------------------------
  private def bpeTable(s: SparkSession, d: String): graft.functions.BpeTable =
    graft.core.Memo.getOrElseUpdate(
        s"bpe_table:${s.sparkContext.applicationId}:$d") {
      graft.text.Bpe.train(docs(s, d), "text", nMerges = 20)
    }

  def bpeMerges(s: SparkSession, d: String): DataFrame =
    graft.text.Bpe.mergesDf(s, bpeTable(s, d)).orderBy("rank")

  def bpeSegments(s: SparkSession, d: String): DataFrame = {
    val words = docs(s, d)
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("w"))
      .distinct()
    words.select(col("w"),
        graft.text.Bpe.bpeEncode(col("w"), bpeTable(s, d)).as("__p"))
      .select(col("w"),
        size(col("__p")).cast("long").as("n_pieces"),
        concat_ws(" ", col("__p")).as("segmented"))
      .orderBy("w")
  }

  val bpeSegmentsSql: String =
    """WITH RECURSIVE m AS (
      |  SELECT rank, "left" AS l, "right" AS r
      |  FROM read_parquet('__VERIFY_OUT__/q106_bpe_merges/*.parquet')
      |),
      |words AS (
      |  SELECT DISTINCT unnest(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS w
      |  FROM documents
      |),
      |init AS (
      |  SELECT w,
      |    chr(31) || array_to_string(list_transform(range(1, len(w) + 1),
      |      i -> substr(w, CAST(i AS INT), 1)), chr(31))
      |      || chr(31) || '</w>' || chr(31) AS cur
      |  FROM words
      |),
      |enc AS (
      |  SELECT w, cur FROM init
      |  UNION ALL
      |  SELECT w, replace(cur, pat, rep) AS cur FROM (
      |    SELECT e.w, e.cur,
      |      chr(31) || m.l || chr(31) || m.r || chr(31) AS pat,
      |      chr(31) || m.l || m.r || chr(31) AS rep,
      |      row_number() OVER (PARTITION BY e.w ORDER BY m.rank) AS rn
      |    FROM enc e JOIN m
      |      ON contains(e.cur, chr(31) || m.l || chr(31) || m.r || chr(31))
      |  ) WHERE rn = 1
      |)
      |SELECT w,
      |  CAST(len(string_split(trim(cur, chr(31)), chr(31))) AS BIGINT) AS n_pieces,
      |  array_to_string(string_split(trim(cur, chr(31)), chr(31)), ' ') AS segmented
      |FROM enc e
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM m
      |  WHERE contains(e.cur, chr(31) || m.l || chr(31) || m.r || chr(31)))
      |ORDER BY w""".stripMargin

  def bpeStats(s: SparkSession, d: String): DataFrame =
    graft.text.Bpe.pieceStats(docs(s, d), "doc_id", "text", bpeTable(s, d))
      .orderBy("doc_id")

  val bpeStatsSql: String =
    """WITH seg AS (
      |  SELECT w, n_pieces
      |  FROM read_parquet('__VERIFY_OUT__/q107_bpe_segments/*.parquet')
      |),
      |tok AS (
      |  SELECT doc_id, unnest(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS w
      |  FROM documents
      |)
      |SELECT doc_id,
      |  count(*) AS n_words,
      |  CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
      |  round(CAST(sum(n_pieces) AS DOUBLE) / count(*), 6) AS fertility
      |FROM tok JOIN seg USING (w)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q93/q94: SemDeDup — q93 dumps the k-means assignment + rounded
  // centroid similarity (model-driven -> rows-only, the q89 pattern);
  // q94 is the keep/drop decision, whose oracle replays the ENTIRE
  // rank-and-drop semantics in DuckDB from q93's dump joined back to
  // the embeddings table (within-cluster pairwise cosine, ranked-ahead
  // predicate, distinct drop set).
  // -------------------------------------------------------------------
  private def semDedupResult(s: SparkSession, d: String): DataFrame =
    graft.core.Memo.getOrElseUpdate(
        s"semdedup:${s.sparkContext.applicationId}:$d") {
      Similarity.semDedup(emb(s, d), "vec_id", "embedding",
          threshold = 0.35, nCells = 16, seed = 27L)
        .withColumnRenamed("id", "vec_id")
        .localCheckpoint(false)
    }

  def semDedupAssign(s: SparkSession, d: String): DataFrame =
    semDedupResult(s, d)
      .select(col("vec_id"), col("cell"), col("centroid_sim"))
      .orderBy("vec_id")

  def semDedupKeep(s: SparkSession, d: String): DataFrame =
    semDedupResult(s, d)
      .select(col("vec_id"), col("cell"), col("keep"))
      .orderBy("vec_id")

  val semDedupKeepSql: String =
    """WITH a AS (
      |  SELECT vec_id, cell, centroid_sim
      |  FROM read_parquet('__VERIFY_OUT__/q93_semdedup_assign/*.parquet')
      |),
      |v AS (
      |  SELECT a.vec_id, a.cell, a.centroid_sim, e.embedding::DOUBLE[] AS vec
      |  FROM a JOIN embeddings e USING (vec_id)
      |),
      |dropped AS (
      |  SELECT DISTINCT y.vec_id
      |  FROM v x JOIN v y ON x.cell = y.cell
      |   AND (x.centroid_sim < y.centroid_sim OR
      |        (x.centroid_sim = y.centroid_sim AND x.vec_id < y.vec_id))
      |  WHERE round(list_cosine_similarity(x.vec, y.vec), 6) >= 0.35
      |)
      |SELECT vec_id, cell,
      |       vec_id NOT IN (SELECT vec_id FROM dropped) AS keep
      |FROM v ORDER BY vec_id""".stripMargin

  // -------------------------------------------------------------------
  // q95: CCNet-style head/middle/tail quality buckets per source —
  // exact per-source percentile thresholds over the q84 LM score,
  // broadcast back; the corpus never re-shuffles for the split.
  // -------------------------------------------------------------------
  def ccnetBuckets(s: SparkSession, d: String): DataFrame =
    graft.text.Curation.ccnetBuckets(docs(s, d), "doc_id", "text", "source")
      .orderBy("doc_id")

  val ccnetBucketsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS w
      |  FROM documents
      |),
      |counts AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
      |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM counts),
      |scored AS (
      |  SELECT doc_id, count(*) AS n_tokens,
      |         round(avg(log10(CAST(cnt AS DOUBLE) / (SELECT total FROM tot))), 6)
      |           AS lm_score
      |  FROM tok JOIN counts USING (w) GROUP BY doc_id
      |),
      |s AS (
      |  SELECT sc.doc_id, d.source, sc.n_tokens, sc.lm_score
      |  FROM scored sc JOIN documents d USING (doc_id)
      |),
      |-- explicit order statistics with Spark's exact interpolation
      |-- form a + f*(b-a) (exact when the brackets tie), NOT
      |-- quantile_cont: its (1-f)*a + f*b form drifts 1 ulp off a
      |-- tied bracket, flipping docs that sit exactly ON a threshold
      |-- (bit-for-bit at sf1, where ~90/150k rows tie the threshold).
      |-- CAST(p AS DOUBLE) keeps the position math off the DECIMAL
      |-- grid so frac matches Spark's double arithmetic bit-for-bit.
      |r AS (
      |  SELECT source, lm_score,
      |         row_number() OVER (PARTITION BY source ORDER BY lm_score) - 1
      |           AS rn,
      |         count(*) OVER (PARTITION BY source) AS n
      |  FROM s
      |),
      |th AS (
      |  SELECT source,
      |    max(CASE WHEN rn = CAST(floor(CAST(0.33 AS DOUBLE)*(n-1)) AS BIGINT)
      |             THEN lm_score END) AS lo33,
      |    max(CASE WHEN rn = CAST(ceil(CAST(0.33 AS DOUBLE)*(n-1)) AS BIGINT)
      |             THEN lm_score END) AS hi33,
      |    max(CASE WHEN rn = CAST(floor(CAST(0.67 AS DOUBLE)*(n-1)) AS BIGINT)
      |             THEN lm_score END) AS lo67,
      |    max(CASE WHEN rn = CAST(ceil(CAST(0.67 AS DOUBLE)*(n-1)) AS BIGINT)
      |             THEN lm_score END) AS hi67,
      |    any_value(CAST(0.33 AS DOUBLE)*(n-1)
      |              - floor(CAST(0.33 AS DOUBLE)*(n-1))) AS f33,
      |    any_value(CAST(0.67 AS DOUBLE)*(n-1)
      |              - floor(CAST(0.67 AS DOUBLE)*(n-1))) AS f67
      |  FROM r GROUP BY source
      |)
      |SELECT doc_id, source, n_tokens, lm_score,
      |       CASE WHEN lm_score >= lo67 + f67 * (hi67 - lo67) THEN 'head'
      |            WHEN lm_score >= lo33 + f33 * (hi33 - lo33) THEN 'middle'
      |            ELSE 'tail' END AS bucket
      |FROM s JOIN th USING (source) ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q221: seeded global shuffle into training shards — the pretraining
  // export permutation: sort key md5(seed || '_' || id), shard from the
  // key's md5-prefix value (the q64/q82 replayable-coin construction),
  // pos = rank within shard. One hash exchange + per-shard sort, never
  // a global sort.
  // -------------------------------------------------------------------
  def shuffleShards(s: SparkSession, d: String): DataFrame =
    graft.text.Curation.shuffleShards(docs(s, d), "doc_id",
        seed = 42L, nShards = 8)
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("shard", "pos")

  val shuffleShardsSql: String =
    """WITH k AS (
      |  SELECT doc_id, md5('42_' || doc_id::VARCHAR) AS key FROM documents
      |),
      |s AS (
      |  SELECT doc_id, key,
      |         ('0x' || substr(key, 1, 15))::BIGINT % 8 AS shard
      |  FROM k)
      |SELECT doc_id, shard,
      |       row_number() OVER (PARTITION BY shard ORDER BY key, doc_id)
      |         AS pos
      |FROM s ORDER BY shard, pos""".stripMargin

  // -------------------------------------------------------------------
  // q87: per-source quality cap — keep only the 5 highest-quality docs
  // per source (deterministic tie-break), the per-domain cap step of a
  // curation pipeline; compiles to partial+final WindowGroupLimit.
  // -------------------------------------------------------------------
  def bestPerSource(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d)
    val scored = base.select(col("doc_id"), col("source"))
      .join(TextOps.qualityScore(base, "doc_id", "text"), "doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("quality").desc, col("doc_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 5).drop("__rn")
      .orderBy("doc_id")
  }

  val bestPerSourceSql: String =
    s"""WITH q AS ($qualitySql),
      |j AS (
      |  SELECT d.doc_id, d.source, q.quality
      |  FROM documents d JOIN q ON d.doc_id = q.doc_id
      |)
      |SELECT doc_id, source, quality FROM j
      |QUALIFY row_number() OVER (PARTITION BY source
      |                           ORDER BY quality DESC, doc_id) <= 5
      |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q88: curation capstone — normalize -> Gopher repetition filter ->
  // keep-first exact dedup -> packing offsets, the full chain replayed
  // stage by stage in the oracle.
  // -------------------------------------------------------------------
  def curationPrep(s: SparkSession, d: String): DataFrame =
    graft.text.Corpus.curationPrep(docs(s, d), "doc_id", "text",
      maxDupGramFrac = 0.05, window = 512)
      .orderBy("doc_id")

  val curationPrepSql: String =
    """WITH norm AS (
      |  SELECT doc_id,
      |         trim(regexp_replace(regexp_replace(lower(text),
      |           '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS t
      |  FROM documents
      |),
      |tok AS (SELECT doc_id, string_split_regex(t, '\s+') AS w FROM norm),
      |grams AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(w)),
      |                                       i -> w[i] || ' ' || w[i+1])) AS g
      |  FROM tok WHERE len(w) >= 2
      |),
      |counts AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g),
      |keep AS (
      |  SELECT doc_id FROM counts GROUP BY doc_id
      |  HAVING round(1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
      |         <= 0.05
      |),
      |dedup AS (
      |  SELECT n.doc_id, n.t FROM norm n JOIN keep USING (doc_id)
      |  QUALIFY row_number() OVER (PARTITION BY n.t ORDER BY n.doc_id) = 1
      |),
      |sized AS (
      |  SELECT doc_id,
      |         CAST(len(string_split_regex(t, '\s+')) AS BIGINT) AS n_tokens
      |  FROM dedup
      |),
      |c AS (
      |  SELECT doc_id, n_tokens,
      |         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |           AS start_offset
      |  FROM sized
      |)
      |SELECT doc_id, n_tokens, start_offset,
      |       CAST(start_offset // 512 AS BIGINT) AS start_window,
      |       CAST((start_offset + n_tokens - 1) // 512 AS BIGINT) AS end_window
      |FROM c ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q200: vocabulary richness per source — token/type counts,
  // type-token ratio, hapax legomena (the corpus-health read-out).
  // -------------------------------------------------------------------
  def vocabRichness(s: SparkSession, d: String): DataFrame =
    TextOps.vocabularyRichness(docs(s, d), "source", "text")
      .orderBy("source")

  val vocabRichnessSql: String =
    """WITH tf AS (
      |  SELECT source AS g, tok, count(*) AS c
      |  FROM (SELECT source,
      |          unnest(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS tok
      |        FROM documents)
      |  WHERE tok <> '' GROUP BY 1, 2
      |)
      |SELECT g AS source, CAST(sum(c) AS BIGINT) AS n_tokens,
      |  count(*) AS n_types,
      |  round(count(*) * 1.0 / sum(c), 6) AS type_token_ratio,
      |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |  round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
      |    AS hapax_fraction
      |FROM tf GROUP BY 1 ORDER BY source""".stripMargin

  // -------------------------------------------------------------------
  // q201: Zipf rank-frequency slope per source — OLS of ln(freq) on
  // ln(rank) over each source's top-100 tokens, replayed through the
  // exact-integer sufficient-sum construction (the q174 formula).
  // -------------------------------------------------------------------
  def zipfSlopeQ(s: SparkSession, d: String): DataFrame =
    TextOps.zipfSlope(docs(s, d), "source", "text", topK = 100)
      .orderBy("source")

  val zipfSlopeSql: String =
    """WITH tf AS (
      |  SELECT source AS g, tok, count(*) AS c
      |  FROM (SELECT source,
      |          unnest(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS tok
      |        FROM documents)
      |  WHERE tok <> '' GROUP BY 1, 2
      |),
      |ranked AS (
      |  SELECT g, c, row_number() OVER (PARTITION BY g
      |           ORDER BY c DESC, tok) AS rn
      |  FROM tf QUALIFY rn <= 100
      |),
      |j AS (SELECT g,
      |        CAST(sign(ln(rn)) * floor(abs(ln(rn)) * 1e6 + 0.5)
      |             AS BIGINT) AS xi,
      |        CAST(sign(ln(c)) * floor(abs(ln(c)) * 1e6 + 0.5)
      |             AS BIGINT) AS yi
      |      FROM ranked),
      |a AS (SELECT g, count(*) AS n, sum(xi) AS sx, sum(yi) AS sy,
      |             sum(xi * xi) AS sxx, sum(xi * yi) AS sxy,
      |             sum(yi * yi) AS syy
      |      FROM j GROUP BY 1),
      |f AS (SELECT g, n,
      |        ((n * 1.0) * (sxy * 1.0) - (sx * 1.0) * (sy * 1.0))
      |          / ((n * 1.0) * (sxx * 1.0) - (sx * 1.0) * (sx * 1.0))
      |          * 1.0 AS slope,
      |        (n * 1.0) * (sxy * 1.0) - (sx * 1.0) * (sy * 1.0) AS covn,
      |        (n * 1.0) * (sxx * 1.0) - (sx * 1.0) * (sx * 1.0) AS varxn,
      |        (n * 1.0) * (syy * 1.0) - (sy * 1.0) * (sy * 1.0) AS varyn,
      |        sx * 1.0 AS sxd, sy * 1.0 AS syd
      |      FROM a WHERE n >= 2
      |        AND (n * 1.0) * (sxx * 1.0) - (sx * 1.0) * (sx * 1.0) > 0)
      |SELECT g AS source, n, round(slope, 9) AS slope,
      |  round(syd / ((n * 1.0) * 1000000.0)
      |        - slope * (sxd / ((n * 1.0) * 1000000.0)), 9) AS intercept,
      |  CASE WHEN varyn > 0
      |       THEN round(covn * covn / (varxn * varyn), 9) END AS r2
      |FROM f ORDER BY source""".stripMargin

  // -------------------------------------------------------------------
  // q216: Flesch-Kincaid readability per source — grade level from
  // whitespace words, [.!?]+ sentence runs, and vowel-group syllable
  // approximation (all integer counts, so the per-doc grade is a fixed
  // double formula both engines reproduce; source means ride
  // micro-unit integer sums).
  // -------------------------------------------------------------------
  def readability(s: SparkSession, d: String): DataFrame = {
    val words = size(split(trim(col("text")), "\\s+"))
    val sentences = greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
    val syllables = greatest(
      regexp_count(lower(col("text")), lit("[aeiouy]+")), lit(1))
    val base = docs(s, d).select(col("source"), words.as("__w"),
        sentences.as("__s"), syllables.as("__y"))
      .filter(col("__w") > 0)
    // FK grade = 0.39·(W/S) + 11.8·(Syl/W) − 15.59 (Kincaid 1975)
    val fk = lit(0.39) * (col("__w").cast("double") / col("__s")) +
      lit(11.8) * (col("__y").cast("double") / col("__w")) - lit(15.59)
    val wps = col("__w").cast("double") / col("__s")
    base
      // decimal sums: micro-unit totals of trillion-doc sources exceed
      // the long range
      .withColumn("__fki", graft.core.ExactSum.quantDec(fk))
      .withColumn("__wpsi", graft.core.ExactSum.quantDec(wps))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        round(sum(col("__fki")).cast("double") / 1e6 / count(lit(1)), 6)
          .as("mean_fk_grade"),
        round(sum(col("__wpsi")).cast("double") / 1e6 / count(lit(1)), 6)
          .as("mean_words_per_sentence"))
      .orderBy("source")
  }

  val readabilitySql: String =
    """WITH b AS (
      |  SELECT source,
      |    len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS w,
      |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
      |    greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS y
      |  FROM documents
      |),
      |q AS (
      |  SELECT source,
      |    CAST(sign(0.39 * ((w * 1.0) / s) + 11.8 * ((y * 1.0) / w)
      |              - 15.59)
      |         * floor(abs(0.39 * ((w * 1.0) / s) + 11.8 * ((y * 1.0) / w)
      |                     - 15.59) * 1e6 + 0.5) AS BIGINT) AS fki,
      |    CAST(sign((w * 1.0) / s)
      |         * floor(abs((w * 1.0) / s) * 1e6 + 0.5) AS BIGINT) AS wpsi
      |  FROM b WHERE w > 0
      |)
      |SELECT source, count(*) AS n_docs,
      |  round((sum(fki) * 1.0) / 1e6 / count(*), 6) AS mean_fk_grade,
      |  round((sum(wpsi) * 1.0) / 1e6 / count(*), 6)
      |    AS mean_words_per_sentence
      |FROM q GROUP BY 1 ORDER BY source""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q200_vocab_richness" -> (vocabRichness _),
    "q216_readability" -> (readability _),
    "q219_prefix_recall" -> (prefixRecall _),
    "q201_zipf_slope" -> (zipfSlopeQ _),
    "q66_dup_clusters" -> (dupClusters _),
    "q82_mix_sources" -> (mixBySource _),
    "q129_temperature_mix" -> (temperatureMixQ _),
    "q83_chunk_dup" -> (chunkDupStats _),
    "q98_line_dedup" -> (lineDedup _),
    "q99_dup_spans" -> (dupSpans _),
    "q109_self_line_dedup" -> (selfLineDedup _),
    "q110_fuzzy_dedup_apply" -> (fuzzyDedupApply _),
    "q118_pmi" -> (pmiTopK _),
    "q122_quality_model" -> (qualityLrDump _),
    "q123_quality_lr_scores" -> (qualityLrScores _),
    "q124_dedup_incremental" -> (dedupIncremental _),
    "q100_bm25" -> (bm25Search _),
    "q101_dsir" -> (dsirSelect _),
    "q84_unigram_lm" -> (unigramLm _),
    "q143_bigram_lm" -> (bigramLm _),
    "q148_tfidf_keywords" -> (tfidfKeywords _),
    "q149_source_kl" -> (sourceKl _),
    "q150_fightin_words" -> (fightinWords _),
    "q85_top_bigrams" -> (topBigrams _),
    "q154_gpt2_pretokens" -> (gpt2Pretokens _),
    "q86_normalize" -> (normalizeText _),
    "q92_nfc_normalize" -> (nfcNormalizeQuery _),
    "q93_semdedup_assign" -> (semDedupAssign _),
    "q94_semdedup_keep" -> (semDedupKeep _),
    "q102_pq_codebook" -> (pqCodebookDump _),
    "q106_bpe_merges" -> (bpeMerges _),
    "q107_bpe_segments" -> (bpeSegments _),
    "q108_bpe_stats" -> (bpeStats _),
    "q103_pq_codes" -> (pqCodesQuery _),
    "q104_pq_adc_topk" -> (pqAdcTopK _),
    "q134_hybrid_rrf" -> (hybridRrf _),
    "q130_ivfpq_coarse" -> (ivfpqCoarseDump _),
    "q131_ivfpq_codes" -> (ivfpqCodesQuery _),
    "q132_ivfpq_codebook" -> (ivfpqCodebookDump _),
    "q133_ivfpq_topk" -> (ivfpqTopK _),
    "q136_ivfpq_rerank" -> (ivfpqRerank _),
    "q95_ccnet_buckets" -> (ccnetBuckets _),
    "q221_shuffle_shards" -> (shuffleShards _),
    "q87_best_per_source" -> (bestPerSource _),
    "q88_curation_prep" -> (curationPrep _),
    "q80_pack_offsets" -> (packOffsets _),
    "q105_pack_sequences" -> (packSequences _),
    "q81_embed_quantize" -> (embedQuantize _),
    "q76_gopher_repetition" -> (gopherRepetition _),
    "q90_gopher_word" -> (gopherWord _),
    "q77_pii_redact" -> (piiRedact _),
    "q78_decontaminate" -> (decontaminate _),
    "q79_chunk_docs" -> (chunkDocs _),
    "q64_weighted_sample" -> (weightedSample _),
    "q65_bpe_tokens" -> (bpeTokens _),
    "q33_dedup_exact" -> (dedupExact _),
    "q34_dedup_near" -> (dedupNear _),
    "q35_ann_topk" -> (annTopK _),
    "q67_ivf_topk" -> (ivfTopK _),
    "q69_ngram_jaccard" -> (ngramJaccard _),
    "q222_pair_budget" -> (pairBudget _),
    "q71_corpus_prep" -> (corpusPrep _),
    "q40_simhash" -> (simhash _),
    "q41_embed_dedup" -> (embedDedup _),
    "q42_token_stats" -> (tokenStats _),
    "q43_lang_id" -> (langId _),
    "q44_quality" -> (quality _),
    "q45_fingerprint" -> (fingerprint _),
    "q46_char_ngrams" -> (charNgrams _),
    "q47_dedup_first" -> (dedupFirst _),
    "q60_simhash_near" -> (simhashNear _))

  val oracles: Map[String, String] = Map(
    "q200_vocab_richness" -> vocabRichnessSql,
    "q201_zipf_slope" -> zipfSlopeSql,
    "q216_readability" -> readabilitySql,
    "q219_prefix_recall" -> prefixRecallSql,
    "q66_dup_clusters" -> dupClustersSql,
    "q82_mix_sources" -> mixBySourceSql,
    "q129_temperature_mix" -> temperatureMixSql,
    "q83_chunk_dup" -> chunkDupStatsSql,
    "q98_line_dedup" -> lineDedupSql,
    "q99_dup_spans" -> dupSpansSql,
    "q109_self_line_dedup" -> selfLineDedupSql,
    "q110_fuzzy_dedup_apply" -> fuzzyDedupApplySql,
    "q118_pmi" -> pmiTopKSql,
    "q123_quality_lr_scores" -> qualityLrScoresSql,
    "q124_dedup_incremental" -> dedupIncrementalSql,
    "q100_bm25" -> bm25SearchSql,
    "q101_dsir" -> dsirSelectSql,
    "q84_unigram_lm" -> unigramLmSql,
    "q143_bigram_lm" -> bigramLmSql,
    "q148_tfidf_keywords" -> tfidfKeywordsSql,
    "q149_source_kl" -> sourceKlSql,
    "q150_fightin_words" -> fightinWordsSql,
    "q85_top_bigrams" -> topBigramsSql,
    "q154_gpt2_pretokens" -> gpt2PretokensSql,
    "q86_normalize" -> normalizeTextSql,
    "q92_nfc_normalize" -> nfcNormalizeSql,
    "q94_semdedup_keep" -> semDedupKeepSql,
    "q103_pq_codes" -> pqCodesSql,
    "q107_bpe_segments" -> bpeSegmentsSql,
    "q108_bpe_stats" -> bpeStatsSql,
    "q104_pq_adc_topk" -> pqAdcTopKSql,
    "q131_ivfpq_codes" -> ivfpqCodesSql,
    "q133_ivfpq_topk" -> ivfpqTopKSql,
    "q136_ivfpq_rerank" -> ivfpqRerankSql,
    "q134_hybrid_rrf" -> hybridRrfSql,
    "q95_ccnet_buckets" -> ccnetBucketsSql,
    "q221_shuffle_shards" -> shuffleShardsSql,
    "q87_best_per_source" -> bestPerSourceSql,
    "q88_curation_prep" -> curationPrepSql,
    "q80_pack_offsets" -> packOffsetsSql,
    "q105_pack_sequences" -> packSequencesSql,
    "q81_embed_quantize" -> embedQuantizeSql,
    "q76_gopher_repetition" -> gopherRepetitionSql,
    "q90_gopher_word" -> gopherWordSql,
    "q77_pii_redact" -> piiRedactSql,
    "q78_decontaminate" -> decontaminateSql,
    "q79_chunk_docs" -> chunkDocsSql,
    "q64_weighted_sample" -> weightedSampleSql,
    "q65_bpe_tokens" -> bpeTokensSql,
    "q33_dedup_exact" -> dedupExactSql,
    "q34_dedup_near" -> dedupNearSql,
    "q35_ann_topk" -> annTopKSql,
    "q67_ivf_topk" -> ivfTopKSql,
    "q69_ngram_jaccard" -> ngramJaccardSql,
    "q222_pair_budget" -> pairBudgetSql,
    "q71_corpus_prep" -> corpusPrepSql,
    "q40_simhash" -> simhashSql,
    "q41_embed_dedup" -> embedDedupSql,
    "q42_token_stats" -> tokenStatsSql,
    "q43_lang_id" -> langIdSql,
    "q44_quality" -> qualitySql,
    "q45_fingerprint" -> fingerprintSql,
    "q46_char_ngrams" -> charNgramsSql,
    "q47_dedup_first" -> dedupFirstSql,
    "q60_simhash_near" -> simhashNearSql)
}
