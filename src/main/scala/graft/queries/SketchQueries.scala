package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Driver-checked queries for the approximate/sketch operator family:
  * HyperLogLog++ distinct counts, quantile sketches, and the Bloom
  * runtime-filter decontamination path.
  *
  * Sketch outputs are approximate, so the oracle pattern differs from
  * the exact queries: the Spark side computes BOTH the exact value and
  * the sketch's published error-bound check, and emits the exact value
  * plus the boolean; the DuckDB oracle recomputes the exact value and
  * emits the boolean as `true`. A sketch that ever violates its bound
  * flips the boolean and fails the hash compare — the bound itself is
  * the oracled property (the q52 invariant-oracle pattern). At 100 TB
  * these sketches replace exact distinct/percentile shuffles with
  * mergeable fixed-size state — the only way those statistics are
  * computable at all on a 1000-executor corpus scan.
  */
object SketchQueries {

  // -------------------------------------------------------------------
  // q114: per-source distinct-token cardinality — HLL++ estimate
  // (rsd 2%) checked against the exact distinct count at 5 sigma.
  // -------------------------------------------------------------------
  def hllDistinct(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"),
        explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      .groupBy("source")
      .agg(
        countDistinct(col("tok")).as("exact_distinct"),
        approx_count_distinct(col("tok"), 0.02).as("__est"))
      .select(col("source"), col("exact_distinct"),
        (abs(col("__est") - col("exact_distinct")) <=
          col("exact_distinct") * 0.1).as("hll_ok"))
      .orderBy("source")

  val hllDistinctSql: String =
    """WITH tok AS (
      |  SELECT source, unnest(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS tok
      |  FROM documents
      |)
      |SELECT source, count(DISTINCT tok) AS exact_distinct, true AS hll_ok
      |FROM tok GROUP BY source ORDER BY source""".stripMargin

  // -------------------------------------------------------------------
  // q115: per-type median sketch — approx_percentile at accuracy 10k
  // guarantees rank error <= n/10000; the check brackets the exact
  // rank interval of the returned value around n/2 (lower rank counts
  // strict-less, upper rank counts <=, so ties are handled exactly).
  // -------------------------------------------------------------------
  def quantileSketch(s: SparkSession, d: String): DataFrame = {
    val ev = graft.streaming.Events.normalize(Tables.events(s, d))
    val sk = ev.groupBy("event_type")
      .agg(approx_percentile(col("value"), lit(0.5), lit(10000)).as("__a"))
    ev.join(broadcast(sk), Seq("event_type"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("value") < col("__a"), 1L).otherwise(0L)).as("__lo"),
        sum(when(col("value") <= col("__a"), 1L).otherwise(0L)).as("__hi"))
      .select(col("event_type"), col("n"),
        (col("__lo") <= col("n") / 2 + col("n") / 10000 + 1 &&
          col("__hi") >= col("n") / 2 - col("n") / 10000 - 1).as("rank_ok"))
      .orderBy("event_type")
  }

  val quantileSketchSql: String =
    """SELECT event_type, count(*) AS n, true AS rank_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------------
  // q116: Bloom-prefiltered decontamination — same inputs and oracle
  // as q78 (the Bloom pass cannot change the verified output), but the
  // corpus gram stream is pruned inside the scan by the native
  // bloom_might_contain probe before the distinct+join shuffle.
  // -------------------------------------------------------------------
  def bloomDecontaminate(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
    graft.text.Curation.decontaminateBloom(
      base.filter(col("doc_id") % 50 =!= 0),
      base.filter(col("doc_id") % 50 === 0),
      "doc_id", "text", n = 8)
      .orderBy("doc_id")
  }

  val bloomDecontaminateSql: String = LlmQueries.decontaminateSql

  // -------------------------------------------------------------------
  // q119: exact heavy hitters (freq >= 0.1%) — Misra-Gries candidate
  // pass + exact broadcast-filtered recount; the no-false-negative
  // guarantee makes the output EXACTLY the naive full-count answer,
  // which is the oracle.
  // -------------------------------------------------------------------
  def heavyHitters(s: SparkSession, d: String): DataFrame =
    graft.text.TextOps.heavyHitters(Tables.documents(s, d), "text", phi = 0.001)

  val heavyHittersSql: String =
    """WITH tok AS (
      |  SELECT unnest(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS token
      |  FROM documents
      |),
      |tot AS (SELECT count(*) AS n FROM tok)
      |SELECT token, count(*) AS cnt
      |FROM tok, tot
      |GROUP BY token, n
      |HAVING count(*) >= 0.001 * n
      |ORDER BY cnt DESC, token""".stripMargin

  // -------------------------------------------------------------------
  // q128: per-group exact heavy hitters — dominant tokens per source
  // from per-group Misra-Gries candidate summaries + an exact recount
  // of candidates only. The oracle is the naive full per-group
  // frequency count; the MG no-false-negative guarantee makes the
  // two-pass plan EXACTLY that answer, with groups x capacity state
  // instead of a vocabulary-wide shuffle.
  // -------------------------------------------------------------------
  def groupHeavyHitters(s: SparkSession, d: String): DataFrame =
    graft.text.TextOps.groupHeavyHitters(
      Tables.documents(s, d), "source", "text", phi = 0.002)

  val groupHeavyHittersSql: String =
    """WITH tok AS (
      |  SELECT source, unnest(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS token
      |  FROM documents
      |),
      |tot AS (SELECT source, count(*) AS n FROM tok GROUP BY source)
      |SELECT t.source, token, count(*) AS cnt
      |FROM tok t JOIN tot USING (source)
      |GROUP BY t.source, token, n
      |HAVING count(*) >= 0.002 * n
      |ORDER BY source, cnt DESC, token""".stripMargin

  // -------------------------------------------------------------------
  // q146: count-min sketch point queries — the top-20 exact tokens
  // estimated from a (3 x 64) CMS. Unlike q114/q115 the oracle is NOT
  // a bound check: the md5-prefix hash family lets DuckDB rebuild the
  // ENTIRE sketch and every estimate exactly, so the full approximate
  // answer (including its collision overcounts) is hash-compared.
  // -------------------------------------------------------------------
  def cmsEstimates(s: SparkSession, d: String): DataFrame = {
    import graft.ops.Cms
    val tok = Tables.documents(s, d)
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("w"))
    val sk = Cms.sketch(tok, "w", depth = 3, width = 64)
    val top = tok.groupBy("w").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(desc("exact_cnt"), asc("w")).limit(20)
    Cms.estimate(sk, top, "w", depth = 3, width = 64)
      .withColumnRenamed("w", "token")
      .select(col("token"), col("exact_cnt"), col("cms_estimate"))
      .orderBy(desc("exact_cnt"), asc("token"))
  }

  val cmsEstimatesSql: String =
    """WITH tok AS (
      |  SELECT unnest(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS w
      |  FROM documents
      |),
      |rb AS (
      |  SELECT w, r,
      |    ('0x' || substr(md5(r::VARCHAR || ':' || w), 1, 15))::BIGINT % 64 AS b
      |  FROM tok, range(3) t(r)
      |),
      |sk AS (SELECT r, b, count(*) AS c FROM rb GROUP BY 1, 2),
      |top AS (
      |  SELECT w, count(*) AS exact_cnt FROM tok
      |  GROUP BY w ORDER BY exact_cnt DESC, w LIMIT 20
      |),
      |kb AS (
      |  SELECT w, exact_cnt, r,
      |    ('0x' || substr(md5(r::VARCHAR || ':' || w), 1, 15))::BIGINT % 64 AS b
      |  FROM top, range(3) t(r)
      |)
      |SELECT kb.w AS token, kb.exact_cnt, min(sk.c) AS cms_estimate
      |FROM kb JOIN sk USING (r, b)
      |GROUP BY 1, 2
      |ORDER BY exact_cnt DESC, token""".stripMargin

  // -------------------------------------------------------------------
  // q120/q121: PCA — q120 dumps the trained component matrix
  // (model-driven → rows-only, the q102 pattern); q121's oracle
  // replays the projection of every embedding from the dump.
  // -------------------------------------------------------------------
  private def pcaComponents(s: SparkSession, d: String): DataFrame =
    graft.core.Memo.getOrElseUpdate(
        s"pca_components:${s.sparkContext.applicationId}:$d") {
      graft.sim.Pca.fit(Tables.embeddings(s, d), "embedding", k = 8)
        .localCheckpoint(false)
    }

  /** Component dump exploded to scalar rows (pc, explained_variance,
    * pos, w): the driver's checker canon-sorts dumps and crashes on
    * array cells, so the weight vector is flattened here and rebuilt
    * with `list(w ORDER BY pos)` in q121's oracle SQL. */
  def pcaComponentsDump(s: SparkSession, d: String): DataFrame =
    pcaComponents(s, d)
      .select(col("pc"), col("explained_variance"),
        posexplode(col("warr")).as(Seq("pos", "w")))
      .orderBy("pc", "pos")

  def pcaProject(s: SparkSession, d: String): DataFrame =
    graft.sim.Pca.project(Tables.embeddings(s, d), pcaComponents(s, d),
        "vec_id", "embedding")
      .orderBy("vec_id", "pc")

  val pcaProjectSql: String =
    """WITH c AS (
      |  SELECT pc, list(w ORDER BY pos) AS warr
      |  FROM read_parquet('__VERIFY_OUT__/q120_pca_components/*.parquet')
      |  GROUP BY pc
      |),
      |e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings)
      |SELECT e.vec_id, c.pc,
      |  round(list_sum(list_transform(range(1, len(x) + 1),
      |    i -> x[i] * warr[i])), 6) AS proj
      |FROM e CROSS JOIN c
      |ORDER BY vec_id, pc""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q120_pca_components" -> (pcaComponentsDump _),
    "q121_pca_project" -> (pcaProject _),
    "q114_hll_distinct" -> (hllDistinct _),
    "q115_quantile_sketch" -> (quantileSketch _),
    "q116_bloom_decontaminate" -> (bloomDecontaminate _),
    "q119_heavy_hitters" -> (heavyHitters _),
    "q146_cms_estimates" -> (cmsEstimates _),
    "q128_group_heavy_hitters" -> (groupHeavyHitters _))

  val oracles: Map[String, String] = Map(
    "q121_pca_project" -> pcaProjectSql,
    "q114_hll_distinct" -> hllDistinctSql,
    "q115_quantile_sketch" -> quantileSketchSql,
    "q116_bloom_decontaminate" -> bloomDecontaminateSql,
    "q119_heavy_hitters" -> heavyHittersSql,
    "q146_cms_estimates" -> cmsEstimatesSql,
    "q128_group_heavy_hitters" -> groupHeavyHittersSql)
}
