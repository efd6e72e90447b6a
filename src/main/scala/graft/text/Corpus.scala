package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** The north-star composition: end-to-end training-corpus preparation
  * over a documents table, chaining the LLM-data operator families into
  * the pipeline a 100 TB pre-training data job actually runs —
  * language filter → quality filter → exact dedup → near-dup removal →
  * per-source accounting. Every stage is the already-tested primitive;
  * this object only sequences them, keeping the whole plan lazy so
  * Catalyst fuses the filters into the scan.
  */
object Corpus {

  /** Result: `corpus` = cleaned documents (original columns);
    * `stats` = per-source (n_docs, total_tokens) accounting table. */
  final case class PrepResult(corpus: DataFrame, stats: DataFrame)

  /** @param langs       metadata languages to keep
    * @param minQuality  TextOps.qualityScore threshold in [0,1]
    * @param jaccard     word-3-shingle MinHash near-dup threshold;
    *                    of each near-dup pair the smaller doc_id wins
    *                    (canonical-representative contract shared with
    *                    Dedup.duplicateClusters)
    */
  def prepare(docs: DataFrame, idCol: String, textCol: String,
      langs: Seq[String], minQuality: Double,
      jaccard: Double = 0.5): PrepResult = {
    val byLang = docs.filter(col("lang").isin(langs: _*))
    val quality = TextOps.qualityScore(byLang, idCol, textCol)
    val kept = byLang.join(
      quality.filter(col("quality") >= minQuality).select(idCol), Seq(idCol))

    // exact dedup with a deterministic representative: smallest id per
    // distinct content (hash-partitioned window, no global sort)
    val exact = Dedup.keepFirst(kept, Seq(textCol), Seq(col(idCol)))

    // near-dup removal on the exact-deduped corpus: each qualifying
    // pair (id_1 < id_2) drops its larger side
    val pairs = Dedup.minHashNearDup(exact, idCol, textCol, jaccard)
    val corpus = exact.join(
      pairs.select(col("id_2").as(idCol)).distinct(), Seq(idCol), "left_anti")

    val stats = corpus
      .select(col("source"), size(Dedup.tokens(col(textCol))).as("__nt"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("__nt").as("total_tokens"))
      .orderBy("source")
    PrepResult(corpus, stats)
  }

  /** The incremental slice of `prepare` for a document STREAM: the
    * stateless stages (language + quality filters) apply per
    * micro-batch unchanged, and exact dedup becomes
    * `dropDuplicatesWithinWatermark` on the text — first arrival wins
    * within the event-time horizon, the streaming analogue of
    * keepFirst's smallest-id representative when ids arrive in order.
    * Near-dup LSH stays a batch compaction pass over the accumulated
    * corpus (its candidate generation needs corpus-wide bucket joins);
    * PipelineStreamingSpec asserts stream==batch on these stages at
    * watermark close. */
  def prepareStream(docs: DataFrame, textCol: String, tsCol: String,
      langs: Seq[String], minQuality: Double,
      watermark: String = "1 hour"): DataFrame = {
    val keep = docs.columns.map(col).toSeq
    docs.filter(col("lang").isin(langs: _*))
      .withColumn("__t", trim(col(textCol)))
      .withColumn("__w", TextOps.tokens(col(textCol)))
      .filter(TextOps.qualityCol(col("__t"), col("__w")) >= minQuality)
      .select(keep: _*)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(textCol)
  }

  /** Round-6 capstone composition: the curation-side preparation a
    * tokenizer-bound corpus runs AFTER language/quality selection —
    * canonical-form normalization (Curation.normalizeText), the Gopher
    * duplicate-bigram repetition filter (Rae et al. 2021 A1.1),
    * exact dedup on the normalized text (keep-first by id so the
    * representative is deterministic), and GPT-style sequence-packing
    * offsets over what survives. Each stage is the already-oracle-
    * gated primitive; this function only sequences them, and the q88
    * oracle replays the full chain stage by stage.
    *
    * @param maxDupGramFrac Gopher duplicate-bigram-fraction cap;
    *                       documents above it are dropped
    * @param window         packing window in tokens
    */
  def curationPrep(docs: DataFrame, idCol: String, textCol: String,
      maxDupGramFrac: Double = 0.05, window: Int = 512): DataFrame = {
    val norm = Curation.normalizeText(docs, idCol, textCol)
      .select(col(idCol), col("normalized").as(textCol))
    val keepIds = Curation.repetitionStats(norm, idCol, textCol, n = 2)
      .filter(col("dup_gram_frac") <= maxDupGramFrac)
      .select(col(idCol))
    val kept = norm.join(keepIds, idCol)
    val deduped = Dedup.keepFirst(kept, Seq(textCol), Seq(col(idCol)))
    Curation.packOffsets(deduped, idCol, textCol, window)
  }
}
