package graft.pipeline

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.io.{Hocon, Sources}
import graft.text.Curation

/** Entry point 3: `BuildCorpus` — the config-driven corpus-curation
  * pipeline, elevating the LLM-data operator families to the same
  * solution level as the reference's model pipeline
  * (create_solution.py's Luigi DAG shape applied to corpus prep):
  *
  *   NormalizeCorpus  (NFC + canonical form -> normalized/)
  *   QualityFilter    (Gopher word rules + repetition cap -> quality/)
  *   Deduplicate      (exact keep-first + MinHash near-dup -> deduped/)
  *   MixtureSampling  (optional source targets -> mixture/)
  *   PackOffsets      (GPT-style sequence packing -> packed/)
  *   CorpusStats      (per-source accounting + stage-count manifest)
  *
  * Same Pipeline file-target semantics as `Solution`: a stage whose
  * outputs exist is skipped wholesale (each parquet stage declares its
  * `_SUCCESS` marker), so a partially built corpus resumes from the
  * gap. Every stage body is an already-oracle-gated primitive; this
  * object only sequences and persists them — intermediate stages are
  * materialized BY DESIGN (each is a corpus a downstream consumer
  * reads; at 100 TB re-deriving the chain per consumer would dwarf the
  * storage cost, and Luigi's resume contract needs the files anyway).
  */
object CorpusSolution {

  final case class CorpusResult(
      report: Pipeline.Report, outputDir: String, stats: DataFrame)

  def buildCorpus(spark: SparkSession, projectLocation: String,
      configDirectory: String, configFile: String): CorpusResult = {
    val cfg = Hocon.parseFile(
      Paths.get(projectLocation, configDirectory, configFile).toString)
    val base = "corpus_pipeline"
    val idCol = cfg.getString(s"$base.input.id_column")
    val textCol = cfg.getString(s"$base.input.text_column")
    val srcCol = cfg.getString(s"$base.input.source_column")
    val inputPath = cfg.getString(s"$base.input.parquet")
    val out = Paths.get(projectLocation, "corpus_preparation",
      cfg.getString(s"$base.output_dirname")).toString

    def flag(path: String, default: Boolean): Boolean =
      if (cfg.has(path)) cfg.getBool(path) else default
    def num(path: String, default: Double): Double =
      if (cfg.has(path)) cfg.getDouble(path) else default

    val nfc = flag(s"$base.normalize.nfc", default = true)
    val gopherRules = flag(s"$base.quality.gopher_word_rules", default = true)
    val minWords = num(s"$base.quality.min_words", 50).toLong
    val maxDupGramFrac = num(s"$base.quality.max_dup_gram_frac", 0.3)
    val nearDupThreshold = num(s"$base.dedup.near_dup_threshold", 0.5)
    val runMixture = flag(s"$base.mixture.run", default = false)
    val packWindow = num(s"$base.pack.window", 512).toInt

    def read(dir: String): DataFrame = spark.read.parquet(s"$out/$dir")
    def task(name: String, dir: String, deps: Seq[Pipeline.Task])(
        body: => DataFrame): Pipeline.Task =
      Pipeline.Task(name, Seq(s"$out/$dir/_SUCCESS"), deps)(() =>
        body.write.mode("overwrite").parquet(s"$out/$dir"))

    val normalize = task("NormalizeCorpus", "normalized", Seq.empty) {
      val docs = spark.read.parquet(inputPath)
      docs.select(col(idCol), col(srcCol))
        .join(Curation.normalizeText(docs, idCol, textCol, nfc)
          .select(col(idCol), col("normalized").as(textCol)), Seq(idCol))
    }

    val quality = task("QualityFilter", "quality", Seq(normalize)) {
      val docs = read("normalized")
      val word = Curation.wordQualityStats(docs, idCol, textCol)
      val wordKeep = (
        if (gopherRules) word.filter(col("passes_gopher_word"))
        else word.filter(col("n_words") >= minWords)).select(idCol)
      val repKeep = Curation.repetitionStats(docs, idCol, textCol, n = 2)
        .filter(col("dup_gram_frac") <= maxDupGramFrac).select(idCol)
      docs.join(wordKeep, Seq(idCol)).join(repKeep, Seq(idCol))
    }

    // The near-dup stage runs the LOUD variant and persists the skew
    // guard's (n_groups_dropped, n_rows_dropped) accounting NEXT TO the
    // corpus it describes: a production run must not require callers to
    // know the WithStats face exists to learn the cap dropped buckets.
    // Both parquet targets are declared, so the file-target resume
    // contract is unchanged — a rerun skips only when corpus AND stats
    // landed. The stats frame is one literal row (collected eagerly
    // inside the WithStats call, which also warns before the candidate
    // join is paid), so the extra write is a metadata-cost artifact.
    val dedup = Pipeline.Task("Deduplicate",
        Seq(s"$out/deduped/_SUCCESS", s"$out/deduped_drop_stats/_SUCCESS"),
        Seq(quality))(() => {
      val docs = read("quality")
      val exact = Dedup.keepFirst(docs, Seq(textCol), Seq(col(idCol)))
      val (pairs, dropStats) = Dedup.minHashNearDupWithStats(
        exact, idCol, textCol, nearDupThreshold)
      dropStats.write.mode("overwrite").parquet(s"$out/deduped_drop_stats")
      exact.join(pairs.select(col("id_2").as(idCol)).distinct(),
          Seq(idCol), "left_anti")
        .write.mode("overwrite").parquet(s"$out/deduped")
    })

    val mixture =
      if (!runMixture) None
      else Some(task("MixtureSampling", "mixture", Seq(dedup)) {
        val docs = read("deduped")
        // mode "targets": explicit per-source token proportions;
        // mode "temperature": q_i ∝ share^alpha flattening (q129's
        // operator) — no target map needed, one knob.
        val mode =
          if (cfg.has(s"$base.mixture.mode")) cfg.getString(s"$base.mixture.mode")
          else "targets"
        val kept = mode match {
          case "temperature" =>
            Curation.temperatureMix(docs, idCol, textCol, srcCol,
              alpha = num(s"$base.mixture.alpha", 0.5))
          case "targets" =>
            val targets = cfg.getConfig(s"$base.mixture.targets").root.fields
              .collect { case (k, Hocon.Num(d, _)) => k -> d }.toMap
            Curation.mixBySource(docs, idCol, textCol, srcCol, targets)
          case other => throw new IllegalArgumentException(
            s"$base.mixture.mode: unknown mode '$other'")
        }
        // both emit the kept MEMBERSHIP (id, source, n_tokens, ...);
        // join back so the stage output is a corpus like every other
        docs.join(kept.select(idCol), Seq(idCol))
      })

    val packInput = mixture.map(_ => "mixture").getOrElse("deduped")
    val pack = task("PackOffsets", "packed",
        Seq(mixture.getOrElse(dedup))) {
      Curation.packOffsets(read(packInput), idCol, textCol, packWindow)
    }

    // Optional distribution-QA report over the deduped corpus: per
    // source, the KL divergence from the corpus token distribution
    // (the mixture-weight review signal) and the mean stupid-backoff
    // LM score (the perplexity-style quality signal). A parallel leaf
    // stage — it gates nothing and reuses the oracle-gated primitives.
    val runDiagnostics = flag(s"$base.diagnostics.run", default = false)
    val diagnostics =
      if (!runDiagnostics) None
      else Some(task("CorpusDiagnostics", "diagnostics", Seq(dedup)) {
        val docs = read("deduped")
        val kl = Curation.groupKlDivergence(docs, srcCol, textCol)
        val lmBySrc = docs.select(col(idCol), col(srcCol))
          .join(Curation.bigramLogProb(docs, idCol, textCol), Seq(idCol))
          .groupBy(col(srcCol))
          .agg(round(avg(col("sb_score")), 6).as("mean_sb_score"))
        kl.join(lmBySrc, Seq(srcCol), "left")
      })

    val statsTask = Pipeline.Task("CorpusStats",
        Seq(s"$out/stats/_SUCCESS", s"$out/corpus_stats.json"),
        Seq(pack) ++ diagnostics)(() => {
      val corpus = read(packInput)
      corpus.select(col(srcCol),
          size(graft.text.TextOps.tokens(col(textCol))).as("__nt"))
        .groupBy(srcCol)
        .agg(count(lit(1)).as("n_docs"), sum("__nt").as("total_tokens"))
        .orderBy(srcCol)
        .write.mode("overwrite").parquet(s"$out/stats")
      val stageCounts = (Seq("normalized", "quality", "deduped") ++
        mixture.map(_ => "mixture") ++
        diagnostics.map(_ => "diagnostics") :+ "packed")
        .map(d => d -> read(d).count().toString)
      Sources.writeJsonManifest(s"$out/corpus_stats.json", stageCounts.toMap)
    })

    val report = Pipeline.execute(statsTask)
    CorpusResult(report, out, read("stats"))
  }
}
