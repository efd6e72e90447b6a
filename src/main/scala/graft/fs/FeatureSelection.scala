package graft.fs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.cv.CrossValidation
import graft.cv.CrossValidation.CvConfig
import graft.ml.ModelWrapper

/** M10: feature selection by target permutation — the Spark-first
  * re-expression of modeling/feature_selection.py:64-480
  * (`FeatureSelectorByTargetPermutation`): actual-importance fit,
  * null-importance distribution over shuffled targets (A15), feature
  * scoring (A16), threshold-sweep CV (A17), and rank-based best
  * threshold (W1).
  *
  * Differences, documented: the explorer model is any tree
  * `ModelWrapper` (MLlib featureImportances) instead of LightGBM in RF
  * mode, and MLlib exposes ONE importance vector, so gain/split carry
  * the same values (the reference records both lgbm importance types,
  * feature_selection.py:166-168). The target shuffle is seeded for
  * testability where the reference is unseeded (R1 deviation, SURVEY
  * §7.4.7).
  */
object FeatureSelection {

  /** R1: random permutation of one column's values across rows,
    * seeded and partition-safe: both sides get a dense index from a
    * range-partitioned sort (no single-partition window), then re-join
    * on the index. The index is the `monotonically_increasing_id`
    * partition-local counter plus a broadcast per-partition offset from
    * a bounded collected count — the same no-window, no-RDD prefix-sum
    * idiom as `Folds.assign` (the earlier zipWithIndex formulation paid
    * an RDD round-trip that broke codegen). */
  def shuffleColumn(df: DataFrame, c: String, seed: Long): DataFrame = {
    val others = df.drop(c)
    val rest = indexed(others,
      xxhash64((lit(seed) +: lit("rows") +: others.columns.map(col)): _*))
    val vals = indexed(df.select(c), xxhash64(lit(seed), lit("vals"), col(c)))
    rest.join(vals, Seq("__idx")).drop("__idx")
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Repeated permutations of the same column (the A15 null-importance
    * loop): the row side is indexed ONCE with a seed-independent key
    * and reused across every run — the composed permutation
    * rowOrder ∘ valsOrder(seed)⁻¹ is (re-)randomized entirely by the
    * per-seed value side, so each run pays one range shuffle of ONE
    * column instead of two of the whole frame. */
  def shuffleColumnRuns(df: DataFrame, c: String, seeds: Seq[Long]): Seq[DataFrame] = {
    val others = df.drop(c)
    val rest = indexed(others,
      xxhash64((lit("rows") +: others.columns.map(col)): _*))
    seeds.map { s =>
      val vals = indexed(df.select(c), xxhash64(lit(s), lit("vals"), col(c)))
      rest.join(vals, Seq("__idx")).drop("__idx")
        .select(df.columns.map(col).toIndexedSeq: _*)
    }
  }

  /** Dense 0..n-1 index in `orderKey` order: range-partitioned sort,
    * partition-local position from `monotonically_increasing_id`'s low
    * bits, broadcast per-partition offsets from a bounded collected
    * count — no RDD hop, no window (same idiom as Folds.assign). */
  private def indexed(in: DataFrame, orderKey: Column): DataFrame = {
    val spark = in.sparkSession
    import spark.implicits._
    val parts = in.withColumn("__k", orderKey)
      .repartitionByRange(col("__k")).sortWithinPartitions(col("__k"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
      // lazy: the counts collect materializes it (one job, not two);
      // blocks are pinned so __mid is consistent for all consumers
      .localCheckpoint(false)
    val counts = parts.groupBy("__pid")
      .agg(count(lit(1)).as("__n"), min("__mid").as("__m"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    var acc = 0L
    val adj = counts.sortBy(_._1).map { case (pid, n, m) =>
      val o = acc; acc += n; (pid, o - m)
    }.toSeq
    parts.join(broadcast(adj.toDF("__apid", "__adj")),
        col("__pid") === col("__apid"))
      .withColumn("__idx", col("__mid") + col("__adj"))
      .drop("__k", "__pid", "__mid", "__apid", "__adj")
  }

  /** One explorer fit → (feature, importance_gain, importance_split)
    * (feature_selection.py:124-170). `shuffleSeed` Some(s) permutes the
    * target first (null-importance run). */
  def importancesOnce(
      train: DataFrame, features: Seq[String], target: String,
      model: ModelWrapper, seed: Long, shuffleSeed: Option[Long]): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val frame = shuffleSeed.fold(train)(s => shuffleColumn(train, target, s))
    val fitted = model.fit(frame, None, features, target, seed)
    val imps = fitted.featureImportances.getOrElse(
      throw new IllegalArgumentException(s"${model.name} has no feature importances"))
    imps.toDF("feature", "importance_gain")
      .withColumn("importance_split", col("importance_gain"))
  }

  /** A15: the null-importance distribution — nbRuns explorer fits on
    * shuffled targets, tagged by run (feature_selection.py:183-198).
    * Permutations come from `shuffleColumnRuns`, so the feature side is
    * indexed once across all runs. */
  def nullImportances(
      train: DataFrame, features: Seq[String], target: String,
      model: ModelWrapper, seed: Long, nbRuns: Int): DataFrame = {
    val frames = shuffleColumnRuns(train, target, (1 to nbRuns).map(seed + _))
    // Independent explorer fits run concurrently (graft.core.Par);
    // each run's permutation frame is already built, so only the
    // blocking fit overlaps. Output order is preserved.
    graft.core.Par.mapPar(frames.zipWithIndex) { case (frame, i) =>
      importancesOnce(frame, features, target, model, seed, shuffleSeed = None)
        .withColumn("run", lit(i + 1))
    }.reduce(_ unionByName _)
  }

  /** The actual-importance fit (run 0) and the A15 null runs (1..nbRuns)
    * in ONE concurrent fan-out: the actual fit is independent of every
    * null fit, so running it first serialized one fit-duration behind
    * the pool for no reason (round-18; the per-fit fixed overhead is
    * the measured cost of this family). Row-for-row identical to
    * `importancesOnce(...).withColumn("run", 0) unionByName
    * nullImportances(...)`. */
  def importancesWithNulls(
      train: DataFrame, features: Seq[String], target: String,
      model: ModelWrapper, seed: Long, nbRuns: Int): DataFrame = {
    val frames =
      train +: shuffleColumnRuns(train, target, (1 to nbRuns).map(seed + _))
    graft.core.Par.mapPar(frames.zipWithIndex) { case (frame, i) =>
      importancesOnce(frame, features, target, model, seed, shuffleSeed = None)
        .withColumn("run", lit(i))
    }.reduce(_ unionByName _)
  }

  /** A16 default scoring function: log(1e-10 + act_mean /
    * (1 + percentile75(null))) (feature_selection.py:225-227). */
  def score(actMean: Column, nullP75: Column): Column =
    log(lit(1e-10) + actMean / (lit(1) + nullP75))

  /** A16 alternative: fraction of null importances strictly below the
    * actual mean ("samples away from the null distribution"). */
  def scoreByNullCount(actual: DataFrame, nulls: DataFrame): DataFrame = {
    val act = actual.groupBy("feature").agg(
      avg("importance_gain").as("act_gain"), avg("importance_split").as("act_split"))
    nulls.join(act, Seq("feature"))
      .groupBy("feature")
      .agg(
        round(avg((col("importance_gain") < col("act_gain")).cast("double")), 6).as("gain_score"),
        round(avg((col("importance_split") < col("act_split")).cast("double")), 6).as("split_score"))
      .orderBy("gain_score", "split_score", "feature")
  }

  /** A16: score every feature against its null distribution —
    * one aggregation per side, joined on feature
    * (feature_selection.py:200-233; sorted like its final frame). */
  def scoreFeatures(actual: DataFrame, nulls: DataFrame): DataFrame = {
    val act = actual.groupBy("feature").agg(
      avg("importance_gain").as("act_gain"), avg("importance_split").as("act_split"))
    val nul = nulls.groupBy("feature").agg(
      expr("percentile(importance_gain, 0.75)").as("null_gain_p75"),
      expr("percentile(importance_split, 0.75)").as("null_split_p75"))
    act.join(nul, Seq("feature"))
      .select(col("feature"),
        round(score(col("act_gain"), col("null_gain_p75")), 6).as("gain_score"),
        round(score(col("act_split"), col("null_split_p75")), 6).as("split_score"))
      .orderBy("gain_score", "split_score", "feature")
  }

  /** A17: CV score per score-threshold: for each threshold keep
    * features scoring >= t, run k-fold CV, record (threshold,
    * cv_bst_score, cv_std_bst_score, n_features)
    * (feature_selection.py:235-312, with our CV engine in the role of
    * lgbm.cv). */
  def thresholdSweep(
      train: DataFrame, target: String, idCol: String,
      scores: DataFrame, thresholds: Seq[Double],
      model: ModelWrapper, cvCfg: CvConfig, seed: Long,
      scoreCol: String = "gain_score"): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val scored = scores.select("feature", scoreCol).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    // per-threshold CVs are independent seeded fits — run them from
    // the bounded driver pool so the fixed multi-job overhead of each
    // fit overlaps (the round-7 Par pattern; the inner fold loop
    // detects the nesting and runs sequentially on the worker thread,
    // results return in input order, output bit-identical)
    val rows = graft.core.Par.mapPar(thresholds) { t =>
      val feats = scored.filter(_._2 >= t).map(_._1).toSeq.sorted
      require(feats.nonEmpty, s"threshold $t leaves no features")
      val r = CrossValidation.runCvOneSeed(
        train, None, feats, target, idCol, model, cvCfg, seed)
      (t, r.cvScore, r.cvStd, feats.size)
    }
    rows.toDF("threshold", "cv_bst_score", "cv_std_bst_score", "n_features")
  }

  /** W1: rank thresholds by (cv score asc-rank) + (cv std desc-rank),
    * best = argmax of the total rank with numpy-argmax first-occurrence
    * tie-break over the threshold-sorted frame
    * (feature_selection.py:314-340). Returns the rank table; the window
    * input is the sweep result — a handful of rows. */
  def rankThresholds(sweep: DataFrame): DataFrame = {
    val byScore = Window.orderBy(col("cv_bst_score").asc)
    val byStd = Window.orderBy(col("cv_std_bst_score").desc)
    sweep
      .withColumn("cv_bst_score_rank", rank().over(byScore).cast("long"))
      .withColumn("cv_std_bst_score_rank", rank().over(byStd).cast("long"))
      .withColumn("total_rank", col("cv_bst_score_rank") + col("cv_std_bst_score_rank"))
      .orderBy("threshold")
  }

  /** Best threshold = first (lowest) threshold achieving the max total
    * rank (np.argmax first-occurrence semantics). */
  def bestThreshold(ranked: DataFrame): Double = {
    val r = ranked.orderBy(col("total_rank").desc, col("threshold").asc)
      .select("threshold").head()
    r.getDouble(0)
  }

  /** End-to-end M10: returns (selected features, scores table, sweep
    * rank table) — feature list ready for the S4 JSON sink. */
  def selectFeatures(
      train: DataFrame, features: Seq[String], target: String, idCol: String,
      explorer: ModelWrapper, cvModel: ModelWrapper, cvCfg: CvConfig,
      seed: Long, nbRuns: Int, thresholds: Seq[Double]): (Seq[String], DataFrame, DataFrame) = {
    val actual = importancesOnce(train, features, target, explorer, seed, None)
    val nulls = nullImportances(train, features, target, explorer, seed, nbRuns)
    val scores = scoreFeatures(actual, nulls).cache()
    val sweep = thresholdSweep(train, target, idCol, scores, thresholds, cvModel, cvCfg, seed)
    val ranked = rankThresholds(sweep)
    val best = bestThreshold(ranked)
    val feats = scores.filter(col("gain_score") >= best)
      .select("feature").collect().map(_.getString(0)).toSeq.sorted
    scores.unpersist()
    (feats, scores, ranked)
  }
}
