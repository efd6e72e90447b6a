package graft

import org.apache.spark.sql.functions._
import graft.cv.CrossValidation
import graft.cv.CrossValidation.CvConfig
import graft.ml.Models

/** Model-wrapper paths not covered by the classification CV specs:
  * regression CV with MAE/RMSE, GBT early-stop via validation fold,
  * multiclass probability slicing by class label, factory names. */
class ModelsSpec extends SparkSpec {

  private lazy val regFrame = core.Tables.orders(spark, sf).select(
    col("o_orderkey").as("row_id"),
    col("o_totalprice").as("target"),
    col("o_custkey").cast("double").as("o_custkey"),
    unix_timestamp(col("o_orderdate")).cast("double").as("o_epoch"),
    (col("o_orderkey") % 7).cast("double").as("f3"))
  private val regFeats = Seq("o_custkey", "o_epoch", "f3")

  test("regression CV: LinearRegression with MAE metric") {
    val cfg = CvConfig(numFolds = 3, stratified = false,
      predictProbability = false, metricName = "mean_absolute_error")
    val r = CrossValidation.runCvOneSeed(
      regFrame, None, regFeats, "target", "row_id", Models.LinReg(), cfg, 27L)
    assert(r.oof.count() == regFrame.count())
    assert(r.cvScore > 0, "MAE positive")
    val mean = regFrame.agg(avg("target")).head().getDouble(0)
    assert(r.cvScore < mean, s"MAE ${r.cvScore} should beat the scale of the target ($mean)")
  }

  test("regression CV: GBT regressor with RMSE and importances") {
    val cfg = CvConfig(numFolds = 2, stratified = false,
      predictProbability = false, metricName = "rmse")
    val r = CrossValidation.runCvOneSeed(
      regFrame, None, regFeats, "target", "row_id",
      Models.GbtRegressorW(maxIter = 5, maxDepth = 3), cfg, 27L)
    assert(r.cvScore > 0)
    assert(r.importances.get.count() == regFeats.size * 2L)
  }

  test("GBT binary classifier uses the validation fold when tol is set") {
    import spark.implicits._
    val frame = core.Tables.orders(spark, sf).select(
      col("o_orderkey").as("row_id"),
      (col("o_orderstatus") === "O").cast("int").as("target"),
      col("o_totalprice"), col("o_custkey").cast("double").as("o_custkey"))
    val Array(tr, va) = frame.randomSplit(Array(0.8, 0.2), seed = 5)
    val m = Models.GbtBinaryClassifier(maxIter = 10, validationTol = Some(0.01))
      .fit(tr, Some(va), Seq("o_totalprice", "o_custkey"), "target", 27L)
    val scored = m.score(frame, predictProbability = true)
    val mm = scored.agg(min("__score"), max("__score")).head()
    assert(mm.getDouble(0) >= 0 && mm.getDouble(1) <= 1)
    assert(m.featureImportances.get.map(_._2).sum > 0.99)
  }

  test("multiclass probability slicing by class label") {
    val frame = core.Tables.orders(spark, sf).select(
      col("o_orderkey").as("row_id"),
      when(col("o_orderstatus") === "O", 0)
        .when(col("o_orderstatus") === "F", 1).otherwise(2).as("target"),
      col("o_totalprice"), col("o_custkey").cast("double").as("o_custkey"))
    val m = Models.RfClassifier(numTrees = 5, maxDepth = 3)
      .fit(frame, None, Seq("o_totalprice", "o_custkey"), "target", 27L)
    val p2 = m.score(frame, predictProbability = true, classLabel = 2)
      .agg(min("__score"), max("__score"), avg("__score")).head()
    assert(p2.getDouble(0) >= 0 && p2.getDouble(1) <= 1)
    val share = frame.filter(col("target") === 2).count().toDouble / frame.count()
    assert(math.abs(p2.getDouble(2) - share) < 0.25,
      s"mean P(class=2)=${p2.getDouble(2)} should track the class share $share")
  }

  test("probability-matrix CV (class_label=None path) with multiclass log loss") {
    val frame = core.Tables.orders(spark, sf).select(
      col("o_orderkey").as("row_id"),
      when(col("o_orderstatus") === "O", 0)
        .when(col("o_orderstatus") === "F", 1).otherwise(2).as("target"),
      col("o_totalprice"), col("o_custkey").cast("double").as("o_custkey"))
    val Array(tr, te) = frame.randomSplit(Array(0.8, 0.2), seed = 3)
    val r = CrossValidation.runCvProbMatrix(
      tr, Some(te), Seq("o_totalprice", "o_custkey"), "target", "row_id",
      Models.RfClassifier(numTrees = 10, maxDepth = 4),
      CvConfig(numFolds = 3, stratified = true, metricName = "multi_logloss"), 27L)
    assert(r.oof.count() == tr.count())
    // probability vectors: 3 classes, rows sum to ~1
    val sums = r.oof.select(aggregate(col("oof_probs"), lit(0.0), (a, x) => a + x).as("s"),
      size(col("oof_probs")).as("n"))
    assert(sums.filter(col("n") =!= 3).isEmpty)
    assert(sums.filter(abs(col("s") - 1.0) > 1e-6).isEmpty)
    // near the class-prior baseline ln(3) (the synthetic features carry
    // little signal for orderstatus; the assertion checks the metric is
    // a calibrated log loss, not garbage)
    assert(r.cvScore > 0.8 && r.cvScore < 1.3,
      s"multi_logloss ${r.cvScore} out of the plausible band around ln(3)")
    assert(r.foldScores.forall(s => s > 0.8 && s < 1.4))
    // test reduction: mean of fold prob vectors, still a distribution
    val t = r.testPreds.get
    assert(t.count() == te.count())
    val tSums = t.select(aggregate(col("probs"), lit(0.0), (a, x) => a + x).as("s"))
    assert(tSums.filter(abs(col("s") - 1.0) > 1e-6).isEmpty)
  }

  test("ovr_gbt degenerate folds: missing class gets a constant-negative stand-in") {
    import spark.implicits._
    // 2 features, labels {0,1} only, but numClasses=3 (the full frame
    // had a rare class 2 that this fold's train split missed). The
    // reference (lightgbm num_class) trains regardless — so must we.
    val tr = (1 to 200).map(i =>
      (i.toLong, (i % 2), i.toDouble, (i * 7 % 13).toDouble))
      .toDF("row_id", "target", "f1", "f2")
    val m = Models.OvrGbtClassifier(maxIter = 3, maxDepth = 2, numClasses = 3)
      .fit(tr, None, Seq("f1", "f2"), "target", 27L)
    val probs = m.scoreAll(tr)
    // class 2 probability is exactly 0 (pre-normalization constant 0)
    assert(probs.filter(element_at(col("__probs"), 3) =!= 0.0).isEmpty)
    // rows still carry a distribution over the 3 classes
    val s = probs.select(aggregate(col("__probs"), lit(0.0), (a, x) => a + x).as("s"))
    assert(s.filter(abs(col("s") - 1.0) > 1e-9).isEmpty)
    // argmax never picks the missing class
    val pred = m.score(tr, predictProbability = false, classLabel = 0)
    assert(pred.filter(col("__score") === 2.0).isEmpty)

    // empty split: clear error, not empty.max
    val empty = tr.filter(col("row_id") < 0)
    val eEmpty = intercept[IllegalArgumentException](
      Models.OvrGbtClassifier(maxIter = 3, numClasses = 3)
        .fit(empty, None, Seq("f1", "f2"), "target", 27L))
    assert(eEmpty.getMessage.contains("empty train split"))

    // out-of-range labels name the real contract violation
    val bad = tr.withColumn("target",
      when(col("target") === 1, 3).otherwise(col("target")))
    val eRange = intercept[IllegalArgumentException](
      Models.OvrGbtClassifier(maxIter = 3, numClasses = 3)
        .fit(bad, None, Seq("f1", "f2"), "target", 27L))
    assert(eRange.getMessage.contains("outside [0, 3)"))
  }

  test("factory resolves reference model names; unknown rejected") {
    assert(Models.byName("lightgbm").name == "gbt_classifier")
    assert(Models.byName("et").name == "random_forest_classifier")
    assert(Models.byName("lr").name == "logistic_regression")
    assert(Models.byName("linreg").name == "linear_regression")
    assert(Models.byName("ovr_gbt").name == "ovr_gbt_classifier")
    intercept[IllegalArgumentException](Models.byName("catboost"))
  }

  test("testIterBoost: test-side scoring uses the extended-round refit") {
    val frame = core.Tables.orders(spark, sf).select(
      col("o_orderkey").as("row_id"),
      (col("o_orderstatus") === "O").cast("int").as("target"),
      col("o_totalprice"), col("o_custkey").cast("double").as("o_custkey"))
    val Array(tr, va) = frame.randomSplit(Array(0.8, 0.2), seed = 5)
    val feats = Seq("o_totalprice", "o_custkey")

    // without the knob, scoreTest IS score
    val plain = Models.GbtBinaryClassifier(maxIter = 5, maxDepth = 3)
      .fit(tr, Some(va), feats, "target", 27L)
    assert(plain.score(va, predictProbability = true)
      .select(col("row_id"), col("__score"))
      .except(plain.scoreTest(va, predictProbability = true)
        .select(col("row_id"), col("__score"))).isEmpty,
      "no boost => identical test-side scores")

    // with boost=2.0, the test-side model has ~2x rounds => different scores
    val boosted = Models.GbtBinaryClassifier(maxIter = 5, maxDepth = 3,
      validationTol = Some(0.01), testIterBoost = Some(2.0))
      .fit(tr, Some(va), feats, "target", 27L)
    val sValid = boosted.score(va, predictProbability = true)
      .select(col("row_id"), col("__score"))
    val sTest = boosted.scoreTest(va, predictProbability = true)
      .select(col("row_id"), col("__score"))
    val mm = sTest.agg(min("__score"), max("__score")).head()
    assert(mm.getDouble(0) >= 0 && mm.getDouble(1) <= 1, "boosted scores are probabilities")
    assert(sValid.except(sTest).count() > 0,
      "boosted refit must score differently from the early-stopped model")
  }
}
