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

  test("factory resolves reference model names; unknown rejected") {
    assert(Models.byName("lightgbm").name == "gbt_classifier")
    assert(Models.byName("et").name == "random_forest_classifier")
    assert(Models.byName("lr").name == "logistic_regression")
    assert(Models.byName("linreg").name == "linear_regression")
    intercept[IllegalArgumentException](Models.byName("catboost"))
  }
}
