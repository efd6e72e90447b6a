package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality-classifier filter — the CCNet / GPT-3 pattern of a
  * light linear model scoring every document for corpus inclusion
  * (Wenzek et al. 2020 §4.3 fasttext LM filter; Brown et al. 2020
  * §A's LR quality classifier over reference-corpus features),
  * re-expressed Spark-first:
  *
  *  - features are the four scan-local quality sub-scores of
  *    `TextOps.qualityCol` (already oracle-pinned by q44), each
  *    rounded to 6 decimals so the model's input domain is exactly
  *    SQL-replayable;
  *  - training is ONE bounded MLlib LogisticRegression fit;
  *    coefficients are rounded at train time, so the dumped
  *    (feature, coef) table IS the serving model (the q102/q120
  *    dump-replay discipline);
  *  - scoring collects the <= 5-row model to the driver and builds a
  *    pure column expression sigmoid(b + Σ wᵢfᵢ) — zero joins, zero
  *    shuffle, evaluated inside the scan at any corpus scale.
  */
object QualityClassifier {

  val featureNames: Seq[String] =
    Seq("len_score", "punct_score", "diversity", "len_plaus")

  private val interceptKey = "__intercept"

  /** Per-doc feature frame: idCol + the four rounded sub-scores. */
  def featurize(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), trim(col(textCol)).as("__t"),
        TextOps.tokens(col(textCol)).as("__w"))
      .select(col(idCol),
        round(TextOps.lenScoreCol(col("__w")), 6).as("len_score"),
        round(TextOps.punctScoreCol(col("__t")), 6).as("punct_score"),
        round(TextOps.diversityCol(col("__w")), 6).as("diversity"),
        round(TextOps.lenPlausCol(col("__w")), 6).as("len_plaus"))

  /** Train on a labeled frame (label 0/1 in `labelCol`): returns the
    * model as (feature, coef) rows — the four weights plus an
    * `__intercept` row, all rounded to 6 decimals. */
  def train(df: DataFrame, idCol: String, textCol: String,
      labelCol: String): DataFrame = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    val spark = df.sparkSession
    import spark.implicits._
    val feats = featurize(df, idCol, textCol)
      .join(df.select(col(idCol), col(labelCol).cast("double").as("__y")), idCol)
    val assembled = new VectorAssembler()
      .setInputCols(featureNames.toArray).setOutputCol("__fv")
      .transform(feats)
    val model = new LogisticRegression()
      .setFeaturesCol("__fv").setLabelCol("__y")
      .setRegParam(1e-3).setMaxIter(100)
      .fit(assembled)
    val rows = featureNames.zip(model.coefficients.toArray).map {
      case (f, w) => (f, math.rint(w * 1e6) / 1e6)
    } :+ (interceptKey, math.rint(model.intercept * 1e6) / 1e6)
    rows.toDF("feature", "coef")
  }

  /** Score every document with the dumped model: sigmoid of the
    * intercept plus the feature dot product, in fixed feature order
    * (left-to-right — the same association the SQL oracle writes).
    * The model frame is bounded (5 rows) and collected. */
  def score(df: DataFrame, model: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val coefs = model.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val feats = featurize(df, idCol, textCol)
    val z = featureNames.foldLeft(lit(coefs(interceptKey)): Column) {
      (acc, f) => acc + col(f) * lit(coefs(f))
    }
    feats.select(col(idCol),
      round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("quality_prob"))
  }
}
