package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA dimensionality reduction for embedding columns — the standard
  * preprocessing stage ahead of ANN / SemDeDup-style clustering
  * (project to the top-k variance directions, then run the cheaper
  * geometry downstream).
  *
  * Training is one bounded MLlib fit (`ml.feature.PCA`, covariance +
  * eigendecomposition on the driver for the d×d Gram — d is the
  * embedding width, never the corpus); the component matrix (k rows of
  * d weights) is rounded to 6 decimals at train time so the dumped
  * model IS the serving model (the q102 dump-replay pattern: DuckDB
  * replays the projection bit-for-bit from the dump). Projection is
  * scan-local: the k component rows broadcast, and each (vector,
  * component) dot product is a sequential in-row fold
  * (`aggregate(zip_with(...))`) — deterministic float order, no
  * corpus-scale shuffle anywhere.
  *
  * Note: Spark's PCA transform does NOT mean-center inputs at
  * projection time (the components are computed from the covariance,
  * the transform is a plain matrix multiply) — this module mirrors
  * that documented behavior exactly.
  */
object Pca {

  /** Train: (pc, warr, explained_variance) — one row per component,
    * pc 0-based in decreasing explained-variance order, weights
    * rounded to 6 decimals. */
  def fit(corpus: DataFrame, embCol: String, k: Int): DataFrame = {
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    val assembled = corpus.select(
      array_to_vector(transform(col(embCol), _.cast("double"))).as("__fv"))
    val model = new PCA().setK(k)
      .setInputCol("__fv").setOutputCol("__pc").fit(assembled)
    val m = model.pc // d x k, column-major
    val ev = model.explainedVariance
    (0 until k).map { j =>
      val w = (0 until m.numRows).map(i =>
        math.rint(m(i, j) * 1e6) / 1e6).toSeq
      (j.toLong, w, math.rint(ev(j) * 1e6) / 1e6)
    }.toDF("pc", "warr", "explained_variance")
  }

  /** Project every vector onto every component: (idCol, pc, proj).
    * Components broadcast; the dot product is a sequential fold over
    * the zipped arrays, matching DuckDB's list_sum order exactly. */
  def project(corpus: DataFrame, components: DataFrame,
      idCol: String, embCol: String): DataFrame =
    corpus.select(col(idCol),
        transform(col(embCol), _.cast("double")).as("__x"))
      .crossJoin(broadcast(components.select(col("pc"), col("warr"))))
      .select(col(idCol), col("pc"),
        round(aggregate(zip_with(col("__x"), col("warr"), (a, b) => a * b),
          lit(0.0), (acc, v) => acc + v), 6).as("proj"))
}
