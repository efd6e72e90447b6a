package graft

import org.apache.spark.ml.classification.GBTClassifier
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.tree.GraftTreeAccess
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ml.Shap
import graft.ml.Shap.FlatTree

/** TreeSHAP correctness: the O(LD^2) recursion must equal brute-force
  * Shapley values (all 2^k subsets) of the tree's own path-dependent
  * conditional expectation, on real MLlib-fitted trees — plus the
  * additivity identity bias + sum(phi) = margin on the DataFrame path.
  */
class ShapSpec extends SparkSpec {

  private lazy val frame = core.Tables.orders(spark, sf).select(
    col("o_orderkey").as("row_id"),
    (col("o_orderstatus") === "O").cast("double").as("target"),
    col("o_totalprice"),
    col("o_custkey").cast("double").as("o_custkey"),
    unix_timestamp(col("o_orderdate")).cast("double").as("o_epoch"))

  private val feats = Seq("o_totalprice", "o_custkey", "o_epoch")

  private def fitGbt(df: DataFrame, features: Seq[String], maxDepth: Int,
      maxIter: Int) = {
    val assembled = new VectorAssembler().setInputCols(features.toArray)
      .setOutputCol("__features").transform(df)
    new GBTClassifier().setMaxIter(maxIter).setMaxDepth(maxDepth)
      .setSeed(27).setFeaturesCol("__features").setLabelCol("target")
      .fit(assembled)
  }

  /** The set function TreeSHAP attributes: follow x at splits whose
    * feature is in S, take the cover-weighted average elsewhere. */
  private def condExp(t: FlatTree, node: Int, x: Vector, s: Set[Int]): Double =
    if (t.isLeaf(node)) t.value(node)
    else {
      val f = GraftTreeAccess.featureOf(t.split(node))
      if (s(f))
        condExp(t,
          if (GraftTreeAccess.goesLeft(t.split(node), x)) t.left(node)
          else t.right(node), x, s)
      else
        (t.cover(t.left(node)) * condExp(t, t.left(node), x, s) +
         t.cover(t.right(node)) * condExp(t, t.right(node), x, s)) / t.cover(node)
    }

  /** Exponential-exact Shapley values of condExp — the definition the
    * fast recursion must reproduce. */
  private def bruteShap(t: FlatTree, x: Vector, n: Int): Array[Double] = {
    val phi = new Array[Double](n)
    def fact(k: Int): Double = (1 to k).product.toDouble
    for (i <- 0 until n; sub <- ((0 until n).toSet - i).subsets()) {
      val w = fact(sub.size) * fact(n - sub.size - 1) / fact(n)
      phi(i) += w * (condExp(t, 0, x, sub + i) - condExp(t, 0, x, sub))
    }
    phi
  }

  private def fastShap(t: FlatTree, x: Vector, n: Int): Array[Double] = {
    val phi = new Array[Double](n)
    Shap.shapOne(t, x, phi, new Shap.Workspace(t.maxDepth))
    phi
  }

  test("TreeSHAP equals brute-force Shapley on fitted GBT trees") {
    val m = fitGbt(frame, feats, maxDepth = 3, maxIter = 3)
    val ens = Shap.gbtEnsemble(m)
    val rows = frame.select(feats.map(col): _*).limit(25).collect()
    for ((t, _) <- ens; r <- rows) {
      val x = Vectors.dense(feats.indices.map(i =>
        r.getAs[Number](i).doubleValue).toArray)
      val fast = fastShap(t, x, feats.size)
      val brute = bruteShap(t, x, feats.size)
      feats.indices.foreach { i =>
        assert(math.abs(fast(i) - brute(i)) < 1e-9,
          s"feature $i: fast ${fast(i)} vs brute ${brute(i)} at x=$x")
      }
    }
  }

  test("repeated splits on the same feature still match brute force") {
    // 2 features at depth 4 forces reuse of a feature along a path,
    // exercising the unwind/merge branch of the recursion.
    val two = Seq("o_totalprice", "o_custkey")
    val m = fitGbt(frame, two, maxDepth = 4, maxIter = 2)
    val ens = Shap.gbtEnsemble(m)
    val reused = ens.exists { case (t, _) =>
      def paths(i: Int, seen: Set[Int]): Boolean =
        if (t.isLeaf(i)) false
        else {
          val f = GraftTreeAccess.featureOf(t.split(i))
          seen(f) || paths(t.left(i), seen + f) || paths(t.right(i), seen + f)
        }
      paths(0, Set.empty)
    }
    assert(reused, "expected at least one path reusing a feature")
    val rows = frame.select(two.map(col): _*).limit(25).collect()
    for ((t, _) <- ens; r <- rows) {
      val x = Vectors.dense(two.indices.map(i =>
        r.getAs[Number](i).doubleValue).toArray)
      val fast = fastShap(t, x, two.size)
      val brute = bruteShap(t, x, two.size)
      two.indices.foreach { i =>
        assert(math.abs(fast(i) - brute(i)) < 1e-9,
          s"feature $i: fast ${fast(i)} vs brute ${brute(i)}")
      }
    }
  }

  test("DataFrame path: bias + sum(shap) equals the model margin everywhere") {
    val m = fitGbt(frame, feats, maxDepth = 3, maxIter = 5)
    val ens = Shap.gbtEnsemble(m)
    val shap = Shap.treeShap(frame, ens, feats)
    // margin = dot(treePredictions, weights); recompute independently
    // from MLlib's own transform (rawPrediction = [-margin, margin])
    val assembled = new VectorAssembler().setInputCols(feats.toArray)
      .setOutputCol("__features").transform(frame)
    val margin = m.transform(assembled).select(col("row_id"),
      element_at(vector_to_array(col("rawPrediction")), 2).as("margin"))
    val joined = shap.join(margin, "row_id")
      .withColumn("additivity",
        abs(col("shap_bias") + feats.map(f => col(s"shap_$f")).reduce(_ + _)
          - col("margin")))
    val worst = joined.agg(max("additivity")).head().getDouble(0)
    assert(worst < 1e-8, s"additivity violated by $worst")
  }

  test("linearShap: additivity against MLlib LinearRegression predictions") {
    val df = frame.select(col("row_id"),
      col("o_totalprice").as("y"), col("o_custkey"), col("o_epoch"))
    val lfeats = Seq("o_custkey", "o_epoch")
    val assembled = new VectorAssembler().setInputCols(lfeats.toArray)
      .setOutputCol("__f").transform(df)
    val lr = new org.apache.spark.ml.regression.LinearRegression()
      .setSolver("normal").setRegParam(0.0)
      .setFeaturesCol("__f").setLabelCol("y").fit(assembled)
    val means = lfeats.map(f =>
      df.agg(avg(f)).head().getDouble(0)).toArray
    val shap = Shap.linearShap(df, lfeats,
      lr.coefficients.toArray, means, lr.intercept)
    val preds = lr.transform(assembled)
      .select(col("row_id"), col("prediction"))
    val worst = shap.join(preds, "row_id")
      .agg(max(abs(col("shap_bias") +
        lfeats.map(f => col(s"shap_$f")).reduce(_ + _) - col("prediction"))))
      .head().getDouble(0)
    assert(worst < 1e-6, s"linear additivity violated by $worst")
  }

  test("ensemble bias equals the mean training margin") {
    val m = fitGbt(frame, feats, maxDepth = 3, maxIter = 5)
    val ens = Shap.gbtEnsemble(m)
    val bias = ens.map { case (t, w) => w * t.expectedValue }.sum
    val assembled = new VectorAssembler().setInputCols(feats.toArray)
      .setOutputCol("__features").transform(frame)
    val meanMargin = m.transform(assembled)
      .agg(avg(element_at(vector_to_array(col("rawPrediction")), 2)))
      .head().getDouble(0)
    assert(math.abs(bias - meanMargin) < 1e-6,
      s"bias $bias vs mean margin $meanMargin")
  }
}
