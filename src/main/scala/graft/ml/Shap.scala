package graft.ml

import org.apache.spark.ml.classification.GBTClassificationModel
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.tree.{GraftTreeAccess, InternalNode, Node, Split}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** SHAP feature attributions for tree ensembles and linear models,
  * closing the reference's `shap`-library dependency natively
  * (modeling/prediction.py:256-286 computes per-fold SHAP matrices for
  * LightGBM models; the summary table is mean |shap| per feature).
  *
  * TreeSHAP follows the published algorithm of Lundberg, Erion & Lee,
  * "Consistent Individualized Feature Attribution for Tree Ensembles"
  * (arXiv:1802.03888, Algorithm 2): exact Shapley values under the
  * path-dependent conditional expectation, O(leaves * depth^2) per row
  * instead of exponential subset enumeration. Correctness is pinned by
  * ShapSpec, which checks the recursion against brute-force Shapley
  * values (all 2^k subsets) on real fitted trees, and by the additivity
  * identity bias + sum(phi) = raw margin, which q73's oracle replays.
  *
  * LinearSHAP is the closed form for linear models (same paper,
  * independent-features corollary): phi_j = coef_j * (x_j - E[x_j]).
  *
  * Scale: the per-row computation is embarrassingly parallel —
  * mapPartitions over the data with the flattened ensemble broadcast
  * once per executor (the model is a few KB; no shuffle, no driver
  * collection). This is genuine per-row imperative logic over shared
  * read-only state, the documented case where mapPartitions beats a
  * Catalyst expression.
  */
object Shap {

  /** Decision tree flattened to parallel arrays for cache-friendly
    * traversal. `split` keeps MLlib's Split objects so continuous and
    * categorical splits both route through shouldGoLeft; leaves have
    * left(i) == -1 and split(i) == null. */
  final case class FlatTree(
      left: Array[Int],
      right: Array[Int],
      split: Array[Split],
      value: Array[Double],
      cover: Array[Double],
      maxDepth: Int,
      expectedValue: Double) extends Serializable {
    def isLeaf(i: Int): Boolean = left(i) < 0
    def predict(x: Vector): Double = {
      var i = 0
      while (!isLeaf(i)) i = if (GraftTreeAccess.goesLeft(split(i), x)) left(i) else right(i)
      value(i)
    }
  }

  /** Flatten an MLlib tree (preorder). Covers come from each node's
    * impurity stats (training row counts) via GraftTreeAccess. */
  def flatten(root: Node): FlatTree = {
    val la = scala.collection.mutable.ArrayBuffer.empty[Int]
    val ra = scala.collection.mutable.ArrayBuffer.empty[Int]
    val sa = scala.collection.mutable.ArrayBuffer.empty[Split]
    val va = scala.collection.mutable.ArrayBuffer.empty[Double]
    val ca = scala.collection.mutable.ArrayBuffer.empty[Double]
    def walk(node: Node): Int = {
      val me = la.length
      la += -1; ra += -1
      va += node.prediction; ca += GraftTreeAccess.cover(node)
      node match {
        case in: InternalNode =>
          sa += in.split
          la(me) = walk(in.leftChild)
          ra(me) = walk(in.rightChild)
        case _ =>
          sa += null
      }
      me
    }
    walk(root)
    val l = la.toArray; val r = ra.toArray
    val s = sa.toArray; val v = va.toArray; val c = ca.toArray
    def depth(i: Int): Int =
      if (l(i) < 0) 0 else 1 + math.max(depth(l(i)), depth(r(i)))
    def ev(i: Int): Double =
      if (l(i) < 0) v(i)
      else (c(l(i)) * ev(l(i)) + c(r(i)) * ev(r(i))) / c(i)
    FlatTree(l, r, s, v, c, depth(0), ev(0))
  }

  /** A boosted ensemble as (tree, weight) pairs; SHAP values and the
    * bias combine linearly, so the ensemble attribution is the weighted
    * sum of per-tree attributions. */
  def gbtEnsemble(m: GBTClassificationModel): Array[(FlatTree, Double)] =
    m.trees.zip(m.treeWeights).map { case (t, w) => (flatten(t.rootNode), w) }

  /** Reusable per-task path buffers. The recursion at level l works on
    * its own segment of the buffer (offset grows by depth+1 per level,
    * as in the paper's reference layout), so one allocation serves the
    * whole traversal. */
  final class Workspace(maxDepth: Int) {
    val cap: Int = 2 + (maxDepth + 2) * (maxDepth + 3) / 2
    val d = new Array[Int](cap) // feature on path (-1 for the root sentinel)
    val z = new Array[Double](cap) // fraction of paths flowing through when feature excluded
    val o = new Array[Double](cap) // 1 if x follows this split, else 0
    val w = new Array[Double](cap) // permutation-weight polynomial coefficients
  }

  /** Grow the subset-permutation polynomial by one path element
    * (paper Algorithm 2, EXTEND). */
  private def extendPath(ws: Workspace, off: Int, depth: Int,
      pz: Double, po: Double, pi: Int): Unit = {
    ws.d(off + depth) = pi; ws.z(off + depth) = pz; ws.o(off + depth) = po
    ws.w(off + depth) = if (depth == 0) 1.0 else 0.0
    var i = depth - 1
    while (i >= 0) {
      ws.w(off + i + 1) += po * ws.w(off + i) * (i + 1).toDouble / (depth + 1)
      ws.w(off + i) = pz * ws.w(off + i) * (depth - i).toDouble / (depth + 1)
      i -= 1
    }
  }

  /** Remove path element idx, inverting EXTEND (paper UNWIND). */
  private def unwindPath(ws: Workspace, off: Int, depth: Int, idx: Int): Unit = {
    val po = ws.o(off + idx); val pz = ws.z(off + idx)
    var carry = ws.w(off + depth)
    var i = depth - 1
    while (i >= 0) {
      if (po != 0) {
        val t = ws.w(off + i)
        ws.w(off + i) = carry * (depth + 1) / ((i + 1) * po)
        carry = t - ws.w(off + i) * pz * (depth - i).toDouble / (depth + 1)
      } else {
        ws.w(off + i) = ws.w(off + i) * (depth + 1) / (pz * (depth - i))
      }
      i -= 1
    }
    var j = idx
    while (j < depth) {
      ws.d(off + j) = ws.d(off + j + 1)
      ws.z(off + j) = ws.z(off + j + 1)
      ws.o(off + j) = ws.o(off + j + 1)
      j += 1
    }
  }

  /** Total polynomial weight if element idx were unwound, without
    * mutating the path (paper's summation used at leaves). */
  private def unwoundSum(ws: Workspace, off: Int, depth: Int, idx: Int): Double = {
    val po = ws.o(off + idx); val pz = ws.z(off + idx)
    var carry = ws.w(off + depth)
    var total = 0.0
    var i = depth - 1
    while (i >= 0) {
      if (po != 0) {
        val t = carry * (depth + 1) / ((i + 1) * po)
        total += t
        carry = ws.w(off + i) - t * pz * (depth - i).toDouble / (depth + 1)
      } else {
        total += ws.w(off + i) * (depth + 1) / (pz * (depth - i))
      }
      i -= 1
    }
    total
  }

  private def recurse(t: FlatTree, x: Vector, phi: Array[Double], ws: Workspace,
      node: Int, parentOff: Int, parentDepth: Int,
      pz: Double, po: Double, pi: Int): Unit = {
    val off = parentOff + parentDepth + 1
    var c = 0
    while (c <= parentDepth) { // root call copies nothing (parentDepth = -1)
      ws.d(off + c) = ws.d(parentOff + c); ws.z(off + c) = ws.z(parentOff + c)
      ws.o(off + c) = ws.o(parentOff + c); ws.w(off + c) = ws.w(parentOff + c)
      c += 1
    }
    var depth = parentDepth + 1
    extendPath(ws, off, depth, pz, po, pi)
    if (t.isLeaf(node)) {
      var i = 1
      while (i <= depth) {
        val w = unwoundSum(ws, off, depth, i)
        phi(ws.d(off + i)) += w * (ws.o(off + i) - ws.z(off + i)) * t.value(node)
        i += 1
      }
    } else {
      val sp = t.split(node)
      val f = GraftTreeAccess.featureOf(sp)
      val goLeft = GraftTreeAccess.goesLeft(sp, x)
      val hot = if (goLeft) t.left(node) else t.right(node)
      val cold = if (goLeft) t.right(node) else t.left(node)
      val hz = t.cover(hot) / t.cover(node)
      val cz = t.cover(cold) / t.cover(node)
      var iz = 1.0; var io = 1.0
      var k = 1; var found = -1
      while (k <= depth && found < 0) {
        if (ws.d(off + k) == f) found = k
        k += 1
      }
      if (found >= 0) { // feature already on path: merge its fractions
        iz = ws.z(off + found); io = ws.o(off + found)
        unwindPath(ws, off, depth, found)
        depth -= 1
      }
      recurse(t, x, phi, ws, hot, off, depth, iz * hz, io, f)
      recurse(t, x, phi, ws, cold, off, depth, iz * cz, 0.0, f)
    }
  }

  /** Exact per-feature Shapley values of one tree at x, accumulated
    * into phi (indexed by the tree's featureIndex space). */
  def shapOne(t: FlatTree, x: Vector, phi: Array[Double], ws: Workspace): Unit =
    recurse(t, x, phi, ws, 0, 0, -1, 1.0, 1.0, -1)

  /** Per-row SHAP attribution columns for an ensemble over `features`
    * (which must be in the training assembly order). Appends one
    * `<prefix><feature>` double column per feature plus `<prefix>bias`
    * (= weighted expected value, so bias + sum(shap) = raw margin). */
  def treeShap(df: DataFrame, ensemble: Array[(FlatTree, Double)],
      features: Seq[String], prefix: String = "shap_"): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(ensemble)
    val bias = ensemble.map { case (t, w) => w * t.expectedValue }.sum
    val featIdx = features.map(df.schema.fieldIndex).toArray
    val schema = StructType(df.schema.fields ++
      features.map(f => StructField(prefix + f, DoubleType, nullable = false)) :+
      StructField(prefix + "bias", DoubleType, nullable = false))
    val nFeat = features.length
    df.mapPartitions { rows =>
      val ens = bc.value
      val ws = new Workspace(ens.iterator.map(_._1.maxDepth).max)
      val phi = new Array[Double](nFeat)
      val acc = new Array[Double](nFeat)
      rows.map { r =>
        val xs = new Array[Double](nFeat)
        var i = 0
        while (i < nFeat) {
          xs(i) = r.getAs[Number](featIdx(i)).doubleValue; i += 1
        }
        val x = Vectors.dense(xs)
        java.util.Arrays.fill(acc, 0.0)
        ens.foreach { case (t, w) =>
          java.util.Arrays.fill(phi, 0.0)
          shapOne(t, x, phi, ws)
          var j = 0
          while (j < nFeat) { acc(j) += w * phi(j); j += 1 }
        }
        Row.fromSeq(r.toSeq ++ acc.toSeq :+ bias)
      }
    }(Encoders.row(schema))
  }

  /** LinearSHAP closed form (independent features, Lundberg & Lee 2017
    * Corollary 1): phi_j = coef_j * (x_j - E[x_j]), bias = intercept +
    * sum_j coef_j * E[x_j], so bias + sum(phi) = prediction exactly.
    * Pure column arithmetic — stays in whole-stage codegen. */
  def linearShap(df: DataFrame, features: Seq[String], coefs: Array[Double],
      means: Array[Double], intercept: Double,
      prefix: String = "shap_"): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val withPhi = features.zipWithIndex.foldLeft(df) { case (acc, (f, i)) =>
      acc.withColumn(prefix + f, lit(coefs(i)) * (col(f) - lit(means(i))))
    }
    withPhi.withColumn(prefix + "bias",
      lit(intercept + coefs.zip(means).map { case (c, m) => c * m }.sum))
  }
}
