package org.apache.spark.ml.tree

/** Narrow accessor for tree internals that MLlib keeps `private[ml]`.
  *
  * TreeSHAP (graft.ml.Shap) needs each node's training-sample count
  * ("cover") to form the conditional expectations E[f(x) | x_S]; MLlib
  * stores it on every node's `ImpurityCalculator` but does not expose
  * it publicly. This object lives in the `org.apache.spark.ml.tree`
  * package purely to read that one number — no mutation, no other
  * internals touched.
  */
object GraftTreeAccess {
  /** Number of training rows that reached this node. */
  def cover(n: Node): Double = n.impurityStats.count

  /** Routing decision for x at this split (continuous or categorical). */
  def goesLeft(s: Split, x: org.apache.spark.ml.linalg.Vector): Boolean =
    s.shouldGoLeft(x)

  /** Index of the feature this split tests. */
  def featureOf(s: Split): Int = s.featureIndex
}
