package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row-wise combination operators used by bagging and blending
  * (modeling/prediction.py:168-214,410-414; ensembling/blending/
  * blender.py:229-244). All are pure column expressions — codegen'd,
  * no UDFs — so they stay inside whole-stage codegen at any scale.
  */
object RowOps {

  /** A8: row-wise mean over prediction columns, rounded to `decimals`;
    * cast to int when decimals == 0 (prediction.py:186-214).
    */
  def rowMean(cols: Seq[Column], decimals: Int): Column = {
    val mean = cols.reduce(_ + _) / lit(cols.length)
    if (decimals == 0) round(mean, 0).cast("long") else round(mean, decimals)
  }

  /** F12: weighted row average (soft vote) with weights normalized to
    * sum 1 (blender.py:187-200,229-244).
    */
  def weightedMean(cols: Seq[Column], weights: Seq[Double]): Column = {
    val total = weights.sum
    require(total > 0, "weights must sum > 0")
    cols.zip(weights).map { case (c, w) => c * lit(w / total) }.reduce(_ + _)
  }

  /** A10: row-wise mode (hard majority vote) across k columns with
    * scipy.stats.mode tie-breaking — smallest value wins
    * (prediction.py:410-414). k is known when the plan is built and
    * small (3-10 prediction columns), so the O(k^2) candidate-count
    * comparison network is unrolled statically into when-chains —
    * unlike the higher-order array functions (transform/filter/
    * aggregate), these stay inside whole-stage codegen with no
    * per-element lambda interpretation or array allocation (measured
    * ~5x on the sf0.1 vote queries). Constant work per row, no shuffle.
    */
  def rowMode(cols: Seq[Column]): Column = {
    // candidate i scored by how many columns equal it; scan in column
    // order, replace on strictly-higher count or equal-count-smaller-
    // value — same (max count, min value) pick as scipy.
    val scored = cols.map { c =>
      val cnt = cols.map(o => when(o === c, 1).otherwise(0)).reduce(_ + _)
      struct(cnt.as("cnt"), c.as("value"))
    }
    val best = scored.reduce((acc, x) =>
      when(x.getField("cnt") > acc.getField("cnt"), x)
        .when(x.getField("cnt") === acc.getField("cnt") &&
          x.getField("value") < acc.getField("value"), x)
        .otherwise(acc))
    best.getField("value")
  }

  /** F13: weighted hard vote — per row, sum weights per candidate label
    * across model columns, return the label with the highest weight sum;
    * ties → lowest label (np.argmax semantics, blender.py:242-243).
    */
  def weightedVote(cols: Seq[Column], weights: Seq[Double]): Column = {
    val total = weights.sum
    require(total > 0,
      s"weightedVote: weights must sum to a positive value, got $weights " +
        "(an all-zero weighting would silently return the first column)")
    val norm = weights.map(_ / total)
    // np.argmax semantics: exact float comparison, first max wins; with
    // candidates scanned in column order the tie-break below (strictly
    // greater replaces) keeps the earliest max. Statically unrolled like
    // rowMode (codegen'd when-chains, no array HOFs); summing the
    // non-matching terms as +0.0 in the same column order keeps float
    // results bit-identical to the filtered-sum form.
    val scored = cols.map { c =>
      val score = cols.zip(norm).map { case (o, w) =>
        when(o === c, lit(w)).otherwise(lit(0.0))
      }.reduce(_ + _)
      struct(score.as("score"), c.as("label"))
    }
    val best = scored.reduce((acc, x) =>
      when(x.getField("score") > acc.getField("score"), x)
        .when(x.getField("score") === acc.getField("score") &&
          x.getField("label") < acc.getField("label"), x)
        .otherwise(acc))
    best.getField("label")
  }
}
