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
    * (prediction.py:410-414). Implemented with higher-order array
    * functions: for each candidate value, count occurrences, then pick
    * the value with (max count, min value). O(k^2) per row with k =
    * number of prediction columns (3-10), constant per row — scales
    * linearly in rows with no shuffle.
    */
  def rowMode(cols: Seq[Column]): Column = {
    val arr = array(cols: _*)
    // pairs of (count_of_v_in_arr, v) → pick max count, tie → min value.
    val counted = transform(arr, v =>
      struct(
        size(filter(arr, x => x === v)).as("cnt"),
        v.as("value")))
    // maximize count, then minimize value: compare (cnt, -v) lexically.
    val best = aggregate(
      counted,
      element_at(counted, 1),
      (acc, x) =>
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
    val arr = array(cols.zip(weights).map { case (c, w) =>
      struct(c.as("label"), lit(w / total).as("w"))
    }: _*)
    // np.argmax semantics: exact float comparison, first max wins; with
    // candidates scanned in column order the tie-break below (strictly
    // greater replaces) keeps the earliest max, and a final min-label
    // pass is unnecessary because equal labels produce equal scores.
    val scored = transform(arr, s =>
      struct(
        aggregate(
          filter(arr, x => x.getField("label") === s.getField("label")),
          lit(0.0), (acc, x) => acc + x.getField("w")).as("score"),
        s.getField("label").as("label")))
    val best = aggregate(
      scored,
      element_at(scored, 1),
      (acc, x) =>
        when(x.getField("score") > acc.getField("score"), x)
          .when(x.getField("score") === acc.getField("score") &&
            x.getField("label") < acc.getField("label"), x)
          .otherwise(acc))
    best.getField("label")
  }
}
