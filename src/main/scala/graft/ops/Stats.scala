package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EDA / evaluation statistics operators (data_vis/visualization.py,
  * modeling/prediction.py:532-605). All distributed aggregates; outputs
  * are small stat frames.
  */
object Stats {

  /** J4: cross-tabulation with row normalization
    * (pd.crosstab(normalize='index'), visualization.py:188-189).
    * groupBy(f, t).count + window-normalize over f. Long layout
    * (f, t, cnt, share) instead of pandas' wide layout — equivalent
    * information, shuffle-friendly, and stable under unseen categories.
    */
  def crosstabNorm(df: DataFrame, f: String, t: String): DataFrame =
    df.groupBy(col(f), col(t))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("share",
        round(col("cnt") / sum(col("cnt")).over(Window.partitionBy(f)), 6))
      .orderBy(col(f), col(t))

  /** A18: pairwise Pearson correlation over numeric columns
    * (df.corr(), visualization.py:30-31). Emits the upper triangle as
    * (col_a, col_b, corr) — one aggregate job computes all pairs.
    */
  def corrPairs(df: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.length
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      round(corr(col(a), col(b)), 6).as(s"${a}__$b")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val n = pairs.length
    row.select(expr(
      s"stack($n, ${pairs.map { case (a, b) => s"'$a', '$b', `${a}__$b`" }.mkString(", ")}) as (col_a, col_b, corr)"))
      .orderBy("col_a", "col_b")
  }

  /** A19: fixed-width histogram per class (visualization.py:105-116).
    * Bucket index = floor(x / width) — equivalent to the reference's
    * pd.cut over a regular bin list (generic_tools/utils.py:103-119)
    * anchored at 0. Pure expression, no Bucketizer needed.
    */
  def histogram(df: DataFrame, valueCol: String, width: Double,
      classCol: String): DataFrame =
    df.groupBy(
      floor(col(valueCol) / width).cast("long").as("bin"),
      col(classCol))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("bin", classCol)

  /** A20: confusion matrix with optional row normalization
    * (prediction.py:532-605). Long layout (label, prediction, cnt,
    * share); sklearn's matrix layout is a driver-side pivot of this.
    */
  def confusion(df: DataFrame, labelCol: String, predCol: String): DataFrame =
    df.groupBy(col(labelCol).as("label"), col(predCol).as("prediction"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("share",
        round(col("cnt") / sum(col("cnt")).over(Window.partitionBy("label")), 6))
      .orderBy("label", "prediction")
}
