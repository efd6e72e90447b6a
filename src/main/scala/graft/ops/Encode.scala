package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Categorical encoding operators (preprocessing.py:136-150,
  * create_solution.py:115-119).
  */
object Encode {

  /** F9: label encoding (pd.factorize). The reference assigns codes in
    * first-occurrence order, which is row-order-dependent — undefined on
    * a distributed engine. We assign codes in lexicographic value order
    * (dense_rank over the distinct values), which is deterministic,
    * SQL-expressible, and stable across partitionings (documented
    * deviation, SURVEY §7.4.1). NULL encodes to -1 like pd.factorize.
    */
  def labelEncode(df: DataFrame, c: String, out: String): DataFrame = {
    val mapping = df.select(col(c)).filter(col(c).isNotNull).distinct()
      .withColumn(out, dense_rank().over(Window.orderBy(col(c))) - 1)
    df.join(broadcast(mapping), Seq(c), "left")
      .withColumn(out, coalesce(col(out), lit(-1)))
  }

  /** F10: one-hot encoding with a column per category value
    * (pd.get_dummies(dummy_na=true), preprocessing.py:136-150). The
    * category list is collected once (small by definition of
    * categorical); output columns are named <col>_<value> exactly like
    * get_dummies. A NULL indicator column <col>_nan mirrors dummy_na.
    */
  def oneHot(df: DataFrame, c: String): DataFrame = {
    val values = df.select(col(c)).filter(col(c).isNotNull).distinct()
      .collect().map(_.get(0).toString).sorted
    val withCats = values.foldLeft(df) { (acc, v) =>
      acc.withColumn(s"${c}_$v", (col(c) === v).cast("int"))
    }
    withCats.withColumn(s"${c}_nan", col(c).isNull.cast("int")).drop(c)
  }
}
