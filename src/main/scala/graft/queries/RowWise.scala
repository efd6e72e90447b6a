package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.cv.Folds
import graft.ops.RowOps

/** Row-wise bagging/voting operators (SURVEY §2.4 A8/A10, §2.8 F12/F13)
  * and the fold-assignment shape check (A12), bound to the test tables.
  *
  * The "seed_i" prediction columns are derived deterministically from
  * lineitem so the DuckDB oracle can reproduce them exactly.
  */
object RowWise {

  // Three deterministic pseudo-prediction columns (stand-ins for
  // per-seed model outputs, prediction.py:168-184).
  private def seedCols(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_quantity") * (lit(1) - col("l_discount"))).as("seed_1"),
      (col("l_quantity") * (lit(1) + col("l_tax"))).as("seed_2"),
      col("l_quantity").as("seed_3"))

  private val seedColsSql =
    """SELECT l_orderkey, l_linenumber,
      |       l_quantity * (1 - l_discount) AS seed_1,
      |       l_quantity * (1 + l_tax) AS seed_2,
      |       l_quantity AS seed_3
      |FROM lineitem""".stripMargin

  // Three deterministic integer label columns (stand-ins for per-fold
  // class predictions, prediction.py:410-414).
  private def labelCols(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_linenumber") % 3).cast("long").as("m1"),
      (col("l_partkey") % 3).cast("long").as("m2"),
      (col("l_suppkey") % 3).cast("long").as("m3"))

  private val labelColsSql =
    """SELECT l_orderkey, l_linenumber,
      |       l_linenumber % 3 AS m1,
      |       l_partkey % 3 AS m2,
      |       l_suppkey % 3 AS m3
      |FROM lineitem""".stripMargin

  /** A8: bagged row mean over seed columns. */
  def rowMean(s: SparkSession, d: String): DataFrame = {
    val df = seedCols(s, d)
    df.select(col("l_orderkey"), col("l_linenumber"),
      RowOps.rowMean(Seq(col("seed_1"), col("seed_2"), col("seed_3")), 4).as("bagged"))
  }

  val rowMeanSql: String =
    s"""SELECT l_orderkey, l_linenumber,
       |       round((seed_1 + seed_2 + seed_3) / 3, 4) AS bagged
       |FROM ($seedColsSql)""".stripMargin

  /** A10: row mode with scipy tie-break (smallest value). */
  def rowMode(s: SparkSession, d: String): DataFrame = {
    val df = labelCols(s, d)
    df.select(col("l_orderkey"), col("l_linenumber"),
      RowOps.rowMode(Seq(col("m1"), col("m2"), col("m3"))).as("voted"))
  }

  // for 3 columns: any pair equal wins, else all-distinct → smallest.
  val rowModeSql: String =
    s"""SELECT l_orderkey, l_linenumber,
       |  CASE WHEN m1 = m2 OR m1 = m3 THEN m1
       |       WHEN m2 = m3 THEN m2
       |       ELSE least(m1, m2, m3) END AS voted
       |FROM ($labelColsSql)""".stripMargin

  /** F12: weighted soft vote (normalized weights, blender.py:229-244). */
  def softVote(s: SparkSession, d: String): DataFrame = {
    val df = seedCols(s, d)
    df.select(col("l_orderkey"), col("l_linenumber"),
      round(RowOps.weightedMean(
        Seq(col("seed_1"), col("seed_2"), col("seed_3")),
        Seq(0.5, 0.3, 0.2)), 6).as("blended"))
  }

  val softVoteSql: String =
    s"""SELECT l_orderkey, l_linenumber,
       |       round(seed_1 * 0.5 + seed_2 * 0.3 + seed_3 * 0.2, 6) AS blended
       |FROM ($seedColsSql)""".stripMargin

  /** F13: weighted hard vote, np.bincount-argmax semantics
    * (tie → lowest label). Weight sums accumulate in model-column order
    * on both sides so float results are bit-identical.
    */
  def hardVote(s: SparkSession, d: String): DataFrame = {
    val df = labelCols(s, d)
    df.select(col("l_orderkey"), col("l_linenumber"),
      RowOps.weightedVote(
        Seq(col("m1"), col("m2"), col("m3")),
        Seq(0.5, 0.3, 0.2)).as("voted"))
  }

  val hardVoteSql: String =
    s"""WITH base AS ($labelColsSql),
       |scored AS (
       |  SELECT l_orderkey, l_linenumber, m1, m2, m3,
       |    0.0 + (CASE WHEN m1 = m1 THEN 0.5 ELSE 0 END)
       |        + (CASE WHEN m2 = m1 THEN 0.3 ELSE 0 END)
       |        + (CASE WHEN m3 = m1 THEN 0.2 ELSE 0 END) AS s1,
       |    0.0 + (CASE WHEN m1 = m2 THEN 0.5 ELSE 0 END)
       |        + (CASE WHEN m2 = m2 THEN 0.3 ELSE 0 END)
       |        + (CASE WHEN m3 = m2 THEN 0.2 ELSE 0 END) AS s2,
       |    0.0 + (CASE WHEN m1 = m3 THEN 0.5 ELSE 0 END)
       |        + (CASE WHEN m2 = m3 THEN 0.3 ELSE 0 END)
       |        + (CASE WHEN m3 = m3 THEN 0.2 ELSE 0 END) AS s3
       |  FROM base
       |)
       |SELECT l_orderkey, l_linenumber,
       |  CASE WHEN s1 >= s2 AND s1 >= s3 AND (m1 <= m2 OR s1 > s2) AND (m1 <= m3 OR s1 > s3) THEN m1
       |       WHEN s2 >= s3 AND (m2 <= m1 OR s2 > s1) AND (m2 <= m3 OR s2 > s3) THEN m2
       |       ELSE m3 END AS voted
       |FROM scored""".stripMargin

  /** A12 shape check: per-(class, fold) sizes from the stratified fold
    * assigner are deterministic given class counts (index mod k), even
    * though membership is random — the oracle recomputes the sizes
    * arithmetically.
    */
  def foldSizes(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    Folds.assign(o, k = 5, seed = 42L, stratifyBy = Some("o_orderstatus"))
      .groupBy(col("o_orderstatus"), col("fold").cast("long").as("fold"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderstatus", "fold")
  }

  val foldSizesSql: String =
    """WITH cls AS (
      |  SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus
      |), folds AS (SELECT unnest(range(5)) AS fold)
      |SELECT c.o_orderstatus, f.fold,
      |       CAST(floor((c.n - 1 - f.fold) / 5.0) AS BIGINT) + 1 AS cnt
      |FROM cls c CROSS JOIN folds f
      |WHERE f.fold < c.n
      |ORDER BY c.o_orderstatus, f.fold""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_row_mean" -> (rowMean _),
    "q19_row_mode" -> (rowMode _),
    "q20_soft_vote" -> (softVote _),
    "q21_hard_vote" -> (hardVote _),
    "q25_fold_sizes" -> (foldSizes _))

  val oracles: Map[String, String] = Map(
    "q18_row_mean" -> rowMeanSql,
    "q19_row_mode" -> rowModeSql,
    "q20_soft_vote" -> softVoteSql,
    "q21_hard_vote" -> hardVoteSql,
    "q25_fold_sizes" -> foldSizesSql)
}
