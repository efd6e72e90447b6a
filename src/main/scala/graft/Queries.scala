package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Central registry of driver-checked queries and their DuckDB oracles.
  *
  * Each entry exercises one operator from SURVEY.md §2. Implementations
  * live in the operator modules (graft.ops, graft.cv, graft.dedup, ...);
  * this object only binds them to the driver test tables.
  */
object Queries {

  /** A1-style pricing-summary aggregate: per-group sums/avgs/counts on
    * lineitem. Reference per-column aggregate scans:
    * data_processing/preprocessing.py:27-28,51-58. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 0)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_quantity >= 0
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // Registry
  // ---------------------------------------------------------------------

  val registry: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame]("q1_agg" -> (q1Agg _)) ++
      queries.Relational.registry ++
      queries.RowWise.registry ++
      queries.MlQueries.registry ++
      queries.LlmQueries.registry ++
      queries.MiscQueries.registry ++
      queries.TemporalQueries.registry ++
      queries.SketchQueries.registry ++
      queries.EvalQueries.registry ++
      queries.GraphQueries.registry ++
      queries.IncrementalQueries.registry

  val oracles: Map[String, String] =
    Map("q1_agg" -> q1AggSql) ++
      queries.Relational.oracles ++
      queries.RowWise.oracles ++
      queries.MlQueries.oracles ++
      queries.LlmQueries.oracles ++
      queries.MiscQueries.oracles ++
      queries.TemporalQueries.oracles ++
      queries.SketchQueries.oracles ++
      queries.EvalQueries.oracles ++
      queries.GraphQueries.oracles ++
      queries.IncrementalQueries.oracles
}
