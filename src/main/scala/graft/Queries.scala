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
    * data_processing/preprocessing.py:27-28,51-58.
    *
    * The money sums use the repo's micro-unit decimal-sum construction
    * (`Incremental.aggState` pattern): each row's money value rounds to
    * a fixed-point integer (cents for the 2-decimal inputs, 1e-4 units
    * for the price*(1-discount) product), the integers sum exactly in
    * decimal(38,0), and the quotient back to currency is a single
    * deterministic double op. `round(sum(double), 2)` was
    * order-DEPENDENT: at sf10 (60M rows, group sums ~5e11) the
    * float-sum's partial-aggregation order left 7 of 28 values ±1 cent
    * off the DuckDB replay (PLANS round-14 record); integer sums make
    * Spark and any replaying engine bit-equal at every scale. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    // 2-decimal inputs → cents are exact; the product has 4 decimal
    // digits → 1e-4 units. The sign-corrected quantizer reproduces
    // identically in DuckDB (same per-row double expression), so both
    // engines sum the SAME integers.
    val qtyC = graft.core.ExactSum.quantDec(col("l_quantity"), 100)
    val baseC = graft.core.ExactSum.quantDec(col("l_extendedprice"), 100)
    val discC = graft.core.ExactSum.quantDec(
      col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 0)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(qtyC).cast("double") / 100, 2).as("sum_qty"),
        round(sum(baseC).cast("double") / 100, 2).as("sum_base_price"),
        round(sum(discC).cast("double") / 10000, 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(CAST(sum(CAST(sign(l_quantity) * floor(abs(l_quantity) * 100 + 0.5) AS HUGEINT)) AS DOUBLE) / 100, 2) AS sum_qty,
      |  round(CAST(sum(CAST(sign(l_extendedprice) * floor(abs(l_extendedprice) * 100 + 0.5) AS HUGEINT)) AS DOUBLE) / 100, 2) AS sum_base_price,
      |  round(CAST(sum(CAST(sign(l_extendedprice * (1 - l_discount)) * floor(abs(l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000, 2) AS sum_disc_price,
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
