package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * `queries` maps operator names (SURVEY §2 inventory) to
  * `(SparkSession, sfDir) => DataFrame`; `oracleSql` carries the DuckDB
  * equivalent run by the driver on the same parquet tables. Column names
  * are aliased identically on both sides (the driver compare sorts
  * columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Pricing-summary aggregate over lineitem (reference A1/A2-style
    * per-column aggregation — preprocessing.py:27-58 computes per-column
    * stats; here grouped by return flag/status as the flagship).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.registry

  /** DuckDB-runnable ANSI SQL oracle per query key. */
  def oracleSql: Map[String, String] = Queries.oracles
}
