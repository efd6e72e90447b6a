package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract validation: declarative quality checks over tables,
  * reported as one (check_name, n_violations) row each — the dbt-test
  * / Great-Expectations-style gate a production pipeline runs before
  * publishing a dataset. Every check is a single distributed aggregate
  * (predicate counts scan-local; uniqueness a keys-as-data aggregate;
  * referential integrity a left-anti hash join), so the whole report
  * costs one pass per involved table at any scale.
  */
object Contracts {

  /** Rows violating a row-level predicate (`violation` true = bad). */
  def predicateCheck(df: DataFrame, name: String, violation: Column): DataFrame =
    df.agg(sum(violation.cast("long")).as("n_violations"))
      .select(lit(name).as("check_name"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"))

  /** Number of key values appearing more than once. */
  def uniquenessCheck(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Child rows whose foreign key has no parent (left-anti join). */
  def referentialCheck(child: DataFrame, parent: DataFrame, name: String,
      childKey: String, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Union of check reports into one frame. */
  def report(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)
}
