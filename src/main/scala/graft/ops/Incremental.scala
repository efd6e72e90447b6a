package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental-pipeline maintenance operators: mergeable per-key
  * aggregate state (so a 100 TB daily pipeline updates yesterday's
  * aggregates from today's delta instead of recomputing the corpus)
  * and snapshot diffing (added / removed / changed rows between two
  * table versions).
  *
  * The aggregate state is EXACT: values are scaled to integer
  * micro-units and summed as 38-digit decimals, so state merging is
  * plain integer addition — associative, commutative, and
  * bit-reproducible under any partitioning or merge order. Derived
  * moments (mean, population variance) are computed from the exact
  * sums by a fixed double-precision formula, so any engine computing
  * the same formula over the same integers produces identical bits —
  * no Welford/Chan float-merge drift, no tolerance windows.
  */
object Incremental {

  private val Scale = 1000000.0 // 6-dp micro-units

  /** Per-key mergeable state over `valueCol`: row count, exact scaled
    * sum and sum-of-squares (decimal), min/max in micro-units. */
  def aggState(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val vi = graft.core.ExactSum.quantLong(col(valueCol), Scale)
    df.select(col(keyCol).as("key"), vi.as("__vi"))
      // multiply in decimal: a micro-unit value past ~3e9 (|v| >= ~3038)
      // squares past the long range and would silently wrap
      .select(col("key"), col("__vi"),
        (col("__vi").cast("decimal(38,0)") * col("__vi").cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("__vi2"))
      .groupBy("key").agg(
        count(lit(1)).as("n"),
        sum(col("__vi").cast("decimal(38,0)")).as("s1"),
        sum(col("__vi2")).as("s2"),
        min(col("__vi")).as("mn"),
        max(col("__vi")).as("mx"))
  }

  /** Merge two state frames: integer addition per key (keys present in
    * only one side pass through). The result is identical to
    * `aggState` over the unioned input — asserted by spec. */
  def mergeState(a: DataFrame, b: DataFrame): DataFrame = {
    val bb = b.select(col("key"), col("n").as("nb"), col("s1").as("s1b"),
      col("s2").as("s2b"), col("mn").as("mnb"), col("mx").as("mxb"))
    a.join(bb, Seq("key"), "full_outer")
      .select(col("key"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("nb"), lit(0L))).as("n"),
        (coalesce(col("s1"), lit(0).cast("decimal(38,0)")) +
          coalesce(col("s1b"), lit(0).cast("decimal(38,0)"))).cast("decimal(38,0)").as("s1"),
        (coalesce(col("s2"), lit(0).cast("decimal(38,0)")) +
          coalesce(col("s2b"), lit(0).cast("decimal(38,0)"))).cast("decimal(38,0)").as("s2"),
        least(col("mn"), col("mnb")).as("mn"),
        greatest(col("mx"), col("mxb")).as("mx"))
  }

  /** Finalize a state frame into reported statistics. The formula is
    * part of the contract (an oracle computing the same expression
    * over the same exact sums reproduces every bit):
    * sum_v = s1/1e6; mean_v = (s1/1e6)/n;
    * var_v = s2/1e12/n - mean_v²; min/max = mn/1e6, mx/1e6. */
  def finish(state: DataFrame): DataFrame = {
    val s1d = col("s1").cast("double")
    val s2d = col("s2").cast("double")
    val mean = s1d / Scale / col("n")
    state.select(col("key"), col("n"),
      round(s1d / Scale, 6).as("sum_v"),
      round(mean, 6).as("mean_v"),
      round(s2d / lit(1e12) / col("n") - mean * mean, 6).as("var_v"),
      round(col("mn") / Scale, 6).as("min_v"),
      round(col("mx") / Scale, 6).as("max_v"))
  }

  /** SCD2-style validity intervals from a change log: each keyed event
    * is valid from its own timestamp until the key's next event
    * (exclusive); the latest event per key is current (open-ended).
    * One per-key window pass; ties broken by `tieCol` so the interval
    * chain is deterministic. Returns the input ids plus
    * (valid_from_us, valid_to_us nullable, is_current). */
  def scd2Intervals(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    df.select(col(tieCol), col(keyCol), col(tsCol))
      .withColumn("valid_from_us", unix_micros(col(tsCol)))
      .withColumn("valid_to_us", lead(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("is_current", col("valid_to_us").isNull)
      .drop(tsCol)
  }

  /** Snapshot diff: rows added, removed, or changed between two
    * versions of a keyed table. Content equality is an md5 over the
    * JSON of the compare-column struct (computed scan-local on each
    * side), so the full outer join carries one 16-byte digest per
    * row, never the payload. JSON keeps one DELIMITED, ESCAPED field
    * per column: a raw separator-joined concat is injectable — with
    * '|' glue, ('a|b', 'c') and ('a', 'b|c') serialize identically
    * and a real change is reported unchanged — and a null maps to an
    * ABSENT JSON field no string value can collide with (the earlier
    * NUL sentinel still collided with a literal NUL-string value).
    * Returns (key columns..., status ∈ added|removed|changed). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    def hashed(df: DataFrame, h: String): DataFrame =
      df.select(keyCols.map(col) :+
        md5(to_json(struct(compareCols.map(col): _*))).as(h): _*)
    hashed(oldDf, "__ho").join(hashed(newDf, "__hn"), keyCols, "full_outer")
      .withColumn("status",
        when(col("__ho").isNull, "added")
          .when(col("__hn").isNull, "removed")
          .when(col("__ho") =!= col("__hn"), "changed"))
      .filter(col("status").isNotNull)
      .select(keyCols.map(col) :+ col("status"): _*)
  }
}
