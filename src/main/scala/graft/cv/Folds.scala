package graft.cv

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** K-fold assignment — the Spark-first replacement for sklearn
  * KFold/StratifiedKFold(shuffle=True, random_state) used by the
  * reference's CV engine (modeling/prediction.py:329-336).
  *
  * Design for scale (SURVEY §7.4.2): a naive
  * `row_number().over(Window.orderBy(rand))` collapses the frame into a
  * single partition. Instead we do a distributed range-partitioned sort
  * by (stratum, rand(seed)) and derive exact per-row indices with
  * zipWithIndex (one extra count pass, no shuffle beyond the sort).
  * Fold id = per-stratum row index mod k — exact balance per stratum
  * (sizes differ by at most 1), like sklearn.
  *
  * Fold *membership* intentionally differs from sklearn for the same
  * seed (different RNG); tests assert the invariants — partition,
  * coverage, per-fold class proportions — not membership equality.
  */
object Folds {

  /** KFold(shuffle=False) analogue: fold = key % k. The reference's
    * unshuffled KFold slices by *position* (prediction.py:329-336 with
    * kfolds_shuffle=False); positional order is undefined on a
    * distributed engine, so the order-free equivalent keys the split on
    * a stable id column (documented deviation, same invariants:
    * partition, coverage, near-balance for dense keys). Pure
    * arithmetic — no shuffle at all. */
  def assignModulo(df: DataFrame, k: Int, idCol: String): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.withColumn("fold", pmod(col(idCol), lit(k)).cast("int"))
  }

  /** Adds a `fold` column in [0, k). `stratifyBy = None` gives plain
    * shuffled k-fold; `Some(col)` stratifies so every fold has the same
    * class mix (sizes per (class, fold) are deterministic given class
    * counts, independent of the seed).
    */
  def assign(df: DataFrame, k: Int, seed: Long,
      stratifyBy: Option[String] = None): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = df.sparkSession
    val strat = stratifyBy.map(col).getOrElse(lit(0))
    // Shuffle key = content hash seeded by `seed`: deterministic for a
    // given dataset regardless of physical partitioning (rand() is not —
    // it depends on partition index), so fold membership is reproducible
    // across runs and cluster sizes.
    val shuffleKey = xxhash64(lit(seed) +: df.columns.map(col): _*)
    val sorted = df.withColumn("__strat", strat.cast("string"))
      .withColumn("__h", shuffleKey)
      .repartitionByRange(col("__strat"), col("__h"))
      .sortWithinPartitions(col("__strat"), col("__h"))
      .drop("__h")

    // Per-stratum offsets are derived from a cheap source-side count
    // (strata = class labels, few by contract) collected BEFORE zipping,
    // so the expensive repartition+sort+zip pipeline below has exactly
    // one consumer — no persist needed, nothing cached for the life of
    // the session (each HPO trial used to leak one cached copy here).
    // Null strata sort first under range partitioning, matching the
    // nulls-first driver sort below.
    val counts = df.groupBy(strat.cast("string").as("__strat")).count()
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)))
      .sortBy(_._1)(Ordering.Option(Ordering.String)) // None (null stratum) first
    val offsets: Map[Option[String], Long] =
      counts.scanLeft((Option.empty[String], 0L)) { case ((_, acc), (s0, n)) => (s0, acc + n) }
        .drop(1).zip(counts).map { case ((s0, cum), (_, n)) => (s0, cum - n) }.toMap
    val offsetExpr = counts.map { case (s0, _) =>
      val cond = s0.map(v => col("__strat") === lit(v)).getOrElse(col("__strat").isNull)
      (cond, lit(offsets(s0)))
    }.foldRight(lit(0L): org.apache.spark.sql.Column) { case ((c0, v), acc) => when(c0, v).otherwise(acc) }

    // zipWithIndex: global index in (stratum, rand) order without a
    // single-partition window. Sort is range-partitioned → distributed.
    val schema = StructType(sorted.schema.fields :+ StructField("__idx", LongType, nullable = false))
    val indexed = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
    indexed
      .withColumn("fold", ((col("__idx") - offsetExpr) % k).cast("int"))
      .drop("__strat", "__idx")
  }
}
