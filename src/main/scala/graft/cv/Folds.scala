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

    // zipWithIndex: global index in (stratum, rand) order without a
    // single-partition window. Sort is range-partitioned → distributed.
    val schema = StructType(sorted.schema.fields :+ StructField("__idx", LongType, nullable = false))
    val indexed = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
    // Two consumers follow (the offsets aggregate and the join back);
    // without a persist the repartition+sort+zip pipeline runs twice.
    indexed.persist()

    // per-stratum offset = count of all preceding strata (tiny frame,
    // broadcast join back).
    val offsets = indexed.groupBy("__strat").agg(
      min(col("__idx")).as("__offset"))
    indexed.join(broadcast(offsets), Seq("__strat"))
      .withColumn("fold", ((col("__idx") - col("__offset")) % k).cast("int"))
      .drop("__strat", "__idx", "__offset")
  }
}
