package graft.core

import org.apache.spark.sql.DataFrame

/** Guard for undersplit inputs feeding expensive scan-local work.
  *
  * A parquet file is only splittable at row-group boundaries, so a
  * single-row-group file scans as ONE task no matter how many cores the
  * session has — and every scan-local stage pipelined behind it (native
  * gram hashing, signature partial aggregation, image decodes) runs
  * single-threaded. The fix is the guide's input-skew rule: repartition
  * immediately after the read — but ONLY when the scan is actually
  * undersplit. At production scale inputs carry orders of magnitude
  * more splits than the cluster has cores, the guard is false, and no
  * repartition (no shuffle of the heavy payload) is ever added; the
  * shuffle only exists in exactly the regime where it buys parallelism
  * for work that costs far more than one extra pass over the bytes.
  */
object Parallelize {

  /** `df` hash-repartitioned to the session's default parallelism when
    * its physical plan currently yields fewer partitions, unchanged
    * otherwise. Row-identical either way — callers must (and in this
    * repo do) tolerate arbitrary row order, which any shuffle already
    * implies. */
  def scan(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val current = df.rdd.getNumPartitions
    if (current < target) df.repartition(target) else df
  }
}
