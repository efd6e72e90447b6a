package graft

import org.apache.spark.sql.functions._

/** LSH bucket census (dev-only; run via
  * `sbt "Test/runMain graft.BucketProbe <sfDir>"`).
  *
  * For several (bands, rowsPerBand) shapes, computes the (band, bsig)
  * bucket-size distribution of the char-5-gram min-hash banding and
  * the candidate-pair mass Σ C(size, 2) — total and under caps — so a
  * banding config can be chosen from MEASUREMENT before paying the
  * candidate self-join. This is the cheap half of the pipeline (one
  * signature aggregate + one count per config); the expensive half is
  * exactly the candidate mass this probe prices. */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .withExtensions(graft.functions.GraftFunctions.inject)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, args(0))
    val sh = graft.dedup.Dedup
      .hashedCharNgrams(docs, "doc_id", "text", 5).cache()
    sh.count()
    val pairs = (col("n") * (col("n") - 1) / 2).cast("double")
    Seq((8, 4), (16, 4), (8, 6), (12, 6), (16, 6), (8, 8)).foreach {
      case (b, r) =>
        val t0 = System.nanoTime()
        val sizes = graft.dedup.Dedup.bandedSignatures(sh, b, r)
          .groupBy("band", "bsig").agg(count(lit(1)).as("n"))
        val row = sizes.agg(
          sum(pairs).as("cand_all"),
          sum(when(col("n") <= 10000, pairs)).as("cand_cap10k"),
          sum(when(col("n") <= 1000, pairs)).as("cand_cap1k"),
          sum(when(col("n") <= 100, pairs)).as("cand_cap100"),
          max(col("n")).as("max_bucket"),
          count(lit(1)).as("n_buckets")).head()
        println(f"[bucketprobe] b=$b%2d r=$r%d " +
          f"candAll=${row.getDouble(0)}%.3g " +
          f"cap10k=${Option(row.get(1)).fold(0.0)(_ => row.getDouble(1))}%.3g " +
          f"cap1k=${Option(row.get(2)).fold(0.0)(_ => row.getDouble(2))}%.3g " +
          f"cap100=${Option(row.get(3)).fold(0.0)(_ => row.getDouble(3))}%.3g " +
          f"maxBucket=${row.getLong(4)}%d buckets=${row.getLong(5)}%d " +
          f"wall=${(System.nanoTime() - t0) / 1e9}%.0fs")
    }
    spark.stop()
  }
}
