package graft

/** sf10 char-gram near-dup probe (dev-only; run via
  * `sbt "Test/runMain graft.NgramProbe <sfDir> [maxBucketSize] [bands] [rowsPerBand] [minAgree]"`).
  *
  * Times ngramJaccardNearDup with an explicit maxBucketSize and counts
  * its pairs, plus reports the (band, bsig) bucket-size distribution —
  * the sf10 cliff diagnosis: a 31-word vocabulary makes the min-hash
  * over densely-shared grams collide into near-cap buckets, and each
  * bucket contributes C(size, 2) candidates, so the DEFAULT 10k cap
  * admits ~5e7 candidates per near-cap bucket. The knob (a tighter
  * cap, mirrored in oracles like every engaged cap) restores
  * answer-bound cost; a real corpus's gram diversity keeps buckets
  * tiny without it. */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .withExtensions(graft.functions.GraftFunctions.inject)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val cap = if (args.length > 1) args(1).toInt else 10000
    val bands = if (args.length > 2) args(2).toInt else 8
    val rows = if (args.length > 3) args(3).toInt else 4
    val agree = if (args.length > 4) args(4).toInt else 1
    val docs = graft.core.Tables.documents(spark, args(0))
    val t0 = System.nanoTime()
    val pairs = graft.dedup.Dedup.ngramJaccardNearDup(docs, "doc_id",
      "text", threshold = 0.5, n = 5, bands = bands, rowsPerBand = rows,
      maxBucketSize = cap, minBandAgreements = agree)
    val n = pairs.count()
    println(f"[ngramprobe] b=$bands%d r=$rows%d cap=$cap%d agree=$agree%d " +
      f"pairs=$n%d wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
