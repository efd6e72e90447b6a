package graft

/** Output-cardinality probe for scale rehearsals (dev-only; run via
  * `sbt "Test/runMain graft.Sf3Count <sfDir> <query> [query...]"`).
  * Counts each registry query's result so rehearsal runtime growth can
  * be attributed to answer growth vs plan degeneration (PLANS.md
  * round-12 sf3 probe). */
object Sf3Count {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .withExtensions(graft.functions.GraftFunctions.inject)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { q =>
      println(s"[count] $q = " +
        SparkEntry.queries(q)(spark, args(0)).count())
    }
    spark.stop()
  }
}
