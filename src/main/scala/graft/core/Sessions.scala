package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Settings chosen for scale (see SURVEY.md §4/§7): AQE on (runtime
  * re-planning, skew-join splitting, shuffle coalescing), UTC session
  * timezone (oracle parity), shuffle partitions sized to the local core
  * count rather than the 200 default. On a real cluster the caller
  * overrides `shufflePartitions` to ~2-3x total executor cores.
  */
object Sessions {

  def local(
      appName: String = "graft",
      cores: Int = Runtime.getRuntime.availableProcessors(),
      shufflePartitions: Int = 32,
      extraConf: Map[String, String] = Map.empty): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .withExtensions(graft.functions.GraftFunctions.inject)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) which Spark 4 refuses by
      // default; read as epoch-nanos long and convert explicitly.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    extraConf.foreach { case (k, v) => spark.config(k, v) }
    val built = spark.getOrCreate()
    built.sparkContext.setLogLevel("WARN")
    built
  }
}
