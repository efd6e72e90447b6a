package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a list of registry queries to files —
  * the plan evidence the optimization rounds commit under plans/rNN/.
  *
  * Usage: runMain graft.ExplainDump <sfDir> <outDir> <suffix> [q1,q2,... | all]
  *
  * Writes <outDir>/<query>_<suffix>.txt per query. Uses the same session
  * config as [[Bench]] so the plans are the benched plans (AQE on; the
  * dump is the initial plan, isFinalPlan=false — join-strategy/exchange
  * structure is what the files evidence).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names: Seq[String] =
      if (args.length < 4 || args(3) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(3).split(',').toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(graft.functions.GraftFunctions.inject)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    // Route graft.core.PlanTrace marks (the INTERNAL pre-checkpoint /
    // pre-collect frames that the registry-level dump cannot see — they
    // truncate to Scan ExistingRDD / LocalTableScan) into the same out
    // dir, tagged with the suffix (round-18, verdict ask #9). Building
    // a query's frame below may eagerly run its scalar/checkpoint jobs,
    // which is exactly when the marks fire.
    System.setProperty("graft.plantrace.dir", s"$outDir/trace_$suffix")
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.write(Paths.get(outDir, s"${n}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[explain] $n -> $outDir/${n}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[explain] $n FAILED: ${e.toString.linesIterator.next()}")
      }
    }
    spark.stop()
  }
}
