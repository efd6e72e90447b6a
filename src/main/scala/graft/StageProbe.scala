package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** Per-stage attribution for one registry query: runs the query once
  * (after a warmup of q1), prints every completed stage's wall time,
  * task count, summed task run time and peak task time — the local-mode
  * stand-in for the Spark UI's stage table (guide §1.1/§7.1).
  *
  * Usage: runMain graft.StageProbe <sfDir> <query> [reps=1]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 1
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
    def checksum(df: DataFrame): Unit =
      df.agg(bit_xor(xxhash64(df.columns.map(col): _*))).collect()
    checksum(SparkEntry.queries("q1_agg")(spark, sfDir)) // warmup
    case class St(id: Int, name: String, tasks: Int, wallMs: Long,
      taskSumMs: Long, taskMaxMs: Long)
    val stages = ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val wall = (for {s <- i.submissionTime; c <- i.completionTime}
          yield c - s).getOrElse(-1L)
        val sum = i.taskMetrics.executorRunTime
        stages += St(i.stageId, i.name.linesIterator.next().take(90),
          i.numTasks, wall, sum, -1L)
      }
    })
    (1 to reps).foreach { r =>
      stages.clear()
      graft.core.Memo.clear()
      val t0 = System.nanoTime()
      checksum(SparkEntry.queries(name)(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let listener events drain
      println(f"== rep $r: $name total $wall%.3f s, ${stages.size} stages ==")
      stages.sortBy(-_.wallMs).take(30).foreach { s =>
        println(f"  stage ${s.id}%4d wall ${s.wallMs}%6d ms tasks ${s.tasks}%4d taskSum ${s.taskSumMs}%6d ms  ${s.name}")
      }
      println(f"  [stageWallSum] ${stages.map(_.wallMs).sum} ms over ${stages.size} stages")
    }
    spark.stop()
  }
}
