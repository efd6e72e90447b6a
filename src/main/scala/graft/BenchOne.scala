package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}

/** Focused micro-bench for attribution work: time a comma-separated
  * list of registry queries, `reps` passes each (memo cleared between
  * passes), and print per-query all-pass timings + min. Same session
  * config and checksum-forcing as [[Bench]], so numbers are
  * comparable to the per-query entries of the full artifact.
  *
  * Usage: runMain graft.BenchOne <sfDir> <q1,q2,...> [reps=3] [pass]
  *
  * Default mode clears the memo before EVERY query rep, so each number
  * is that query's full-chain-from-scratch cost. `pass` mode instead
  * clears once per rep and runs the listed queries in order — the same
  * accounting as one [[Bench]] pass, so it attributes the INCREMENTAL
  * cost of each query given the group memo warm (the artifact's
  * per-query slot semantics).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    // distinct up front: pass mode keys per-pass timings by name, so a
    // duplicated input name would otherwise keep only its last
    // occurrence there while default mode timed each occurrence
    val names = args(1).split(',').toSeq.distinct
    val reps = if (args.length > 2) args(2).toInt else 3
    val passMode = args.length > 3 && args(3) == "pass"
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
    val times: Seq[(String, Seq[Double])] =
      if (passMode) {
        val perPass = (1 to reps).map { _ =>
          graft.core.Memo.clear()
          names.map { n =>
            val t0 = System.nanoTime()
            checksum(SparkEntry.queries(n)(spark, sfDir))
            n -> (System.nanoTime() - t0) / 1e9
          }
        }
        names.map(n => n -> perPass.map(_.toMap.apply(n)))
      } else names.map { n =>
        n -> (1 to reps).map { _ =>
          graft.core.Memo.clear()
          val t0 = System.nanoTime()
          checksum(SparkEntry.queries(n)(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }
      }
    times.foreach { case (n, ts) =>
      println(f"""{"query":"$n","min":${ts.min}%.3f,"passes":[${ts.map(t => f"$t%.3f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
