package graft.core

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.DataFrame

/** Plan-evidence hook for INTERNAL frames that the registry-level
  * `ExplainDump` cannot see: operators that end in a localCheckpoint
  * dump as `Scan ExistingRDD` at the registry boundary, and operators
  * that compute their scalars eagerly dump as `LocalTableScan` — the
  * round-17 verdict's "vacuous exactly where the biggest claims are"
  * gap. Operators call `mark(name, df)` right before the truncating
  * boundary; the call is a no-op (one system-property read) unless
  * `graft.plantrace.dir` is set, in which case the formatted plan is
  * appended to `<dir>/<name>.txt`. Append (not overwrite) because
  * iterative operators mark once per round and memoized pipelines mark
  * once per build — the file then shows every marked plan of the run.
  */
object PlanTrace {
  def mark(name: String, df: DataFrame): Unit = {
    val dir = System.getProperty("graft.plantrace.dir")
    if (dir == null || dir.isEmpty) return
    try {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.createDirectories(Paths.get(dir))
      Files.write(Paths.get(dir, s"$name.txt"),
        (s"== PlanTrace $name ==\n$txt\n").getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    } catch { case _: Throwable => () } // evidence must never fail the job
  }
}
