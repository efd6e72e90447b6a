package graft.pipeline

import java.nio.file.{Files, Paths}

/** §3.1 orchestration: a task DAG with Luigi's file-target semantics —
  * a task is *complete* iff every declared output file exists, complete
  * tasks are skipped wholesale, incomplete tasks first ensure their
  * dependencies then run (create_solution.py:67-69 and every Luigi
  * `output()`/`requires()` pair). Resume-after-partial-failure works by
  * construction: whatever produced its outputs stays skipped.
  */
object Pipeline {

  final case class Task(
      name: String,
      outputs: Seq[String],
      deps: Seq[Task] = Seq.empty)(val run: () => Unit)

  final case class Report(ran: Seq[String], skipped: Seq[String])

  def complete(t: Task): Boolean =
    t.outputs.nonEmpty && t.outputs.forall(o => Files.exists(Paths.get(o)))

  /** Post-order execution with memoized completeness. */
  def execute(roots: Task*): Report = {
    val ran = scala.collection.mutable.ListBuffer.empty[String]
    val skipped = scala.collection.mutable.ListBuffer.empty[String]
    val visited = scala.collection.mutable.Set.empty[String]
    def go(t: Task): Unit = {
      if (visited.contains(t.name)) return
      visited += t.name
      if (complete(t)) { skipped += t.name; return }
      t.deps.foreach(go)
      t.outputs.foreach(o => Option(Paths.get(o).getParent).foreach(Files.createDirectories(_)))
      t.run()
      require(complete(t),
        s"task ${t.name} ran but did not produce its declared outputs: ${t.outputs}")
      ran += t.name
    }
    roots.foreach(go)
    Report(ran.toSeq, skipped.toSeq)
  }
}
