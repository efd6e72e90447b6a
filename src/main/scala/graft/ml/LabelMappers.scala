package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** §2.12: the reference `eval()`s a config-provided lambda to map
  * probability scores to class labels before the confusion matrix
  * (create_solution.py:347-349,585-587 — a code-injection surface).
  * Replaced by a CLOSED registry: named mappers plus a structural
  * parser for the reference configs' exact lambda shape
  * (`lambda x: A if x > T else B`, credit_scoring solution.conf:257),
  * matched by regex and compiled to a Column expression — config text
  * is never executed.
  */
object LabelMappers {

  private val LambdaThreshold =
    """lambda\s+x\s*:\s*(-?\d+)\s+if\s+x\s*(>=|>)\s*([0-9.eE+-]+)\s+else\s+(-?\d+)""".r
  private val Threshold = """threshold\(([0-9.eE+-]+)\)""".r

  /** Resolve a mapper spec to a score→label Column transform. */
  def resolve(spec: String): Column => Column = spec.trim match {
    case Threshold(t) =>
      val thr = t.toDouble
      c => when(c > thr, 1).otherwise(0)
    case "round" => c => round(c, 0).cast("int")
    case "identity" => c => c
    case LambdaThreshold(a, op, t, b) =>
      val thr = t.toDouble
      val (hi, lo) = (a.toInt, b.toInt)
      c => when(if (op == ">") c > thr else c >= thr, hi).otherwise(lo)
    case other => throw new IllegalArgumentException(
      s"unsupported labels_mapper '$other': named mappers only, code is never eval'd")
  }
}
