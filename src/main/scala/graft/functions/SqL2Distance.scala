package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: squared L2 distance of two float/double
  * array columns in one fused codegen loop.
  *
  * Why a custom Expression (the CosineSimilarity rationale): the
  * composable form — `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)),
  * 0.0, _+_)` — allocates a zipped intermediate array per row and walks
  * it through interpreted higher-order-function lambdas. It sits in the
  * hottest loops of the PQ family (encode = ks distance evaluations per
  * (vector, subspace); IVF assignment = nCells per vector; ADC tables =
  * ks per (probe, subspace)). The accumulation order is ascending index
  * exactly like the interpreted fold, so results are bit-identical and
  * every dump-replay oracle is unaffected.
  *
  * Semantics mirror the composed form: NULL for null inputs and for
  * length mismatches (zip_with pads with nulls, which nulls the fold);
  * 0.0 for two empty arrays (fold over an empty array returns the
  * zero element). Null ELEMENTS inside an array null the result the
  * same way.
  */
case class SqL2Distance(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okType(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left) && okType(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2_sq expects array<float>/array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xi - yi
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // x/y via freshName like the rest: raw locals would collide with
      // any enclosing generated scope declaring the same names, and a
      // Janino failure silently drops the whole stage to the
      // interpreted path — defeating the expression's purpose
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        int $n = $a.numElements();
        if ($b.numElements() != $n) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            double $x = (double) $a.$lGet($i);
            double $y = (double) $b.$rGet($i);
            $acc += ($x - $y) * ($x - $y);
          }
          if (!${ev.isNull}) { ${ev.value} = $acc; }
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqL2Distance =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "l2_sq"
}
