package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC (canonical composition)
  * normalization of a string column — the canonical-form step corpus
  * pipelines apply before hashing/dedup so that visually identical
  * text with different codepoint sequences (e.g. e + COMBINING ACUTE
  * vs the precomposed é) hashes identically.
  *
  * Why a custom Expression: Spark has no built-in NFC function (the
  * reference corpus tools and DuckDB's `nfc_normalize` both have one),
  * and a Scala UDF would box every row and block whole-stage codegen.
  * The JDK's `java.text.Normalizer` is the implementation — the
  * codegen path emits a direct static call, so the only per-row cost
  * is the unavoidable UTF8String <-> String conversion, with an ASCII
  * fast path (ASCII is NFC-invariant; `Normalizer.isNormalized` walks
  * it without allocating) skipping the round-trip entirely for the
  * common case.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$cls.nfc($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  /** Shared interpreted/codegen kernel. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
