package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Kernel shared by interpreted eval and generated code (the NgramHash
  * pattern). */
object MinHashKernel {
  /** Per-seed constants: Spark's `xxhash64(lit(j), g)` evaluates as
    * `hashLong(g, hashInt(j, 42))` — the inner step depends only on j,
    * so it is precomputed once per (JVM, numHashes). */
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  def seeds(numHashes: Int): Array[Long] =
    seedCache.computeIfAbsent(numHashes, k =>
      Array.tabulate(k)(j => XXH64.hashInt(j, 42L)))

  /** The `numHashes` MinHash values of a gram multiset: out(j) =
    * min over grams g of xxhash64(seed=42; lit(j): int, g: long) —
    * BIT-IDENTICAL to the aggregate form
    * `groupBy(id).agg(min(xxhash64(lit(j), col("s"))))` over the
    * exploded (id, s) table, and to the streaming per-row form
    * `array_min(transform(gs, g -> xxhash64(lit(j), g)))` (asserted in
    * LlmOpsSpec). One pass over the array: grams × numHashes hashLong
    * calls, no explode, no aggregation machinery. */
  def signature(gs: ArrayData, numHashes: Int): ArrayData = {
    val n = gs.numElements()
    val sd = seeds(numHashes)
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (gs.isNullAt(i)) {
        // bit-parity with the exploded aggregate form: xxhash64 leaves
        // the accumulator untouched for a NULL input, so
        // xxhash64(lit(j), NULL) = hashInt(j, 42) = sd(j). Guarding here
        // (rather than getLong(i) blindly) avoids the silent-0L hash on
        // UnsafeArrayData / NPE on GenericArrayData for SQL callers
        // passing nullable-element arrays.
        var j = 0
        while (j < numHashes) {
          if (sd(j) < out(j)) out(j) = sd(j)
          j += 1
        }
      } else {
        val g = gs.getLong(i)
        var j = 0
        while (j < numHashes) {
          val h = XXH64.hashLong(g, sd(j))
          if (h < out(j)) out(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression: the `numHashes` seeded MinHash values of
  * a hashed-gram array column, as array<bigint>.
  *
  * Why a custom Expression: the engine's MinHash signature is a
  * per-DOCUMENT function (min over the doc's own grams), yet the
  * aggregate formulation forces a corpus-scale explode and a hash
  * aggregation over |grams| rows × numHashes columns just to compute
  * row-local math. This runs the identical hash sequence scan-local.
  * Returns NULL for empty/NULL gram arrays (a doc with no grams has no
  * signature — the exploded form produced no rows for it). */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] &&
        child.dataType.asInstanceOf[ArrayType].elementType == LongType &&
        numHashes >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects (array<bigint>, numHashes >= 1), " +
        s"got ${child.dataType.catalogString}, numHashes=$numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null
    else MinHashKernel.signature(arr, numHashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.MinHashKernel.signature($c, $numHashes);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}
