package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnAccess
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Serializable Bloom filter over 64-bit hashes, built driver-side
  * from a bounded key set and shipped to executors as an expression
  * reference object — the runtime-filter pattern: drop corpus rows at
  * the scan, long before any shuffle, with a structure whose size is
  * `bitsPerKey` bits per key regardless of key length.
  *
  * Construction is the standard double-hashing scheme (Kirsch &
  * Mitzenmacher 2006, "Less Hashing, Same Performance": probe i uses
  * h1 + i*h2 — the same construction Guava's BloomFilter and Parquet's
  * split-block filters derive from). Inputs are already 64-bit hashes
  * (xxhash64 of the keys); h1/h2 come from two rounds of the
  * SplitMix64 finalizer, which is enough independence for the probe
  * sequence. False positives are possible (rate ~0.6^bitsPerKey·ln2
  * ≈ 1% at 10 bits/key); false negatives are not — callers must
  * verify positives with an exact join, which the Bloom pass has
  * already made candidate-bounded.
  */
final class BloomBits(val bits: Array[Long], val k: Int) extends Serializable {
  def numBits: Long = bits.length.toLong * 64L
  def sizeBytes: Long = bits.length.toLong * 8L

  private[functions] def set(pos: Long): Unit = {
    bits((pos >>> 6).toInt) |= (1L << (pos & 63))
  }
  private[functions] def get(pos: Long): Boolean =
    (bits((pos >>> 6).toInt) & (1L << (pos & 63))) != 0L

  def add(h: Long): Unit = {
    val h1 = BloomKernel.mix(h)
    val h2 = BloomKernel.mix(h1)
    var i = 0
    while (i < k) {
      set(java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits))
      i += 1
    }
  }

  def mightContain(h: Long): Boolean = BloomKernel.mightContain(this, h)
}

/** Static kernel shared by interpreted eval and generated Java. */
object BloomKernel {

  /** SplitMix64 finalizer (Steele, Lea & Flood 2014) — the standard
    * 64-bit avalanche mix. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def mightContain(bf: BloomBits, h: Long): Boolean = {
    val h1 = mix(h)
    val h2 = mix(h1)
    val n = bf.numBits
    var i = 0
    while (i < bf.k) {
      if (!bf.get(java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, n)))
        return false
      i += 1
    }
    true
  }
}

object Bloom {

  /** Build a filter sized `bitsPerKey` bits per key (k = bitsPerKey·ln2
    * probes, the optimum for that budget) over pre-hashed 64-bit keys.
    * Driver-side by design: the key sets this engine blooms (benchmark
    * grams, blocklists) are bounded broadcast-scale sets; the corpus
    * side only ever evaluates `mightContain`. */
  def build(hashes: Array[Long], bitsPerKey: Int = 10): BloomBits = {
    require(bitsPerKey >= 1, s"bitsPerKey must be >= 1, got $bitsPerKey")
    val nBits = math.max(64L, hashes.length.toLong * bitsPerKey)
    val words = ((nBits + 63) / 64).toInt
    val k = math.max(1, math.round(bitsPerKey * math.log(2)).toInt)
    val bf = new BloomBits(new Array[Long](words), k)
    hashes.foreach(bf.add)
    bf
  }

  /** `might_contain` over a bigint hash column. */
  def mightContainCol(bloom: BloomBits, hashCol: Column): Column =
    GraftColumnAccess.column(
      BloomMightContain(GraftColumnAccess.expression(hashCol), bloom))
}

/** Native Catalyst expression: membership probe of a broadcast-by-
  * reference Bloom filter on a bigint hash column. Codegen'd so the
  * probe stays inside the scan's whole-stage pipeline — the filter
  * rides the generated class as a reference object exactly like the
  * BPE merge table. */
case class BloomMightContain(child: Expression, bloom: BloomBits)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a bigint hash, got ${child.dataType.catalogString}")

  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any =
    BloomKernel.mightContain(bloom, input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bloom, classOf[BloomBits].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BloomKernel.mightContain($ref, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}
