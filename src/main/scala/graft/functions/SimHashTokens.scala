package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Kernel shared by interpreted eval and generated code (the static
  * forwarder pattern of NgramHash). Computes the SimHash of a token
  * ARRAY with the exact semantics of the former distributed
  * formulation in `Dedup.simHash`:
  *
  *   - token set semantics (DISTINCT tokens of the array, string
  *     equality — two distinct tokens hashing alike still count once
  *     each, so this is NOT hash-set dedup);
  *   - per-token hash = the replayable md5-prefix construction
  *     `conv(substring(md5(utf8 bytes), 1, 15), 16, 10)` — the first
  *     15 hex chars of the md5 digest as a 60-bit value, which is the
  *     big-endian first 8 digest bytes shifted right one nibble;
  *   - per-bit vote: +1 when bit i of the hash is set, else −1;
  *     bit i of the output is set when its counter is >= 0 (ties set).
  *
  * A DuckDB oracle replays the whole chain (md5 → substr → ::BIGINT →
  * bit tests), which is why the hash is md5 and not xxhash64.
  */
object SimHashTokens {
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** 60-bit md5-prefix hash of the UTF-8 bytes — bit-identical to
    * Spark's conv(substring(md5(w.cast("binary")), 1, 15), 16, 10). */
  def hash60(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    var be = 0L
    var i = 0
    while (i < 8) { be = (be << 8) | (d(i) & 0xffL); i += 1 }
    be >>> 4 // drop the 16th hex nibble: 15 hex chars = 60 bits
  }

  /** Null (not a signature) when NO token voted — an empty array or an
    * array of only null elements. The old distributed formulation
    * (explode → distinct → groupBy) emitted no row at all for such
    * inputs, so "no signature" is the parity-preserving answer; an
    * all-zero counter vector would otherwise tie-break to an
    * all-bits-set signature and collide every degenerate document into
    * one giant near-dup bucket. (Null TOKENS differ from the old plan's
    * when/otherwise(-1) all-bits-down vote, but Dedup.simHash's
    * tokenizer never emits null elements; documented on the class.) */
  def simhash(tokens: ArrayData, bits: Int): java.lang.Long = {
    val n = tokens.numElements()
    val seen = new java.util.HashSet[UTF8String](math.max(16, n * 2))
    val counters = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val w = tokens.getUTF8String(i)
        if (seen.add(w)) {
          val h = hash60(w.getBytes)
          var b = 0
          while (b < bits) {
            if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
            b += 1
          }
        }
      }
      i += 1
    }
    if (seen.isEmpty) return null
    var out = 0L
    var b = 0
    while (b < bits) {
      if (counters(b) >= 0) out |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(out)
  }
}

/** Native Catalyst expression: SimHash signature of a token-array
  * column, as bigint.
  *
  * Why a custom Expression (same rationale as HashedShingles): the
  * distributed formulation — explode(tokens) → distinct → groupBy(id)
  * with `bits` conditional sums — shuffles the corpus's full
  * (id, token) stream TWICE (the distinct, then the signature
  * aggregate) just to build per-document signatures that are a pure
  * function of each document's own tokens. This expression computes
  * the signature scan-locally inside whole-stage codegen: at 100 TB
  * the signature stage runs at read bandwidth with zero Exchange, and
  * only the banded signatures (a few longs per document) ever shuffle.
  */
case class SimHashTokens(child: Expression, bits: Int) extends UnaryExpression {

  // Null input → null (UnaryExpression default), AND a non-null array
  // with no voting token (empty, or all-null elements) → null: see the
  // kernel scaladoc. Parity with the old distributed plan therefore
  // holds exactly for arrays with >= 1 non-null element; null ELEMENTS
  // are skipped rather than voting all-bits-down as the old
  // when/otherwise(-1) arm did (unreachable from Dedup.simHash, whose
  // tokenizer emits neither).
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if bits >= 1 && bits <= 60 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"simhash_tokens expects (array<string>, 1 <= bits <= 60), got " +
        s"${child.dataType.catalogString}, bits=$bits")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHashTokens.simhash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("simhashBoxed")
      s"""
      java.lang.Long $boxed = graft.functions.SimHashTokens.simhash($c, $bits);
      if ($boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $boxed.longValue(); }"""
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashTokens =
    copy(child = newChild)

  override def prettyName: String = "simhash_tokens"
}
