package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Hash loop shared by interpreted eval and generated code (the
  * generated Java calls the static forwarder). Separate object so the
  * codegen body is a single call — the loop itself JITs the same
  * either way, and keeping it here avoids duplicating the UTF-8
  * walking logic in a Java string template. */
object NgramHash {
  /** xxhash64 (seed 42, Spark's convention) of every n-character
    * window of s, computed directly over the string's UTF-8 bytes:
    * one boundary-offset pass, then one hash per window over the
    * original buffer — no per-window UTF8String/substring allocation.
    * Empty array when the string has fewer than n characters. */
  def hashWindows(s: UTF8String, n: Int): ArrayData = {
    val numBytes = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // character-start byte offsets (ASCII fast path falls out: 1 byte
    // per char); offsets(nc) = numBytes sentinel closes the last window
    val offsets = new Array[Int](numBytes + 1)
    var nb = 0
    var nc = 0
    while (nb < numBytes) {
      offsets(nc) = nb
      nc += 1
      nb += UTF8String.numBytesForFirstByte(Platform.getByte(base, off + nb))
    }
    offsets(nc) = numBytes
    if (nc < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](nc - n + 1)
    var i = 0
    while (i <= nc - n) {
      out(i) = XXH64.hashUnsafeBytes(
        base, off + offsets(i), offsets(i + n) - offsets(i), 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Hashes of all k-token shingle windows of s: tokens are maximal
    * runs of non-whitespace (the same token set as split on \\s+ after
    * trim), each token is hashed over its byte range, and a window's
    * hash chains its k token hashes — so "a  b" and "a b" shingle
    * identically (whitespace-normalized, like the concat_ws(" ") form)
    * without ever materializing token or shingle strings. Empty array
    * when there are fewer than k tokens. */
  def hashTokenShingles(s: UTF8String, k: Int): ArrayData = {
    val numBytes = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // collect per-token hashes in one pass over the bytes
    var tokenHashes = new Array[Long](math.max(8, numBytes / 4))
    var nt = 0
    var i = 0
    while (i < numBytes) {
      while (i < numBytes && isSpace(Platform.getByte(base, off + i))) i += 1
      if (i < numBytes) {
        val start = i
        while (i < numBytes && !isSpace(Platform.getByte(base, off + i))) i += 1
        if (nt == tokenHashes.length)
          tokenHashes = java.util.Arrays.copyOf(tokenHashes, nt * 2)
        tokenHashes(nt) = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        nt += 1
      }
    }
    if (nt < k) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](nt - k + 1)
    var w = 0
    while (w <= nt - k) {
      var h = 42L
      var j = 0
      while (j < k) { h = XXH64.hashLong(tokenHashes(w + j), h); j += 1 }
      out(w) = h
      w += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression: 64-bit hashes of all character n-gram
  * windows of a string column, as array<bigint>.
  *
  * Why a custom Expression (same rationale as CosineSimilarity): the
  * composable form — `transform(sequence(1, length-n+1),
  * i -> xxhash64(substr(t, i, n)))` — allocates one UTF8String copy
  * per window and walks the interpreted higher-order-function lambda
  * per element; a 1000-char document costs ~1000 substring allocations
  * before hashing even starts. This expression walks the original
  * UTF-8 buffer once and hashes windows in place. Downstream (minhash
  * signatures, Jaccard verification) consumes only the hashes, so no
  * gram strings ever need to exist.
  */
case class HashedNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hashed_ngrams expects (string, n >= 1), got ${child.dataType.catalogString}, n=$n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    NgramHash.hashWindows(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramHash.hashWindows($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): HashedNgrams =
    copy(child = newChild)

  override def prettyName: String = "hashed_ngrams"
}

/** Native Catalyst expression: chained hashes of all k-token shingle
  * windows of a string column, as array<bigint>. Same rationale as
  * HashedNgrams — the composed form tokenizes with a regex split,
  * builds every shingle with concat_ws and hashes the copies; this
  * walks the byte buffer once. See NgramHash.hashTokenShingles for the
  * normalization contract. */
case class HashedShingles(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hashed_shingles expects (string, k >= 1), got ${child.dataType.catalogString}, k=$k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    NgramHash.hashTokenShingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramHash.hashTokenShingles($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)

  override def prettyName: String = "hashed_shingles"
}
