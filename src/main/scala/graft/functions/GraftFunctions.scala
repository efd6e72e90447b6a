package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Registration for graft's native Catalyst expressions — available
  * both as a `SparkSessionExtensions` injector (canonical path:
  * `Sessions.local` wires it in, and spark.sql.extensions can name
  * `GraftExtensions` in any deployment) and as an idempotent
  * per-session registration for externally created sessions.
  */
object GraftFunctions {

  private val cosineBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, s"cosine_sim expects 2 arguments, got ${children.size}")
    CosineSimilarity(children.head, children(1))
  }

  private val cosineInfo = new ExpressionInfo(
    classOf[CosineSimilarity].getCanonicalName, "cosine_sim")

  private val ngramBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, s"hashed_ngrams expects 2 arguments, got ${children.size}")
    val n = children(1) match {
      case e if e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType =>
        e.eval().asInstanceOf[Int]
      case other => throw new IllegalArgumentException(
        s"hashed_ngrams n must be an integer literal, got $other")
    }
    HashedNgrams(children.head, n)
  }

  private val ngramInfo = new ExpressionInfo(
    classOf[HashedNgrams].getCanonicalName, "hashed_ngrams")

  private val shingleBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, s"hashed_shingles expects 2 arguments, got ${children.size}")
    val k = children(1) match {
      case e if e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType =>
        e.eval().asInstanceOf[Int]
      case other => throw new IllegalArgumentException(
        s"hashed_shingles k must be an integer literal, got $other")
    }
    HashedShingles(children.head, k)
  }

  private val shingleInfo = new ExpressionInfo(
    classOf[HashedShingles].getCanonicalName, "hashed_shingles")

  private val isectBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2,
      s"sorted_intersect_count expects 2 arguments, got ${children.size}")
    SortedIntersectCount(children.head, children(1))
  }

  private val isectInfo = new ExpressionInfo(
    classOf[SortedIntersectCount].getCanonicalName, null, "sorted_intersect_count",
    "_FUNC_(a, b) - Returns |a ∩ b| for two array<bigint> inputs that MUST " +
      "be sorted ascending (e.g. via sort_array); unsorted input returns an " +
      "undercount. Null elements match nothing; duplicates count pairwise-min.",
    "")

  private val simhashBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, s"simhash_tokens expects 2 arguments, got ${children.size}")
    val bits = children(1) match {
      case e if e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType =>
        e.eval().asInstanceOf[Int]
      case other => throw new IllegalArgumentException(
        s"simhash_tokens bits must be an integer literal, got $other")
    }
    SimHashTokens(children.head, bits)
  }

  private val simhashInfo = new ExpressionInfo(
    classOf[SimHashTokens].getCanonicalName, "simhash_tokens")

  private val l2sqBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, s"l2_sq expects 2 arguments, got ${children.size}")
    SqL2Distance(children.head, children(1))
  }

  private val l2sqInfo = new ExpressionInfo(
    classOf[SqL2Distance].getCanonicalName, "l2_sq")

  private val minhashSigBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2,
      s"minhash_signature expects 2 arguments, got ${children.size}")
    val k = children(1) match {
      case e if e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType =>
        e.eval().asInstanceOf[Int]
      case other => throw new IllegalArgumentException(
        s"minhash_signature numHashes must be an integer literal, got $other")
    }
    MinHashSignature(children.head, k)
  }

  private val minhashSigInfo = new ExpressionInfo(
    classOf[MinHashSignature].getCanonicalName, "minhash_signature")

  private val nfcBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 1, s"nfc_normalize expects 1 argument, got ${children.size}")
    NfcNormalize(children.head)
  }

  private val nfcInfo = new ExpressionInfo(
    classOf[NfcNormalize].getCanonicalName, "nfc_normalize")

  def inject(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_sim"), cosineInfo, cosineBuilder))
    ext.injectFunction((FunctionIdentifier("hashed_ngrams"), ngramInfo, ngramBuilder))
    ext.injectFunction((FunctionIdentifier("hashed_shingles"), shingleInfo, shingleBuilder))
    ext.injectFunction((FunctionIdentifier("sorted_intersect_count"), isectInfo, isectBuilder))
    ext.injectFunction((FunctionIdentifier("nfc_normalize"), nfcInfo, nfcBuilder))
    ext.injectFunction((FunctionIdentifier("simhash_tokens"), simhashInfo, simhashBuilder))
    ext.injectFunction((FunctionIdentifier("minhash_signature"), minhashSigInfo, minhashSigBuilder))
    ext.injectFunction((FunctionIdentifier("l2_sq"), l2sqInfo, l2sqBuilder))
  }

  /** Idempotent registration into an existing session's registry. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val cid = FunctionIdentifier("cosine_sim")
    if (!registry.functionExists(cid))
      registry.registerFunction(cid, cosineInfo, cosineBuilder)
    val nid = FunctionIdentifier("hashed_ngrams")
    if (!registry.functionExists(nid))
      registry.registerFunction(nid, ngramInfo, ngramBuilder)
    val sid = FunctionIdentifier("hashed_shingles")
    if (!registry.functionExists(sid))
      registry.registerFunction(sid, shingleInfo, shingleBuilder)
    val iid = FunctionIdentifier("sorted_intersect_count")
    if (!registry.functionExists(iid))
      registry.registerFunction(iid, isectInfo, isectBuilder)
    val fid = FunctionIdentifier("nfc_normalize")
    if (!registry.functionExists(fid))
      registry.registerFunction(fid, nfcInfo, nfcBuilder)
    val shid = FunctionIdentifier("simhash_tokens")
    if (!registry.functionExists(shid))
      registry.registerFunction(shid, simhashInfo, simhashBuilder)
    val mid = FunctionIdentifier("minhash_signature")
    if (!registry.functionExists(mid))
      registry.registerFunction(mid, minhashSigInfo, minhashSigBuilder)
    val lid = FunctionIdentifier("l2_sq")
    if (!registry.functionExists(lid))
      registry.registerFunction(lid, l2sqInfo, l2sqBuilder)
  }

  /** Column API for the native cosine similarity. Ensures registration
    * on the owning session, then resolves through the registry. */
  def cosineSim(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("cosine_sim", a, b)
  }

  /** Column API for the native char-n-gram hasher. */
  def hashedNgrams(spark: SparkSession, text: Column, n: Int): Column = {
    register(spark)
    call_function("hashed_ngrams", text, org.apache.spark.sql.functions.lit(n))
  }

  /** Column API for the native k-token shingle hasher. */
  def hashedShingles(spark: SparkSession, text: Column, k: Int): Column = {
    register(spark)
    call_function("hashed_shingles", text, org.apache.spark.sql.functions.lit(k))
  }

  /** Column API for the native sorted-array intersection counter. */
  def sortedIntersectCount(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("sorted_intersect_count", a, b)
  }

  /** Column API for the native squared-L2 distance. */
  def l2Sq(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("l2_sq", a, b)
  }

  /** Column API for the native per-row MinHash signature. */
  def minhashSignature(spark: SparkSession, grams: Column, numHashes: Int): Column = {
    register(spark)
    call_function("minhash_signature", grams,
      org.apache.spark.sql.functions.lit(numHashes))
  }

  /** Column API for the native token-array SimHash. */
  def simhashTokens(spark: SparkSession, tokens: Column, bits: Int): Column = {
    register(spark)
    call_function("simhash_tokens", tokens, org.apache.spark.sql.functions.lit(bits))
  }

  /** Column API for the native Unicode NFC normalizer. */
  def nfcNormalize(spark: SparkSession, s: Column): Column = {
    register(spark)
    call_function("nfc_normalize", s)
  }
}

/** `spark.sql.extensions`-compatible injector class. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}
