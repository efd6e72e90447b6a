package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Small operators closing out the SURVEY §2 inventory: column-name
  * surgery (F5/F6), deterministic sampling (R2), memory estimation
  * (A23), argmax (O6), and min-anchored binning (F16 pd.cut parity).
  */
object Misc {

  /** F5: uppercase all column names (preprocessing.py:147-148). */
  def upperCaseColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toUpperCase): _*)

  /** F6: suffix/prefix surgery on column names (prediction.py:301-309,
    * ensembler.py:85-91). */
  def addPrefix(df: DataFrame, prefix: String, except: Set[String]): DataFrame =
    df.toDF(df.columns.map(c => if (except.contains(c)) c else s"$prefix$c"): _*)

  def stripSuffix(df: DataFrame, suffix: String): DataFrame =
    df.toDF(df.columns.map(c => c.stripSuffix(suffix)): _*)

  /** R2: exact-n deterministic subsample — ordered by a content hash so
    * the "random" subset is reproducible on any cluster layout and
    * SQL-recomputable (the reference's sample(n, random_state),
    * preprocessing.py:170, is RNG-order-dependent; documented
    * deviation). A global sort of only the hash key + limit-pushdown
    * (TakeOrderedAndProject at the physical level — no full sort
    * materialization). */
  def deterministicSample(df: DataFrame, n: Int, keyCols: Seq[String]): DataFrame =
    df.orderBy(md5(concat_ws("|", keyCols.map(c => col(c).cast("string")): _*))).limit(n)

  /** Stratified exact-n sample: the first `n` rows PER GROUP under the
    * same content-hash order as `deterministicSample` (md5 of the key
    * columns, key tie-break) — reproducible on any cluster layout and
    * SQL-recomputable. The rank window partitions by the group key, so
    * this scales as one key shuffle; no global sort, no driver state. */
  def stratifiedSample(df: DataFrame, groupCol: String, n: Int,
      keyCols: Seq[String]): DataFrame = {
    val h = md5(concat_ws("|", keyCols.map(c => col(c).cast("string")): _*))
    val w = Window.partitionBy(groupCol)
      .orderBy(h +: keyCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Weighted sample WITHOUT replacement, exact size n, deterministic:
    * the Efraimidis–Spirakis (2006) exponential-key scheme with the
    * uniform drawn from the row's content hash instead of an RNG —
    * each row gets key = ln(u) / w (equivalent order to u^(1/w)) and
    * the top-n keys win. Inclusion probability is proportional to
    * weight, the draw is reproducible on any cluster layout, and the
    * selection is a TakeOrdered (no full sort materialization).
    * Weights must be strictly positive. */
  def weightedSampleTopN(df: DataFrame, n: Int, weightCol: String,
      keyCols: Seq[String]): DataFrame = {
    val coin = conv(substring(
      md5(concat_ws("|", keyCols.map(c => col(c).cast("string")): _*)), 1, 15),
      16, 10).cast("long") % 1000000L
    val u = (coin.cast("double") + 0.5) / 1000000.0 // (0,1), never 0
    df.withColumn("__es_key", log(u) / col(weightCol))
      .orderBy(col("__es_key").desc +: keyCols.map(col): _*)
      .limit(n)
      .drop("__es_key")
  }

  /** A23: estimated in-memory bytes per column — exact payload bytes
    * for strings, fixed width for primitives (the reference's
    * memory_usage aggregate, preprocessing.py:22,45-47, is
    * informational; deep=True string accounting is the analogue). */
  def memoryEstimate(df: DataFrame): DataFrame = {
    val n = df.columns.length
    val sizes = df.schema.fields.map { f =>
      f.dataType match {
        case StringType => sum(coalesce(length(col(f.name)), lit(0))).as(f.name)
        case dt => (count(lit(1)) * lit(dt.defaultSize)).as(f.name)
      }
    }
    val agged = df.agg(sizes.head, sizes.tail.toSeq: _*)
    agged.select(expr(
      s"stack($n, ${df.columns.map(c => s"'$c', `$c`").mkString(", ")}) as (feature, bytes)"))
      .orderBy("feature")
  }

  /** O6: argmax — the row carrying the maximum of `c`, deterministic
    * via explicit tie-break keys. orderBy+limit(1) compiles to a
    * TakeOrdered physical op (no global sort materialization). */
  def argmax(df: DataFrame, c: String, tieBreak: Seq[String]): DataFrame =
    df.orderBy(col(c).desc +: tieBreak.map(col(_).asc): _*).limit(1)

  /** F14: timestamp string for artifact naming (utils.py:48-53 format
    * '%Y-%m-%d_%H-%M'). */
  def timestampString(epochMillis: Long): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd_HH-mm")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(epochMillis))

  /** F15: random model id `model_%04d` — seeded for determinism where
    * the reference draws from an unseeded RNG (utils.py:159-173;
    * documented deviation for testability). */
  def modelId(seed: Long): String =
    f"model_${new scala.util.Random(seed).nextInt(10000)}%04d"

  /** F16 (pd.cut parity): n equal-width bins anchored at the column
    * min, rightmost edge inclusive — bin = min(floor((x-min)/w), n-1)
    * (utils.py:103-119 constructs these splits; visualization.py:105-116
    * counts per bin per class). Computed with a scalar min/max
    * pre-pass, then a single-pass binned aggregate. */
  def histogramCut(df: DataFrame, c: String, classCol: String, nbins: Int): DataFrame = {
    val r = df.agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    require(hi > lo, s"degenerate range [$lo,$hi] for $c")
    val w = (hi - lo) / nbins
    val bin = least(floor((col(c) - lit(lo)) / lit(w)), lit(nbins - 1)).cast("int")
    df.groupBy(bin.as("bin"), col(classCol))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("bin", classCol)
  }
}
