package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Preprocessing operators — Spark-first re-expressions of the
  * reference's pandas column ops (data_processing/preprocessing.py).
  *
  * All functions are pure `DataFrame => DataFrame` (or return small
  * stat frames) and compile to Catalyst expressions: single-pass
  * aggregates where the reference loops per column, join+coalesce where
  * the reference patches rows in a Python loop. No collect() in any
  * data path except where a scalar statistic is genuinely needed by a
  * subsequent cast decision (downcast), matching the reference's
  * two-phase behavior.
  */
object Preprocess {

  /** A1+downcast: narrow numeric column types based on a single-pass
    * min/max scan (reference preprocessing.py:16-48 loops per column;
    * here one job computes all bounds). float16 has no Spark analogue —
    * floor is FloatType (SURVEY §1.4, documented widening).
    */
  def downcast(df: DataFrame): DataFrame = {
    val intCols = df.schema.fields.collect {
      case f if f.dataType == LongType || f.dataType == IntegerType ||
        f.dataType == ShortType => f.name
    }
    if (intCols.isEmpty) return df
    val bounds = df.agg(
      intCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
        .head, intCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))).tail: _*)
      .collect()(0)
    val casts = intCols.map { c =>
      val lo = Option(bounds.getAs[Any](s"min_$c")).map(_.toString.toLong).getOrElse(0L)
      val hi = Option(bounds.getAs[Any](s"max_$c")).map(_.toString.toLong).getOrElse(0L)
      val t: DataType =
        if (lo >= Byte.MinValue && hi <= Byte.MaxValue) ByteType
        else if (lo >= Short.MinValue && hi <= Short.MaxValue) ShortType
        else if (lo >= Int.MinValue && hi <= Int.MaxValue) IntegerType
        else LongType
      c -> t
    }.toMap
    df.select(df.columns.map { c =>
      casts.get(c).map(t => col(c).cast(t).as(c)).getOrElse(col(c))
    }: _*)
  }

  /** A2: per-column null counts (absolute + percent), unpivoted to
    * (feature, total, percent), filtered >0, sorted desc
    * (preprocessing.py:51-67). One aggregate job for all columns, then
    * an unpivot — no per-column pass.
    */
  def nullStats(df: DataFrame): DataFrame = {
    val n = df.columns.length
    val counts = df.select(
      df.columns.map(c => sum(col(c).isNull.cast("long")).as(c)).toSeq :+
        count(lit(1)).as("__total_rows"): _*)
    val stacked = counts.select(
      expr(s"stack($n, ${df.columns.map(c => s"'$c', `$c`").mkString(", ")}) as (feature, total)"),
      col("__total_rows"))
    stacked
      .filter(col("total") > 0)
      .select(
        col("feature"),
        col("total"),
        round(col("total") * 100.0 / col("__total_rows"), 4).as("percent"))
      .orderBy(desc("total"), col("feature"))
  }

  /** A3: group-wise imputation — fill NA in `target` with `aggType` of
    * the column within `keys` groups. The reference does a driver-side
    * per-row loop (preprocessing.py:90-112); here it is an aggregate +
    * equi-join + coalesce, fully distributed. Join is broadcast when the
    * group count is small (Catalyst/AQE decides; group side is an agg of
    * the same table so it is always the small side).
    */
  def imputeByGroup(df: DataFrame, keys: Seq[String], target: String,
      aggType: String = "mean"): DataFrame = {
    val aggCol = aggExpr(aggType, target).as("__imputed")
    val groups = df.filter(col(target).isNotNull).groupBy(keys.map(col): _*).agg(aggCol)
    // no broadcast hint: a forced broadcast OOMs the driver when the
    // grouping key is high-cardinality; AQE broadcasts the (always
    // smaller) aggregate side by measured size instead
    df.join(groups, keys, "left")
      .withColumn(target, coalesce(col(target), col("__imputed")))
      .drop("__imputed")
  }

  /** A4: global imputation — fill NA with an aggregate of the combined
    * non-null values (preprocessing.py:115-133).
    */
  def imputeGlobal(df: DataFrame, targets: Seq[String],
      aggType: String = "mean"): DataFrame = {
    val row = df.agg(
      aggExpr(aggType, targets.head).as(targets.head),
      targets.tail.map(c => aggExpr(aggType, c).as(c)): _*).collect()(0)
    val fills = targets.flatMap(c => Option(row.getAs[Any](c)).map(v =>
      c -> v.toString.toDouble)).toMap
    df.na.fill(fills)
  }

  private def aggExpr(aggType: String, c: String): Column = aggType match {
    case "mean" => avg(col(c))
    case "median" => percentile_approx(col(c), lit(0.5), lit(10000))
    case "min" => min(col(c))
    case "max" => max(col(c))
    case other => throw new IllegalArgumentException(s"agg_type $other")
  }

  /** A5: normalized value counts ×100 (preprocessing.py:201-203).
    * groupBy + a window-free normalization via a scalar total computed
    * in the same plan (sum over window of the whole frame is a single
    * shuffle; the agg output is tiny so the window is cheap).
    */
  def valueCounts(df: DataFrame, c: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.groupBy(col(c))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("share_pct",
        round(col("cnt") * 100.0 / sum(col("cnt")).over(Window.partitionBy()), 4))
      .orderBy(desc("cnt"), col(c))
  }

  /** P8: columns whose non-null values are all in {0,1}
    * (preprocessing.py:238-240). Single aggregate over all candidate
    * columns; returns the qualifying column names (driver-side, small).
    */
  def binaryColumns(df: DataFrame, candidates: Seq[String]): Seq[String] = {
    if (candidates.isEmpty) return Nil
    val flags = candidates.map(c =>
      max(when(col(c).isNotNull && !col(c).isin(0, 1), 1).otherwise(0)).as(c))
    val row = df.agg(flags.head, flags.tail: _*).collect()(0)
    candidates.filter(c => row.getAs[Int](c) == 0)
  }

  /** A6: near-zero-variance scan over binary columns — sklearn
    * VarianceThreshold uses the population variance
    * (preprocessing.py:222-254); Spark `var_pop` matches. Returns
    * (feature, variance) for all candidates; caller thresholds.
    */
  def variancePop(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c => round(var_pop(col(c)), 8).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val n = cols.length
    row.select(expr(
      s"stack($n, ${cols.map(c => s"'$c', `$c`").mkString(", ")}) as (feature, variance)"))
      .orderBy("feature")
  }

  /** A7: per-column skewness and excess kurtosis (preprocessing.py:
    * 261-274). Spark built-ins implement the bias-uncorrected moments
    * (g1 = m3/m2^1.5, g2 = m4/m2^2 - 3) matching scipy's defaults.
    */
  def skewKurt(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      round(skewness(col(c)), 6).as(s"skew_$c"),
      round(kurtosis(col(c)), 6).as(s"kurt_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val n = cols.length
    row.select(expr(
      s"stack($n, ${cols.map(c => s"'$c', `skew_$c`, `kurt_$c`").mkString(", ")}) as (feature, skewness, kurtosis)"))
      .orderBy("feature")
  }

  /** F1/F2/F3: the reference's skew-reduction transform ladder
    * (preprocessing.py:277-300,361,374-378). The `x ** 1/N` branch in
    * the reference actually computes `(x**1)/N` due to Python operator
    * precedence (preprocessing.py:284-286) — behavior is spec, so the
    * "root" family is x/2, x/3, x/4 (SURVEY §7.4.7).
    */
  def transformLadder(c: Column): Seq[(String, Column)] = Seq(
    "log" -> log(c),
    "log1p" -> log1p(c),
    "abs" -> abs(c),
    "pow2" -> pow(c, 2),
    "pow3" -> pow(c, 3),
    "pow4" -> pow(c, 4),
    "div2" -> (c / 2),
    "div3" -> (c / 3),
    "div4" -> (c / 4))

  /** Result of the composed skew-reduction pass: `data` = input with
    * abs() applied in place to all-negative columns and one winning
    * transform column appended per improved feature; `summary` rows =
    * (feature, original_skew, chosen, chosen_skew). */
  final case class SkewTransformResult(
      data: DataFrame, summary: DataFrame,
      transformed: Map[String, String], appliedAbs: Seq[String])

  /** The reference's full `transform_skewed_features` driver
    * (preprocessing.py:326-415), distributed: two aggregate passes
    * total (one for per-column skew/min/max/zero stats, one for the
    * skew of every candidate transform of every column) instead of the
    * reference's per-feature loop.
    *
    * Behavior-as-spec notes (SURVEY §7.4.7):
    *  - all-values<=0 columns get abs() applied in place
    *    (preprocessing.py:356-367); skew(|x|) = -skew(x) there, used
    *    analytically for the post-abs baseline;
    *  - log1p when the column contains 0, log otherwise
    *    (preprocessing.py:374-378);
    *  - skew<0 -> the "root" ladder, which by the x**1/N precedence
    *    bug is x/2, x/3, x/4; skew>0 -> x^2, x^3, x^4
    *    (preprocessing.py:277-300,380-387);
    *  - winner = min |skew| over [original, log-family, ladder] in that
    *    column order (dict-order tie-break, preprocessing.py:393-394),
    *    kept only when |  |best| - |orig|  | > minSkewImprovement;
    *  - exact skew == 0.0 (and undefined skew) -> feature skipped.
    */
  def transformSkewed(df: DataFrame, cols: Seq[String],
      minSkewImprovement: Double = 0.15): SkewTransformResult = {
    val spark = df.sparkSession
    import spark.implicits._

    val statAggs = cols.flatMap(c => Seq(
      skewness(col(c)).as(s"sk_$c"), min(col(c)).cast("double").as(s"mn_$c"),
      max(col(c)).cast("double").as(s"mx_$c"),
      max(when(col(c) === 0, 1).otherwise(0)).as(s"z_$c")))
    val r1 = df.agg(statAggs.head, statAggs.tail: _*).collect()(0)
    def num(r: org.apache.spark.sql.Row, n: String): Double =
      r.getAs[Any](n) match { case null => Double.NaN; case x: Number => x.doubleValue }

    val absCols = cols.filter(c => num(r1, s"mn_$c") < 0.0 && num(r1, s"mx_$c") <= 0.0).toSet
    val baseSkew = cols.map { c =>
      c -> (if (absCols(c)) -num(r1, s"sk_$c") else num(r1, s"sk_$c"))
    }.toMap
    val hasZero = cols.map(c => c -> (num(r1, s"z_$c") == 1.0)).toMap
    def base(c: String): Column = if (absCols(c)) abs(col(c)) else col(c)

    val active = cols.filter(c => baseSkew(c) != 0.0 && !baseSkew(c).isNaN)
    val candidates: Seq[(String, String, Column)] = active.flatMap { c =>
      val logCand =
        if (hasZero(c)) Seq((c, s"${c}_LOG1P", log1p(base(c))))
        else Seq((c, s"${c}_LOG", log(base(c))))
      val ladder =
        if (baseSkew(c) < 0)
          Seq(s"$c^1/2" -> base(c) / 2, s"$c^1/3" -> base(c) / 3, s"$c^1/4" -> base(c) / 4)
        else
          Seq(s"$c^2" -> pow(base(c), 2), s"$c^3" -> pow(base(c), 3), s"$c^4" -> pow(base(c), 4))
      logCand ++ ladder.map { case (n, e) => (c, n, e) }
    }

    val r2 =
      if (candidates.isEmpty) null
      else {
        val candAggs = candidates.map { case (_, n, e) => skewness(e).as(n) }
        df.agg(candAggs.head, candAggs.tail: _*).collect()(0)
      }

    val chosen: Map[String, (String, Double)] = active.flatMap { c =>
      val cands = candidates.collect { case (`c`, n, _) => n -> num(r2, n) }
      val all = ((c, baseSkew(c)) +: cands).filterNot(_._2.isNaN)
      val best = all.minBy { case (_, s) => math.abs(s) } // first minimal wins ties
      if (best._1 != c &&
          math.abs(math.abs(best._2) - math.abs(baseSkew(c))) > minSkewImprovement)
        Some(c -> best)
      else None
    }.toMap

    val inPlace = df.columns.map(cn =>
      if (absCols(cn)) abs(col(cn)).as(cn) else col(cn))
    val winners = chosen.toSeq.sortBy(_._1).map { case (_, (n, _)) =>
      candidates.find(_._2 == n).get._3.as(n)
    }
    val data = df.select((inPlace ++ winners).toSeq: _*)

    val summary = cols.map { c =>
      val orig = baseSkew(c)
      chosen.get(c) match {
        case Some((n, s)) => (c, r6(orig), n, r6(s))
        case None => (c, r6(orig), "none", r6(orig))
      }
    }.toDF("feature", "original_skew", "chosen", "chosen_skew")
      .orderBy("feature")

    SkewTransformResult(data, summary,
      chosen.map { case (c, (n, _)) => c -> n }, cols.filter(absCols).toList)
  }

  private def r6(x: Double): Double =
    if (x.isNaN) x
    else BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** F7: integer-likeness test. The reference samples 100 values and
    * checks np.allclose(x, int(x)) (preprocessing.py:157-176); the
    * distributed form is an exact full-column scan (cheaper than a
    * random sample at scale and strictly more accurate — documented
    * deviation). Returns (feature, is_int_like 0/1).
    */
  def intLike(df: DataFrame, cols: Seq[String]): DataFrame = {
    // int(x) truncates toward zero — floor alone misclassifies a
    // negative near-integer (-2.000000001 is int-like to the
    // reference: int(x) = -2, |diff| = 1e-9; floor gives -3 and a
    // spurious 0.999... difference)
    def trunc(c: Column): Column = when(c >= 0, floor(c)).otherwise(ceil(c))
    val aggs = cols.map(c =>
      max(when(abs(col(c) - trunc(col(c))) > 1e-8, 1).otherwise(0)).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val n = cols.length
    row.select(expr(
      s"stack($n, ${cols.map(c => s"'$c', 1 - `$c`").mkString(", ")}) as (feature, is_int_like)"))
      .orderBy("feature")
  }
}
