package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Encode, Preprocess, Stats}

/** Relational operator queries (SURVEY §2.2-2.8) bound to the driver
  * test tables, with DuckDB oracles.
  *
  * Hash-robustness rules used throughout (driver compares value hashes):
  *  - money sums go through DECIMAL(28,6) so they are exact and
  *    order-independent on both engines;
  *  - averages = exact decimal sum / count, divided in double;
  *  - every float output is round()-ed identically on both sides;
  *  - every computed column is aliased identically on both sides.
  */
object Relational {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)

  /** Exact, order-independent sum of a double column via decimal. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(28,6)")).cast("double")

  private val dsumSql = (e: String) =>
    s"CAST(sum(CAST($e AS DECIMAL(28,6))) AS DOUBLE)"

  // -------------------------------------------------------------------
  // A2 null stats — synthetic nulls via nullif (test tables are complete)
  // -------------------------------------------------------------------
  def nullStats(s: SparkSession, d: String): DataFrame = {
    val base = li(s, d).select(
      col("l_orderkey"),
      when(col("l_discount") === 0, lit(null)).otherwise(col("l_discount")).as("discount_n"),
      when(col("l_tax") === 0, lit(null)).otherwise(col("l_tax")).as("tax_n"),
      col("l_quantity"))
    Preprocess.nullStats(base)
  }

  val nullStatsSql: String =
    """WITH base AS (
      |  SELECT l_orderkey,
      |         nullif(l_discount, 0) AS discount_n,
      |         nullif(l_tax, 0) AS tax_n,
      |         l_quantity
      |  FROM lineitem
      |), n AS (SELECT count(*) AS total_rows FROM base),
      |stats AS (
      |  SELECT 'discount_n' AS feature, count(*) - count(discount_n) AS total FROM base
      |  UNION ALL SELECT 'tax_n', count(*) - count(tax_n) FROM base
      |  UNION ALL SELECT 'l_orderkey', count(*) - count(l_orderkey) FROM base
      |  UNION ALL SELECT 'l_quantity', count(*) - count(l_quantity) FROM base
      |)
      |SELECT feature, total, round(total * 100.0 / (SELECT total_rows FROM n), 4) AS percent
      |FROM stats WHERE total > 0
      |ORDER BY total DESC, feature""".stripMargin

  // -------------------------------------------------------------------
  // A3 group imputation
  // -------------------------------------------------------------------
  def imputeGroup(s: SparkSession, d: String): DataFrame = {
    val base = li(s, d).select(
      col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
      when(col("l_linenumber") === 3, lit(null)).otherwise(col("l_discount")).as("disc_n"))
    Preprocess.imputeByGroup(base, Seq("l_returnflag"), "disc_n", "mean")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        round(col("disc_n"), 6).as("disc_imputed"))
  }

  val imputeGroupSql: String =
    """WITH base AS (
      |  SELECT l_orderkey, l_linenumber, l_returnflag,
      |         CASE WHEN l_linenumber = 3 THEN NULL ELSE l_discount END AS disc_n
      |  FROM lineitem
      |), grp AS (
      |  SELECT l_returnflag,
      |         CAST(sum(CAST(disc_n AS DECIMAL(28,6))) AS DOUBLE) / count(disc_n) AS imputed
      |  FROM base WHERE disc_n IS NOT NULL GROUP BY l_returnflag
      |)
      |SELECT b.l_orderkey, b.l_linenumber, b.l_returnflag,
      |       round(coalesce(b.disc_n, g.imputed), 6) AS disc_imputed
      |FROM base b LEFT JOIN grp g ON b.l_returnflag = g.l_returnflag""".stripMargin

  // -------------------------------------------------------------------
  // A4 global imputation
  // -------------------------------------------------------------------
  def imputeGlobal(s: SparkSession, d: String): DataFrame = {
    val base = li(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      when(col("l_linenumber") === 2, lit(null)).otherwise(col("l_quantity")).as("qty_n"))
    val mean = base.agg(
      (dsum(col("qty_n")) / count(col("qty_n"))).as("m")).collect()(0).getDouble(0)
    base.na.fill(Map("qty_n" -> mean))
      .select(col("l_orderkey"), col("l_linenumber"), round(col("qty_n"), 6).as("qty_imputed"))
  }

  val imputeGlobalSql: String =
    s"""WITH base AS (
       |  SELECT l_orderkey, l_linenumber,
       |         CASE WHEN l_linenumber = 2 THEN NULL ELSE l_quantity END AS qty_n
       |  FROM lineitem
       |), m AS (
       |  SELECT ${dsumSql("qty_n")} / count(qty_n) AS mean_v FROM base
       |)
       |SELECT l_orderkey, l_linenumber,
       |       round(coalesce(qty_n, (SELECT mean_v FROM m)), 6) AS qty_imputed
       |FROM base""".stripMargin

  // -------------------------------------------------------------------
  // A5 value counts
  // -------------------------------------------------------------------
  def valueCounts(s: SparkSession, d: String): DataFrame =
    Preprocess.valueCounts(Tables.customer(s, d), "c_mktsegment")

  val valueCountsSql: String =
    """SELECT c_mktsegment, count(*) AS cnt,
      |       round(count(*) * 100.0 / sum(count(*)) OVER (), 4) AS share_pct
      |FROM customer GROUP BY c_mktsegment
      |ORDER BY cnt DESC, c_mktsegment""".stripMargin

  // -------------------------------------------------------------------
  // A6 population variance (sklearn VarianceThreshold parity)
  // -------------------------------------------------------------------
  def variancePop(s: SparkSession, d: String): DataFrame =
    Preprocess.variancePop(li(s, d), Seq("l_quantity", "l_discount", "l_tax"))

  val variancePopSql: String =
    """SELECT feature, round(variance, 8) AS variance FROM (
      |  SELECT 'l_quantity' AS feature, var_pop(l_quantity) AS variance FROM lineitem
      |  UNION ALL SELECT 'l_discount', var_pop(l_discount) FROM lineitem
      |  UNION ALL SELECT 'l_tax', var_pop(l_tax) FROM lineitem
      |) ORDER BY feature""".stripMargin

  // -------------------------------------------------------------------
  // A7 skewness / kurtosis (scipy bias-uncorrected semantics)
  // -------------------------------------------------------------------
  def skewKurt(s: SparkSession, d: String): DataFrame =
    Preprocess.skewKurt(li(s, d), Seq("l_quantity", "l_discount"))

  // explicit central moments: DuckDB's built-ins use sample-corrected
  // formulas; Spark's skewness/kurtosis are the g1/g2 population forms.
  val skewKurtSql: String =
    """WITH moments AS (
      |  SELECT c AS feature,
      |         avg(pow(x - m, 2)) AS m2,
      |         avg(pow(x - m, 3)) AS m3,
      |         avg(pow(x - m, 4)) AS m4
      |  FROM (
      |    SELECT 'l_quantity' AS c, l_quantity AS x,
      |           avg(l_quantity) OVER () AS m FROM lineitem
      |    UNION ALL
      |    SELECT 'l_discount', l_discount, avg(l_discount) OVER () FROM lineitem
      |  ) GROUP BY c
      |)
      |SELECT feature,
      |       round(m3 / pow(m2, 1.5), 6) AS skewness,
      |       round(m4 / pow(m2, 2) - 3, 6) AS kurtosis
      |FROM moments ORDER BY feature""".stripMargin

  // -------------------------------------------------------------------
  // F1/F2/F3 transform ladder (incl. the reference's x**1/N bug-as-spec)
  // -------------------------------------------------------------------
  def transformLadder(s: SparkSession, d: String): DataFrame = {
    val base = li(s, d).select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val ladder = Preprocess.transformLadder(col("l_quantity"))
    base.select(
      Seq(col("l_orderkey"), col("l_linenumber")) ++
        ladder.map { case (n, c) => round(c, 6).as(n) }: _*)
  }

  val transformLadderSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  round(ln(l_quantity), 6) AS log,
      |  round(ln(1 + l_quantity), 6) AS log1p,
      |  round(abs(l_quantity), 6) AS abs,
      |  round(pow(l_quantity, 2), 6) AS pow2,
      |  round(pow(l_quantity, 3), 6) AS pow3,
      |  round(pow(l_quantity, 4), 6) AS pow4,
      |  round(l_quantity / 2, 6) AS div2,
      |  round(l_quantity / 3, 6) AS div3,
      |  round(l_quantity / 4, 6) AS div4
      |FROM lineitem""".stripMargin

  // -------------------------------------------------------------------
  // P8+A6 binary column detection + variance threshold
  // -------------------------------------------------------------------
  def binaryVariance(s: SparkSession, d: String): DataFrame = {
    val base = li(s, d).select(
      (col("l_returnflag") === "A").cast("int").as("flag_a"),
      (col("l_linestatus") === "O").cast("int").as("status_o"),
      (col("l_tax") > 0.9).cast("int").as("high_tax"),
      col("l_quantity"))
    val bin = Preprocess.binaryColumns(base, base.columns.toSeq)
    Preprocess.variancePop(base, bin)
  }

  val binaryVarianceSql: String =
    """WITH base AS (
      |  SELECT CAST(l_returnflag = 'A' AS INT) AS flag_a,
      |         CAST(l_linestatus = 'O' AS INT) AS status_o,
      |         CAST(l_tax > 0.9 AS INT) AS high_tax
      |  FROM lineitem
      |)
      |SELECT feature, round(variance, 8) AS variance FROM (
      |  SELECT 'flag_a' AS feature, var_pop(flag_a) AS variance FROM base
      |  UNION ALL SELECT 'status_o', var_pop(status_o) FROM base
      |  UNION ALL SELECT 'high_tax', var_pop(high_tax) FROM base
      |) ORDER BY feature""".stripMargin

  // -------------------------------------------------------------------
  // J4 crosstab with row normalization
  // -------------------------------------------------------------------
  def crosstab(s: SparkSession, d: String): DataFrame =
    Stats.crosstabNorm(Tables.orders(s, d), "o_orderstatus", "o_orderpriority")

  val crosstabSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
      |  round(count(*) / CAST(sum(count(*)) OVER (PARTITION BY o_orderstatus) AS DOUBLE), 6) AS share
      |FROM orders GROUP BY o_orderstatus, o_orderpriority
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  // -------------------------------------------------------------------
  // A18 pairwise Pearson correlation
  // -------------------------------------------------------------------
  def corrPairs(s: SparkSession, d: String): DataFrame =
    Stats.corrPairs(li(s, d), Seq("l_quantity", "l_discount", "l_extendedprice", "l_tax"))

  val corrPairsSql: String =
    """SELECT col_a, col_b, round(c, 6) AS corr FROM (
      |  SELECT 'l_quantity' AS col_a, 'l_discount' AS col_b, corr(l_quantity, l_discount) AS c FROM lineitem
      |  UNION ALL SELECT 'l_quantity', 'l_extendedprice', corr(l_quantity, l_extendedprice) FROM lineitem
      |  UNION ALL SELECT 'l_quantity', 'l_tax', corr(l_quantity, l_tax) FROM lineitem
      |  UNION ALL SELECT 'l_discount', 'l_extendedprice', corr(l_discount, l_extendedprice) FROM lineitem
      |  UNION ALL SELECT 'l_discount', 'l_tax', corr(l_discount, l_tax) FROM lineitem
      |  UNION ALL SELECT 'l_extendedprice', 'l_tax', corr(l_extendedprice, l_tax) FROM lineitem
      |) ORDER BY col_a, col_b""".stripMargin

  // -------------------------------------------------------------------
  // A19 histogram (fixed-width bins per class)
  // -------------------------------------------------------------------
  def histogram(s: SparkSession, d: String): DataFrame =
    Stats.histogram(li(s, d), "l_extendedprice", 5000.0, "l_returnflag")

  val histogramSql: String =
    """SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bin,
      |       l_returnflag, count(*) AS cnt
      |FROM lineitem GROUP BY 1, 2 ORDER BY bin, l_returnflag""".stripMargin

  // -------------------------------------------------------------------
  // A20 confusion matrix (derived label/pred, row-normalized)
  // -------------------------------------------------------------------
  def confusion(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      col("event_type"),
      when(col("value") > 100, "high").otherwise("low").as("pred"))
    Stats.confusion(ev, "event_type", "pred")
  }

  val confusionSql: String =
    """SELECT event_type AS label,
      |       CASE WHEN value > 100 THEN 'high' ELSE 'low' END AS prediction,
      |       count(*) AS cnt,
      |       round(count(*) / CAST(sum(count(*)) OVER (PARTITION BY event_type) AS DOUBLE), 6) AS share
      |FROM events GROUP BY 1, 2 ORDER BY label, prediction""".stripMargin

  // -------------------------------------------------------------------
  // W1 rank over aggregated scores
  // -------------------------------------------------------------------
  def rankNations(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg((dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
      .select(
        col("n_name"),
        round(col("avg_bal"), 4).as("avg_bal"),
        rank().over(Window.orderBy(desc("avg_bal"))).cast("long").as("bal_rank"))
      .orderBy("bal_rank", "n_name")
  }

  val rankNationsSql: String =
    s"""WITH agg AS (
       |  SELECT n_name, ${dsumSql("c_acctbal")} / count(*) AS avg_bal
       |  FROM customer JOIN nation ON c_nationkey = n_nationkey
       |  GROUP BY n_name
       |)
       |SELECT n_name, round(avg_bal, 4) AS avg_bal,
       |       rank() OVER (ORDER BY avg_bal DESC) AS bal_rank
       |FROM agg ORDER BY bal_rank, n_name""".stripMargin

  // -------------------------------------------------------------------
  // O2/O5 top-N by sort
  // -------------------------------------------------------------------
  def topParts(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .orderBy(desc("p_retailprice"), col("p_partkey"))
      .limit(10)

  val topPartsSql: String =
    """SELECT p_partkey, p_name, p_retailprice FROM part
      |ORDER BY p_retailprice DESC, p_partkey LIMIT 10""".stripMargin

  // -------------------------------------------------------------------
  // U1 row union of two stat frames
  // -------------------------------------------------------------------
  def unionStats(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).agg(
      lit("customer").as("side"),
      count(lit(1)).as("cnt"),
      round(dsum(col("c_acctbal")), 2).as("total_bal"))
    val sup = Tables.supplier(s, d).agg(
      lit("supplier").as("side"),
      count(lit(1)).as("cnt"),
      round(dsum(col("s_acctbal")), 2).as("total_bal"))
    c.unionByName(sup).orderBy("side")
  }

  val unionStatsSql: String =
    s"""SELECT 'customer' AS side, count(*) AS cnt,
       |       round(${dsumSql("c_acctbal")}, 2) AS total_bal FROM customer
       |UNION ALL
       |SELECT 'supplier', count(*), round(${dsumSql("s_acctbal")}, 2) FROM supplier
       |ORDER BY side""".stripMargin

  // -------------------------------------------------------------------
  // J2-style multi-way equi join: revenue per nation (TPC-H Q5 shape)
  // -------------------------------------------------------------------
  def joinRevenue(s: SparkSession, d: String): DataFrame = {
    val l = li(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  val joinRevenueSql: String =
    s"""SELECT r_name, n_name,
       |  round(${dsumSql("l_extendedprice * (1 - l_discount)")}, 2) AS revenue,
       |  count(*) AS n_items
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name
       |ORDER BY r_name, n_name""".stripMargin

  // -------------------------------------------------------------------
  // q217: market share (TPC-H Q8 flavor) — one nation's revenue share
  // within its region per order year, conditional aggregation over the
  // 5-way star join; dimension sides broadcast, exact decimal sums.
  // -------------------------------------------------------------------
  def marketShare(s: SparkSession, d: String): DataFrame = {
    val l = li(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        round(dsum(when(col("n_name") === "NATION_2", rev)
          .otherwise(lit(0.0))) / dsum(rev), 6).as("market_share"),
        round(dsum(rev), 2).as("region_revenue"))
      .orderBy("o_year")
  }

  val marketShareSql: String =
    s"""SELECT CAST(date_part('year', o_orderdate) AS INT) AS o_year,
       |  round(${dsumSql("CASE WHEN n_name = 'NATION_2' " +
         "THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
       |        / ${dsumSql("l_extendedprice * (1 - l_discount)")}, 6)
       |    AS market_share,
       |  round(${dsumSql("l_extendedprice * (1 - l_discount)")}, 2)
       |    AS region_revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |GROUP BY 1 ORDER BY o_year""".stripMargin

  // -------------------------------------------------------------------
  // F9 label encoding (deterministic value-order codes)
  // -------------------------------------------------------------------
  def labelEncode(s: SparkSession, d: String): DataFrame =
    Encode.labelEncode(
      Tables.customer(s, d).select("c_custkey", "c_mktsegment"),
      "c_mktsegment", "segment_code")
      .select(col("c_custkey"), col("c_mktsegment"),
        col("segment_code").cast("long").as("segment_code"))

  val labelEncodeSql: String =
    """SELECT c_custkey, c_mktsegment,
      |       dense_rank() OVER (ORDER BY c_mktsegment) - 1 AS segment_code
      |FROM customer""".stripMargin

  // -------------------------------------------------------------------
  // F10 one-hot encoding (column-per-value, get_dummies layout)
  // -------------------------------------------------------------------
  def oneHot(s: SparkSession, d: String): DataFrame = {
    val df = Encode.oneHot(
      Tables.orders(s, d).select("o_orderkey", "o_orderstatus"), "o_orderstatus")
    df.select(df.columns.map {
      case c if c.startsWith("o_orderstatus_") => col(c).cast("long").as(c)
      case c => col(c)
    }: _*)
  }

  val oneHotSql: String =
    """SELECT o_orderkey,
      |  CAST(coalesce(o_orderstatus = 'F', FALSE) AS BIGINT) AS o_orderstatus_F,
      |  CAST(coalesce(o_orderstatus = 'O', FALSE) AS BIGINT) AS o_orderstatus_O,
      |  CAST(coalesce(o_orderstatus = 'P', FALSE) AS BIGINT) AS o_orderstatus_P,
      |  CAST(o_orderstatus IS NULL AS BIGINT) AS o_orderstatus_nan
      |FROM orders""".stripMargin

  // -------------------------------------------------------------------
  // F7 int-likeness scan
  // -------------------------------------------------------------------
  def intLike(s: SparkSession, d: String): DataFrame =
    Preprocess.intLike(li(s, d), Seq("l_quantity", "l_discount", "l_extendedprice"))

  val intLikeSql: String =
    """SELECT feature, is_int_like FROM (
      |  SELECT 'l_quantity' AS feature,
      |    1 - max(CASE WHEN abs(l_quantity - trunc(l_quantity)) > 1e-8 THEN 1 ELSE 0 END) AS is_int_like
      |  FROM lineitem
      |  UNION ALL SELECT 'l_discount',
      |    1 - max(CASE WHEN abs(l_discount - trunc(l_discount)) > 1e-8 THEN 1 ELSE 0 END) FROM lineitem
      |  UNION ALL SELECT 'l_extendedprice',
      |    1 - max(CASE WHEN abs(l_extendedprice - trunc(l_extendedprice)) > 1e-8 THEN 1 ELSE 0 END) FROM lineitem
      |) ORDER BY feature""".stripMargin

  // -------------------------------------------------------------------
  // F8 isclose tolerance compare
  // -------------------------------------------------------------------
  def isClose(s: SparkSession, d: String): DataFrame = {
    val a = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val b = col("l_extendedprice") - col("l_extendedprice") * col("l_discount")
    li(s, d).agg(
      sum((abs(a - b) <= lit(1e-8) + lit(1e-5) * abs(b)).cast("long")).as("n_close"),
      count(lit(1)).as("n_total"))
  }

  val isCloseSql: String =
    """SELECT CAST(sum(CASE WHEN abs((l_extendedprice * (1 - l_discount)) -
      |                         (l_extendedprice - l_extendedprice * l_discount))
      |              <= 1e-8 + 1e-5 * abs(l_extendedprice - l_extendedprice * l_discount)
      |         THEN 1 ELSE 0 END) AS BIGINT) AS n_close,
      |       count(*) AS n_total
      |FROM lineitem""".stripMargin

  // -------------------------------------------------------------------
  // P1/P5 feature projection (name-set difference, dtype pruning)
  // -------------------------------------------------------------------
  def projection(s: SparkSession, d: String): DataFrame = {
    val df = li(s, d)
    val exclude = Set("l_returnflag", "l_linestatus", "l_shipdate", "l_comment")
    val numeric = df.schema.fields.collect {
      case f if !exclude.contains(f.name) &&
        (f.dataType.typeName == "double" || f.dataType.typeName == "long" ||
          f.dataType.typeName == "integer") => f.name
    }
    df.select(numeric.sorted.map(col).toSeq: _*)
  }

  val projectionSql: String =
    """SELECT l_discount, l_extendedprice, l_linenumber, l_orderkey,
      |       l_partkey, l_quantity, l_suppkey, l_tax
      |FROM lineitem""".stripMargin

  // -------------------------------------------------------------------
  // P3 train/test split by target-null idiom
  // -------------------------------------------------------------------
  def splitCounts(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).withColumn("target",
      when(col("o_orderkey") % 5 === 0, lit(null)).otherwise(col("o_totalprice")))
    val train = base.filter(col("target").isNotNull)
    val test = base.filter(col("target").isNull)
    train.agg(lit("train").as("split"), count(lit(1)).as("cnt"))
      .unionByName(test.agg(lit("test").as("split"), count(lit(1)).as("cnt")))
      .orderBy("split")
  }

  val splitCountsSql: String =
    """WITH base AS (
      |  SELECT CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_totalprice END AS target
      |  FROM orders
      |)
      |SELECT 'train' AS split, count(*) AS cnt FROM base WHERE target IS NOT NULL
      |UNION ALL
      |SELECT 'test', count(*) FROM base WHERE target IS NULL
      |ORDER BY split""".stripMargin

  // -------------------------------------------------------------------
  // P7 debug limit (deterministic order)
  // -------------------------------------------------------------------
  def debugLimit(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus")
      .orderBy("o_orderkey").limit(100)

  val debugLimitSql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
      |ORDER BY o_orderkey LIMIT 100""".stripMargin

  // -------------------------------------------------------------------
  // A1 downcast decision table (min/max scan → narrowed type)
  // -------------------------------------------------------------------
  def downcastPlan(s: SparkSession, d: String): DataFrame = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    val df = li(s, d)
    val aggs = cols.flatMap(c => Seq(min(col(c)).cast("long").as(s"min_$c"),
      max(col(c)).cast("long").as(s"max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val n = cols.length
    row.select(expr(
      s"stack($n, ${cols.map(c => s"'$c', `min_$c`, `max_$c`").mkString(", ")}) as (feature, min_v, max_v)"))
      .withColumn("narrowed_type",
        when(col("min_v") >= -128 && col("max_v") <= 127, "tinyint")
          .when(col("min_v") >= -32768 && col("max_v") <= 32767, "smallint")
          .when(col("min_v") >= Int.MinValue.toLong && col("max_v") <= Int.MaxValue.toLong, "int")
          .otherwise("bigint"))
      .orderBy("feature")
  }

  val downcastPlanSql: String =
    """WITH b AS (
      |  SELECT 'l_orderkey' AS feature, min(l_orderkey) AS min_v, max(l_orderkey) AS max_v FROM lineitem
      |  UNION ALL SELECT 'l_partkey', min(l_partkey), max(l_partkey) FROM lineitem
      |  UNION ALL SELECT 'l_suppkey', min(l_suppkey), max(l_suppkey) FROM lineitem
      |  UNION ALL SELECT 'l_linenumber', min(l_linenumber), max(l_linenumber) FROM lineitem
      |)
      |SELECT feature, min_v, max_v,
      |  CASE WHEN min_v >= -128 AND max_v <= 127 THEN 'tinyint'
      |       WHEN min_v >= -32768 AND max_v <= 32767 THEN 'smallint'
      |       WHEN min_v >= -2147483648 AND max_v <= 2147483647 THEN 'int'
      |       ELSE 'bigint' END AS narrowed_type
      |FROM b ORDER BY feature""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_null_stats" -> (nullStats _),
    "q3_impute_group" -> (imputeGroup _),
    "q4_impute_global" -> (imputeGlobal _),
    "q5_value_counts" -> (valueCounts _),
    "q6_variance" -> (variancePop _),
    "q7_skew_kurt" -> (skewKurt _),
    "q8_transform_ladder" -> (transformLadder _),
    "q9_binary_variance" -> (binaryVariance _),
    "q10_crosstab" -> (crosstab _),
    "q11_corr" -> (corrPairs _),
    "q12_histogram" -> (histogram _),
    "q13_confusion" -> (confusion _),
    "q14_rank" -> (rankNations _),
    "q15_topn" -> (topParts _),
    "q16_union" -> (unionStats _),
    "q17_join_revenue" -> (joinRevenue _),
    "q217_market_share" -> (marketShare _),
    "q22_label_encode" -> (labelEncode _),
    "q23_onehot" -> (oneHot _),
    "q24_int_like" -> (intLike _),
    "q26_isclose" -> (isClose _),
    "q27_projection" -> (projection _),
    "q28_split_counts" -> (splitCounts _),
    "q29_debug_limit" -> (debugLimit _),
    "q30_downcast_plan" -> (downcastPlan _))

  val oracles: Map[String, String] = Map(
    "q2_null_stats" -> nullStatsSql,
    "q3_impute_group" -> imputeGroupSql,
    "q4_impute_global" -> imputeGlobalSql,
    "q5_value_counts" -> valueCountsSql,
    "q6_variance" -> variancePopSql,
    "q7_skew_kurt" -> skewKurtSql,
    "q8_transform_ladder" -> transformLadderSql,
    "q9_binary_variance" -> binaryVarianceSql,
    "q10_crosstab" -> crosstabSql,
    "q11_corr" -> corrPairsSql,
    "q12_histogram" -> histogramSql,
    "q13_confusion" -> confusionSql,
    "q14_rank" -> rankNationsSql,
    "q15_topn" -> topPartsSql,
    "q16_union" -> unionStatsSql,
    "q17_join_revenue" -> joinRevenueSql,
    "q217_market_share" -> marketShareSql,
    "q22_label_encode" -> labelEncodeSql,
    "q23_onehot" -> oneHotSql,
    "q24_int_like" -> intLikeSql,
    "q26_isclose" -> isCloseSql,
    "q27_projection" -> projectionSql,
    "q28_split_counts" -> splitCountsSql,
    "q29_debug_limit" -> debugLimitSql,
    "q30_downcast_plan" -> downcastPlanSql)
}
