package graft

import org.apache.spark.sql.functions._
import graft.cv.Folds

class FoldsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = core.Tables.orders(spark, sf)

  test("plain k-fold: partition + coverage + balance") {
    val folded = Folds.assign(df, k = 4, seed = 7L).cache()
    val n = df.count()
    assert(folded.count() == n, "every row assigned exactly once")
    val sizes = folded.groupBy("fold").count().collect()
      .map(r => r.getAs[Int]("fold") -> r.getAs[Long]("count")).toMap
    assert(sizes.keySet == Set(0, 1, 2, 3))
    assert(sizes.values.max - sizes.values.min <= 1, s"balanced: $sizes")
    folded.unpersist()
  }

  test("stratified k-fold: per-class balance") {
    val folded = Folds.assign(df, k = 3, seed = 11L, stratifyBy = Some("o_orderstatus")).cache()
    val byClassFold = folded.groupBy("o_orderstatus", "fold").count().collect()
    val byClass = byClassFold.groupBy(_.getAs[String]("o_orderstatus"))
    byClass.foreach { case (cls, rows) =>
      val counts = rows.map(_.getAs[Long]("count"))
      assert(counts.max - counts.min <= 1, s"class $cls balanced: ${counts.toSeq}")
    }
    folded.unpersist()
  }

  test("modulo folds (shuffle=False path): pure arithmetic, exact balance") {
    val folded = Folds.assignModulo(df, k = 3, "o_orderkey")
    assert(folded.count() == df.count())
    val sizes = folded.groupBy("fold").count().collect()
      .map(r => r.getAs[Int]("fold") -> r.getAs[Long]("count")).toMap
    assert(sizes.keySet == Set(0, 1, 2))
    assert(sizes.values.max - sizes.values.min <= 1)
    // no shuffle in the plan — fold is a projection over the scan
    val plan = folded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"modulo assignment must not shuffle:\n$plan")
  }

  test("stratified k-fold with NULL strata: nulls form their own balanced stratum") {
    // exercises the nulls-first driver-side offset ordering in assign
    val withNulls = df.withColumn("strat",
      when(col("o_orderkey") % 5 === 0, lit(null).cast("string"))
        .otherwise(col("o_orderstatus")))
    val folded = Folds.assign(withNulls, k = 3, seed = 13L, stratifyBy = Some("strat")).cache()
    assert(folded.count() == withNulls.count(), "every row assigned exactly once")
    val nullCounts = folded.filter(col("strat").isNull)
      .groupBy("fold").count().collect().map(_.getAs[Long]("count"))
    assert(nullCounts.length == 3 && nullCounts.max - nullCounts.min <= 1,
      s"null stratum balanced across folds: ${nullCounts.toSeq}")
    val nonNull = folded.filter(col("strat").isNotNull)
      .groupBy("strat", "fold").count().collect()
      .groupBy(_.getAs[String]("strat"))
    nonNull.foreach { case (cls, rows) =>
      val counts = rows.map(_.getAs[Long]("count"))
      assert(counts.max - counts.min <= 1, s"class $cls balanced: ${counts.toSeq}")
    }
    folded.unpersist()
  }

  test("assignment is physical-layout independent: repartitioned input, same folds") {
    // the shuffle key is a content hash, and the per-stratum index is
    // derived from the range-sorted order of that hash — so fold
    // membership must not depend on how the INPUT happens to be
    // partitioned (a cluster resize or a different upstream plan must
    // not re-deal the folds)
    val base = core.Tables.orders(spark, sf).select(
      col("o_orderkey").as("id"),
      (col("o_orderkey") % 3).cast("int").as("y"),
      col("o_totalprice"))
    def foldsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      Folds.assign(df, 4, 27L, Some("y"))
        .select("id", "fold").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a = foldsOf(base)
    val b = foldsOf(base.repartition(7, col("o_totalprice")))
    val c = foldsOf(base.coalesce(1))
    assert(a == b, "hash-partitioned input must yield identical folds")
    assert(a == c, "single-partition input must yield identical folds")
  }

  test("same seed → same assignment, different seed → different") {
    val a = Folds.assign(df, 3, 5L).select("o_orderkey", "fold")
    val b = Folds.assign(df, 3, 5L).select("o_orderkey", "fold")
    val c = Folds.assign(df, 3, 6L).select("o_orderkey", "fold")
    assert(a.except(b).isEmpty, "deterministic for fixed seed")
    assert(c.except(a).count() > 0, "seed changes membership")
  }
}
