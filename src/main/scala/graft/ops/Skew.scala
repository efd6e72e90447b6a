package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew tooling for hot grouping/join keys. AQE's skew-join splitting
  * covers sort-merge joins at runtime; aggregation skew (one giant key
  * hammering a single reducer) still needs salting — these helpers make
  * the two-phase pattern a one-liner.
  */
object Skew {

  /** Supported algebraic aggregates: each decomposes into a salted
    * partial and an exact merge. */
  sealed trait SaltedAgg { def col: String; def as: String }
  final case class SaltedSum(col: String, as: String) extends SaltedAgg
  final case class SaltedCount(as: String) extends SaltedAgg { val col = "*" }
  final case class SaltedMin(col: String, as: String) extends SaltedAgg
  final case class SaltedMax(col: String, as: String) extends SaltedAgg
  final case class SaltedAvg(col: String, as: String) extends SaltedAgg

  /** Two-phase salted aggregation: phase 1 groups by (keys, salt) so a
    * hot key spreads over `buckets` reducers; phase 2 merges partials
    * by keys alone — by then every key holds at most `buckets` rows.
    * The salt is a content hash (deterministic, no rand()), derived
    * from all non-key columns so rows of a hot key spread evenly.
    * Result is bit-identical to the direct groupBy for integer/decimal
    * inputs and for min/max/count on any type; float sum/avg are
    * order-dependent in EITHER formulation (the partial-aggregation
    * order already varies with partitioning), so salting adds no new
    * drift class — use the micro-unit decimal construction
    * (graft.core.ExactSum) when a float sum must be exact.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], aggs: Seq[SaltedAgg],
      buckets: Int = 64): DataFrame = {
    require(aggs.nonEmpty)
    val nonKey = df.columns.filterNot(keys.contains).map(col)
    val salt = pmod(xxhash64(nonKey.toSeq: _*), lit(buckets)).as("__salt")

    val partialExprs = aggs.flatMap {
      case SaltedSum(c, a) => Seq(sum(col(c)).as(s"__s_$a"))
      case SaltedCount(a) => Seq(count(lit(1)).as(s"__c_$a"))
      case SaltedMin(c, a) => Seq(min(col(c)).as(s"__mn_$a"))
      case SaltedMax(c, a) => Seq(max(col(c)).as(s"__mx_$a"))
      case SaltedAvg(c, a) => Seq(sum(col(c)).as(s"__as_$a"), count(col(c)).as(s"__ac_$a"))
    }
    val mergeExprs = aggs.map {
      case SaltedSum(_, a) => sum(col(s"__s_$a")).as(a)
      case SaltedCount(a) => sum(col(s"__c_$a")).as(a)
      case SaltedMin(_, a) => min(col(s"__mn_$a")).as(a)
      case SaltedMax(_, a) => max(col(s"__mx_$a")).as(a)
      case SaltedAvg(_, a) => (sum(col(s"__as_$a")) / sum(col(s"__ac_$a"))).as(a)
    }
    df.withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialExprs.head, partialExprs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(mergeExprs.head, mergeExprs.tail: _*)
  }

  /** Salted broadcast-replicated join for a skewed equi join where the
    * small side fits in a broadcast anyway: explodes the small side
    * `buckets` times and salts the big side — every reducer sees an
    * even share of the hot key. (With AQE skew handling on, prefer the
    * plain join; this is the manual fallback for aggregation-free
    * pipelines or disabled AQE.) */
  def saltedBroadcastJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int = 16): DataFrame = {
    val nonKey = big.columns.filterNot(_ == key).map(col)
    val bigSalted = big.withColumn("__salt", pmod(xxhash64(nonKey.toSeq: _*), lit(buckets)))
    val smallExploded = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    bigSalted.join(broadcast(smallExploded), Seq(key, "__salt")).drop("__salt")
  }
}
