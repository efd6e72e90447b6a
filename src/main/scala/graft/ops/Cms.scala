package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved data
  * stream summary: the count-min sketch and its applications") as a
  * composition of plain Spark aggregates — no custom expression needed,
  * because the sketch IS a (depth × width) count table: cell (r, b)
  * holds the number of stream items whose r-th hash lands in bucket b,
  * and a point query returns the MINIMUM of a key's depth cells
  * (each row overcounts by its colliders, never undercounts, so the
  * min is the tightest upper bound — ε·N over-estimate with
  * probability 1−δ at width e/ε, depth ln 1/δ).
  *
  * The hash family is the engine's SQL-replayable md5-prefix
  * construction (the q40/q64/q101 idiom): row r's hash of key w is
  * the first 60 bits of md5("r:w") mod width — independent-enough
  * rows from md5's avalanche, and a DuckDB oracle can rebuild the
  * ENTIRE sketch and every estimate exactly.
  *
  * Distributed shape: building is one explode(×depth) over the stream
  * followed by a hash-partitioned count keyed by (row, bucket) —
  * map-side combinable, output exactly depth·width rows, i.e. the
  * sketch is bounded and broadcastable no matter the corpus size
  * (THE point of a sketch at 100 TB). Point queries equi-join the
  * (key, row, bucket) triples of a bounded key list against the
  * sketch and take a per-key min — never a second corpus scan.
  */
object Cms {

  /** Row-r bucket of `key`: first 60 bits of md5("r:key") mod width. */
  def bucket(r: Int, key: Column, width: Int): Column =
    (conv(substring(md5(concat(lit(s"$r:"), key)), 1, 15), 16, 10)
      .cast("long") % width).as(s"__b")

  private def rowBuckets(key: Column, depth: Int, width: Int): Column =
    explode(array((0 until depth).map(r =>
      struct(lit(r).as("__r"), bucket(r, key, width))): _*))

  /** Build the sketch: one row per (sketch row, bucket) with its
    * counter. Input rows with a null key are skipped (no item). */
  def sketch(df: DataFrame, key: String, depth: Int, width: Int): DataFrame =
    df.filter(col(key).isNotNull)
      .select(rowBuckets(col(key), depth, width).as("__rb"))
      .select(col("__rb.__r").as("__r"), col("__rb.__b").as("__b"))
      .groupBy("__r", "__b").agg(count(lit(1)).as("__c"))

  /** Point-query `keys` (any frame with a `key` column; its other
    * columns pass through) against a sketch built with the same
    * (depth, width): appends `cms_estimate` = min over the key's depth
    * cells. Inner-joins the sketch — a queried key that was counted at
    * least once always has all depth cells present. */
  def estimate(sk: DataFrame, keys: DataFrame, key: String,
      depth: Int, width: Int): DataFrame = {
    val kb = keys
      .withColumn("__rb", rowBuckets(col(key), depth, width))
      .select(col("*"), col("__rb.__r").as("__r"), col("__rb.__b").as("__b"))
      .drop("__rb")
    val passthrough = keys.columns.map(col)
    kb.join(sk, Seq("__r", "__b"))
      .groupBy(passthrough: _*)
      .agg(min(col("__c")).as("cms_estimate"))
  }
}
