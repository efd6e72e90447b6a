package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Incremental

/** Driver-checked queries for the incremental-pipeline family
  * (`ops/Incremental.scala`) and the rolling-distinct operator.
  *
  * q170 exercises the full state lifecycle — build state on two
  * disjoint halves of the events table, merge, finalize — and the
  * oracle aggregates the WHOLE table in one pass with the identical
  * exact-integer formulas, proving merge(state(A), state(B)) ==
  * aggregate(A ∪ B) bit-for-bit.
  */
object IncrementalQueries {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)

  private def events(s: SparkSession, d: String): DataFrame =
    graft.streaming.Events.normalize(Tables.events(s, d))

  // -------------------------------------------------------------------
  // q170: mergeable aggregate state — two half-month states merged and
  // finalized must equal the single-pass whole-table aggregate.
  // -------------------------------------------------------------------
  def incrementalAgg(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val cut = lit("2024-01-16").cast("timestamp")
    val a = Incremental.aggState(ev.filter(col("ts") < cut), "event_type", "value")
    val b = Incremental.aggState(ev.filter(col("ts") >= cut), "event_type", "value")
    Incremental.finish(Incremental.mergeState(a, b))
      .withColumnRenamed("key", "event_type")
      .orderBy("event_type")
  }

  val incrementalAggSql: String =
    """WITH s AS (
      |  SELECT event_type,
      |         CAST(sign(value) * floor(abs(value) * 1000000.0 + 0.5)
      |              AS BIGINT) AS vi
      |  FROM events
      |),
      |a AS (
      |  SELECT event_type, count(*) AS n, sum(vi) AS sv,
      |         sum(vi * vi) AS s2, min(vi) AS mn, max(vi) AS mx
      |  FROM s GROUP BY 1
      |)
      |SELECT event_type, n,
      |  round((sv * 1.0) / 1000000.0, 6) AS sum_v,
      |  round((sv * 1.0) / 1000000.0 / n, 6) AS mean_v,
      |  round((s2 * 1.0) / 1e12 / n
      |        - ((sv * 1.0) / 1000000.0 / n) * ((sv * 1.0) / 1000000.0 / n), 6)
      |    AS var_v,
      |  round(mn / 1000000.0, 6) AS min_v,
      |  round(mx / 1000000.0, 6) AS max_v
      |FROM a ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------------
  // q171: snapshot diff — a simulated new table version (some rows
  // dropped, some langs rewritten, a few rows added) diffed against
  // the shipped documents table.
  // -------------------------------------------------------------------
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    val old = docs(s, d)
    val changed = old.filter(col("doc_id") % 37 =!= 0)
      .withColumn("lang",
        when(col("doc_id") % 11 === 0, lit("xx")).otherwise(col("lang")))
    val added = old.filter(col("doc_id") < 5)
      .withColumn("doc_id", col("doc_id") + 100000)
    Incremental.snapshotDiff(old, changed.unionByName(added),
        Seq("doc_id"), Seq("text", "lang", "source", "n_chars"))
      .orderBy("doc_id", "status")
  }

  val snapshotDiffSql: String =
    """WITH old AS (SELECT doc_id, text, lang, source, n_chars FROM documents),
      |new1 AS (SELECT doc_id, text,
      |                CASE WHEN doc_id % 11 = 0 THEN 'xx' ELSE lang END AS lang,
      |                source, n_chars
      |         FROM documents WHERE doc_id % 37 <> 0),
      |new2 AS (SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
      |         FROM documents WHERE doc_id < 5),
      |nw AS (SELECT * FROM new1 UNION ALL SELECT * FROM new2),
      |j AS (SELECT coalesce(old.doc_id, nw.doc_id) AS doc_id,
      |        CASE WHEN old.doc_id IS NULL THEN 'added'
      |             WHEN nw.doc_id IS NULL THEN 'removed'
      |             WHEN (old.text IS DISTINCT FROM nw.text)
      |               OR (old.lang IS DISTINCT FROM nw.lang)
      |               OR (old.source IS DISTINCT FROM nw.source)
      |               OR (old.n_chars IS DISTINCT FROM nw.n_chars)
      |             THEN 'changed' END AS status
      |      FROM old FULL OUTER JOIN nw ON old.doc_id = nw.doc_id)
      |SELECT doc_id, status FROM j WHERE status IS NOT NULL
      |ORDER BY doc_id, status""".stripMargin

  // -------------------------------------------------------------------
  // q172: rolling 7-day distinct active users per observed day.
  // -------------------------------------------------------------------
  def rollingActive(s: SparkSession, d: String): DataFrame =
    graft.ops.EventAnalytics.rollingDistinct(events(s, d), "ts", "user_id", 7)
      .orderBy("day")

  val rollingActiveSql: String =
    """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id AS u
      |            FROM events),
      |days AS (SELECT DISTINCT d FROM du)
      |SELECT strftime(days.d, '%Y-%m-%d') AS day,
      |       count(DISTINCT du.u) AS n_keys
      |FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d
      |GROUP BY days.d ORDER BY day""".stripMargin

  // -------------------------------------------------------------------
  // q179: SCD2 validity intervals from the events change log.
  // -------------------------------------------------------------------
  def scd2(s: SparkSession, d: String): DataFrame =
    Incremental.scd2Intervals(
        events(s, d).select("event_id", "user_id", "ts"),
        "user_id", "ts", "event_id")
      .select("event_id", "user_id", "valid_from_us", "valid_to_us", "is_current")
      .orderBy("event_id")

  val scd2Sql: String =
    """SELECT event_id, user_id, epoch_us(ts) AS valid_from_us,
      |  lead(epoch_us(ts)) OVER w AS valid_to_us,
      |  lead(epoch_us(ts)) OVER w IS NULL AS is_current
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin

  // -------------------------------------------------------------------
  // q180: data-contract validation report over the TPC-H-ish tables —
  // range, null, uniqueness, and referential-integrity checks, one
  // (check_name, n_violations) row each.
  // -------------------------------------------------------------------
  def dataContract(s: SparkSession, d: String): DataFrame = {
    import graft.ops.Contracts._
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
    val cust = Tables.customer(s, d)
    report(Seq(
      predicateCheck(li, "lineitem_quantity_range",
        col("l_quantity") < 1 || col("l_quantity") > 60),
      predicateCheck(li, "lineitem_discount_range",
        col("l_discount") < 0 || col("l_discount") > 0.1),
      predicateCheck(li, "lineitem_null_keys",
        col("l_orderkey").isNull || col("l_partkey").isNull),
      uniquenessCheck(ord, "orders_unique_key", Seq("o_orderkey")),
      referentialCheck(ord, cust, "orders_orphan_custkey",
        "o_custkey", "c_custkey"),
      referentialCheck(li, ord, "lineitem_orphan_orderkey",
        "l_orderkey", "o_orderkey")))
      .orderBy("check_name")
  }

  val dataContractSql: String =
    """SELECT 'lineitem_quantity_range' AS check_name,
      |       count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 60)
      |         AS n_violations FROM lineitem
      |UNION ALL
      |SELECT 'lineitem_discount_range',
      |       count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1)
      |FROM lineitem
      |UNION ALL
      |SELECT 'lineitem_null_keys',
      |       count(*) FILTER (WHERE l_orderkey IS NULL OR l_partkey IS NULL)
      |FROM lineitem
      |UNION ALL
      |SELECT 'orders_unique_key', count(*) FROM
      |  (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
      |UNION ALL
      |SELECT 'orders_orphan_custkey', count(*) FROM orders o
      |  WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                    WHERE c.c_custkey = o.o_custkey)
      |UNION ALL
      |SELECT 'lineitem_orphan_orderkey', count(*) FROM lineitem l
      |  WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                    WHERE o.o_orderkey = l.l_orderkey)
      |ORDER BY check_name""".stripMargin

  // -------------------------------------------------------------------
  // q181: exact per-label embedding centroids (micro-unit integer
  // sums — every component bit-replayable in SQL).
  // -------------------------------------------------------------------
  def labelCentroids(s: SparkSession, d: String): DataFrame =
    graft.sim.Similarity.exactCentroids(
        Tables.embeddings(s, d), "label", "embedding")
      .orderBy("label", "pos")

  val labelCentroidsSql: String =
    """WITH x AS (
      |  SELECT label, p.pos AS pos,
      |         -- 1e6 parses as DOUBLE; 1000000.0 would parse as DECIMAL and
      |         -- change the float rounding path
      |         CAST(sign(CAST(list_extract(embedding, p.pos + 1) AS DOUBLE))
      |              * floor(abs(CAST(list_extract(embedding, p.pos + 1)
      |                              AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS vi
      |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS pos) p
      |)
      |SELECT label, pos, count(*) AS n,
      |       round((sum(vi) * 1.0) / 1000000.0 / count(*), 9) AS centroid
      |FROM x GROUP BY 1, 2 ORDER BY label, pos""".stripMargin

  // -------------------------------------------------------------------
  // q214: pairwise label-centroid L2 distances — separability matrix
  // over the exact q181 centroids, micro-quantized so the sum is
  // order-independent and bit-replayable.
  // -------------------------------------------------------------------
  def centroidDistances(s: SparkSession, d: String): DataFrame =
    graft.sim.Similarity.centroidDistances(
        Tables.embeddings(s, d), "label", "embedding")
      .orderBy("label_a", "label_b")

  private val centroidCte: String =
    """x AS (
      |  SELECT vec_id, label, p.pos AS pos,
      |         CAST(list_extract(embedding, p.pos + 1) AS DOUBLE) AS v
      |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS pos) p
      |),
      |cent AS (
      |  SELECT label AS cl, pos,
      |    round((sum(CAST(sign(v) * floor(abs(v) * 1e6 + 0.5) AS BIGINT))
      |           * 1.0)
      |          / 1e6 / count(*), 9) AS c
      |  FROM x GROUP BY 1, 2
      |)""".stripMargin

  val centroidDistancesSql: String =
    s"""WITH $centroidCte
      |SELECT a.cl AS label_a, b.cl AS label_b,
      |  round(sqrt((sum(CAST(sign(a.c - b.c)
      |                       * floor(abs(a.c - b.c) * 1e6 + 0.5) AS BIGINT)
      |              * CAST(sign(a.c - b.c)
      |                     * floor(abs(a.c - b.c) * 1e6 + 0.5) AS BIGINT))
      |              * 1.0)
      |             / 1e12), 6) AS distance
      |FROM cent a JOIN cent b ON a.pos = b.pos AND a.cl < b.cl
      |GROUP BY 1, 2 ORDER BY label_a, label_b""".stripMargin

  // -------------------------------------------------------------------
  // q215: centroid-based label-confusion screen — vectors whose
  // nearest label centroid differs from their own label (mislabeled-
  // data candidates), with micro-quantized squared distances.
  // -------------------------------------------------------------------
  def labelConfusion(s: SparkSession, d: String): DataFrame =
    graft.sim.Similarity.labelConfusion(
        Tables.embeddings(s, d), "vec_id", "label", "embedding")
      .orderBy("vec_id")

  val labelConfusionSql: String =
    s"""WITH $centroidCte,
      |dst AS (
      |  SELECT x.vec_id, x.label, cent.cl,
      |    sum(CAST(sign(x.v - cent.c)
      |             * floor(abs(x.v - cent.c) * 1e6 + 0.5) AS BIGINT)
      |        * CAST(sign(x.v - cent.c)
      |               * floor(abs(x.v - cent.c) * 1e6 + 0.5) AS BIGINT)) AS dq
      |  FROM x JOIN cent ON cent.pos = x.pos
      |  GROUP BY 1, 2, 3
      |),
      |best AS (
      |  SELECT vec_id, cl AS nearest_label, dq AS d_nearest_q,
      |         row_number() OVER (PARTITION BY vec_id ORDER BY dq, cl) AS rn
      |  FROM dst
      |)
      |SELECT d.vec_id, d.label, b.nearest_label,
      |       CAST(d.dq AS BIGINT) AS d_own_q,
      |       CAST(b.d_nearest_q AS BIGINT) AS d_nearest_q
      |FROM dst d JOIN best b ON b.vec_id = d.vec_id AND b.rn = 1
      |WHERE d.cl = d.label AND b.nearest_label <> d.label
      |ORDER BY d.vec_id""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q214_centroid_distances" -> (centroidDistances _),
    "q215_label_confusion" -> (labelConfusion _),
    "q170_incremental_agg" -> (incrementalAgg _),
    "q171_snapshot_diff" -> (snapshotDiff _),
    "q172_rolling_active" -> (rollingActive _),
    "q179_scd2_intervals" -> (scd2 _),
    "q180_data_contract" -> (dataContract _),
    "q181_label_centroids" -> (labelCentroids _))

  val oracles: Map[String, String] = Map(
    "q214_centroid_distances" -> centroidDistancesSql,
    "q215_label_confusion" -> labelConfusionSql,
    "q170_incremental_agg" -> incrementalAggSql,
    "q171_snapshot_diff" -> snapshotDiffSql,
    "q172_rolling_active" -> rollingActiveSql,
    "q179_scd2_intervals" -> scd2Sql,
    "q180_data_contract" -> dataContractSql,
    "q181_label_centroids" -> labelCentroidsSql)
}
