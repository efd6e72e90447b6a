package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Graph

/** Driver-checked queries for the graph family (`ops/Graph.scala`):
  * co-purchase edge extraction over lineitem baskets, weighted
  * PageRank with a fixed deterministic iteration count, market-basket
  * association rules, and the key-skew diagnostic over the events
  * table. Every oracle is the naive declarative rendering (bare
  * self-join, unrolled PageRank iterations) that DuckDB can afford at
  * sf0.01.
  */
object GraphQueries {

  private def li(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)

  /** The co-purchase edge frame feeds q162/q163/q164 — build it once
    * per (session, sf) and checkpoint (the established memo-group
    * pattern; the three queries otherwise each redo the distinct +
    * pair join over lineitem). */
  private def edges(s: SparkSession, d: String): DataFrame =
    graft.core.Memo.getOrElseUpdate(
        s"copurchase:${s.sparkContext.applicationId}:$d") {
      Graph.coOccurrenceEdges(li(s, d), "l_orderkey", "l_partkey")
        .localCheckpoint(false)
    }

  private def events(s: SparkSession, d: String): DataFrame =
    graft.streaming.Events.normalize(Tables.events(s, d))

  // -------------------------------------------------------------------
  // q162: co-purchase edges — unordered part pairs sharing >= 2 orders.
  // -------------------------------------------------------------------
  def copurchaseEdges(s: SparkSession, d: String): DataFrame =
    edges(s, d)
      .filter(col("w") >= 2)
      .orderBy("src", "dst")

  val copurchaseEdgesSql: String =
    """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem)
      |SELECT a.i AS src, c.i AS dst, count(*) AS w
      |FROM b a JOIN b c ON a.o = c.o AND a.i < c.i
      |GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY src, dst""".stripMargin

  // -------------------------------------------------------------------
  // q163: weighted PageRank over the FULL co-purchase graph, exactly
  // 3 iterations from the uniform vector (deterministic contract —
  // the oracle unrolls the same three iterations in SQL). Rank is
  // normalized to mean 1 so 6-dp rounding stays meaningful.
  // -------------------------------------------------------------------
  def partPageRank(s: SparkSession, d: String): DataFrame =
    Graph.pageRank(edges(s, d), damping = 0.85, iters = 3)
      .orderBy("node")

  val partPageRankSql: String =
    """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
      |e0 AS (SELECT a.i AS x, c.i AS y, count(*) * 1.0 AS w
      |       FROM b a JOIN b c ON a.o = c.o AND a.i < c.i GROUP BY 1, 2),
      |e AS (SELECT x, y, w FROM e0 UNION ALL SELECT y AS x, x AS y, w FROM e0),
      |deg AS (SELECT x, sum(w) AS wd FROM e GROUP BY 1),
      |nn AS (SELECT count(*) * 1.0 AS n FROM deg),
      |r0 AS (SELECT deg.x AS node, 1.0 / nn.n AS r FROM deg, nn),
      |r1 AS (SELECT e.y AS node, (1.0 - 0.85) / nn.n + 0.85 * sum(r0.r * e.w / deg.wd) AS r
      |       FROM e JOIN r0 ON r0.node = e.x JOIN deg ON deg.x = e.x, nn
      |       GROUP BY e.y, nn.n),
      |r1b AS (SELECT e.y AS node, (1.0 - 0.85) / nn.n + 0.85 * sum(r1.r * e.w / deg.wd) AS r
      |        FROM e JOIN r1 ON r1.node = e.x JOIN deg ON deg.x = e.x, nn
      |        GROUP BY e.y, nn.n),
      |r2 AS (SELECT e.y AS node, (1.0 - 0.85) / nn.n + 0.85 * sum(r1b.r * e.w / deg.wd) AS r
      |       FROM e JOIN r1b ON r1b.node = e.x JOIN deg ON deg.x = e.x, nn
      |       GROUP BY e.y, nn.n)
      |SELECT r2.node, round(r2.r * nn.n, 6) AS rank
      |FROM r2, nn ORDER BY node""".stripMargin

  // -------------------------------------------------------------------
  // q164: association rules (support / confidence / lift) for directed
  // part pairs sharing >= 2 orders.
  // -------------------------------------------------------------------
  def assocRules(s: SparkSession, d: String): DataFrame =
    Graph.associationRules(li(s, d), "l_orderkey", "l_partkey",
        minJoint = 2L, precomputedEdges = Some(edges(s, d)))
      .orderBy("antecedent", "consequent")

  val assocRulesSql: String =
    """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
      |nb AS (SELECT count(DISTINCT o) * 1.0 AS n FROM b),
      |ic AS (SELECT i, count(*) AS ni FROM b GROUP BY 1),
      |pc AS (SELECT a.i AS x, c.i AS y, count(*) AS w
      |       FROM b a JOIN b c ON a.o = c.o AND a.i < c.i
      |       GROUP BY 1, 2 HAVING count(*) >= 2),
      |d AS (SELECT x AS antecedent, y AS consequent, w FROM pc
      |      UNION ALL SELECT y AS antecedent, x AS consequent, w FROM pc)
      |SELECT d.antecedent, d.consequent, d.w AS n_joint,
      |       round(d.w / nb.n, 6) AS support,
      |       round(d.w * 1.0 / ia.ni, 6) AS confidence,
      |       round((d.w * 1.0 / ia.ni) / (ca.ni / nb.n), 6) AS lift
      |FROM d
      |JOIN ic ia ON ia.i = d.antecedent
      |JOIN ic ca ON ca.i = d.consequent, nb
      |ORDER BY antecedent, consequent""".stripMargin

  // -------------------------------------------------------------------
  // q165: key-skew diagnostic over the events table's user_id load.
  // -------------------------------------------------------------------
  def keySkew(s: SparkSession, d: String): DataFrame =
    Graph.keySkewStats(events(s, d), "user_id")

  val keySkewSql: String =
    """WITH c AS (SELECT user_id AS k, count(*) AS cnt FROM events GROUP BY 1),
      |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt, k) AS rn FROM c),
      |a AS (SELECT count(*) AS nk, sum(cnt) AS nr, max(cnt) AS mx,
      |             sum(rn * cnt * 1.0) AS rc FROM r),
      |q AS (SELECT quantile_cont(cnt, 0.5) AS p50,
      |             quantile_cont(cnt, 0.99) AS p99 FROM c)
      |SELECT nk AS n_keys, CAST(nr AS BIGINT) AS n_rows, mx AS max_cnt,
      |       round(p50, 6) AS p50_cnt, round(p99, 6) AS p99_cnt,
      |       round(2.0 * rc / (nk * 1.0 * nr) - (nk + 1.0) / nk, 6) AS gini
      |FROM a, q""".stripMargin

  // -------------------------------------------------------------------
  // q186: degree distribution of the co-purchase graph.
  // -------------------------------------------------------------------
  def degreeDist(s: SparkSession, d: String): DataFrame =
    Graph.degreeDistribution(edges(s, d)).orderBy("degree")

  val degreeDistSql: String =
    """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
      |e AS (SELECT a.i AS x, c.i AS y FROM b a
      |      JOIN b c ON a.o = c.o AND a.i < c.i GROUP BY a.i, c.i),
      |d AS (SELECT x AS node FROM e UNION ALL SELECT y FROM e),
      |dg AS (SELECT node, count(*) AS deg FROM d GROUP BY 1)
      |SELECT deg AS degree, count(*) AS n_nodes FROM dg
      |GROUP BY 1 ORDER BY degree""".stripMargin

  // -------------------------------------------------------------------
  // q208: triangle census of the co-purchase graph — node/edge/wedge/
  // triangle counts and global transitivity via the degree-ordered
  // orientation; the oracle enumerates (a<b<c) triangles directly.
  // -------------------------------------------------------------------
  def triangles(s: SparkSession, d: String): DataFrame =
    Graph.triangleStats(edges(s, d))

  val trianglesSql: String =
    """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
      |e AS (SELECT a.i AS src, c.i AS dst FROM b a
      |      JOIN b c ON a.o = c.o AND a.i < c.i GROUP BY 1, 2),
      |d AS (SELECT node, count(*) AS dg FROM
      |        (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
      |      GROUP BY 1),
      |t AS (SELECT count(*) AS tri FROM e e1
      |      JOIN e e2 ON e2.src = e1.src AND e2.dst > e1.dst
      |      JOIN e e3 ON e3.src = e1.dst AND e3.dst = e2.dst)
      |SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_nodes,
      |       CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
      |       CAST((SELECT sum(dg * (dg - 1) // 2) FROM d) AS BIGINT)
      |         AS n_wedges,
      |       CAST(t.tri AS BIGINT) AS n_triangles,
      |       round(3.0 * t.tri /
      |             (SELECT sum(dg * (dg - 1) // 2) FROM d), 6) AS transitivity
      |FROM t""".stripMargin

  // -------------------------------------------------------------------
  // q211: co-purchase communities — connected components (pointer
  // jumping) over the w >= 3 edge backbone, reported as the community
  // size distribution; the oracle closes the same edges with a
  // recursive CTE (the q66/q194 pattern).
  // -------------------------------------------------------------------
  def communities(s: SparkSession, d: String): DataFrame =
    graft.dedup.Dedup.duplicateClusters(
        edges(s, d).filter(col("w") >= 3)
          .select(col("src").as("id_1"), col("dst").as("id_2")))
      .groupBy("cluster").agg(count(lit(1)).as("__size"))
      .groupBy(col("__size").as("size")).agg(count(lit(1)).as("n_communities"))
      .orderBy("size")

  val communitiesSql: String =
    """WITH RECURSIVE b AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
      |e0 AS (SELECT a.i AS src, c.i AS dst FROM b a
      |       JOIN b c ON a.o = c.o AND a.i < c.i
      |       GROUP BY 1, 2 HAVING count(*) >= 3),
      |edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      |reach(id, lbl) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id
      |),
      |cl AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY 1),
      |sz AS (SELECT cluster, count(*) AS sz FROM cl GROUP BY 1)
      |SELECT CAST(sz AS BIGINT) AS size, count(*) AS n_communities
      |FROM sz GROUP BY 1 ORDER BY size""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q208_triangles" -> (triangles _),
    "q211_communities" -> (communities _),
    "q162_copurchase_edges" -> (copurchaseEdges _),
    "q163_part_pagerank" -> (partPageRank _),
    "q164_assoc_rules" -> (assocRules _),
    "q165_key_skew" -> (keySkew _),
    "q186_degree_dist" -> (degreeDist _))

  val oracles: Map[String, String] = Map(
    "q208_triangles" -> trianglesSql,
    "q211_communities" -> communitiesSql,
    "q162_copurchase_edges" -> copurchaseEdgesSql,
    "q163_part_pagerank" -> partPageRankSql,
    "q164_assoc_rules" -> assocRulesSql,
    "q165_key_skew" -> keySkewSql,
    "q186_degree_dist" -> degreeDistSql)
}
