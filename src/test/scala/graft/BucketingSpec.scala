package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: two tables bucketed+sorted on the
  * join key join WITHOUT any shuffle exchange — the physical plan must
  * contain a SortMergeJoin and zero Exchange operators. This is the
  * scale pattern for repeated big-to-big joins on a stable key
  * (SURVEY §4 physical-execution notes; brief "bucketing for
  * co-located joins").
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    // tables are external (explicit temp paths), so the static
    // warehouse dir is never written
    val wh = Files.createTempDirectory("graft_wh").toString
    val li = core.Tables.lineitem(spark, sf)
    val ord = core.Tables.orders(spark, sf)
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").saveAsTable("li_b")
    ord.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/ord_b").saveAsTable("ord_b")

    // merge hint on the join side: otherwise the small sf0.001 tables
    // take the broadcast path and the bucket layout is moot
    val noBcast = spark.table("li_b").hint("merge")
      .join(spark.table("ord_b").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
    noBcast.collect()
    val plan = noBcast.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
      "no shuffle on the bucketed join key")
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
      "no shuffle on the bucketed join key")

    // same result as the unbucketed join
    val direct = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
    assert(noBcast.except(direct).isEmpty && direct.except(noBcast).isEmpty)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }

  test("persisted IVF index: probe scan prunes to probed cell partitions") {
    import graft.sim.Similarity
    val dir = Files.createTempDirectory("graft_ivf").toString
    val emb = core.Tables.embeddings(spark, sf)
    val probes = emb.limit(5)
    val (nCells, nProbe, seed) = (8, 2, 27L)
    Similarity.ivfIndexWrite(emb, "vec_id", "embedding", dir, nCells, seed)

    // static partition pruning: the probed scan lists only the probed
    // cells' directories, not the whole corpus
    val scan = Similarity.ivfProbedScan(spark, dir, Seq(0, 3))
    val fs = scan.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(fs.nonEmpty, "expected a file scan")
    assert(fs.head.metadata("PartitionFilters").contains("cell"),
      s"partition filter missing: ${fs.head.metadata("PartitionFilters")}")
    assert(fs.head.selectedPartitions.partitionCount == 2,
      s"expected 2 pruned partitions of $nCells, got ${fs.head.selectedPartitions.partitionCount}")

    // the indexed path returns exactly what the in-memory path returns
    // (same seed => same KMeans quantizer)
    val direct = Similarity.ivfTopK(emb, probes, "vec_id", "embedding",
      k = 3, nCells, nProbe, seed)
    val indexed = Similarity.ivfTopKIndexed(spark, dir, probes, "vec_id", "embedding",
      k = 3, nProbe)
    assert(indexed.count() == direct.count())
    assert(indexed.except(direct).isEmpty && direct.except(indexed).isEmpty,
      "indexed IVF equals in-memory IVF")
  }
}
