package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`) — the
  * ANN family of the LLM-data extension (BASELINE.json north star).
  *
  * Two paths:
  *  - `bruteForceTopK`: exact cosine top-k of every probe against the
  *    full corpus. The probe set is broadcast (it is small by
  *    contract); the corpus is scanned once, partition-parallel; the
  *    per-probe top-k is a window over (probe, cosine). Exact — the
  *    correctness baseline.
  *  - `lshTopK`: the scale path. Sign-random-projection buckets
  *    (SimHash for vectors) shrink the candidate set; exact cosine
  *    re-ranks within candidates. Approximate: recall is tested
  *    against the brute-force baseline, not an oracle.
  *
  * All arithmetic is double (float inputs upcast) with sequential
  * per-row folds, so results are reproducible and SQL-oracle-parity
  * holds.
  */
object Similarity {

  private def asDouble(vec: Column): Column = transform(vec, _.cast("double"))

  /** Exact top-k cosine neighbors for each probe row.
    * Output: (query_id, neighbor_id, cosine), k rows per probe, ranked
    * by (cosine desc, neighbor_id asc); self-matches excluded. Cosine
    * runs through the native fused-loop expression
    * (graft.functions.CosineSimilarity) inside whole-stage codegen. */
  def bruteForceTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val p = probes.select(col(idCol).as("query_id"), col(vecCol).as("pvec"))
    val scored = c.join(broadcast(p), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.GraftFunctions.cosineSim(spark, col("pvec"), col("cvec")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** IVF (inverted-file) top-k — the classic ANN scale path: a seeded
    * KMeans coarse quantizer assigns every corpus vector to a cell;
    * each probe scans only its `nProbe` nearest cells and re-ranks
    * exactly. Corpus scan cost per probe drops by ~nCells/nProbe;
    * the cell assignment is computed once and reusable (in a real
    * deployment it would be persisted/bucketed by cell). */
  def ivfTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCells: Int = 16, nProbe: Int = 4, seed: Long = 27L): DataFrame = {
    val (assigned, cents) = quantize(corpus, idCol, vecCol, nCells, seed)
    rerank(assigned, probeCells(cents, probes, idCol, vecCol, nProbe), k)
  }

  /** KMeans coarse quantizer: (assigned corpus with a `cell` column,
    * centroid table (cell, centroid)). Deterministic for a seed.
    * Vectors are L2-NORMALIZED before clustering: the search metric is
    * cosine (probeCells ranks cells by cosine, rerank by cosine), and
    * on the unit sphere Euclidean KMeans clusters by direction — the
    * same geometry. Clustering the RAW vectors would mix metrics: L2
    * cells split by magnitude too, so an unnormalized probe's true
    * top-cosine neighbor can sit in a cell whose centroid has low
    * cosine to the probe and stay unreachable at any nProbe < nCells.
    * Zero vectors pass through unnormalized (their cosine is 0 to
    * everything; any cell is equally right). */
  private def quantize(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int, seed: Long): (DataFrame, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    // The norm is hoisted into its OWN column and the zero-vector
    // branch sits OUTSIDE the transform: an aggregate referenced
    // inside a per-element lambda re-evaluates per element (O(d²)
    // interpreted work per row, re-paid on every KMeans pass over the
    // projection — measured 2.0 s → 10.8 s on q93 at sf0.1), the same
    // re-projection trap as TextOps' materialize-the-token-array rule.
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .withColumn("__x", asDouble(col("cvec")))
      .withColumn("__n",
        sqrt(aggregate(transform(col("__x"), x => x * x), lit(0.0), _ + _)))
      .withColumn("__fv", array_to_vector(
        when(col("__n") > 0, transform(col("__x"), x => x / col("__n")))
          .otherwise(col("__x"))))
      .drop("__x", "__n")
    val model = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("__fv").setPredictionCol("cell").fit(c)
    val cents = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray) }.toSeq.toDF("cell", "centroid")
    (model.transform(c).drop("__fv"), cents)
  }

  /** Each probe's `nProbe` nearest cells: (query_id, pvec, cell). */
  private def probeCells(
      cents: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, nProbe: Int): DataFrame = {
    val spark = probes.sparkSession
    val p = probes.select(col(idCol).as("query_id"), col(vecCol).as("pvec"))
    val wCells = Window.partitionBy("query_id")
      .orderBy(col("__csim").desc, col("cell").asc)
    p.crossJoin(broadcast(cents))
      .withColumn("__csim",
        graft.functions.GraftFunctions.cosineSim(spark, col("pvec"), col("centroid")))
      .withColumn("__rn", row_number().over(wCells))
      .filter(col("__rn") <= nProbe)
      .select("query_id", "pvec", "cell")
  }

  /** Exact cosine re-rank of the probed cells' candidates. */
  private def rerank(assigned: DataFrame, pc: DataFrame, k: Int): DataFrame = {
    val spark = assigned.sparkSession
    val scored = assigned.join(broadcast(pc), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.GraftFunctions.cosineSim(spark, col("pvec"), col("cvec")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Persist the IVF index: the assigned corpus written
    * `partitionBy("cell")` (coarse, bounded cardinality — the on-disk
    * layout of an inverted file) plus the centroid table. Probing via
    * `ivfTopKIndexed` then reads ONLY the probed cells' partitions —
    * the partition-column filter prunes at file-listing time, so each
    * probe batch scans ~nProbe/nCells of the corpus no matter how large
    * the corpus grows (BucketingSpec asserts the pruned scan). */
  def ivfIndexWrite(
      corpus: DataFrame, idCol: String, vecCol: String, path: String,
      nCells: Int = 16, seed: Long = 27L): Unit = {
    val (assigned, cents) = quantize(corpus, idCol, vecCol, nCells, seed)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(s"$path/assigned")
    cents.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** The pruned read of an `ivfIndexWrite` index: only the partitions
    * of `cells` are listed/scanned (static partition pruning on the
    * partition column). */
  def ivfProbedScan(
      spark: org.apache.spark.sql.SparkSession, path: String,
      cells: Seq[Int]): DataFrame =
    spark.read.parquet(s"$path/assigned")
      .filter(col("cell").isin(cells: _*))

  /** IVF top-k over a persisted index. The probed cell set (bounded by
    * nCells — a driver-side scalar list, never row-scale) is collected
    * first so the corpus scan is statically pruned to those partitions. */
  def ivfTopKIndexed(
      spark: org.apache.spark.sql.SparkSession, path: String,
      probes: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int = 4): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids")
    val pc = probeCells(cents, probes, idCol, vecCol, nProbe)
      // lazy: the cell-id collect below materializes it; the re-rank
      // join reads the pinned blocks
      .localCheckpoint(false)
    val cells = pc.select("cell").distinct().collect().map(_.getInt(0)).toSeq
    rerank(ivfProbedScan(spark, path, cells), pc, k)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication = k-means clustering + within-cluster pairwise
    * cosine. A document is dropped when some cluster-mate ranked AHEAD
    * of it is within `threshold` cosine; rank = (centroid similarity
    * ASC, id ASC) — the paper keeps, within each duplicate relation,
    * the example FARTHEST from its cluster centroid. Returns
    * (id, cell, centroid_sim, keep), centroid_sim rounded to 6 so a
    * dump-replay oracle can reproduce the ranking exactly.
    *
    * Scale shape: the quadratic is per-cell (never corpus-wide) and
    * `nCells` grows with the corpus — the paper runs 110k clusters
    * over LAION — so cell sizes stay bounded; the KMeans fit samples/
    * iterates out-of-core under MLlib. The rank needs no window: the
    * "ranked ahead" predicate rides the same per-cell join that
    * computes the pairwise cosine, and the drop set is a DISTINCT over
    * qualifying pairs, all hash-partitioned by cell/id. */
  def semDedup(
      corpus: DataFrame, idCol: String, vecCol: String, threshold: Double,
      nCells: Int = 16, seed: Long = 27L): DataFrame = {
    val spark = corpus.sparkSession
    val (assigned, cents) = quantize(corpus, idCol, vecCol, nCells, seed)
    val a = assigned.join(broadcast(cents), Seq("cell"))
      .select(col("neighbor_id").as("id"), col("cell"), col("cvec").as("vec"),
        round(graft.functions.GraftFunctions.cosineSim(spark,
          col("cvec"), col("centroid")), 6).as("centroid_sim"))
    val x = a.select(col("id").as("xid"), col("cell"),
      col("vec").as("xvec"), col("centroid_sim").as("xsim"))
    val dropped = a.join(x, Seq("cell"))
      .filter(col("xsim") < col("centroid_sim") ||
        (col("xsim") === col("centroid_sim") && col("xid") < col("id")))
      .filter(round(graft.functions.GraftFunctions.cosineSim(spark,
        col("xvec"), col("vec")), 6) >= threshold)
      .select("id").distinct()
      .withColumn("__dropped", lit(true))
    a.join(dropped, Seq("id"), "left")
      .select(col("id"), col("cell"), col("centroid_sim"),
        col("__dropped").isNull.as("keep"))
  }

  /** Sign-random-projection bucket id: `planes` pseudo-random
    * hyperplanes derived from xxhash64(seed, dim, plane) — deterministic
    * with no driver-side randomness, computable per-partition. */
  def srpBucket(vec: Column, planes: Int, seed: Long): Column = {
    val signs = (0 until planes).map { pl =>
      // pseudo-random +-1 weight per (plane, dim) from a seeded hash
      val s = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => when(xxhash64(lit(seed), lit(pl), i) % 2 === 0, x).otherwise(-x)),
        lit(0.0), (acc, x) => acc + x)
      when(s >= 0, lit(1L << pl)).otherwise(lit(0L))
    }
    signs.reduce(_ + _)
  }

  /** Approximate top-k: candidates share an SRP bucket with the probe
    * (several independent hash tables raise recall); exact cosine
    * re-ranks candidates. */
  def lshTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int,
      planes: Int = 8, tables: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, id: String, vecOut: String): DataFrame = {
      val v = asDouble(col(vecCol))
      val tcols = (0 until tables).map(t =>
        struct(lit(t).as("tbl"), srpBucket(v, planes, 7919L * (t + 1)).as("bkt")))
      df.select(col(idCol).as(id), v.as(vecOut),
        explode(array(tcols: _*)).as("tb"))
        .select(col(id), col(vecOut), col("tb.tbl"), col("tb.bkt"))
    }
    val c = bucketed(corpus, "neighbor_id", "cvec")
    val p = bucketed(probes, "query_id", "pvec")
    val cand = c.join(broadcast(p), Seq("tbl", "bkt"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "pvec", "cvec").distinct()
    val scored = cand.select(col("query_id"), col("neighbor_id"),
      graft.functions.GraftFunctions.cosineSim(corpus.sparkSession,
        col("pvec"), col("cvec")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** EXACT per-group centroids in long format (group, pos, centroid):
    * vector components are scaled to micro-unit integers and summed as
    * 38-digit decimals (the `Incremental.aggState` construction), so
    * the centroid derives from exact sums by a fixed double formula —
    * bit-reproducible under any partitioning, and replayable by any
    * engine computing the same expression. One posexplode + one
    * (group × dim)-keyed aggregate; output is groups × dims rows,
    * never corpus-scale. */
  /** Pairwise L2 distance between the exact label centroids — the
    * label-separability read-out (close centroids predict confusable
    * classes). Distances are computed over the MICRO-QUANTIZED
    * component differences (sign-corrected half-away-from-zero
    * micro-units, [[graft.core.ExactSum.quantLong]], as integers, so
    * the sum is order/partition-independent and bit-replayable; the
    * ≤1e-6-per-component quantization is far below any separability
    * signal). Bounded output: (labels choose 2) rows. */
  def centroidDistances(df: DataFrame, labelCol: String,
      vecCol: String): DataFrame = {
    val c = exactCentroids(df, labelCol, vecCol)
      .select(col(labelCol).as("__l"), col("pos"), col("centroid").as("__c"))
      .localCheckpoint(false) // both join sides read it
    val di = graft.core.ExactSum.quantLong(col("a.__c") - col("b.__c"))
    c.as("a").join(c.as("b"),
        col("a.pos") === col("b.pos") && col("a.__l") < col("b.__l"))
      .withColumn("__di", di)
      // square in decimal: a micro-unit component diff past ~3e9 would
      // wrap the long product
      .groupBy(col("a.__l").as("label_a"), col("b.__l").as("label_b"))
      .agg(sum((col("__di").cast("decimal(38,0)") *
        col("__di").cast("decimal(38,0)")).cast("decimal(38,0)")).as("__dq"))
      .select(col("label_a"), col("label_b"),
        round(sqrt(col("__dq").cast("double") / lit(1e12)), 6).as("distance"))
  }

  /** Centroid-based label-confusion screen (the mislabeled-data
    * candidate detector): each vector's micro-quantized squared L2
    * distance to EVERY label centroid; vectors whose nearest centroid
    * belongs to a different label are flagged with both distances.
    * One posexplode + broadcast centroid join + (id, label) aggregate
    * — per-vector work is dims × labels, never pairwise over the
    * corpus. Deterministic argmin: (distance, label) struct-min. */
  def labelConfusion(df: DataFrame, idCol: String, labelCol: String,
      vecCol: String): DataFrame = {
    val cent = exactCentroids(df, labelCol, vecCol)
      .select(col(labelCol).as("__cl"), col("pos"), col("centroid").as("__c"))
    val x = df.select(col(idCol), col(labelCol).as("__l"),
        posexplode(col(vecCol)).as(Seq("pos", "__v0")))
      .withColumn("__v", col("__v0").cast("double"))
    val d = x.join(broadcast(cent), Seq("pos"))
      .withColumn("__di",
        graft.core.ExactSum.quantLong(col("__v") - col("__c")))
      // decimal squares, long result: exact up to |x−c| ~ 4e8 per
      // component — far beyond any embedding scale
      .groupBy(col(idCol), col("__l"), col("__cl"))
      .agg(sum((col("__di").cast("decimal(38,0)") *
        col("__di").cast("decimal(38,0)")).cast("decimal(38,0)"))
        .cast("long").as("__dq"))
      .localCheckpoint(false) // own-distance filter + argmin both read it
    val best = d.groupBy(idCol)
      .agg(min(struct(col("__dq"), col("__cl"))).as("__b"))
      .select(col(idCol), col("__b.__cl").as("nearest_label"),
        col("__b.__dq").as("d_nearest_q"))
    d.filter(col("__l") === col("__cl"))
      .select(col(idCol), col("__l").as(labelCol), col("__dq").as("d_own_q"))
      .join(best, Seq(idCol))
      .filter(col("nearest_label") =!= col(labelCol))
      .select(col(idCol), col(labelCol), col("nearest_label"),
        col("d_own_q"), col("d_nearest_q"))
  }

  def exactCentroids(df: DataFrame, groupCol: String,
      vecCol: String): DataFrame =
    df.select(col(groupCol).as("grp"),
        posexplode(col(vecCol)).as(Seq("pos", "__v")))
      .select(col("grp"), col("pos"),
        graft.core.ExactSum.quantLong(col("__v").cast("double")).as("__vi"))
      .groupBy("grp", "pos").agg(
        count(lit(1)).as("__n"),
        sum(col("__vi").cast("decimal(38,0)")).as("__s"))
      .select(col("grp").as(groupCol), col("pos"), col("__n").as("n"),
        round(col("__s").cast("double") / lit(1e6) / col("__n"), 9)
          .as("centroid"))
}
