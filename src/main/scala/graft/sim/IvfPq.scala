package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ composite ANN index (Jégou, Douze & Schmid 2011 §IV, the
  * "IVFADC" structure FAISS ships as its large-scale default): a coarse
  * KMeans quantizer partitions the corpus into `nCells` inverted lists;
  * every vector is stored as its cell plus the PQ codes of its RESIDUAL
  * (x − coarse centroid), one shared residual codebook across cells.
  * A query probes only its `nProbe` nearest cells and ranks their
  * candidates by asymmetric distance over per-cell residual tables —
  * cell pruning bounds scan cost, PQ bounds memory, and the two
  * compose because residuals concentrate near zero, where a shared
  * codebook quantizes well.
  *
  * Distributed shape: both models are bounded (nCells + m·ks rows) and
  * broadcast; cell assignment, residual computation, and encoding are
  * scan-local expressions; search joins the codes table (m small ints
  * per vector — the only corpus-scale data) against a broadcast
  * (probe × nProbe × m × ks) distance table on (cell, sub, code). On a
  * real deployment the codes table persists partitionBy(cell) exactly
  * like `Similarity.ivfIndexWrite`, making the probe scan
  * partition-pruned as well.
  *
  * Replayability: coarse centroids and PQ centroids are rounded to 6
  * decimals at train time, every distance is rounded to 6 before any
  * argmin/sum, and all tie-breaks are deterministic (smaller cell/code
  * wins) — so dumped models let DuckDB replay assignment, encoding AND
  * search bit-for-bit (the q102-q104 oracle pattern, extended to the
  * composite).
  */
object IvfPq {

  /** Coarse quantizer: KMeans over the raw vectors, centroids rounded
    * to 6 decimals — the values every downstream step uses, so the
    * fitted model and its dump are the same model. (cell, centroid). */
  def trainCoarse(corpus: DataFrame, vecCol: String,
      nCells: Int, seed: Long): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus.select(array_to_vector(Pq.asDouble(col(vecCol))).as("__fv"))
    val model = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("__fv").setPredictionCol("__c").fit(c)
    model.clusterCenters.zipWithIndex.map { case (v, i) =>
      (i.toLong, v.toArray.map(x => math.rint(x * 1e6) / 1e6).toSeq)
    }.toSeq.toDF("cell", "centroid")
  }

  /** The bounded (nCells-row) coarse model collected into two parallel
    * array literals in ascending-cell order: (cell ids, centroids).
    * Collecting here is the scale design, not a shortcut: it turns cell
    * assignment into a pure scan-local projection — no explode, no
    * per-id shuffle, no join — the same way a single-node ANN library
    * keeps the coarse quantizer in memory. */
  private def coarseLit(coarse: DataFrame): (Column, Column) = {
    val rows = coarse.select(col("cell"), col("centroid")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
      .sortBy(_._1)
    (typedLit(rows.map(_._1).toSeq), typedLit(rows.map(_._2)))
  }

  /** Cell assignment as exact math over the ROUNDED centroid table:
    * argmin of the rounded squared L2 distance, ties to the smaller
    * cell — a scan-local projection over the collected centroid array
    * (array_position finds the FIRST minimum, and the array is in
    * ascending-cell order, so ties break to the smaller cell exactly
    * like the dump replay's ORDER BY cd, cell) and exactly replayable
    * from the dump (unlike `model.transform`, whose unrounded boundary
    * could flip a near-tie). (id, cell, __x). */
  def assign(corpus: DataFrame, coarse: DataFrame,
      idCol: String, vecCol: String): DataFrame =
    assigned(corpus, coarse, idCol, vecCol)
      .select(col(idCol), col("cell"), col("__x"))

  /** The shared rounded-argmin assignment block: (id, cell, __x,
    * __cent = the assigned centroid). ONE definition — assign() and
    * residuals() both project from it, so the tie-break and the 6-dp
    * rounding the dump-replay oracle depends on cannot drift between
    * the assignment and the residual paths. */
  private def assigned(corpus: DataFrame, coarse: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val (cells, cents) = coarseLit(coarse)
    corpus.select(col(idCol), Pq.asDouble(col(vecCol)).as("__x"))
      .withColumn("__d", transform(cents, c => round(Pq.l2sq(col("__x"), c), 6)))
      .withColumn("__pos",
        array_position(col("__d"), array_min(col("__d"))).cast("int"))
      .select(col(idCol), element_at(cells, col("__pos")).as("cell"),
        col("__x"), element_at(cents, col("__pos")).as("__cent"))
  }

  /** Residual frame: (id, cell, residual = x − coarse[cell]) — one
    * scan-local projection (assignment, centroid lookup, and the
    * subtraction all against the collected model; zero shuffles). */
  private def residuals(corpus: DataFrame, coarse: DataFrame,
      idCol: String, vecCol: String): DataFrame =
    assigned(corpus, coarse, idCol, vecCol)
      .select(col(idCol), col("cell"),
        zip_with(col("__x"), col("__cent"), (x, c) => x - c).as("__rvec"))

  /** One shared PQ codebook over the residuals (sub, code, centroid) —
    * the IVFADC layout; residuals of every cell train one quantizer. */
  def trainCodebook(corpus: DataFrame, coarse: DataFrame, idCol: String,
      vecCol: String, m: Int, ks: Int, seed: Long): DataFrame =
    Pq.train(residuals(corpus, coarse, idCol, vecCol), idCol, "__rvec",
      m = m, ks = ks, seed = seed)

  /** Inverted-list entries: (id, cell, sub, code) — each vector's cell
    * plus the PQ codes of its residual. The cell rides through
    * `Pq.encode` inside a struct id, so encoding is a SINGLE corpus
    * pass with one (id, sub) shuffle — no second assignment pass and
    * no corpus-scale self-join to recover the cell. */
  def encode(corpus: DataFrame, coarse: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String, m: Int): DataFrame = {
    val res = residuals(corpus, coarse, idCol, vecCol)
      .select(struct(col(idCol), col("cell")).as("__idc"), col("__rvec"))
    Pq.encode(res, codebook, "__idc", "__rvec", m)
      .select(col(s"__idc.$idCol").as(idCol), col("__idc.cell").as("cell"),
        col("sub"), col("code"))
  }

  /** IVFADC search: per probe, the `nProbe` nearest cells by rounded
    * L2 to the coarse centroids (ties to the smaller cell), a residual
    * ADC table per probed cell, and approximate distances for ONLY the
    * probed cells' candidates. Output (query_id, neighbor_id, adist),
    * k rows per probe ranked (adist asc, neighbor_id asc); self-matches
    * excluded. */
  def search(codes: DataFrame, coarse: DataFrame, codebook: DataFrame,
      probes: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbe: Int, m: Int): DataFrame = {
    val p = probes.select(col(idCol).as("query_id"),
      Pq.asDouble(col(vecCol)).as("__p"))
    val wCells = Window.partitionBy("query_id")
      .orderBy(col("__cd").asc, col("cell").asc)
    // probed cells with the probe's residual against each cell
    val pc = p.crossJoin(broadcast(coarse))
      .select(col("query_id"), col("__p"), col("cell"),
        round(Pq.l2sq(col("__p"), col("centroid")), 6).as("__cd"),
        col("centroid"))
      .withColumn("__rn", row_number().over(wCells))
      .filter(col("__rn") <= nProbe)
      .select(col("query_id"), col("cell"),
        zip_with(col("__p"), col("centroid"), (x, c) => x - c).as("__rq"))
    // per-(probe, cell) ADC table: subspace distances to every code
    val sliceLen = Pq.guardedSliceLen(col("__rq"), m)
    val table = pc
      .select(col("query_id"), col("cell"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          i => slice(col("__rq"), i * sliceLen + 1, sliceLen)))
          .as(Seq("sub", "__rsub")))
      .select(col("query_id"), col("cell"),
        col("sub").cast("long").as("sub"), col("__rsub"))
      .join(broadcast(codebook), Seq("sub"))
      .select(col("query_id"), col("cell"), col("sub"), col("code"),
        round(Pq.l2sq(col("__rsub"), col("centroid")), 6).as("__qd"))
    val scored = codes
      .join(broadcast(table), Seq("cell", "sub", "code"))
      .filter(col("query_id") =!= col(idCol))
      .groupBy(col("query_id"), col(idCol).as("neighbor_id"))
      .agg(round(sum(col("__qd")), 6).as("adist"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** IVFADC with exact re-rank (Jégou 2011 §IV-C — the standard final
    * step of the FAISS-style pipeline): `search` produces a
    * kShort-candidate shortlist per probe by approximate ADC distance;
    * the shortlist is then re-scored by EXACT rounded squared L2
    * against the raw corpus vectors and the top `k` kept (ties to the
    * smaller neighbor id). Re-ranking recovers the quantization loss on
    * the short list while the expensive scan stays ADC-bounded.
    *
    * Scale shape: the shortlist is bounded (|probes|·kShort rows) and
    * broadcasts to the corpus scan, so only candidate vectors survive
    * the join; probes broadcast likewise. The corpus is read once more
    * for the candidates' raw vectors — the one extra read §IV-C's
    * refinement costs by construction. Output (query_id, neighbor_id,
    * edist), k rows per probe ranked (edist asc, neighbor_id asc). */
  def searchRerank(codes: DataFrame, coarse: DataFrame, codebook: DataFrame,
      probes: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, kShort: Int, nProbe: Int, m: Int): DataFrame = {
    require(kShort >= k, s"shortlist kShort=$kShort must be >= k=$k")
    val short = search(codes, coarse, codebook, probes, idCol, vecCol,
      kShort, nProbe, m)
    val c = corpus.select(col(idCol).as("neighbor_id"),
      Pq.asDouble(col(vecCol)).as("__cv"))
    val p = probes.select(col(idCol).as("query_id"),
      Pq.asDouble(col(vecCol)).as("__pv"))
    val exact = c
      .join(broadcast(short.select("query_id", "neighbor_id")), Seq("neighbor_id"))
      .join(broadcast(p), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Pq.l2sq(col("__pv"), col("__cv")), 6).as("edist"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("edist").asc, col("neighbor_id").asc)
    exact.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }
}
