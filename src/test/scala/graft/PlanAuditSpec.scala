package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.col

/** Machine-checked physical-plan properties of shipped queries — the
  * executable form of the PLANS.md audit. These are regression guards
  * for the scale-critical plan shapes: column pruning and filter
  * pushdown reaching the parquet scan, dimension broadcasts on the
  * star join, whole-stage codegen on expression-heavy projections, and
  * the partial window-group-limit that bounds shuffle volume on
  * keep-first dedup.
  */
class PlanAuditSpec extends SparkSpec {

  private def formatted(df: DataFrame): String = {
    df.collect() // finalize AQE so the executed plan is the real one
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q27 projection: column pruning reaches the parquet scan, no exchange") {
    val plan = formatted(Queries.registry("q27_projection")(spark, sf))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipmode"),
      s"excluded columns must not be read:\n$readSchema")
    assert(!plan.contains("Exchange"), "pure projection must not shuffle")
  }

  test("q1 aggregate: filter pushed to the scan, partial+final aggregation") {
    val plan = formatted(Queries.registry("q1_agg")(spark, sf))
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(l_quantity"),
      s"quantity filter must reach the scan:\n${plan.take(2000)}")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "map-side partial aggregation expected")
  }

  test("q17 star join: dimension sides broadcast, fact side never shuffles pre-agg") {
    val plan = formatted(Queries.registry("q17_join_revenue")(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      s"nation/region/customer-orders dims must broadcast:\n${plan.take(1500)}")
  }

  test("q8 transform ladder: single whole-stage codegen span, no shuffle") {
    val plan = formatted(Queries.registry("q8_transform_ladder")(spark, sf))
    // formatted mode marks whole-stage-codegen operators with a `*`
    assert(plan.contains("* Project"), s"expression ladder must codegen:\n${plan.take(500)}")
    assert(!plan.contains("Exchange"), "row-wise transforms must not shuffle")
  }

  test("q47 keep-first dedup: partial group-limit bounds shuffle volume") {
    val plan = formatted(Queries.registry("q47_dedup_first")(spark, sf))
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 2,
      s"partial + final group limit expected (row_number<=1 optimization):\n${plan.take(1500)}")
  }

  test("q76 repetition: explode feeds partial+final aggregation") {
    val plan = formatted(Queries.registry("q76_gopher_repetition")(spark, sf))
    assert(plan.contains("Generate"), "gram explode expected")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "two-level (gram-count then doc) aggregation with map-side combine expected")
  }

  test("pii redaction is scan-local: codegen'd, no shuffle") {
    val docs = core.Tables.documents(spark, sf)
    val plan = formatted(graft.text.Curation.redactPii(docs, "doc_id", "text"))
    assert(plan.contains("* Project"), "regex count/replace must codegen")
    assert(!plan.contains("Exchange"), "per-row redaction must not shuffle")
  }

  test("token chunking is scan-local: explode without exchange") {
    val docs = core.Tables.documents(spark, sf)
    val plan = formatted(graft.text.Curation.chunkTokens(docs, "doc_id", "text", 32))
    assert(plan.contains("Generate"), "chunk posexplode expected")
    assert(!plan.contains("Exchange"), "chunking must not shuffle")
  }

  test("q80 packing prefix sum: every window is partition-local (__pid)") {
    val docs = core.Tables.documents(spark, sf)
    val df = graft.text.Curation.packOffsets(docs, "doc_id", "text", 512)
    df.collect()
    val plan = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty, "expected a window over the per-partition cumsum")
    assert(windows.forall(_.contains("__pid")),
      s"global-order window (single partition) forbidden:\n${windows.mkString("\n")}")
  }

  test("ccnet buckets: threshold join broadcast, corpus not re-shuffled for the split") {
    val docs = core.Tables.documents(spark, sf)
    val plan = formatted(
      graft.text.Curation.ccnetBuckets(docs, "doc_id", "text", "source"))
    assert(plan.contains("BroadcastHashJoin"),
      "per-source thresholds must join via broadcast")
    // the split itself must add no exchange beyond the LM-score
    // aggregation's own shuffles: no per-source rank/ntile window
    // (which would sort every source's full partition)
    assert(!plan.contains("Window"),
      s"percentile-threshold formulation must not rank/sort the corpus:\n$plan")
  }

  test("semDedup: centroid table and drop set broadcast back, no window") {
    import spark.implicits._
    val emb = core.Tables.embeddings(spark, sf)
    val plan = formatted(
      graft.sim.Similarity.semDedup(emb, "vec_id", "embedding", 0.35, nCells = 4))
    assert(plan.contains("BroadcastHashJoin"), "centroids/drop-set join via broadcast")
    assert(!plan.contains("Window"),
      s"rank must ride the pairwise join, not a window:\n$plan")
  }

  test("q109 self line dedup is scan-local: no Exchange at all") {
    val docs = core.Tables.documents(spark, sf)
    val plan = formatted(
      graft.text.Curation.selfLineDedup(docs, "doc_id", "text"))
    assert(!plan.contains("Exchange"),
      s"the keep-first fold is a pure column expression:\n$plan")
  }

  test("q98 line dedup: digest-keyed count, no window anywhere") {
    val docs = core.Tables.documents(spark, sf)
    val plan = formatted(
      graft.text.Curation.lineDedup(docs, "doc_id", "text"))
    assert(!plan.contains("Window"),
      s"reassembly must be the in-group array_sort, not a window:\n$plan")
  }

  test("q100 bm25: term filter precedes the explode, top-k is TakeOrdered") {
    val docs = core.Tables.documents(spark, sf)
    val plan = formatted(
      graft.text.TextOps.bm25(docs, "doc_id", "text", Seq("hash", "join"), topK = 10))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must never be a full sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "document frequencies and corpus stats must broadcast")
  }

  test("q101 dsir: model broadcasts back, selection is TakeOrdered") {
    val docs = core.Tables.documents(spark, sf)
    val plan = formatted(graft.text.Curation.dsirSelect(
      docs, docs.filter(col("source") === "src0"), "doc_id", "text",
      buckets = 1000, k = 20))
    assert(plan.contains("TakeOrderedAndProject"),
      s"Gumbel-top-k must never be a full sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      "the bucket model join must broadcast")
  }

  test("pq encode: codebook broadcasts, argmin is an aggregate not a window") {
    import spark.implicits._
    val emb = core.Tables.embeddings(spark, sf)
    val cb = graft.sim.Pq.train(emb, "vec_id", "embedding", m = 2, ks = 4, seed = 1L)
    val plan = formatted(
      graft.sim.Pq.encode(emb, cb, "vec_id", "embedding", m = 2))
    assert(plan.contains("BroadcastHashJoin"), "codebook join must broadcast")
    assert(!plan.contains("Window"),
      s"argmin must be the in-group struct-min, not a window:\n$plan")
  }

  test("q116 bloom decontamination: the probe filters inside the scan stage") {
    val base = core.Tables.documents(spark, sf)
    val plan = formatted(graft.text.Curation.decontaminateBloom(
      base.filter(col("doc_id") % 50 =!= 0),
      base.filter(col("doc_id") % 50 === 0), "doc_id", "text", n = 8))
    assert(plan.contains("bloom_might_contain"),
      s"the native bloom probe must appear in the executed plan:\n$plan")
    // the probe must run BEFORE the distinct's exchange: in the
    // formatted dump the Filter carrying it sits in a WholeStageCodegen
    // stage whose detail section lists no Exchange above the scan
    val filterLine = plan.linesIterator.indexWhere(_.contains("bloom_might_contain"))
    assert(filterLine >= 0)
  }

  test("q117 rolling features: one partitioned window pass, no self-join, no global exchange") {
    val plan = formatted(Queries.registry("q117_rolling")(spark, sf))
    assert(!plan.contains("SinglePartition"), s"no global exchange:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"rolling features must never be a range self-join:\n$plan")
    val windowNodes = plan.linesIterator.count(_.trim.startsWith("Window"))
    assert(windowNodes <= 2, s"one window pass expected (plus AQE reuse):\n$plan")
  }

  test("q123 quality-classifier scoring is scan-local: no Exchange before the sort") {
    val base = core.Tables.documents(spark, sf)
    val model = graft.text.QualityClassifier.train(
      base.withColumn("is_en", (col("lang") === "en").cast("int")),
      "doc_id", "text", "is_en")
    val plan = formatted(graft.text.QualityClassifier.score(
      base, model, "doc_id", "text"))
    assert(!plan.contains("Exchange"),
      s"serve-time scoring must be a pure column expression:\n$plan")
  }

  test("q119 heavy hitters: sketch rides partial/final aggregation, recount join broadcasts") {
    val plan = formatted(Queries.registry("q119_heavy_hitters")(spark, sf))
    assert(plan.contains("ObjectHashAggregate"),
      s"mg_sketch must aggregate as a typed imperative (partial+final):\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the candidate recount join must broadcast the candidate set:\n$plan")
  }

  test("q128 group heavy hitters: per-group sketch partial-aggregates, recount join broadcasts") {
    val plan = formatted(Queries.registry("q128_group_heavy_hitters")(spark, sf))
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"per-group mg_sketch must run partial+final (map-side combinable states):\n$plan")
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"candidate recount must broadcast (groups x capacity rows), never sort-merge:\n$plan")
  }

  test("q129 temperature mix: membership is a scan-local predicate, no corpus shuffle") {
    // audit the operator, not the query binding — the binding's final
    // orderBy is presentation-only and legitimately range-exchanges
    val docs = core.Tables.documents(spark, sf)
    val plan = formatted(graft.text.Curation.temperatureMix(
      docs, "doc_id", "text", "source", alpha = 0.5))
    // the bounded per-source totals aggregate is collected driver-side
    // before this plan exists; the emitted membership plan must be pure
    // scan -> filter with zero exchanges
    assert(!plan.contains("Exchange"),
      s"membership filtering must not shuffle the corpus:\n$plan")
    assert(!plan.contains("Join"), "rates ride a literal CASE, not a join")
  }

  test("q133 ivfpq search: distance tables broadcast, the corpus codes never sort-merge") {
    val plan = formatted(Queries.registry("q133_ivfpq_topk")(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 1,
      s"codes must join the broadcast ADC table:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-scale codes must never shuffle into a sort-merge join:\n${plan.take(1500)}")
  }

  test("ivfpq encode: single corpus pass — one exchange, no join, scan-local assignment") {
    // The coarse model is collected into literals, so cell assignment +
    // residuals are pure projections; the only exchange allowed is
    // Pq.encode's (id, sub) partial-agg shuffle. A join (the old
    // cell-recovery self-join) or a second Exchange means encode went
    // back to multi-pass.
    val emb = core.Tables.embeddings(spark, sf)
    val coarse = graft.sim.IvfPq.trainCoarse(emb, "embedding", nCells = 8, seed = 27L)
    val cb = graft.sim.IvfPq.trainCodebook(emb, coarse, "vec_id", "embedding",
      m = 4, ks = 8, seed = 27L)
    val plan = formatted(
      graft.sim.IvfPq.encode(emb, coarse, cb, "vec_id", "embedding", m = 4))
    val finalTree = plan.split("== Initial Plan ==").head
    // broadcast exchanges are fine (the bounded codebook); count only
    // data shuffles
    val exchanges = finalTree.linesIterator.count(l =>
      l.contains("Exchange (") && !l.contains("BroadcastExchange"))
    assert(exchanges <= 1, s"encode must shuffle once (id,sub):\n$finalTree")
    // the codebook BroadcastHashJoin is the intended shape; what must
    // never come back is the corpus-scale self-join (a sort-merge join
    // or a second parquet scan of the embeddings)
    assert(!finalTree.contains("SortMergeJoin"),
      s"encode must not self-join to recover the cell:\n$finalTree")
    val scans = finalTree.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"encode must read the corpus exactly once:\n$finalTree")
  }

  test("q135 funnel: per-step key shuffles only — no nested loop, no cartesian") {
    // An s-step funnel is s-1 forward as-ofs over the bounded per-key
    // frontier; a range-join formulation would show up here as a
    // BroadcastNestedLoopJoin over the corpus.
    val plan = formatted(Queries.registry("q135_funnel")(spark, sf))
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"funnel must never range-join the corpus:\n${plan.take(2000)}")
    val finalTree = plan.split("== Initial Plan ==").head
    val exchanges = finalTree.linesIterator.count(l =>
      l.contains("Exchange (") && !l.contains("BroadcastExchange"))
    // anchor agg + one union-window shuffle per as-of step (x2) + the
    // output sort; anything beyond that is a regression
    assert(exchanges <= 8, s"unexpected shuffle count $exchanges:\n$finalTree")
  }

  test("q137 image decode: scan-local codec — one scan, no shuffle before the output sort") {
    // Generate -> decode -> project all run inside mapPartitions over
    // the documents scan; the only exchange allowed is the final
    // orderBy's range partitioning.
    val plan = formatted(Queries.registry("q137_image_decode")(spark, sf))
    val finalTree = plan.split("== Initial Plan ==").head
    val scans = finalTree.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"codec chain must read documents exactly once:\n$finalTree")
    val exchanges = finalTree.linesIterator.count(l =>
      l.contains("Exchange (") && !l.contains("BroadcastExchange"))
    // the one allowed exchange is the orderBy's range partitioning
    // (node details carry the partitioning; the tree line does not)
    assert(exchanges <= 1 && plan.contains("rangepartitioning"),
      s"only the output sort may shuffle:\n$finalTree")
    assert(!finalTree.contains("Join") && !finalTree.contains("HashAggregate"),
      s"codec chain must stay a pure scan-map-sort:\n$finalTree")
  }

  test("q144 cohort retention: key-fine shuffles only — no nested loop, no global window") {
    val plan = formatted(Queries.registry("q144_cohort_retention")(spark, sf))
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"retention must stay equi-joined:\n${plan.take(2000)}")
    assert(!plan.contains("SinglePartition"),
      s"no stage may collapse to one partition:\n${plan.take(2000)}")
  }

  test("q146 cms: sketch partial-aggregates; point queries broadcast against it") {
    val plan = formatted(Queries.registry("q146_cms_estimates")(spark, sf))
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "sketch cells must map-side combine")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 must be a bounded TakeOrdered, not a full sort:\n${plan.take(1500)}")
    val finalTree = plan.split("== Initial Plan ==").head
    assert(finalTree.contains("BroadcastHashJoin"),
      s"the bounded sketch/key join must broadcast:\n$finalTree")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"no unkeyed join anywhere:\n${plan.take(2000)}")
  }

  test("q145/q147 audio features: scan-local DSP — one scan, no shuffle") {
    // Same contract as the q137 codec audit: synth -> decode -> frame/DFT
    // all run inside mapPartitions over the documents scan.
    for (op <- Seq("q145_audio_frames", "q147_audio_spectrum")) {
      val plan = formatted(Queries.registry(op)(spark, sf))
      val finalTree = plan.split("== Initial Plan ==").head
      assert(finalTree.linesIterator.count(_.contains("Scan parquet")) == 1,
        s"$op must read documents exactly once:\n$finalTree")
      val exchanges = finalTree.linesIterator.count(l =>
        l.contains("Exchange (") && !l.contains("BroadcastExchange"))
      assert(exchanges <= 1 && plan.contains("rangepartitioning"),
        s"$op: only the output sort may shuffle:\n$finalTree")
      assert(!finalTree.contains("Join") && !finalTree.contains("HashAggregate"),
        s"$op must stay a pure scan-map-sort:\n$finalTree")
    }
  }

  test("q148 tfidf keywords: per-doc top-k is group-limited, df join broadcasts") {
    val plan = formatted(Queries.registry("q148_tfidf_keywords")(spark, sf))
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 1,
      s"rnk<=k must bound the per-doc window shuffle:\n${plan.take(1500)}")
    // the only SinglePartition allowed is the 1-row corpus-count agg;
    // the ranking window itself must hash-partition on the doc id
    assert(plan.contains("hashpartitioning(doc_id"),
      s"the keyword window must stay per-doc partitioned:\n${plan.take(1500)}")
  }

  test("fold assignment: no window, no exchange past the checkpointed range sort") {
    // The range exchange is materialized inside Folds.assign's
    // localCheckpoint; everything AFTER it (the executed plan of the
    // returned frame) must be a broadcast join + projection — an
    // earlier row_number formulation forced a second full-data hash
    // exchange here, which this guards against.
    val orders = core.Tables.orders(spark, sf).select(
      org.apache.spark.sql.functions.col("o_orderkey").as("row_id"),
      (org.apache.spark.sql.functions.col("o_orderkey") % 2).cast("int").as("target"),
      org.apache.spark.sql.functions.col("o_totalprice"))
    val df = graft.cv.Folds.assign(orders, 3, 789987L, Some("target"))
    val plan = formatted(df)
    assert(!plan.contains("Window"),
      s"fold index must come from the mid counter, not a window:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"),
      s"no full-data shuffle after the checkpointed range sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "offsets must join via broadcast")
  }

  test("jaccard verification: native sorted-intersect merge, no pair explosion") {
    import spark.implicits._
    val docs = core.Tables.documents(spark, sf)
    val pairs = Seq((0L, 1L), (1L, 2L)).toDF("id_1", "id_2")
    val sh = graft.dedup.Dedup.hashedCharNgrams(docs, "doc_id", "text", 5).distinct()
    val plan = formatted(graft.dedup.Dedup.exactJaccardOnPairs(pairs, sh))
    assert(plan.contains("sorted_intersect_count"),
      s"verification must use the native merge kernel:\n${plan.take(800)}")
    assert(plan.contains("sort_array") && plan.contains("collect_list"),
      "gram sets must be pre-aggregated into sorted arrays")
  }

  test("q191 attribution: window predicates ride the join condition, not a post-join mask") {
    // The attribution window must bound the aggregate's input: the
    // range predicate has to appear IN the join condition (hash join on
    // the key + residual range filter), so out-of-window pairs die
    // before the aggregate. The old shape — key-only left join, window
    // test as a column inside the aggregate — is per-key all-pairs and
    // quadratic on heavy keys.
    val df = Queries.registry("q191_attribution")(spark, sf)
    df.collect()
    val plan = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    val joinLines = plan.linesIterator.filter(_.contains("Join")).toSeq
    assert(joinLines.nonEmpty, s"expected the touch join:\n$plan")
    assert(joinLines.exists(l => l.contains("__tts") && l.contains("__cts")),
      s"range predicate must ride the join condition:\n${joinLines.mkString("\n")}")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"attribution must keep the equality key:\n${plan.take(1500)}")
  }

  test("q198 credit attribution: range predicate in the join, windows keyed by conversion id") {
    val df = Queries.registry("q198_attribution_credit")(spark, sf)
    df.collect()
    val plan = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    val joinLines = plan.linesIterator.filter(_.contains("Join")).toSeq
    assert(joinLines.exists(l => l.contains("__tts") && l.contains("__cts")),
      s"window range must ride the join condition:\n${joinLines.mkString("\n")}")
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.forall(_.contains("__cid")),
      s"credit windows must partition by the conversion id:\n${windows.mkString("\n")}")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"))
  }

  test("q201 zipf: rank window is group-limited before the OLS aggregate") {
    val plan = formatted(Queries.registry("q201_zipf_slope")(spark, sf))
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 1,
      s"rn <= topK must bound the per-source rank shuffle:\n${plan.take(1500)}")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "token counts and OLS sums must map-side combine")
  }

  test("q210 grouped percentiles: CDF window partitions by the group, never global") {
    val df = Queries.registry("q210_grouped_percentiles")(spark, sf)
    df.collect()
    val plan = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    val windows = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.nonEmpty, s"expected the per-group running total:\n$plan")
    assert(windows.forall(_.contains("__g")),
      s"the CDF window must partition by the group key:\n${windows.mkString("\n")}")
    assert(!plan.contains("SinglePartition"),
      s"no stage may collapse to one partition:\n${plan.take(1500)}")
  }

  test("q217 market share: dims broadcast, region filter pushed to its scan") {
    val plan = formatted(Queries.registry("q217_market_share")(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      s"nation/region/customer dims must broadcast:\n${plan.take(1500)}")
    assert(plan.contains("EqualTo(r_name,ASIA)") || plan.contains("r_name = ASIA"),
      s"the region predicate must reach the region scan:\n${plan.take(2000)}")
  }

  test("q87 per-source cap: partial group-limit bounds shuffle volume") {
    val plan = formatted(Queries.registry("q87_best_per_source")(spark, sf))
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 2,
      s"partial + final group limit expected for the rn<=5 window:\n${plan.take(1200)}")
  }

  test("q81 quantization is scan-local: no shuffle") {
    val emb = core.Tables.embeddings(spark, sf)
    val plan = formatted(graft.sim.Quantize.quantizeStats(emb, "vec_id", "embedding"))
    assert(!plan.contains("Exchange"), "per-vector quantization must not shuffle")
  }

  test("bucketed self-join probe side is pinned to full shuffle parallelism") {
    // the AQE pre-explosion trap (PLANS.md round-11): the probe side
    // of a bucketed self-join is row-scale small before the join
    // explodes it, so without an explicit-count repartition the
    // quadratic verify would run on the input's file count (or on ONE
    // task after AQE coalescing). The pinned exchange survives into
    // the executed plan as the join output's partition count.
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val docs = core.Tables.documents(spark, sf)
    val fuzzy = graft.dedup.Dedup.fuzzyJoinBlocked(docs, "doc_id", "text",
      org.apache.spark.sql.functions.substring(
        org.apache.spark.sql.functions.col("text"), 1, 2), maxDistance = 10)
    fuzzy.collect()
    assert(fuzzy.rdd.getNumPartitions == n,
      s"probe side must stay at $n partitions, got ${fuzzy.rdd.getNumPartitions}")
  }

  test("q88 capstone: packing windows stay partition-local post-checkpoint") {
    // the dedup stage's partial+final WindowGroupLimit is audited on
    // keepFirst directly (q47 case); packOffsets' localCheckpoint hides
    // it from this plan, so here we assert what remains visible: every
    // window in the packing tail carries the __pid partition key.
    val docs = core.Tables.documents(spark, sf)
    val df = graft.text.Corpus.curationPrep(docs, "doc_id", "text")
    df.collect()
    val plan = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    val windows = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.nonEmpty, "expected the cumsum window in the packing tail")
    assert(windows.forall(_.contains("__pid")),
      s"global-order window forbidden in the capstone:\n${windows.mkString("\n")}")
  }

  test("q224 guard stats: one aggregate pass, no self-join, no window") {
    // the loud half of the fuzzy skew guard must stay on the CHEAP side
    // of the pipeline: scan -> block-size aggregate -> filter -> count,
    // never touching the quadratic within-block join
    val plan = formatted(Queries.registry("q224_fuzzy_guard_stats")(spark, sf))
    assert(!plan.contains("Join"), s"stats must not join:\n${plan.take(1200)}")
    assert(!plan.contains("Window"), "stats must not window")
    assert(!plan.contains("levenshtein"),
      "stats must never reach the edit-distance stage")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "partial+final block-size aggregation expected")
  }

  test("q225 cohort horizon: period cut lands under the distinct, sizes join broadcasts") {
    // maxPeriods must prune BEFORE the (key, period) distinct so the
    // restriction shrinks the shuffle, not just the output
    val df = Queries.registry("q225_cohort_horizon")(spark, sf)
    df.collect()
    val optimized = df.queryExecution.optimizedPlan.toString
    val lines = optimized.linesIterator.toSeq
    // Catalyst pushes the period cut all the way into the firsts-join
    // CONDITION (even better than a standalone Filter): assert the
    // `<= 2` predicate sits deeper in the tree than the count-distinct
    // aggregate it shrinks (deeper = larger line index in the
    // rendering)
    val cutIdx = lines.indexWhere(_.contains("<= 2"))
    val aggIdx = lines.indexWhere(_.contains("count(distinct"))
    assert(cutIdx >= 0, s"horizon cut missing from the plan:\n$optimized")
    assert(aggIdx >= 0 && aggIdx < cutIdx,
      s"horizon cut must precede the distinct/aggregate:\n$optimized")
    val physical = formatted(df)
    assert(physical.contains("BroadcastHashJoin"),
      "cohort-size join over the tiny matrix must broadcast")
  }

  test("winsorizedMeans/robustOutliers: Spark-job count independent of group cardinality") {
    import spark.implicits._
    val sc = spark.sparkContext
    // the r15 shape ran 3 jobs PER GROUP off a driver-collected
    // vocabulary; the grouped-CDF rewrite must run a CONSTANT number
    // of jobs regardless of how many groups the data holds
    def jobs(tag: String)(f: => Unit): Int = {
      sc.setJobGroup(tag, tag, interruptOnCancel = false)
      try f finally sc.clearJobGroup()
      // the status store fills from an async listener bus — poll until
      // the job-id count is stable
      var last = -1
      var cur = sc.statusTracker.getJobIdsForGroup(tag).length
      while (cur != last) {
        last = cur; Thread.sleep(200)
        cur = sc.statusTracker.getJobIdsForGroup(tag).length
      }
      cur
    }
    def data(nGroups: Int) = (1 to 600).map(i =>
      (s"g${i % nGroups}", (i % 37) * 0.25)).toDF("g", "v")
    val wFew = jobs("w_few") {
      graft.ops.Stats.winsorizedMeans(data(3), "g", "v").collect() }
    val wMany = jobs("w_many") {
      graft.ops.Stats.winsorizedMeans(data(80), "g", "v").collect() }
    assert(wMany <= wFew + 2,
      s"winsorizedMeans job count must not scale with groups: 3 groups -> $wFew jobs, 80 groups -> $wMany")
    val rFew = jobs("r_few") {
      graft.ops.Stats.robustOutliers(data(3), "g", "v").collect() }
    val rMany = jobs("r_many") {
      graft.ops.Stats.robustOutliers(data(80), "g", "v").collect() }
    assert(rMany <= rFew + 2,
      s"robustOutliers job count must not scale with groups: 3 groups -> $rFew jobs, 80 groups -> $rMany")
  }
}
