package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.cv.{CrossValidation, Folds}
import graft.cv.CrossValidation.CvConfig
import graft.ml.{Metrics, Models}

/** Throwaway per-stage profiler for q31/q32 (VERDICT r6 item 1):
  * replicates the q32 pipeline stage by stage with wall timers to
  * attribute the 24s. Not part of the shipped surface; deleted once
  * the attribution lands in PLANS.md. */
object ProfileCv {
  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(graft.functions.GraftFunctions.inject)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val frame = Tables.orders(spark, sfDir).select(
      col("o_orderkey").as("row_id"),
      (col("o_orderstatus") === "O").cast("int").as("target"),
      col("o_totalprice"), col("o_custkey").cast("double").as("o_custkey"),
      unix_timestamp(col("o_orderdate")).cast("double").as("o_epoch"))
    val features = Seq("o_totalprice", "o_custkey", "o_epoch")
    val cfg = CvConfig(numFolds = 3, stratified = true, metricName = "roc_auc_score")

    t("warmup count")(frame.count())

    // ---- stage-by-stage replica of runCvOneSeed ----
    val folded = t("folds assign+cache+count") {
      val f = Folds.assign(
        frame.select(("row_id" +: "target" +: features).map(col): _*),
        cfg.numFolds, cfg.dataSplitSeed, Some("target")).cache()
      f.count()
      f
    }
    val model = Models.LogReg(maxIter = 10)
    var oofParts = List.empty[DataFrame]
    (0 until 3).foreach { k =>
      val trainK = folded.filter(col("fold") =!= k)
      val validK = folded.filter(col("fold") === k)
      val fitted = t(s"fit fold $k")(model.fit(trainK, Some(validK), features, "target", 27L))
      oofParts ::= fitted.score(validK, cfg.predictProbability, cfg.classLabel)
        .select(col("row_id"), col("target"), col("fold"), col("__score").as("oof_score"))
    }
    val oof = oofParts.reduce(_ unionByName _).cache()
    t("oof union count")(oof.count())
    (0 until 3).foreach { k =>
      t(s"rocAuc fold $k")(Metrics.rocAuc(oof.filter(col("fold") === k), "target", "oof_score"))
    }
    t("rocAuc full oof")(Metrics.rocAuc(oof, "target", "oof_score"))

    // ---- the bagged tail of runCvAndPrediction (seedless: same oof twice) ----
    val seeds = Seq(27L, 42L)
    val seedNames = Seq("seed_1", "seed_2")
    val bagged = t("bagSeeds pivot + count") {
      val tagged = seeds.zipWithIndex.map { case (_, i) =>
        oof.select(col("row_id"), col("oof_score").as("__v"), lit(s"seed_${i + 1}").as("__seed"))
      }.reduce(_ unionByName _)
      val b = tagged.groupBy("row_id").pivot("__seed", seedNames)
        .agg(round(first(col("__v")), 6)).cache()
      b.count()
      b
    }
    val targetSide = oof.select(col("row_id"), col("target"))
    val oofBag = t("reduce + join + count") {
      val reduced = seedNames.map(col(_).cast("double")).reduce(_ + _) / lit(2)
      val ob = bagged.select(col("row_id"), round(reduced, 6).as("target_OOF"))
        .join(targetSide, Seq("row_id")).cache()
      ob.count()
      ob
    }
    t("rocAuc bagged")(Metrics.rocAuc(oofBag, "target", "target_OOF"))

    // ---- end-to-end comparison: the real entry points, fresh ----
    graft.core.Memo.clear()
    t("q31 end-to-end (checksum)") {
      val df = graft.queries.MlQueries.cvOof(spark, sfDir)
      df.agg(bit_xor(xxhash64(df.columns.map(col): _*))).collect()
    }
    t("q32 end-to-end (checksum)") {
      val df = graft.queries.MlQueries.cvScores(spark, sfDir)
      df.agg(bit_xor(xxhash64(df.columns.map(col): _*))).collect()
    }
    spark.stop()
  }
}
