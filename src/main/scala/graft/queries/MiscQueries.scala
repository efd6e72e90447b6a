package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.fs.FeatureSelection
import graft.multimodal.Multimodal
import graft.ops.Misc

/** Driver-checked queries for the remaining small SURVEY §2 operators
  * (A11, J3, R1, R2, A23, O6, F16) and the multimodal plumbing. */
object MiscQueries {

  /** A11+W2/O3: per-feature mean importance over folds, top-N desc. */
  def importanceTopN(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_type").as("feature"), col("p_retailprice").as("importance"),
        (col("p_size") % 5).as("fold"))
      .groupBy("feature").agg(round(avg("importance"), 4).as("mean_importance"))
      .orderBy(col("mean_importance").desc, col("feature")).limit(3)

  val importanceTopNSql: String =
    """SELECT p_type AS feature, round(avg(p_retailprice), 4) AS mean_importance
      |FROM part GROUP BY 1
      |ORDER BY mean_importance DESC, feature LIMIT 3""".stripMargin

  /** J3: full outer join of train/test category stat frames
    * (preprocessing.py:61,203 keyed concat). */
  def outerStats(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val train = o.filter(col("o_orderkey") % 3 === 0)
      .groupBy(col("o_orderpriority").as("value")).agg(count(lit(1)).as("train_cnt"))
    val test = o.filter(col("o_orderkey") % 3 =!= 0)
      .groupBy(col("o_orderpriority").as("value")).agg(count(lit(1)).as("test_cnt"))
    train.join(test, Seq("value"), "outer").orderBy("value")
  }

  val outerStatsSql: String =
    """WITH train AS (
      |  SELECT o_orderpriority AS value, count(*) AS train_cnt
      |  FROM orders WHERE o_orderkey % 3 = 0 GROUP BY 1
      |), test AS (
      |  SELECT o_orderpriority AS value, count(*) AS test_cnt
      |  FROM orders WHERE o_orderkey % 3 <> 0 GROUP BY 1
      |)
      |SELECT coalesce(train.value, test.value) AS value, train_cnt, test_cnt
      |FROM train FULL OUTER JOIN test ON train.value = test.value
      |ORDER BY value""".stripMargin

  /** R2: exact-n content-hash-deterministic subsample. */
  def subsample(s: SparkSession, d: String): DataFrame =
    Misc.deterministicSample(Tables.orders(s, d), 100, Seq("o_orderkey"))
      .select("o_orderkey", "o_orderstatus").orderBy("o_orderkey")

  val subsampleSql: String =
    """SELECT o_orderkey, o_orderstatus FROM (
      |  SELECT * FROM orders
      |  ORDER BY md5(CAST(o_orderkey AS VARCHAR)) LIMIT 100
      |) ORDER BY o_orderkey""".stripMargin

  /** R1: target permutation preserves the value multiset — the
    * permutation itself is engine-internal (seeded xxhash order), so
    * the checked invariant is sum/count equality. */
  def permuteInvariant(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_orderkey", "o_totalprice")
    val shuffled = FeatureSelection.shuffleColumn(o, "o_totalprice", seed = 27L)
    val a = o.agg(round(sum("o_totalprice"), 2).as("sum_orig"))
    val b = shuffled.agg(round(sum("o_totalprice"), 2).as("sum_perm"),
      count(lit(1)).as("n"))
    a.crossJoin(b)
  }

  val permuteInvariantSql: String =
    """SELECT round(sum(o_totalprice), 2) AS sum_orig,
      |       round(sum(o_totalprice), 2) AS sum_perm,
      |       count(*) AS n
      |FROM orders""".stripMargin

  /** A23: per-column in-memory byte estimate. */
  def memUsage(s: SparkSession, d: String): DataFrame =
    Misc.memoryEstimate(Tables.orders(s, d)
      .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"))

  // Every branch is CAST to BIGINT: DuckDB types sum(len(..)) as HUGEINT,
  // which lands as float64 in the driver's type-strict hash compare.
  val memUsageSql: String =
    """SELECT feature, bytes FROM (
      |  SELECT 'o_orderkey' AS feature, CAST(count(*) * 8 AS BIGINT) AS bytes FROM orders
      |  UNION ALL SELECT 'o_orderstatus', CAST(sum(len(o_orderstatus)) AS BIGINT) FROM orders
      |  UNION ALL SELECT 'o_orderpriority', CAST(sum(len(o_orderpriority)) AS BIGINT) FROM orders
      |  UNION ALL SELECT 'o_totalprice', CAST(count(*) * 8 AS BIGINT) FROM orders
      |) ORDER BY feature""".stripMargin

  /** A20 (report half): per-class precision/recall/f1/support plus
    * macro/weighted averages over a derived label/pred pair with a
    * shared domain. */
  def classReport(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_orderstatus").as("label"),
      when(col("o_totalprice") > 150000, "O")
        .when(col("o_totalprice") > 50000, "F")
        .otherwise("P").as("pred"))
    graft.ops.Stats.classificationReport(o, "label", "pred")
  }

  val classReportSql: String =
    """WITH d AS (
      |  SELECT o_orderstatus AS label,
      |         CASE WHEN o_totalprice > 150000 THEN 'O'
      |              WHEN o_totalprice > 50000 THEN 'F'
      |              ELSE 'P' END AS pred
      |  FROM orders
      |), cm AS (
      |  SELECT label, pred, count(*) AS cnt FROM d GROUP BY 1, 2
      |), bl AS (
      |  SELECT label AS cls, sum(cnt) AS support,
      |         sum(CASE WHEN label = pred THEN cnt ELSE 0 END) AS tp
      |  FROM cm GROUP BY 1
      |), bp AS (
      |  SELECT pred AS cls, sum(cnt) AS pred_cnt FROM cm GROUP BY 1
      |), pc AS (
      |  SELECT coalesce(bl.cls, bp.cls) AS cls,
      |         coalesce(support, 0) AS support, coalesce(tp, 0) AS tp,
      |         coalesce(pred_cnt, 0) AS pred_cnt
      |  FROM bl FULL OUTER JOIN bp ON bl.cls = bp.cls
      |), m AS (
      |  SELECT cls,
      |         CASE WHEN pred_cnt > 0 THEN tp * 1.0 / pred_cnt ELSE 0 END AS p,
      |         CASE WHEN support > 0 THEN tp * 1.0 / support ELSE 0 END AS r,
      |         support FROM pc
      |), m2 AS (
      |  SELECT cls, p, r,
      |         CASE WHEN p + r > 0 THEN 2 * p * r / (p + r) ELSE 0 END AS f,
      |         support FROM m
      |)
      |SELECT cls AS class, round(p, 6) AS "precision", round(r, 6) AS recall,
      |       round(f, 6) AS f1, CAST(support AS BIGINT) AS support FROM m2
      |UNION ALL
      |SELECT 'macro avg', round(avg(p), 6), round(avg(r), 6), round(avg(f), 6),
      |       CAST(sum(support) AS BIGINT) FROM m2
      |UNION ALL
      |SELECT 'weighted avg', round(sum(p * support) / sum(support), 6),
      |       round(sum(r * support) / sum(support), 6),
      |       round(sum(f * support) / sum(support), 6),
      |       CAST(sum(support) AS BIGINT) FROM m2
      |ORDER BY class""".stripMargin

  /** Composed skew reduction (transform_skewed_features,
    * preprocessing.py:326-415): events.value is genuinely
    * right-skewed (skew ~1.93) with no zeros, so the LOG candidate
    * wins by a wide margin; user_id is near-uniform, so nothing beats
    * the 0.15 improvement threshold and it stays untransformed. */
  def skewTransform(s: SparkSession, d: String): DataFrame =
    graft.ops.Preprocess.transformSkewed(
      Tables.events(s, d).select(col("value"), col("user_id").cast("double").as("user_id")),
      Seq("value", "user_id")).summary

  // Population skew via explicit moments (Spark/scipy convention;
  // DuckDB's skewness() built-in is the bias-corrected sample form).
  private def popSkewSql(expr: String): String =
    s"""(SELECT avg(pow(v - av, 3)) / pow(avg(pow(v - av, 2)), 1.5) FROM
       |  (SELECT v, avg(v) OVER () AS av FROM
       |    (SELECT $expr AS v FROM events WHERE $expr IS NOT NULL)))""".stripMargin

  val skewTransformSql: String =
    s"""SELECT 'user_id' AS feature,
       |       round(${popSkewSql("CAST(user_id AS DOUBLE)")}, 6) AS original_skew,
       |       'none' AS chosen,
       |       round(${popSkewSql("CAST(user_id AS DOUBLE)")}, 6) AS chosen_skew
       |UNION ALL
       |SELECT 'value',
       |       round(${popSkewSql("value")}, 6),
       |       'value_LOG',
       |       round(${popSkewSql("ln(value)")}, 6)
       |ORDER BY feature""".stripMargin

  /** O6: argmax row with deterministic tie-break. */
  def argmaxRow(s: SparkSession, d: String): DataFrame =
    Misc.argmax(Tables.lineitem(s, d), "l_extendedprice",
        Seq("l_orderkey", "l_linenumber"))
      .select("l_orderkey", "l_linenumber", "l_extendedprice")

  val argmaxRowSql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 1""".stripMargin

  /** F16: min-anchored equal-width binning (pd.cut parity), counts per
    * (bin, class). */
  def histCut(s: SparkSession, d: String): DataFrame =
    Misc.histogramCut(Tables.orders(s, d), "o_totalprice", "o_orderstatus", 8)

  val histCutSql: String =
    """WITH b AS (
      |  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
      |)
      |SELECT CAST(least(floor((o_totalprice - lo) / ((hi - lo) / 8)), 7) AS INT) AS bin,
      |       o_orderstatus, count(*) AS cnt
      |FROM orders, b
      |GROUP BY 1, 2 ORDER BY bin, o_orderstatus""".stripMargin

  /** Multimodal: binary payload column + partition-batched (stubbed)
    * decode — byte-level features recomputable in SQL because the
    * corpus is ASCII. */
  def multimodal(s: SparkSession, d: String): DataFrame = {
    val withPayload = Multimodal.withPayload(Tables.documents(s, d), "text", "payload")
    Multimodal.extractFeatures(withPayload.select("doc_id", "payload"), "payload")
      .select("doc_id", "n_bytes", "first_code", "byte_checksum")
      .orderBy("doc_id")
  }

  val multimodalSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  ascii(substr(text, 1, 1)) AS first_code,
      |  CAST(list_sum([ascii(substr(text, CAST(i AS INT), 1)) for i in range(1, len(text) + 1)])
      |    % 1000003 AS BIGINT) AS byte_checksum
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q137: REAL image decode under the oracle gate — deterministic
    * synthetic P6/PPM payloads (geometry + every pixel closed-form in
    * doc_id) are built, then parsed back by the pure-JVM netpbm codec
    * (header with comments, raster walk, per-channel integer stats);
    * the oracle recomputes the same statistics from the closed-form
    * pixel formula without touching any binary. A header-parse or
    * offset bug shifts every stat and fails the hash. */
  def imageDecode(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id")
    val decoded = Multimodal.decodeImages(
      Multimodal.syntheticPpm(docs, "doc_id", "payload"), "payload")
    def ch(c: Int): Seq[org.apache.spark.sql.Column] = Seq(
      round(col(s"c${c}_sum").cast("double") / (col("width") * col("height")), 6)
        .as(s"c${c}_mean"),
      col(s"c${c}_min"), col(s"c${c}_max"))
    decoded.select(
        (Seq(col("doc_id"), col("width"), col("height"), col("channels")) ++
          ch(0) ++ ch(1) ++ ch(2)): _*)
      .orderBy("doc_id")
  }

  val imageDecodeSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(4 + doc_id % 5 AS INT) AS width,
      |         CAST(3 + doc_id % 4 AS INT) AS height
      |  FROM documents
      |),
      |u AS (SELECT doc_id, width, height,
      |             unnest(range(0, CAST(width AS BIGINT)*height*3)) AS i FROM d),
      |px AS (SELECT doc_id, width, height, i % 3 AS ch,
      |              CAST((doc_id*31 + i*7) % 256 AS BIGINT) AS v FROM u)
      |SELECT doc_id, width, height, CAST(3 AS INT) AS channels,
      |  round(CAST(sum(CASE WHEN ch=0 THEN v END) AS DOUBLE) / (width*height), 6) AS c0_mean,
      |  CAST(min(CASE WHEN ch=0 THEN v END) AS INT) AS c0_min,
      |  CAST(max(CASE WHEN ch=0 THEN v END) AS INT) AS c0_max,
      |  round(CAST(sum(CASE WHEN ch=1 THEN v END) AS DOUBLE) / (width*height), 6) AS c1_mean,
      |  CAST(min(CASE WHEN ch=1 THEN v END) AS INT) AS c1_min,
      |  CAST(max(CASE WHEN ch=1 THEN v END) AS INT) AS c1_max,
      |  round(CAST(sum(CASE WHEN ch=2 THEN v END) AS DOUBLE) / (width*height), 6) AS c2_mean,
      |  CAST(min(CASE WHEN ch=2 THEN v END) AS INT) AS c2_min,
      |  CAST(max(CASE WHEN ch=2 THEN v END) AS INT) AS c2_max
      |FROM px GROUP BY 1, 2, 3
      |ORDER BY doc_id""".stripMargin

  /** q184: per-image 16-bin grayscale histogram over the q137
    * synthetic PPMs — gray is the integer channel mean and the bin is
    * g*16/256 integer arithmetic, so the oracle recomputes every
    * pixel's bin from the closed-form formula without any binary. */
  def imageHistogramQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id")
    Multimodal.imageHistogram(
        Multimodal.syntheticPpm(docs, "doc_id", "payload"), "payload", 16)
      .select("doc_id", "bin", "n_px")
      .orderBy("doc_id", "bin")
  }

  val imageHistogramSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(4 + doc_id % 5 AS INT) AS width,
      |         CAST(3 + doc_id % 4 AS INT) AS height
      |  FROM documents
      |),
      |u AS (SELECT doc_id, unnest(range(0, CAST(width AS BIGINT) * height)) AS i
      |      FROM d),
      |g AS (SELECT doc_id,
      |        CAST((((doc_id * 31 + (i * 3 + 0) * 7) % 256 +
      |               (doc_id * 31 + (i * 3 + 1) * 7) % 256 +
      |               (doc_id * 31 + (i * 3 + 2) * 7) % 256) // 3) * 16 // 256
      |          AS INT) AS bin
      |      FROM u)
      |SELECT doc_id, bin, count(*) AS n_px FROM g
      |GROUP BY 1, 2 ORDER BY doc_id, bin""".stripMargin

  /** q195: per-image contrast stats (min/max/range gray + RMS
    * contrast) over the q137 synthetic PPMs — exact integer sums, std
    * by the fixed double formula, every value replayed from the
    * closed-form pixels. */
  def imageContrastQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id")
    Multimodal.imageContrast(
        Multimodal.syntheticPpm(docs, "doc_id", "payload"), "payload")
      .select("doc_id", "g_min", "g_max", "g_range", "rms_contrast")
      .orderBy("doc_id")
  }

  val imageContrastSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(4 + doc_id % 5 AS INT) AS width,
      |         CAST(3 + doc_id % 4 AS INT) AS height
      |  FROM documents
      |),
      |u AS (SELECT doc_id, unnest(range(0, CAST(width AS BIGINT) * height)) AS i
      |      FROM d),
      |g AS (SELECT doc_id,
      |        ((doc_id * 31 + (i * 3 + 0) * 7) % 256 +
      |         (doc_id * 31 + (i * 3 + 1) * 7) % 256 +
      |         (doc_id * 31 + (i * 3 + 2) * 7) % 256) // 3 AS gv
      |      FROM u)
      |SELECT doc_id, CAST(min(gv) AS INT) AS g_min,
      |  CAST(max(gv) AS INT) AS g_max,
      |  CAST(max(gv) - min(gv) AS INT) AS g_range,
      |  round(sqrt((sum(gv * gv) * 1.0) / count(*)
      |    - ((sum(gv) * 1.0) / count(*)) * ((sum(gv) * 1.0) / count(*))), 6)
      |    AS rms_contrast
      |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q139: the decode → nearest-neighbor resize → re-encode → decode
    * chain under the oracle gate: synthetic PPMs resize to 3x2 and the
    * resized pixel stats must equal the closed-form replay of the NN
    * index map (sx = floor(x·w/3), sy = floor(y·h/2)) — any error in
    * the kernel, the re-encode header, or the second decode shifts the
    * stats and fails the hash. */
  def imageResize(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id")
    val resized = Multimodal.resizeImages(
      Multimodal.syntheticPpm(docs, "doc_id", "payload"), "payload",
      outW = 3, outH = 2)
    val decoded = Multimodal.decodeImages(resized, "payload")
    def ch(c: Int): Seq[org.apache.spark.sql.Column] = Seq(
      round(col(s"c${c}_sum").cast("double") / (col("width") * col("height")), 6)
        .as(s"c${c}_mean"),
      col(s"c${c}_min"), col(s"c${c}_max"))
    decoded.select(
        (Seq(col("doc_id"), col("width"), col("height"), col("channels")) ++
          ch(0) ++ ch(1) ++ ch(2)): _*)
      .orderBy("doc_id")
  }

  val imageResizeSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(4 + doc_id % 5 AS INT) AS w,
      |         CAST(3 + doc_id % 4 AS INT) AS h
      |  FROM documents
      |),
      |u AS (SELECT doc_id, w, h, unnest(range(0, 18)) AS o FROM d),
      |px AS (
      |  SELECT doc_id, o % 3 AS ch,
      |    ((((o // 3) // 3) * h) // 2) AS sy,
      |    ((((o // 3) % 3) * w) // 3) AS sx, w
      |  FROM u),
      |v AS (
      |  SELECT doc_id, ch,
      |    CAST((doc_id*31 + ((sy*w + sx)*3 + ch)*7) % 256 AS BIGINT) AS val
      |  FROM px)
      |SELECT doc_id, CAST(3 AS INT) AS width, CAST(2 AS INT) AS height,
      |  CAST(3 AS INT) AS channels,
      |  round(CAST(sum(CASE WHEN ch=0 THEN val END) AS DOUBLE) / 6, 6) AS c0_mean,
      |  CAST(min(CASE WHEN ch=0 THEN val END) AS INT) AS c0_min,
      |  CAST(max(CASE WHEN ch=0 THEN val END) AS INT) AS c0_max,
      |  round(CAST(sum(CASE WHEN ch=1 THEN val END) AS DOUBLE) / 6, 6) AS c1_mean,
      |  CAST(min(CASE WHEN ch=1 THEN val END) AS INT) AS c1_min,
      |  CAST(max(CASE WHEN ch=1 THEN val END) AS INT) AS c1_max,
      |  round(CAST(sum(CASE WHEN ch=2 THEN val END) AS DOUBLE) / 6, 6) AS c2_mean,
      |  CAST(min(CASE WHEN ch=2 THEN val END) AS INT) AS c2_min,
      |  CAST(max(CASE WHEN ch=2 THEN val END) AS INT) AS c2_max
      |FROM v GROUP BY 1
      |ORDER BY doc_id""".stripMargin

  /** q140: REAL WAV/PCM audio decode under the oracle gate —
    * deterministic synthetic 16-bit WAVs (mono/stereo alternating by
    * doc_id, a junk LIST chunk before fmt to exercise the RIFF walk)
    * decoded back to per-channel sample statistics; the oracle
    * recomputes them from the closed-form sample formula. */
  def audioDecode(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id")
    val decoded = Multimodal.decodeAudio(
      Multimodal.syntheticWav(docs, "doc_id", "payload"), "payload")
    def ch(c: Int): Seq[org.apache.spark.sql.Column] = Seq(
      round(col(s"a${c}_sum").cast("double") / col("n_frames"), 6).as(s"a${c}_mean"),
      col(s"a${c}_min"), col(s"a${c}_max"))
    decoded.select(
        (Seq(col("doc_id"), col("format"), col("sample_rate"), col("channels"),
          col("n_frames")) ++ ch(0) ++ ch(1)): _*)
      .orderBy("doc_id")
  }

  val audioDecodeSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(1 + doc_id % 2 AS INT) AS channels,
      |         CAST(20 + doc_id % 7 AS BIGINT) AS n
      |  FROM documents
      |),
      |u AS (SELECT doc_id, channels, n,
      |             unnest(range(0, n*channels)) AS s FROM d),
      |v AS (
      |  SELECT doc_id, channels, n, CAST(s % channels AS INT) AS ch,
      |    CAST((doc_id*37 + (s // channels)*11 + (s % channels)*5) % 4096
      |         - 2048 AS BIGINT) AS val
      |  FROM u)
      |SELECT doc_id, 'wav' AS format, CAST(8000 AS INT) AS sample_rate,
      |  channels, n AS n_frames,
      |  round(CAST(sum(CASE WHEN ch=0 THEN val END) AS DOUBLE) / n, 6) AS a0_mean,
      |  CAST(min(CASE WHEN ch=0 THEN val END) AS INT) AS a0_min,
      |  CAST(max(CASE WHEN ch=0 THEN val END) AS INT) AS a0_max,
      |  round(CAST(sum(CASE WHEN ch=1 THEN val END) AS DOUBLE) / n, 6) AS a1_mean,
      |  CAST(min(CASE WHEN ch=1 THEN val END) AS INT) AS a1_min,
      |  CAST(max(CASE WHEN ch=1 THEN val END) AS INT) AS a1_max
      |FROM v GROUP BY 1, 4, 5
      |ORDER BY doc_id""".stripMargin

  /** q145: framed audio DSP features under the oracle gate — the same
    * deterministic WAVs as q140, decoded and cut into 8-sample windows
    * per channel; RMS energy and zero-crossing counts per window must
    * equal the closed-form replay. This is the feature-extraction step
    * of an audio training-data pipeline (VAD / silence trimming run on
    * exactly these two features), computed from the REAL decoded PCM. */
  def audioFrameFeatures(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id")
    Multimodal.audioFrames(
        Multimodal.syntheticWav(docs, "doc_id", "payload"), "payload",
        frameSize = 8)
      .select(col("doc_id"), col("frame_idx"), col("channel"),
        col("n_samples"), col("rms"), col("zero_crossings"))
      .orderBy("doc_id", "frame_idx", "channel")
  }

  val audioFrameFeaturesSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(1 + doc_id % 2 AS INT) AS channels,
      |         CAST(20 + doc_id % 7 AS BIGINT) AS n
      |  FROM documents
      |),
      |u AS (SELECT doc_id, channels, unnest(range(0, n*channels)) AS s FROM d),
      |v AS (
      |  SELECT doc_id, CAST(s % channels AS INT) AS ch,
      |         CAST(s // channels AS BIGINT) AS t,
      |         CAST((doc_id*37 + (s // channels)*11 + (s % channels)*5) % 4096
      |              - 2048 AS BIGINT) AS val
      |  FROM u),
      |w AS (
      |  SELECT doc_id, ch, t, CAST(t // 8 AS INT) AS f, val,
      |         lag(val) OVER (PARTITION BY doc_id, ch ORDER BY t) AS prev
      |  FROM v)
      |SELECT doc_id, f AS frame_idx, ch AS channel,
      |  CAST(count(*) AS INT) AS n_samples,
      |  round(sqrt(CAST(sum(val*val) AS DOUBLE) / count(*)), 6) AS rms,
      |  CAST(coalesce(sum(CASE WHEN t % 8 <> 0
      |                         AND ((prev >= 0) <> (val >= 0))
      |                    THEN 1 END), 0) AS BIGINT) AS zero_crossings
      |FROM w GROUP BY doc_id, f, ch
      |ORDER BY doc_id, frame_idx, channel""".stripMargin

  /** q147: whole-clip DFT bin power under the oracle gate — the same
    * deterministic WAVs as q140, with per-channel spectral energy at
    * bins 1-4 (the Goertzel tone-energy feature) recomputed by the
    * oracle from the closed-form samples via explicit cos/sin sums.
    * The 1e-3 rounding grid absorbs cross-engine libm trig drift. */
  def audioSpectrumQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id")
    Multimodal.audioSpectrum(
        Multimodal.syntheticWav(docs, "doc_id", "payload"), "payload",
        bins = Seq(1, 2, 3, 4))
      .select(col("doc_id"), col("channel"), col("bin"), col("power"))
      .orderBy("doc_id", "channel", "bin")
  }

  val audioSpectrumSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(1 + doc_id % 2 AS INT) AS channels,
      |         CAST(20 + doc_id % 7 AS BIGINT) AS n
      |  FROM documents
      |),
      |u AS (SELECT doc_id, channels, n,
      |             unnest(range(0, n*channels)) AS s FROM d),
      |v AS (
      |  SELECT doc_id, n, CAST(s % channels AS INT) AS ch,
      |         CAST(s // channels AS BIGINT) AS t,
      |         CAST((doc_id*37 + (s // channels)*11 + (s % channels)*5) % 4096
      |              - 2048 AS BIGINT) AS val
      |  FROM u),
      |b AS (SELECT doc_id, n, ch, t, val, r AS bin FROM v, range(1, 5) q(r)),
      |agg AS (
      |  SELECT doc_id, ch, bin,
      |         sum(val * cos(2*pi()*bin*t/n)) AS sc,
      |         sum(val * sin(2*pi()*bin*t/n)) AS ss
      |  FROM b GROUP BY 1, 2, 3)
      |SELECT doc_id, ch AS channel, CAST(bin AS INT) AS bin,
      |       round(sc*sc + ss*ss, 3) AS power
      |FROM agg ORDER BY doc_id, channel, bin""".stripMargin

  /** q141: REAL Y4M video demux under the oracle gate — deterministic
    * synthetic YUV4MPEG2 streams (C420, closed-form luma and chroma)
    * demuxed back to geometry/rate/frame-count and whole-stream luma
    * stats; the oracle recomputes them from the luma formula. */
  def videoDecode(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id")
    Multimodal.decodeVideo(
        Multimodal.syntheticY4m(docs, "doc_id", "payload"), "payload")
      .select(col("doc_id"), col("width"), col("height"), col("n_frames"),
        col("fps_num"), col("fps_den"),
        round(col("y_sum").cast("double") /
          (col("width") * col("height") * col("n_frames")), 6).as("y_mean"),
        col("y_min"), col("y_max"))
      .orderBy("doc_id")
  }

  val videoDecodeSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(4 + 2*(doc_id % 3) AS INT) AS width,
      |         CAST(4 + 2*(doc_id % 2) AS INT) AS height,
      |         CAST(3 + doc_id % 4 AS BIGINT) AS n
      |  FROM documents
      |),
      |u AS (SELECT doc_id, width, height, n,
      |             unnest(range(0, n*width*height)) AS s FROM d),
      |v AS (
      |  SELECT doc_id, width, height, n,
      |    CAST((doc_id*13 + (s // (width*height))*17
      |          + (s % (width*height))*5) % 256 AS BIGINT) AS val
      |  FROM u)
      |SELECT doc_id, width, height, n AS n_frames,
      |  CAST(25 AS INT) AS fps_num, CAST(1 AS INT) AS fps_den,
      |  round(CAST(sum(val) AS DOUBLE) / (width*height*n), 6) AS y_mean,
      |  CAST(min(val) AS INT) AS y_min, CAST(max(val) AS INT) AS y_max
      |FROM v GROUP BY 1, 2, 3, 4
      |ORDER BY doc_id""".stripMargin

  /** q142: video→image composition — every 2nd demuxed frame re-encoded
    * as a P5 PGM payload and pushed through the IMAGE decoder; per-frame
    * luma stats must equal the closed-form replay. Exercises the whole
    * chain: Y4M demux, stride sampling, netpbm re-encode, image decode. */
  def videoFrames(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id")
    val framed = Multimodal.sampleVideoFrames(
      Multimodal.syntheticY4m(docs, "doc_id", "payload"), "payload", stride = 2)
    Multimodal.decodeImages(framed, "frame")
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
        col("channels"),
        round(col("c0_sum").cast("double") / (col("width") * col("height")), 6)
          .as("c0_mean"),
        col("c0_min"), col("c0_max"))
      .orderBy("doc_id", "frame_idx")
  }

  val videoFramesSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(4 + 2*(doc_id % 3) AS INT) AS width,
      |         CAST(4 + 2*(doc_id % 2) AS INT) AS height,
      |         CAST(3 + doc_id % 4 AS BIGINT) AS n
      |  FROM documents
      |),
      |f AS (SELECT doc_id, width, height,
      |             unnest(range(0, n, 2)) AS fi FROM d),
      |u AS (SELECT doc_id, width, height, fi,
      |             unnest(range(0, width*height)) AS q FROM f),
      |v AS (
      |  SELECT doc_id, width, height, fi,
      |    CAST((doc_id*13 + fi*17 + q*5) % 256 AS BIGINT) AS val
      |  FROM u)
      |SELECT doc_id, CAST(fi AS INT) AS frame_idx, width, height,
      |  CAST(1 AS INT) AS channels,
      |  round(CAST(sum(val) AS DOUBLE) / (width*height), 6) AS c0_mean,
      |  CAST(min(val) AS INT) AS c0_min, CAST(max(val) AS INT) AS c0_max
      |FROM v GROUP BY 1, 2, 3, 4
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** q153: perceptual image hashing under the oracle gate — dHash over
    * the q137 synthetic PPMs (channel-mean gray, 9×8 NN resize, 64
    * adjacent-brightness bits); the oracle rebuilds every hash bit
    * from the closed-form pixel formula. */
  def imageDHashQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id")
    Multimodal.imageDHash(
        Multimodal.syntheticPpm(docs, "doc_id", "payload"), "payload")
      .select(col("doc_id"), col("dhash"))
      .orderBy("doc_id")
  }

  val imageDHashSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(4 + doc_id % 5 AS BIGINT) AS w,
      |         CAST(3 + doc_id % 4 AS BIGINT) AS h
      |  FROM documents
      |),
      |grid AS (
      |  SELECT doc_id, w, h, y, x, (y*h) // 8 AS sy, (x*w) // 9 AS sx
      |  FROM d, range(0, 8) t1(y), range(0, 9) t2(x)
      |),
      |g AS (
      |  SELECT doc_id, y, x,
      |    ((CAST((doc_id*31 + ((sy*w+sx)*3 + 0)*7) % 256 AS BIGINT)
      |    + CAST((doc_id*31 + ((sy*w+sx)*3 + 1)*7) % 256 AS BIGINT)
      |    + CAST((doc_id*31 + ((sy*w+sx)*3 + 2)*7) % 256 AS BIGINT)) // 3)
      |      AS gray
      |  FROM grid
      |),
      |b AS (
      |  SELECT doc_id, y, x,
      |    CASE WHEN lead(gray) OVER (PARTITION BY doc_id, y ORDER BY x)
      |              > gray THEN '1' ELSE '0' END AS bit
      |  FROM g)
      |SELECT doc_id, string_agg(bit, '' ORDER BY y, x) AS dhash
      |FROM b WHERE x < 8 GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q209: image near-duplicate detection — Hamming-banded dHash over
    * the q153 synthetic PPMs (8 bands × 8 bits; pigeonhole guarantees
    * no pair at distance ≤ 6 is missed), exact popcount verification.
    * The oracle rebuilds every hash from the closed-form pixel formula
    * and takes the all-pairs Hamming distance it can afford at
    * sf0.01 — the banded pipeline must reproduce it exactly. The
    * oracle mirrors the operator's maxBucketSize=10000 skew guard
    * (the fuzzyJoinSql `ok` CTE pattern): cross-hash pairs must share
    * at least one band bucket holding <= 10000 distinct hashes, while
    * identical-hash pairs (distance 0) are always kept — so engine
    * and oracle agree at ANY scale factor, not just below the cap. */
  /** q209 and q212 share the expensive step — the banded verify over
    * DISTINCT dHashes — via this memo of (hashed frame, hash-level
    * near pairs), both checkpointed once per (session, sf). q209
    * expands to id pairs (output-bound) and q212 clusters at the HASH
    * level (the sf1 rehearsal lesson: clustering the expanded id
    * graph pays every same-hash clique and |a|×|b| edge copies for
    * the same components — 586 s vs ~40 s at sf1). */
  private def imageHashPairs(s: SparkSession, d: String): (DataFrame, DataFrame) =
    graft.core.Memo.getOrElseUpdate(
        s"imgpairs:${s.sparkContext.applicationId}:$d") {
      val docs = Tables.documents(s, d).select("doc_id")
      val hashed = Multimodal.imageDHash(
          Multimodal.syntheticPpm(docs, "doc_id", "payload"), "payload")
        .select(col("doc_id"), col("dhash"))
        .localCheckpoint(false)
      val hp = graft.dedup.Dedup.hammingHashPairs(hashed, "dhash",
          maxDistance = 6, bands = 8)
        .localCheckpoint(false)
      (hashed, hp)
    }

  def imageNearDup(s: SparkSession, d: String): DataFrame = {
    val (hashed, hp) = imageHashPairs(s, d)
    graft.dedup.Dedup.hammingExpandPairs(hashed, "doc_id", "dhash", hp)
      .orderBy("id_1", "id_2")
  }

  /** q212: image near-dup clusters — connected components over the
    * q209 Hamming pairs, computed on the distinct-hash graph and
    * mapped to ids (the oracle closes the expanded id pairs with a
    * recursive CTE, the q66/q194 pattern — same components). */
  def imageDupClusters(s: SparkSession, d: String): DataFrame = {
    val (hashed, hp) = imageHashPairs(s, d)
    graft.dedup.Dedup.hammingClusters(hashed, "doc_id", "dhash", hp)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  /** q220: canonical image per near-dup cluster — composition of the
    * q212 clusters with the q195 contrast score: each cluster keeps
    * its highest-RMS-contrast member (doc_id tie-break), the image
    * curation "keep the sharpest copy" step after near-dup grouping.
    * The oracle reads the verified q212 dump and re-ranks with q195's
    * closed-form contrast SQL (the q192 canonical-docs pattern). */
  def canonicalImages(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id")
    val scored = Multimodal.imageContrast(
        Multimodal.syntheticPpm(docs, "doc_id", "payload"), "payload")
      .select(col("doc_id"), col("rms_contrast"))
    graft.dedup.Dedup.canonicalPick(
        imageDupClusters(s, d), scored, "doc_id", "rms_contrast")
      .orderBy("cluster")
  }

  val canonicalImagesSql: String =
    """WITH cl AS (
      |  SELECT doc_id, cluster
      |  FROM read_parquet('__VERIFY_OUT__/q212_image_dup_clusters/*.parquet')
      |),
      |d AS (
      |  SELECT doc_id, CAST(4 + doc_id % 5 AS INT) AS width,
      |         CAST(3 + doc_id % 4 AS INT) AS height
      |  FROM documents
      |),
      |u AS (SELECT doc_id, unnest(range(0, CAST(width AS BIGINT) * height)) AS i
      |      FROM d),
      |g AS (SELECT doc_id,
      |        ((doc_id * 31 + (i * 3 + 0) * 7) % 256 +
      |         (doc_id * 31 + (i * 3 + 1) * 7) % 256 +
      |         (doc_id * 31 + (i * 3 + 2) * 7) % 256) // 3 AS gv
      |      FROM u),
      |c AS (SELECT doc_id,
      |        round(sqrt((sum(gv * gv) * 1.0) / count(*)
      |          - ((sum(gv) * 1.0) / count(*)) * ((sum(gv) * 1.0) / count(*))), 6)
      |          AS rms_contrast
      |      FROM g GROUP BY doc_id),
      |j AS (SELECT cl.cluster, cl.doc_id, c.rms_contrast
      |      FROM cl JOIN c USING (doc_id)),
      |r AS (SELECT cluster, doc_id, rms_contrast,
      |        row_number() OVER (PARTITION BY cluster
      |                           ORDER BY rms_contrast DESC, doc_id) AS rn,
      |        count(*) OVER (PARTITION BY cluster) AS n_members
      |      FROM j)
      |SELECT cluster, doc_id AS canonical_doc_id, rms_contrast, n_members
      |FROM r WHERE rn = 1 ORDER BY cluster""".stripMargin

  // lazy: textually precedes imageNearDupSql in this object
  lazy val imageDupClustersSql: String = {
    val pairsCte = imageNearDupSql.replace("ORDER BY id_1, id_2", "")
    s"""WITH RECURSIVE pairs AS ($pairsCte),
      |e AS (
      |  SELECT id_1 AS src, id_2 AS dst FROM pairs
      |  UNION ALL SELECT id_2, id_1 FROM pairs
      |),
      |reach(id, lbl) AS (
      |  SELECT src, src FROM e
      |  UNION
      |  SELECT e.src, r.lbl FROM e JOIN reach r ON e.dst = r.id
      |)
      |SELECT id AS doc_id, min(lbl) AS cluster
      |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin
  }

  val imageNearDupSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(4 + doc_id % 5 AS BIGINT) AS w,
      |         CAST(3 + doc_id % 4 AS BIGINT) AS h
      |  FROM documents
      |),
      |grid AS (
      |  SELECT doc_id, w, h, y, x, (y*h) // 8 AS sy, (x*w) // 9 AS sx
      |  FROM d, range(0, 8) t1(y), range(0, 9) t2(x)
      |),
      |g AS (
      |  SELECT doc_id, y, x,
      |    ((CAST((doc_id*31 + ((sy*w+sx)*3 + 0)*7) % 256 AS BIGINT)
      |    + CAST((doc_id*31 + ((sy*w+sx)*3 + 1)*7) % 256 AS BIGINT)
      |    + CAST((doc_id*31 + ((sy*w+sx)*3 + 2)*7) % 256 AS BIGINT)) // 3)
      |      AS gray
      |  FROM grid
      |),
      |b AS (
      |  SELECT doc_id, y, x,
      |    CASE WHEN lead(gray) OVER (PARTITION BY doc_id, y ORDER BY x)
      |              > gray THEN '1' ELSE '0' END AS bit
      |  FROM g),
      |hsh AS (SELECT doc_id, string_agg(bit, '' ORDER BY y, x) AS dhash
      |        FROM b WHERE x < 8 GROUP BY doc_id),
      |reps AS (SELECT DISTINCT dhash FROM hsh),
      |bnd AS (SELECT dhash, bi, substr(dhash, CAST(bi*8+1 AS INT), 8) AS v
      |        FROM reps, range(0, 8) tb(bi)),
      |okb AS (SELECT bi, v FROM bnd GROUP BY bi, v
      |        HAVING count(*) <= 10000),
      |hp AS (SELECT DISTINCT x.dhash AS ha, y.dhash AS hb
      |       FROM bnd x JOIN okb o ON x.bi = o.bi AND x.v = o.v
      |       JOIN bnd y ON y.bi = x.bi AND y.v = x.v
      |                 AND x.dhash < y.dhash),
      |p AS (SELECT a.doc_id AS id_1, c.doc_id AS id_2,
      |             a.dhash AS ha, c.dhash AS hb
      |      FROM hsh a JOIN hsh c ON a.doc_id < c.doc_id),
      |dist AS (
      |  SELECT id_1, id_2, ha, hb,
      |    CAST(list_sum(list_transform(range(1, 65),
      |      i -> CASE WHEN substr(ha, i, 1) <> substr(hb, i, 1)
      |           THEN 1 ELSE 0 END)) AS INT) AS hamming
      |  FROM p)
      |SELECT d.id_1, d.id_2, d.hamming FROM dist d
      |LEFT JOIN hp ON hp.ha = least(d.ha, d.hb)
      |            AND hp.hb = greatest(d.ha, d.hb)
      |WHERE d.hamming <= 6 AND (d.ha = d.hb OR hp.ha IS NOT NULL)
      |ORDER BY id_1, id_2""".stripMargin

  /** q218: linear-interpolation resample of the synthetic WAV clips
    * from 8 kHz to 12 kHz — every output sample replayed in SQL from
    * the closed-form source formula with the identical exact-integer
    * index/remainder arithmetic. */
  def audioResample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id")
    Multimodal.resampleAudio(
        Multimodal.syntheticWav(docs, "doc_id", "payload"), "payload",
        targetRate = 12000)
      .select(col("doc_id"), col("channel"), col("k"), col("value"))
      .orderBy("doc_id", "channel", "k")
  }

  val audioResampleSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(1 + doc_id % 2 AS BIGINT) AS nch,
      |         CAST(20 + doc_id % 7 AS BIGINT) AS n
      |  FROM documents
      |),
      |ks AS (SELECT doc_id, nch, n,
      |         unnest(range(0, ((n - 1) * 12000) // 8000 + 1)) AS k
      |       FROM d),
      |kc AS (SELECT doc_id, nch, n, k, unnest(range(0, nch)) AS c FROM ks),
      |pos AS (SELECT doc_id, nch, n, k, c,
      |          (k * 8000) // 12000 AS idx, (k * 8000) % 12000 AS md
      |        FROM kc),
      |sv AS (SELECT doc_id, k, c, md,
      |         CAST((doc_id*37 + idx*11 + c*5) % 4096 AS BIGINT) - 2048 AS s0,
      |         CAST((doc_id*37 + least(idx + 1, n - 1)*11 + c*5) % 4096
      |           AS BIGINT) - 2048 AS s1
      |       FROM pos)
      |SELECT doc_id, CAST(c AS INT) AS channel, CAST(k AS INT) AS k,
      |  round(s0 * (1 - (md * 1.0) / 12000) + s1 * ((md * 1.0) / 12000), 6)
      |    AS value
      |FROM sv ORDER BY doc_id, channel, k""".stripMargin

  /** q152: shot-boundary detection under the oracle gate — the same
    * deterministic Y4M streams as q141, diffed frame-to-frame; the
    * mean-absolute-luma-difference metric and cut flags must equal the
    * closed-form replay (per-pixel diffs are 17 or 17−256 mod-wraps,
    * so threshold 30 splits the two regimes). */
  def videoScenes(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id")
    Multimodal.sceneChanges(
        Multimodal.syntheticY4m(docs, "doc_id", "payload"), "payload",
        threshold = 30.0)
      .select(col("doc_id"), col("frame_idx"), col("mad"), col("is_cut"))
      .orderBy("doc_id", "frame_idx")
  }

  val videoScenesSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(4 + 2*(doc_id % 3) AS INT) AS width,
      |         CAST(4 + 2*(doc_id % 2) AS INT) AS height,
      |         CAST(3 + doc_id % 4 AS BIGINT) AS n
      |  FROM documents
      |),
      |f AS (SELECT doc_id, width, height,
      |             unnest(range(1, n)) AS fi FROM d),
      |u AS (SELECT doc_id, width, height, fi,
      |             unnest(range(0, width*height)) AS q FROM f),
      |v AS (
      |  SELECT doc_id, width, height, fi,
      |    abs(CAST((doc_id*13 + fi*17 + q*5) % 256 AS BIGINT)
      |      - CAST((doc_id*13 + (fi-1)*17 + q*5) % 256 AS BIGINT)) AS ad
      |  FROM u)
      |SELECT doc_id, CAST(fi AS INT) AS frame_idx,
      |  round(CAST(sum(ad) AS DOUBLE) / (width*height), 6) AS mad,
      |  round(CAST(sum(ad) AS DOUBLE) / (width*height), 6) > 30.0 AS is_cut
      |FROM v GROUP BY doc_id, fi, width, height
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** §2.11 extension under the oracle gate: the same plan
    * Events.hourlyTypeCounts runs incrementally under a watermark,
    * executed batch here and recomputed by DuckDB date_trunc. */
  def hourlyEvents(s: SparkSession, d: String): DataFrame =
    graft.streaming.Events.hourlyTypeCounts(
        graft.streaming.Events.normalize(Tables.events(s, d)))
      .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")

  val hourlyEventsSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |       event_type, count(*) AS n_events,
      |       round(CAST(sum(CAST(sign(value) * floor(abs(value) * 1000000 + 0.5) AS HUGEINT)) AS DOUBLE) / 1000000, 4) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** mapGroupsWithState running totals, batch-executed (the state op
    * runs once over the single batch) and SQL-recomputed. */
  def userTotals(s: SparkSession, d: String): DataFrame =
    graft.streaming.Events.runningUserTotals(
        s, graft.streaming.Events.normalize(Tables.events(s, d)))
      .select(col("user_id"), col("n_events"),
        round(col("total_value"), 4).as("total_value"))
      .orderBy("user_id")

  val userTotalsSql: String =
    """SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS total_value
      |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin

  /** F17 as a *column* function (beyond the reference's driver-side
    * JSON): extract a typed field from the events JSON props and
    * aggregate on it. */
  def jsonProps(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(avg("k"), 4).as("avg_k"),
        max("k").as("max_k"))
      .orderBy("event_type")

  val jsonPropsSql: String =
    """SELECT event_type, count(*) AS n,
      |       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
      |       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Salted two-phase aggregation on a 3-value (maximally hot) key —
    * result identical to the direct groupBy, so the plain-SQL oracle
    * checks the decomposition exactly. */
  def saltedAgg(s: SparkSession, d: String): DataFrame = {
    import graft.ops.Skew
    Skew.saltedAgg(Tables.lineitem(s, d), Seq("l_returnflag"),
        Seq(Skew.SaltedSum("l_quantity", "sum_qty"), Skew.SaltedCount("n"),
          Skew.SaltedMin("l_extendedprice", "min_price"),
          Skew.SaltedMax("l_extendedprice", "max_price"),
          Skew.SaltedAvg("l_discount", "avg_disc")))
      .select(col("l_returnflag"), round(col("sum_qty"), 2).as("sum_qty"), col("n"),
        col("min_price"), col("max_price"), round(col("avg_disc"), 6).as("avg_disc"))
      .orderBy("l_returnflag")
  }

  val saltedAggSql: String =
    """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n,
      |       min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
      |       round(avg(l_discount), 6) AS avg_disc
      |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q57_hourly_events" -> (hourlyEvents _),
    "q58_user_totals" -> (userTotals _),
    "q59_json_props" -> (jsonProps _),
    "q61_salted_agg" -> (saltedAgg _),
    "q49_importance_topn" -> (importanceTopN _),
    "q50_outer_stats" -> (outerStats _),
    "q51_subsample" -> (subsample _),
    "q52_permute_invariant" -> (permuteInvariant _),
    "q53_memusage" -> (memUsage _),
    "q54_argmax" -> (argmaxRow _),
    "q55_hist_cut" -> (histCut _),
    "q56_multimodal" -> (multimodal _),
    "q137_image_decode" -> (imageDecode _),
    "q139_image_resize" -> (imageResize _),
    "q184_image_histogram" -> (imageHistogramQ _),
    "q195_image_contrast" -> (imageContrastQ _),
    "q140_audio_decode" -> (audioDecode _),
    "q145_audio_frames" -> (audioFrameFeatures _),
    "q147_audio_spectrum" -> (audioSpectrumQ _),
    "q141_video_decode" -> (videoDecode _),
    "q152_video_scenes" -> (videoScenes _),
    "q153_image_dhash" -> (imageDHashQ _),
    "q209_image_near_dup" -> (imageNearDup _),
    "q212_image_dup_clusters" -> (imageDupClusters _),
    "q220_image_canonical" -> (canonicalImages _),
    "q218_audio_resample" -> (audioResample _),
    "q142_video_frames" -> (videoFrames _),
    "q68_class_report" -> (classReport _),
    "q70_skew_transform" -> (skewTransform _))

  val oracles: Map[String, String] = Map(
    "q57_hourly_events" -> hourlyEventsSql,
    "q58_user_totals" -> userTotalsSql,
    "q59_json_props" -> jsonPropsSql,
    "q61_salted_agg" -> saltedAggSql,
    "q49_importance_topn" -> importanceTopNSql,
    "q50_outer_stats" -> outerStatsSql,
    "q51_subsample" -> subsampleSql,
    "q52_permute_invariant" -> permuteInvariantSql,
    "q53_memusage" -> memUsageSql,
    "q54_argmax" -> argmaxRowSql,
    "q55_hist_cut" -> histCutSql,
    "q56_multimodal" -> multimodalSql,
    "q137_image_decode" -> imageDecodeSql,
    "q139_image_resize" -> imageResizeSql,
    "q184_image_histogram" -> imageHistogramSql,
    "q195_image_contrast" -> imageContrastSql,
    "q140_audio_decode" -> audioDecodeSql,
    "q145_audio_frames" -> audioFrameFeaturesSql,
    "q147_audio_spectrum" -> audioSpectrumSql,
    "q141_video_decode" -> videoDecodeSql,
    "q152_video_scenes" -> videoScenesSql,
    "q153_image_dhash" -> imageDHashSql,
    "q209_image_near_dup" -> imageNearDupSql,
    "q212_image_dup_clusters" -> imageDupClustersSql,
    "q220_image_canonical" -> canonicalImagesSql,
    "q218_audio_resample" -> audioResampleSql,
    "q142_video_frames" -> videoFramesSql,
    "q68_class_report" -> classReportSql,
    "q70_skew_transform" -> skewTransformSql)
}
