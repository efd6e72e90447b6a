package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (LLM-data extension family): media
  * payloads ride as opaque `BinaryType` columns with typed metadata;
  * decode / feature-extraction runs as partition-batched functions over
  * the binary bytes.
  *
  * Two feature tiers:
  *  - byte-level (`extractFeatures`, `sampleFrames`, `resizePayload`) —
  *    format-agnostic payload plumbing (length/checksum features,
  *    fixed-stride framing, deterministic subsampling);
  *  - decoded (`decodeImages`) — a real pure-JVM image codec for the
  *    uncompressed interchange formats (binary PPM/PGM a.k.a. netpbm
  *    P6/P5, and 24-bit uncompressed BMP), emitting dimensions and
  *    exact per-channel integer pixel statistics. Compressed codecs
  *    (JPEG/PNG/audio/video) need native libraries this environment
  *    does not ship; the codec dispatch returns a null decode row for
  *    unrecognized magic bytes, so adding codecs is additive.
  *
  * Everything runs mapPartitions-batched (codec state loads once per
  * task, the Scala analogue of a Pandas UDF over mapInPandas) and never
  * collects payloads to the driver.
  */
object Multimodal {

  /** Feature schema produced by the byte-level extractor. */
  val featureSchema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("first_code", IntegerType, nullable = false),
    StructField("byte_checksum", LongType, nullable = false)))

  /** Byte-level features: payload length, first byte, and a mod-prime
    * byte checksum — the format-agnostic tier (no decode). */
  private[multimodal] def byteFeatures(payload: Array[Byte]): Row = {
    var checksum = 0L
    var i = 0
    while (i < payload.length) { checksum = (checksum + (payload(i) & 0xff)) % 1000003L; i += 1 }
    Row(payload.length, if (payload.isEmpty) -1 else payload(0) & 0xff, checksum)
  }

  // -------------------------------------------------------------------
  // Decoded tier: pure-JVM image codec (netpbm P5/P6 + BMP-24)
  // -------------------------------------------------------------------

  /** Schema of a decoded image: format tag, dimensions, and exact
    * per-channel integer statistics (sum/min/max; channels beyond the
    * image's depth stay null). Integer stats by design — means are
    * computed downstream in SQL, so the codec itself has no float
    * rounding to disagree with an oracle about. */
  val imageSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("c0_sum", LongType, nullable = true),
    StructField("c0_min", IntegerType, nullable = true),
    StructField("c0_max", IntegerType, nullable = true),
    StructField("c1_sum", LongType, nullable = true),
    StructField("c1_min", IntegerType, nullable = true),
    StructField("c1_max", IntegerType, nullable = true),
    StructField("c2_sum", LongType, nullable = true),
    StructField("c2_min", IntegerType, nullable = true),
    StructField("c2_max", IntegerType, nullable = true)))

  private val nullDecode: Row = Row(null, null, null, null,
    null, null, null, null, null, null, null, null, null)

  /** Per-channel stats over an interleaved raster: `chMap(j%channels)`
    * gives the OUTPUT channel of interleave position j (identity for
    * RGB rasters, reversed for BMP's BGR), `rowPad` trailing bytes per
    * row are skipped (BMP rows pad to 4-byte boundaries). Stats are
    * order-independent, so top-down vs bottom-up row order never
    * matters. */
  private def rasterStats(fmt: String, p: Array[Byte], off: Int,
      w: Int, h: Int, channels: Int, chMap: Array[Int], rowPad: Int): Row = {
    val sums = new Array[Long](3)
    val mins = Array(256, 256, 256)
    val maxs = Array(-1, -1, -1)
    val rowBytes = w * channels
    require(off + h.toLong * (rowBytes + rowPad) - rowPad <= p.length,
      s"raster truncated: need ${h.toLong * (rowBytes + rowPad)} bytes from $off, have ${p.length}")
    var r = 0
    while (r < h) {
      val base = off + r * (rowBytes + rowPad)
      var j = 0
      while (j < rowBytes) {
        val c = chMap(j % channels)
        val v = p(base + j) & 0xff
        sums(c) += v
        if (v < mins(c)) mins(c) = v
        if (v > maxs(c)) maxs(c) = v
        j += 1
      }
      r += 1
    }
    def s(c: Int): Seq[Any] =
      if (c < channels) Seq[Any](sums(c), mins(c), maxs(c)) // explicit Any: Seq(Long, Int, Int) would widen the Ints
      else Seq(null, null, null)
    Row.fromSeq(Seq(fmt, w, h, channels) ++ s(0) ++ s(1) ++ s(2))
  }

  /** Binary netpbm (P5 grayscale / P6 RGB, maxval <= 255): header is
    * ASCII ints separated by whitespace, `#` comments run to end of
    * line, and exactly ONE whitespace byte after maxval precedes the
    * raster (the netpbm spec rule that makes the raster offset
    * unambiguous). */
  private def decodeNetpbm(p: Array[Byte]): Row = {
    val channels = if (p(1) == '6') 3 else 1
    var i = 2
    def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
    def nextInt(): Int = {
      var skipping = true
      while (skipping) {
        while (i < p.length && isWs(p(i))) i += 1
        if (i < p.length && p(i) == '#') { while (i < p.length && p(i) != '\n') i += 1 }
        else skipping = false
      }
      var v = 0
      require(i < p.length && p(i) >= '0' && p(i) <= '9', "malformed netpbm header")
      while (i < p.length && p(i) >= '0' && p(i) <= '9') { v = v * 10 + (p(i) - '0'); i += 1 }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxv = nextInt()
    require(w > 0 && h > 0 && maxv > 0 && maxv <= 255,
      s"unsupported netpbm geometry ${w}x$h maxval $maxv")
    i += 1 // the single post-maxval whitespace byte
    rasterStats(if (channels == 3) "ppm" else "pgm", p, i, w, h, channels,
      Array(0, 1, 2), rowPad = 0)
  }

  /** Uncompressed 24-bit BMP (BITMAPINFOHEADER or larger, BI_RGB):
    * little-endian header fields, BGR interleave reported as RGB
    * channel stats, rows padded to 4-byte boundaries; negative height
    * (top-down) handled — row order cannot affect the stats. */
  private def decodeBmp(p: Array[Byte]): Row = {
    def u16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    def i32(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) |
      ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)
    require(p.length >= 54, "BMP header truncated")
    val dataOff = i32(10)
    val hdrSize = i32(14)
    val w = i32(18)
    val hRaw = i32(22)
    val bpp = u16(28)
    val comp = i32(30)
    require(hdrSize >= 40 && bpp == 24 && comp == 0,
      s"unsupported BMP variant (hdr $hdrSize, $bpp bpp, compression $comp)")
    val h = math.abs(hRaw)
    require(w > 0 && h > 0, s"bad BMP geometry ${w}x$hRaw")
    val rowPad = (4 - (w * 3) % 4) % 4
    // BGR on disk -> emit channel 0 = R, 1 = G, 2 = B
    rasterStats("bmp", p, dataOff, w, h, 3, Array(2, 1, 0), rowPad)
  }

  /** Codec dispatch on magic bytes; anything unrecognized or malformed
    * decodes to the null row (decode failures are data, not crashes —
    * at corpus scale a poison payload must not kill the job). */
  private[multimodal] def decodeImage(p: Array[Byte]): Row =
    try {
      if (p == null || p.length < 2) nullDecode
      else if (p(0) == 'P' && (p(1) == '5' || p(1) == '6')) decodeNetpbm(p)
      else if (p(0) == 'B' && p(1) == 'M') decodeBmp(p)
      else nullDecode
    } catch { case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException => nullDecode }

  /** Partition-batched image decode over a binary column: input columns
    * + `imageSchema` fields appended. The decode runs inside
    * mapPartitions (codec per task, rows streamed, payloads never
    * collected). */
  def decodeImages(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ imageSchema.fields)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq ++ decodeImage(r.getAs[Array[Byte]](payloadIdx)).toSeq)
      }
    }(enc)
  }

  /** Deterministic synthetic P6 payload generator (TEST DATA, not an
    * operator): image geometry and every pixel byte are closed-form in
    * the id — width 4+id%5, height 3+id%4, raster byte j =
    * (id*31 + j*7) % 256 — so a SQL oracle can recompute the decoded
    * statistics without parsing any binary. The header carries a
    * comment line to exercise the parser's comment handling. */
  def syntheticPpm(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(payloadCol, BinaryType, nullable = true))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val w = (4 + id % 5).toInt
        val h = (3 + id % 4).toInt
        val header = s"P6\n# synthetic $id\n$w $h\n255\n".getBytes("US-ASCII")
        val px = Array.tabulate[Byte](w * h * 3)(j => ((id * 31 + j.toLong * 7) % 256).toByte)
        Row.fromSeq(r.toSeq :+ (header ++ px))
      }
    }(enc)
  }

  /** Attach a payload column: any string column materialized as bytes
    * (stands in for reading image/audio blobs; real ingestion would
    * `spark.read.format("binaryFile")`). */
  def withPayload(df: DataFrame, srcCol: String, payloadCol: String): DataFrame =
    df.withColumn(payloadCol, col(srcCol).cast("binary"))

  /** Partition-batched feature extraction over a binary column:
    * mapPartitions keeps decode libraries loaded once per task (the
    * Scala analogue of a Pandas UDF over mapInPandas) and streams rows
    * without driver collection. Output = input columns + feature
    * struct fields. */
  def extractFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ featureSchema.fields)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // per-partition setup would initialize the codec here, once
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val feats = byteFeatures(if (payload == null) Array.emptyByteArray else payload)
        Row.fromSeq(r.toSeq ++ feats.toSeq)
      }
    }(enc)
  }

  /** Byte-level frame sampling: treat the payload as fixed-size frames
    * and emit every `stride`-th one as its own row — the 1→N generator
    * shape of video frame extraction (`flatMap` over partitions; no
    * driver collection, output rows carry (parent columns, frame_idx,
    * frame payload)). Container demuxing would slot in here once a
    * native demuxer is available; the row-generation contract is the
    * deliverable. */
  def sampleFrames(df: DataFrame, payloadCol: String,
      frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    val parentFields = df.schema.fields.filterNot(_.name == payloadCol)
    val schema = StructType(parentFields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = true)))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val parent = r.toSeq.zipWithIndex.collect { case (v, i) if i != idx => v }
        val p = r.getAs[Array[Byte]](idx)
        if (p == null) Iterator.empty
        else {
          val nFrames = p.length / frameBytes
          Iterator.range(0, nFrames, stride).map { f =>
            Row.fromSeq(parent ++ Seq(f, p.slice(f * frameBytes, (f + 1) * frameBytes)))
          }
        }
      }
    }(enc)
  }

  /** Byte-level resize: deterministic subsampling to `targetBytes` —
    * the shape of an image-resize/audio-downsample kernel (every k-th
    * byte), preserving determinism for tests. */
  def resizePayload(df: DataFrame, payloadCol: String, targetBytes: Int): DataFrame = {
    val schema = df.schema
    val idx = schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]](idx)
        val out =
          if (p == null || p.length <= targetBytes) p
          else {
            val step = p.length.toDouble / targetBytes
            Array.tabulate(targetBytes)(i => p(math.min((i * step).toInt, p.length - 1)))
          }
        Row.fromSeq(r.toSeq.updated(idx, out))
      }
    }(enc)
  }
}
