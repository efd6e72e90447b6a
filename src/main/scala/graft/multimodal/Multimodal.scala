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
  private[graft] def byteFeatures(payload: Array[Byte]): Row = {
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

  /** A decoded image: normalized interleaved raster — channel order
    * RGB (or single gray), rows top-down, no padding — regardless of
    * the source format's layout. Normalizing at decode means every
    * downstream kernel (stats, resize, re-encode) is format-blind. */
  private[graft] final case class Raster(
      fmt: String, w: Int, h: Int, channels: Int, data: Array[Byte])

  /** Binary netpbm (P5 grayscale / P6 RGB, maxval <= 255): header is
    * ASCII ints separated by whitespace, `#` comments run to end of
    * line, and exactly ONE whitespace byte after maxval precedes the
    * raster (the netpbm spec rule that makes the raster offset
    * unambiguous). Already RGB top-down unpadded, so the raster is a
    * straight slice. */
  private def netpbmRaster(p: Array[Byte]): Raster = {
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
    val n = w * h * channels
    require(i + n <= p.length, s"raster truncated: need $n bytes from $i, have ${p.length}")
    Raster(if (channels == 3) "ppm" else "pgm", w, h, channels,
      java.util.Arrays.copyOfRange(p, i, i + n))
  }

  /** Uncompressed 24-bit BMP (BITMAPINFOHEADER or larger, BI_RGB):
    * little-endian header fields; the BGR interleave is reversed to RGB
    * and the (default) bottom-up row order flipped to top-down while
    * building the normalized raster; rows pad to 4-byte boundaries;
    * negative height means already top-down. */
  private def bmpRaster(p: Array[Byte]): Raster = {
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
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    require(w > 0 && h > 0 && dataOff >= 54, s"bad BMP geometry ${w}x$hRaw @$dataOff")
    // all size arithmetic in LONGS: a poison header with huge w/h would
    // otherwise overflow w*3 / w*h*3 into a negative rowPad or a
    // NegativeArraySizeException the codec's catch doesn't cover — one
    // corrupt payload must never kill a corpus-scale job. The
    // truncation require bounds w·h·3 by p.length (an Int), so the
    // int-typed allocation below it is exact.
    val row3 = w.toLong * 3
    val rowPad = ((4 - row3 % 4) % 4).toInt
    require(dataOff + h.toLong * (row3 + rowPad) - rowPad <= p.length,
      s"raster truncated: need ${h.toLong * (row3 + rowPad)} bytes from $dataOff, have ${p.length}")
    val out = new Array[Byte](w * h * 3)
    var r = 0
    while (r < h) {
      val srcRow = if (bottomUp) h - 1 - r else r
      val base = dataOff + srcRow * (w * 3 + rowPad)
      var x = 0
      while (x < w) {
        // BGR -> RGB
        out((r * w + x) * 3) = p(base + x * 3 + 2)
        out((r * w + x) * 3 + 1) = p(base + x * 3 + 1)
        out((r * w + x) * 3 + 2) = p(base + x * 3)
        x += 1
      }
      r += 1
    }
    Raster("bmp", w, h, 3, out)
  }

  /** Codec dispatch on magic bytes; anything unrecognized or malformed
    * decodes to None (decode failures are data, not crashes — at
    * corpus scale a poison payload must not kill the job). */
  private[graft] def imageRaster(p: Array[Byte]): Option[Raster] =
    try {
      if (p == null || p.length < 2) None
      else if (p(0) == 'P' && (p(1) == '5' || p(1) == '6')) Some(netpbmRaster(p))
      else if (p(0) == 'B' && p(1) == 'M') Some(bmpRaster(p))
      else None
    } catch {
      // NegativeArraySize: belt-and-braces for any remaining size-math
      // wraparound on adversarial headers (the requires above aim to
      // reject them first)
      case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException => None
    }

  /** Per-channel integer stats over a normalized raster. */
  private def rasterStats(r: Raster): Row = {
    val sums = new Array[Long](3)
    val mins = Array(256, 256, 256)
    val maxs = Array(-1, -1, -1)
    var j = 0
    while (j < r.data.length) {
      val c = j % r.channels
      val v = r.data(j) & 0xff
      sums(c) += v
      if (v < mins(c)) mins(c) = v
      if (v > maxs(c)) maxs(c) = v
      j += 1
    }
    def s(c: Int): Seq[Any] =
      if (c < r.channels) Seq[Any](sums(c), mins(c), maxs(c)) // explicit Any: Seq(Long, Int, Int) would widen the Ints
      else Seq(null, null, null)
    Row.fromSeq(Seq(r.fmt, r.w, r.h, r.channels) ++ s(0) ++ s(1) ++ s(2))
  }

  private[graft] def decodeImage(p: Array[Byte]): Row =
    imageRaster(p).map(rasterStats).getOrElse(nullDecode)

  /** Nearest-neighbor resize of a normalized raster: output pixel
    * (x, y) takes input pixel (floor(x·w/outW), floor(y·h/outH)) — the
    * standard index-mapping NN kernel, exact integer math. */
  private[graft] def resizeRaster(r: Raster, outW: Int, outH: Int): Raster = {
    require(outW > 0 && outH > 0, "resize target must be positive")
    val out = new Array[Byte](outW * outH * r.channels)
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * r.h / outH).toInt
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * r.w / outW).toInt
        var c = 0
        while (c < r.channels) {
          out((y * outW + x) * r.channels + c) =
            r.data((sy * r.w + sx) * r.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    r.copy(w = outW, h = outH, data = out)
  }

  /** Re-encode a normalized raster as binary netpbm (P6 for 3-channel,
    * P5 for gray) — the round-trippable uncompressed interchange form;
    * a decoded BMP re-encodes as P6. */
  private[graft] def encodeNetpbm(r: Raster): Array[Byte] = {
    val magic = if (r.channels == 3) "P6" else "P5"
    s"$magic\n${r.w} ${r.h}\n255\n".getBytes("US-ASCII") ++ r.data
  }

  // -------------------------------------------------------------------
  // Audio tier: pure-JVM WAV/PCM codec (RIFF chunk walk, 8/16-bit)
  // -------------------------------------------------------------------

  /** Schema of decoded audio: format tag, rate/geometry, and exact
    * per-channel integer sample statistics (16-bit signed scale; 8-bit
    * samples are centered by −128; channel 1 stays null for mono). */
  val audioSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("a0_sum", LongType, nullable = true),
    StructField("a0_min", IntegerType, nullable = true),
    StructField("a0_max", IntegerType, nullable = true),
    StructField("a1_sum", LongType, nullable = true),
    StructField("a1_min", IntegerType, nullable = true),
    StructField("a1_max", IntegerType, nullable = true)))

  private val nullAudio: Row =
    Row(null, null, null, null, null, null, null, null, null, null)

  /** A decoded RIFF/WAVE PCM payload: sample rate, channel count, and
    * the interleaved integer samples (16-bit sign-extended, 8-bit
    * recentered to signed). */
  private[graft] final case class Pcm(
      rate: Int, channels: Int, samples: Array[Int]) {
    def nFrames: Long = samples.length.toLong / channels
  }

  /** RIFF/WAVE PCM (format tag 1, 8 or 16 bits, mono or stereo): the
    * chunk list is walked properly — unknown chunks (LIST, fact, ...)
    * are skipped with word alignment, so 'fmt ' and 'data' are found
    * wherever they sit, exactly as a conforming reader must. */
  private[graft] def wavPcm(p: Array[Byte]): Pcm = {
    def u16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    def i32(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) |
      ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)
    require(p.length >= 44 && p(8) == 'W' && p(9) == 'A' && p(10) == 'V' &&
      p(11) == 'E', "not a WAVE file")
    var i = 12
    var fmt: (Int, Int, Int) = null // (channels, rate, bits)
    var dataAt = -1
    var dataLen = 0
    while (i + 8 <= p.length && (fmt == null || dataAt < 0)) {
      val id = new String(p, i, 4, "US-ASCII")
      val sz = i32(i + 4)
      require(sz >= 0 && i + 8 + sz <= p.length, s"chunk $id overruns payload")
      if (id == "fmt ") {
        require(u16(i + 8) == 1, "only uncompressed PCM supported")
        fmt = (u16(i + 10), i32(i + 12), u16(i + 22))
      } else if (id == "data") { dataAt = i + 8; dataLen = sz }
      i += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    require(fmt != null && dataAt >= 0, "missing fmt or data chunk")
    val (channels, rate, bits) = fmt
    require(channels == 1 || channels == 2, s"unsupported channel count $channels")
    require(bits == 8 || bits == 16, s"unsupported bit depth $bits")
    val bytesPerSample = bits / 8
    val n = (dataLen / (channels * bytesPerSample)) * channels
    val out = new Array[Int](n)
    var s = 0
    while (s < n) {
      val o = dataAt + s * bytesPerSample
      out(s) =
        if (bits == 16) (u16(o) << 16) >> 16 // sign-extend LE int16
        else (p(o) & 0xff) - 128 // 8-bit wav is unsigned; center it
      s += 1
    }
    Pcm(rate, channels, out)
  }

  private def decodeWav(p: Array[Byte]): Row = {
    val pcm = wavPcm(p)
    val channels = pcm.channels
    val sums = new Array[Long](2)
    val mins = Array(Int.MaxValue, Int.MaxValue)
    val maxs = Array(Int.MinValue, Int.MinValue)
    var s = 0
    while (s < pcm.samples.length) {
      val v = pcm.samples(s)
      val c = s % channels
      sums(c) += v
      if (v < mins(c)) mins(c) = v
      if (v > maxs(c)) maxs(c) = v
      s += 1
    }
    def a(c: Int): Seq[Any] =
      if (c < channels && pcm.nFrames > 0) Seq[Any](sums(c), mins(c), maxs(c))
      else Seq(null, null, null)
    Row.fromSeq(Seq("wav", pcm.rate, channels, pcm.nFrames) ++ a(0) ++ a(1))
  }

  private[graft] def decodeAudioPayload(p: Array[Byte]): Row =
    try {
      if (p == null || p.length < 4) nullAudio
      else if (p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F') decodeWav(p)
      else nullAudio
    } catch { case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException => nullAudio }

  /** Partition-batched audio decode over a binary column: input columns
    * + `audioSchema` fields appended. */
  def decodeAudio(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ audioSchema.fields)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq ++ decodeAudioPayload(r.getAs[Array[Byte]](payloadIdx)).toSeq)
      }
    }(enc)
  }

  /** Schema of framed audio features appended by [[audioFrames]]. */
  val audioFrameSchema: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType, nullable = true),
    StructField("channel", IntegerType, nullable = true),
    StructField("n_samples", IntegerType, nullable = true),
    StructField("rms", DoubleType, nullable = true),
    StructField("zero_crossings", LongType, nullable = true)))

  /** Framed audio features over decoded PCM — real DSP on the decoded
    * samples, not payload metadata: fixed windows of `frameSize`
    * samples per channel (the last window may be partial), one output
    * row per (input row, frame, channel) with the sample count, RMS
    * energy, and the zero-crossing count (sign(x) = x >= 0 changing
    * between adjacent samples WITHIN the window; the window's first
    * sample never counts). RMS rounds half-up on the 1e-6 grid =
    * DuckDB round(). Undecodable payloads produce no rows.
    *
    * Distributed shape: the whole feature computation is scan-local
    * (mapPartitions flatMap — decode + frame loop per row, zero
    * shuffle, zero driver collection); output cardinality is
    * n_frames/frameSize × channels per clip, so downstream aggregates
    * key on (row, frame, channel) — as fine as the data. This is the
    * batch shape a 100 TB audio corpus needs: features stream out at
    * read bandwidth and nothing ever materializes a whole clip's
    * samples beyond its own payload bytes. */
  def audioFrames(df: DataFrame, payloadCol: String, frameSize: Int): DataFrame = {
    require(frameSize > 0, s"frameSize must be positive, got $frameSize")
    val schema = StructType(df.schema.fields ++ audioFrameSchema.fields)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    def r6(x: Double): Double = graft.core.Round.r6(x)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val p = r.getAs[Array[Byte]](payloadIdx)
        val pcm =
          try {
            if (p != null && p.length >= 4 && p(0) == 'R' && p(1) == 'I' &&
              p(2) == 'F' && p(3) == 'F') Some(wavPcm(p))
            else None
          } catch {
            case _: IllegalArgumentException |
                 _: ArrayIndexOutOfBoundsException => None
          }
        pcm.iterator.flatMap { w =>
          val nFrames = w.nFrames.toInt
          val nWin = (nFrames + frameSize - 1) / frameSize
          for {
            f <- (0 until nWin).iterator
            c <- (0 until w.channels).iterator
          } yield {
            val lo = f * frameSize
            val hi = math.min(lo + frameSize, nFrames)
            var sumSq = 0L
            var zc = 0L
            var t = lo
            var prevNonNeg = false
            while (t < hi) {
              val v = w.samples(t * w.channels + c)
              sumSq += v.toLong * v
              val nonNeg = v >= 0
              if (t > lo && nonNeg != prevNonNeg) zc += 1
              prevNonNeg = nonNeg
              t += 1
            }
            val n = hi - lo
            Row.fromSeq(r.toSeq ++ Seq[Any](f, c, n,
              r6(math.sqrt(sumSq.toDouble / n)), zc))
          }
        }
      }
    }(enc)
  }

  /** Schema of spectral features appended by [[audioSpectrum]]. */
  val audioSpectrumSchema: StructType = StructType(Seq(
    StructField("channel", IntegerType, nullable = true),
    StructField("bin", IntegerType, nullable = true),
    StructField("power", DoubleType, nullable = true)))

  /** Whole-clip DFT bin power per channel — the Goertzel/tone-energy
    * feature (power at bin k = |Σ_t x[t]·e^(-i2πkt/N)|², i.e.
    * cos-sum² + sin-sum² — the single-bin DFT the Goertzel recurrence
    * computes): one row per (input row, channel, bin) for each
    * requested bin. This is the spectral half of audio curation
    * (tone/hum detection, bandwidth checks) computed from the REAL
    * decoded PCM; power rounds half-up on the 1e-3 grid — coarse
    * enough that cross-engine libm 1-ulp trig drift (≪1e-5 at these
    * magnitudes) can't flip a rounded value, fine enough to pin the
    * math. Undecodable payloads produce no rows; clips shorter than 2
    * frames produce none either (a 1-sample DFT is degenerate).
    *
    * Distributed shape: identical to [[audioFrames]] — scan-local
    * mapPartitions flatMap, zero shuffle, bounded output (channels ×
    * bins rows per clip). At 100 TB the whole spectral pass rides the
    * corpus scan. */
  def audioSpectrum(df: DataFrame, payloadCol: String,
      bins: Seq[Int]): DataFrame = {
    require(bins.nonEmpty && bins.forall(_ >= 0), s"bad bins $bins")
    val schema = StructType(df.schema.fields ++ audioSpectrumSchema.fields)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    // sign-corrected like Round.r6, at the 1e-3 grain (the rounded
    // value re²+im² is nonnegative, so the sign term is an identity —
    // kept for the engine-wide one-quantizer grep rule)
    def r3(x: Double): Double =
      math.signum(x) * (math.floor(math.abs(x) * 1e3 + 0.5) / 1e3)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val p = r.getAs[Array[Byte]](payloadIdx)
        val pcm =
          try {
            if (p != null && p.length >= 4 && p(0) == 'R' && p(1) == 'I' &&
              p(2) == 'F' && p(3) == 'F') Some(wavPcm(p))
            else None
          } catch {
            case _: IllegalArgumentException |
                 _: ArrayIndexOutOfBoundsException => None
          }
        pcm.iterator.filter(_.nFrames >= 2).flatMap { w =>
          val n = w.nFrames.toInt
          for {
            c <- (0 until w.channels).iterator
            k <- bins.iterator
          } yield {
            var re = 0.0
            var im = 0.0
            var t = 0
            while (t < n) {
              val x = w.samples(t * w.channels + c).toDouble
              val ang = 2.0 * math.Pi * k * t / n
              re += x * math.cos(ang)
              im += x * math.sin(ang)
              t += 1
            }
            Row.fromSeq(r.toSeq ++ Seq[Any](c, k, r3(re * re + im * im)))
          }
        }
      }
    }(enc)
  }

  /** Schema of resampled audio appended by [[resampleAudio]]. */
  val audioResampleSchema: StructType = StructType(Seq(
    StructField("channel", IntegerType, nullable = true),
    StructField("k", IntegerType, nullable = true),
    StructField("value", DoubleType, nullable = true)))

  /** Linear-interpolation sample-rate conversion over decoded PCM —
    * real DSP on real samples, the rate-normalization step an audio
    * training pipeline runs before featurization. Output index k maps
    * to source position k·srcRate/targetRate via EXACT integer
    * arithmetic (idx = k·srcRate DIV targetRate, frac from the
    * remainder), so the interpolation weights are engine-portable and
    * the whole output is SQL-replayable; values round half-away-from-
    * zero on the 1e-6 grid (= DuckDB round; samples are signed).
    * Output length is floor((n−1)·target/src) + 1 per channel — the
    * last output never reads past the clip. Scan-local mapPartitions
    * (the codec-family shape): zero shuffle, no driver collection;
    * undecodable payloads emit nothing. */
  def resampleAudio(df: DataFrame, payloadCol: String,
      targetRate: Int): DataFrame = {
    require(targetRate > 0, s"targetRate must be positive, got $targetRate")
    val schema = StructType(df.schema.fields ++ audioResampleSchema.fields)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    def r6(x: Double): Double = graft.core.Round.r6(x)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val p = r.getAs[Array[Byte]](payloadIdx)
        val pcm =
          try {
            if (p != null && p.length >= 4 && p(0) == 'R' && p(1) == 'I' &&
              p(2) == 'F' && p(3) == 'F') Some(wavPcm(p))
            else None
          } catch {
            case _: IllegalArgumentException |
                 _: ArrayIndexOutOfBoundsException => None
          }
        pcm.iterator.filter(_.nFrames > 0).flatMap { w =>
          val n = w.nFrames.toInt
          val m = ((n - 1).toLong * targetRate / w.rate + 1L).toInt
          for {
            k <- (0 until m).iterator
            c <- (0 until w.channels).iterator
          } yield {
            val posNum = k.toLong * w.rate
            val idx = (posNum / targetRate).toInt
            val frac = (posNum % targetRate).toDouble / targetRate
            val s0 = w.samples(idx * w.channels + c).toDouble
            val s1 = w.samples(
              math.min(idx + 1, n - 1) * w.channels + c).toDouble
            Row.fromSeq(r.toSeq ++
              Seq[Any](c, k, r6(s0 * (1 - frac) + s1 * frac)))
          }
        }
      }
    }(enc)
  }

  /** Deterministic synthetic 16-bit PCM WAV generator (TEST DATA, like
    * `syntheticPpm`): channels 1+id%2, frames 20+id%7, rate 8000, and
    * sample(frame t, channel c) = (id·37 + t·11 + c·5) % 4096 − 2048 —
    * closed-form for a SQL oracle. A LIST junk chunk precedes 'fmt '
    * to exercise the chunk walk. */
  def syntheticWav(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(payloadCol, BinaryType, nullable = true))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val nch = (1 + id % 2).toInt
        val n = (20 + id % 7).toInt
        val dataLen = n * nch * 2
        val junk = "JUNK".getBytes("US-ASCII")
        val body =
          Array[Byte]('L', 'I', 'S', 'T') ++ le32(junk.length) ++ junk ++
          Array[Byte]('f', 'm', 't', ' ') ++ le32(16) ++ le16(1) ++ le16(nch) ++
            le32(8000) ++ le32(8000 * nch * 2) ++ le16(nch * 2) ++ le16(16) ++
          Array[Byte]('d', 'a', 't', 'a') ++ le32(dataLen) ++
          Array.tabulate(n * nch)(s => {
            val t = s / nch; val c = s % nch
            le16((((id * 37 + t * 11 + c * 5) % 4096) - 2048).toInt)
          }).flatten.toArray
        val payload = Array[Byte]('R', 'I', 'F', 'F') ++ le32(4 + body.length) ++
          Array[Byte]('W', 'A', 'V', 'E') ++ body
        Row.fromSeq(r.toSeq :+ payload)
      }
    }(enc)
  }

  // -------------------------------------------------------------------
  // Video tier: pure-JVM Y4M (YUV4MPEG2) demuxer — the standard
  // uncompressed video interchange format (what ffmpeg/mjpegtools pipe)
  // -------------------------------------------------------------------

  /** Schema of decoded video: geometry, frame rate, frame count, and
    * exact whole-stream luma (Y-plane) integer statistics. */
  val videoSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("fps_num", IntegerType, nullable = true),
    StructField("fps_den", IntegerType, nullable = true),
    StructField("y_sum", LongType, nullable = true),
    StructField("y_min", IntegerType, nullable = true),
    StructField("y_max", IntegerType, nullable = true)))

  private val nullVideo: Row =
    Row(null, null, null, null, null, null, null, null, null)

  /** A demuxed Y4M stream: geometry, rate, and the luma plane of every
    * frame (chroma is read past but not retained — luma carries the
    * structural content the downstream ops use). */
  private[graft] final case class Y4m(
      w: Int, h: Int, fpsNum: Int, fpsDen: Int, frames: Vector[Array[Byte]])

  /** YUV4MPEG2 demux: space-separated header tags (W/H/F required here,
    * C colorspace optional — C420 family with quarter chroma planes and
    * C444 with full supported), then per frame a FRAME line (optional
    * parameters skipped to the newline, as the spec allows) followed by
    * planar Y then U then V data. */
  private def y4mDemux(p: Array[Byte]): Y4m = {
    val magic = "YUV4MPEG2"
    require(p.length > magic.length + 1 &&
      new String(p, 0, magic.length, "US-ASCII") == magic, "not a Y4M stream")
    var i = magic.length
    var w = -1; var h = -1; var fn = -1; var fd = -1
    var chromaDiv = 2 // C420*: chroma planes are (w/2)x(h/2); C444 -> 1
    def readToken(): String = {
      val start = i
      while (i < p.length && p(i) != ' ' && p(i) != '\n') i += 1
      new String(p, start, i - start, "US-ASCII")
    }
    while (i < p.length && p(i) != '\n') {
      i += 1 // the separating space (or first char after magic)
      val t = readToken()
      require(t.nonEmpty, "empty Y4M header tag")
      t.charAt(0) match {
        case 'W' => w = t.drop(1).toInt
        case 'H' => h = t.drop(1).toInt
        case 'F' =>
          val Array(a, b) = t.drop(1).split(":", 2); fn = a.toInt; fd = b.toInt
        case 'C' =>
          if (t.startsWith("C444")) chromaDiv = 1
          else require(t.startsWith("C420"), s"unsupported colorspace $t")
        case _ => () // I (interlace), A (aspect), X (extensions): ignored
      }
    }
    require(i < p.length, "Y4M header unterminated")
    i += 1 // the header newline
    require(w > 0 && h > 0 && fn > 0 && fd > 0, s"bad Y4M geometry ${w}x$h F$fn:$fd")
    require(chromaDiv == 1 || (w % 2 == 0 && h % 2 == 0),
      "C420 requires even dimensions")
    val ySize = w * h
    val cSize = (w / chromaDiv) * (h / chromaDiv)
    val frames = Vector.newBuilder[Array[Byte]]
    while (i < p.length) {
      require(i + 5 <= p.length &&
        new String(p, i, 5, "US-ASCII") == "FRAME", "expected FRAME marker")
      i += 5
      while (i < p.length && p(i) != '\n') i += 1 // skip frame params
      require(i < p.length, "FRAME line unterminated")
      i += 1
      require(i + ySize + 2 * cSize <= p.length, "frame data truncated")
      frames += java.util.Arrays.copyOfRange(p, i, i + ySize)
      i += ySize + 2 * cSize
    }
    Y4m(w, h, fn, fd, frames.result())
  }

  private[graft] def decodeVideoPayload(p: Array[Byte]): Row =
    try {
      if (p == null || p.length < 10 || p(0) != 'Y') nullVideo
      else {
        val v = y4mDemux(p)
        var sum = 0L; var mn = 256; var mx = -1
        v.frames.foreach { y =>
          var j = 0
          while (j < y.length) {
            val b = y(j) & 0xff
            sum += b; if (b < mn) mn = b; if (b > mx) mx = b
            j += 1
          }
        }
        val any = v.frames.nonEmpty && v.frames.head.nonEmpty
        Row("y4m", v.w, v.h, v.frames.size.toLong, v.fpsNum, v.fpsDen,
          if (any) sum else null, if (any) mn else null, if (any) mx else null)
      }
    } catch {
      case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException |
           _: NumberFormatException | _: MatchError => nullVideo
    }

  /** Partition-batched video decode over a binary column: input columns
    * + `videoSchema` fields appended. */
  def decodeVideo(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ videoSchema.fields)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq ++ decodeVideoPayload(r.getAs[Array[Byte]](payloadIdx)).toSeq)
      }
    }(enc)
  }

  /** REAL frame extraction: demux Y4M, keep every `stride`-th frame,
    * and emit each kept frame's LUMA PLANE re-encoded as a P5 PGM
    * payload — a 1→N generator whose outputs are themselves decodable
    * by the image tier (video → frames → image features composes).
    * Output rows: (parent columns minus payload, frame_idx, frame). */
  def sampleVideoFrames(df: DataFrame, payloadCol: String, stride: Int): DataFrame = {
    require(stride > 0, "stride must be positive")
    val parentFields = df.schema.fields.filterNot(_.name == payloadCol)
    val schema = StructType(parentFields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = true)))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val parent = r.toSeq.zipWithIndex.collect { case (v, i) if i != idx => v }
        try {
          val v = y4mDemux(r.getAs[Array[Byte]](idx))
          Iterator.range(0, v.frames.size, stride).map { f =>
            Row.fromSeq(parent ++ Seq(f,
              encodeNetpbm(Raster("pgm", v.w, v.h, 1, v.frames(f)))))
          }
        } catch { case _: Exception => Iterator.empty }
      }
    }(enc)
  }

  /** Channel-mean grayscale reduction (integer mean, exact and
    * SQL-replayable — no BT.601 float weights). */
  private[graft] def grayRaster(r: Raster): Raster =
    if (r.channels == 1) r
    else {
      val out = new Array[Byte](r.w * r.h)
      var i = 0
      while (i < r.w * r.h) {
        var s = 0
        var c = 0
        while (c < r.channels) { s += r.data(i * r.channels + c) & 0xff; c += 1 }
        out(i) = (s / r.channels).toByte
        i += 1
      }
      Raster("pgm", r.w, r.h, 1, out)
    }

  /** dHash — the difference perceptual hash (the standard cheap
    * near-duplicate image fingerprint: grayscale, NN-resize to 9×8,
    * emit one bit per horizontally-adjacent pixel pair, 1 when the
    * right pixel is brighter): 64 bits as a '0'/'1' string in
    * row-major order, so banding/grouping and a SQL oracle can both
    * consume it directly. Visually-identical images (small brightness
    * or compression noise) collide or land within a few bit flips —
    * Hamming distance over these strings is the image analogue of the
    * SimHash text pipeline, and the banded near-dup machinery applies
    * unchanged. Undecodable payloads hash to null.
    *
    * Distributed shape: scan-local (decode + 72-pixel resize per
    * image); downstream near-dup groups by hash or bands of it —
    * bounded keys, never pairwise. */
  def imageDHash(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("dhash", StringType, nullable = true))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val hash = imageRaster(r.getAs[Array[Byte]](idx)).map { raster =>
          val g = resizeRaster(grayRaster(raster), 9, 8)
          val sb = new StringBuilder(64)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val a = g.data(y * 9 + x) & 0xff
              val b = g.data(y * 9 + x + 1) & 0xff
              sb.append(if (b > a) '1' else '0')
              x += 1
            }
            y += 1
          }
          sb.toString
        }.orNull
        Row.fromSeq(r.toSeq :+ hash)
      }
    }(enc)
  }

  /** Per-image grayscale histogram in sparse long format: the payload
    * is decoded, channel-averaged to gray (integer mean, same rule as
    * the dHash path), and each pixel lands in bin g * bins / 256
    * (integer arithmetic — SQL-replayable); one row per non-empty bin
    * with its pixel count. The luminance-distribution primitive
    * behind exposure filtering and low-contrast detection in image
    * curation. Scan-local mapPartitions (≤ bins rows out per image),
    * zero shuffle; undecodable payloads emit nothing. */
  def imageHistogram(df: DataFrame, payloadCol: String,
      bins: Int = 16): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("bin", IntegerType, nullable = false),
      StructField("n_px", LongType, nullable = false)))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        imageRaster(r.getAs[Array[Byte]](idx)).toSeq.flatMap { raster =>
          val g = grayRaster(raster)
          val counts = new Array[Long](bins)
          var i = 0
          while (i < g.w * g.h) {
            counts((g.data(i) & 0xff) * bins / 256) += 1L
            i += 1
          }
          (0 until bins).filter(counts(_) > 0L)
            .map(b => Row.fromSeq(r.toSeq ++ Seq[Any](b, counts(b))))
        }
      }
    }(enc)
  }

  /** Per-image contrast statistics over the integer gray raster:
    * min/max gray, dynamic range, and RMS contrast (population std of
    * gray levels — the standard low-contrast screen in image
    * curation). Sums accumulate as exact longs and the reported std
    * derives by the fixed double formula sqrt(s2/n - (s/n)²), so a
    * SQL oracle over closed-form pixels reproduces every bit.
    * Scan-local; undecodable payloads emit nothing. */
  def imageContrast(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("g_min", IntegerType, nullable = false),
      StructField("g_max", IntegerType, nullable = false),
      StructField("g_range", IntegerType, nullable = false),
      StructField("rms_contrast", DoubleType, nullable = false)))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        imageRaster(r.getAs[Array[Byte]](idx)).map { raster =>
          val g = grayRaster(raster)
          val n = g.w * g.h
          var (s, s2, mn, mx) = (0L, 0L, 255, 0)
          var i = 0
          while (i < n) {
            val v = g.data(i) & 0xff
            s += v; s2 += v.toLong * v
            if (v < mn) mn = v
            if (v > mx) mx = v
            i += 1
          }
          val mean = s.toDouble / n
          val rms = math.sqrt(s2.toDouble / n - mean * mean)
          Row.fromSeq(r.toSeq ++ Seq[Any](mn, mx, mx - mn,
            graft.core.Round.r6(rms)))
        }
      }
    }(enc)
  }

  /** Schema of scene-change rows appended by [[sceneChanges]]. */
  val sceneChangeSchema: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("mad", DoubleType, nullable = false),
    StructField("is_cut", BooleanType, nullable = false)))

  /** Shot/scene-change detection over demuxed video — the standard
    * pixel-domain metric (mean absolute luma difference between
    * consecutive frames; a cut is a frame whose MAD from its
    * predecessor exceeds `threshold`): one row per frame index ≥ 1
    * with the rounded MAD and the cut flag. This is the video-curation
    * primitive behind keyframe selection and shot-boundary sampling
    * (pick one frame per detected shot instead of a blind stride).
    *
    * Distributed shape: identical to the codec family — scan-local
    * mapPartitions, each clip diffs only its OWN adjacent frame pairs
    * (n_frames−1 rows out per clip), zero shuffle, zero collection.
    * Undecodable payloads and clips with < 2 frames emit nothing. */
  def sceneChanges(df: DataFrame, payloadCol: String,
      threshold: Double): DataFrame = {
    val parentFields = df.schema.fields.filterNot(_.name == payloadCol)
    val schema = StructType(parentFields ++ sceneChangeSchema.fields)
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    def r6(x: Double): Double = graft.core.Round.r6(x)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val parent = r.toSeq.zipWithIndex.collect { case (v, i) if i != idx => v }
        try {
          val v = y4mDemux(r.getAs[Array[Byte]](idx))
          val px = v.w * v.h
          Iterator.range(1, v.frames.size).map { f =>
            val prev = v.frames(f - 1)
            val cur = v.frames(f)
            var sum = 0L
            var q = 0
            while (q < px) {
              sum += math.abs((cur(q) & 0xff) - (prev(q) & 0xff))
              q += 1
            }
            val mad = r6(sum.toDouble / px)
            Row.fromSeq(parent ++ Seq(f, mad, mad > threshold))
          }
        } catch { case _: Exception => Iterator.empty }
      }
    }(enc)
  }

  /** Deterministic synthetic Y4M generator (TEST DATA, like
    * `syntheticPpm`): geometry W=4+2·(id%3), H=4+2·(id%2), frames
    * 3+id%4 at F25:1, C420 with luma byte (frame f, raster pos q) =
    * (id·13 + f·17 + q·5) % 256 and chroma (id·7 + f·3 + q·11) % 256 —
    * all closed-form for a SQL oracle. */
  def syntheticY4m(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(payloadCol, BinaryType, nullable = true))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val w = (4 + 2 * (id % 3)).toInt
        val h = (4 + 2 * (id % 2)).toInt
        val n = (3 + id % 4).toInt
        val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII")
        val cSize = (w / 2) * (h / 2)
        val body = (0 until n).flatMap { f =>
          "FRAME\n".getBytes("US-ASCII") ++
            Array.tabulate[Byte](w * h)(q => ((id * 13 + f * 17 + q.toLong * 5) % 256).toByte) ++
            Array.tabulate[Byte](2 * cSize)(q => ((id * 7 + f * 3 + q.toLong * 11) % 256).toByte)
        }.toArray
        Row.fromSeq(r.toSeq :+ (header ++ body))
      }
    }(enc)
  }

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

  /** REAL image resize over a binary column: decode (netpbm/BMP) →
    * nearest-neighbor index-map kernel → re-encode as binary netpbm.
    * Payloads that don't decode resize to null (a resize of a
    * non-image is no image — kept explicit rather than passed
    * through). Runs partition-batched like every codec op here. */
  def resizeImages(df: DataFrame, payloadCol: String,
      outW: Int, outH: Int): DataFrame = {
    val schema = df.schema
    val idx = schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val out = imageRaster(r.getAs[Array[Byte]](idx))
          .map(ra => encodeNetpbm(resizeRaster(ra, outW, outH))).orNull
        Row.fromSeq(r.toSeq.updated(idx, out))
      }
    }(enc)
  }

  /** Byte-level resize: deterministic subsampling to `targetBytes` —
    * the shape of a format-agnostic downsample kernel (every k-th
    * byte), preserving determinism for tests. For decodable images use
    * `resizeImages` (the real pixel-space kernel). */
  def resizePayload(df: DataFrame, payloadCol: String, targetBytes: Int): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
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
