package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (LLM-data extension family): media
  * payloads ride as opaque `BinaryType` columns with typed metadata;
  * decode / feature-extraction runs as partition-batched functions over
  * the binary bytes.
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * environment — deterministic byte-level features stand in), but the
  * Spark-side contract is real: schema, per-partition batching,
  * row-preserving transform, and a partitioning that never collects
  * payloads to the driver.
  */
object Multimodal {

  /** Feature schema produced by the (stubbed) decoder. */
  val featureSchema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("first_code", IntegerType, nullable = false),
    StructField("byte_checksum", LongType, nullable = false)))

  /** STUB: the real implementation would decode the payload (image
    * decode, audio PCM, video frames) here. Deterministic byte-level
    * features keep the pipeline testable end-to-end. */
  private[multimodal] def decodeStub(payload: Array[Byte]): Row = {
    var checksum = 0L
    var i = 0
    while (i < payload.length) { checksum = (checksum + (payload(i) & 0xff)) % 1000003L; i += 1 }
    Row(payload.length, if (payload.isEmpty) -1 else payload(0) & 0xff, checksum)
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
        val feats = decodeStub(if (payload == null) Array.emptyByteArray else payload)
        Row.fromSeq(r.toSeq ++ feats.toSeq)
      }
    }(enc)
  }

  /** STUB frame sampling: treat the payload as fixed-size frames and
    * emit every `stride`-th one as its own row — the 1→N generator
    * shape of video frame extraction (`flatMap` over partitions; no
    * driver collection, output rows carry (parent columns, frame_idx,
    * frame payload)). A real implementation would demux/decode here. */
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

  /** STUB resize: deterministic byte subsampling to `targetBytes` —
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
