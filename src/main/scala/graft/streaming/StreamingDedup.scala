package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash near-duplicate detection: the LSH banding stage
  * of Dedup.minHashNearDup as an incremental operator. Each arriving
  * document computes its band signatures per-row (no aggregation —
  * the minhash over the doc's own gram array is a row-local
  * expression), and a per-(band, bucket) state of previously seen doc
  * ids emits a candidate pair the moment a new document lands in a
  * bucket someone already occupies — across micro-batches.
  *
  * This is the streaming half of a lambda-style dedup: it emits
  * CANDIDATES (the banding pre-filter, recall-bounded exactly like the
  * batch path); exact-Jaccard verification stays a batch join over the
  * candidate set (Dedup.exactJaccardOnPairs), because verification
  * needs both documents' gram sets while a stream has already let the
  * earlier document go by. The same function body runs on a static
  * frame (state starts empty per group), which the spec uses to assert
  * stream == batch candidate parity.
  *
  * State bound: each bucket keeps at most `maxBucketSize` ids — the
  * same stop-shingle skew guard as the batch path; a production
  * deployment would add a GroupStateTimeout tied to the ingestion
  * watermark to age buckets out.
  */
object StreamingDedup {

  final case class BandRow(band: Int, bsig: Long, id: Long)
  final case class CandPair(id_1: Long, id_2: Long, band: Int)

  def nearDupCandidates(spark: SparkSession, docs: DataFrame,
      idCol: String, textCol: String, shingleK: Int = 3,
      bands: Int = 16, rowsPerBand: Int = 2,
      maxBucketSize: Int = 1000): Dataset[CandPair] = {
    import spark.implicits._
    val grams = graft.functions.GraftFunctions
      .hashedShingles(spark, col(textCol), shingleK)
    // per-row signature: min_j over the doc's own gram array, banded
    // exactly like the batch pipeline (same seeds, same band hash)
    val bandCols = (0 until bands).map { b =>
      val hs = (b * rowsPerBand until (b + 1) * rowsPerBand).map(j =>
        array_min(transform(col("__g"), g => xxhash64(lit(j), g))))
      struct(lit(b).as("band"), xxhash64(hs: _*).as("bsig"))
    }
    val banded = docs
      .select(col(idCol).cast("long").as("id"), grams.as("__g"))
      .filter(size(col("__g")) > 0)
      .select(col("id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("bs.band").as("band"), col("bs.bsig").as("bsig"), col("id"))
      .as[BandRow]
    banded
      .groupByKey(r => (r.band, r.bsig))
      .flatMapGroupsWithState[List[Long], CandPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((band, _), rows, state: GroupState[List[Long]]) =>
          var seen = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer.empty[CandPair]
          rows.foreach { r =>
            if (!seen.contains(r.id) && seen.size < maxBucketSize) {
              seen.foreach { p =>
                out += CandPair(math.min(p, r.id), math.max(p, r.id), band)
              }
              seen = r.id :: seen
            }
          }
          state.update(seen)
          out.iterator
      }
  }
}
