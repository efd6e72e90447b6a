package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-vector linear (asymmetric min/max) quantization of embedding
  * columns to small integer codes — the standard storage/bandwidth
  * reduction for 100 TB-scale embedding corpora (e.g. 64 float32 dims
  * → 64 uint8 codes + two floats of scale metadata, a 3.9x shrink
  * before any ANN indexing; same scheme as the scalar quantizer
  * published with FAISS — Johnson, Douze & Jégou 2017,
  * arXiv:1702.08734).
  *
  * Everything is per-row column expressions over the embedding array —
  * scan-local, no shuffle, no UDFs; the 64-element higher-order
  * functions are the intended tool here (per-element arithmetic on an
  * array column, not a hot row-count-scale comparison network).
  */
object Quantize {

  /** The shared staging frame: (idCol, __x cast-double vector, __min,
    * __scale = (max−min)/levels). ONE definition — dequantized() and
    * quantizeStats() both build their grids from it, so the
    * quantization grid the recall spec reconstructs with and the grid
    * the error-bound assertion measures cannot drift apart. */
  private def staged(df: DataFrame, idCol: String, embCol: String,
      levels: Int): DataFrame =
    df.select(col(idCol),
        transform(col(embCol), e => e.cast("double")).as("__x"))
      .withColumn("__min", array_min(col("__x")))
      .withColumn("__max", array_max(col("__x")))
      .withColumn("__scale", (col("__max") - col("__min")) / levels)

  /** The integer codes of the staged vector: round((x − min)/scale);
    * a constant vector (scale 0) codes to all zeros. */
  private def codesCol: Column =
    when(col("__scale") > 0,
      transform(col("__x"), e =>
        round((e - col("__min")) / col("__scale")).cast("long")))
      .otherwise(transform(col("__x"), _ => lit(0L)))

  /** Quantize-then-reconstruct: the vector a consumer would search
    * over after uint8 storage (each element snapped to its nearest of
    * `levels`+1 grid points in the vector's own [min, max] range).
    * Used by the recall spec to show ANN top-k survives quantization;
    * scan-local like quantizeStats. */
  def dequantized(df: DataFrame, idCol: String, embCol: String,
      levels: Int = 255): DataFrame =
    staged(df, idCol, embCol, levels)
      .select(col(idCol),
        when(col("__scale") > 0,
          transform(col("__x"), e =>
            col("__min") + round((e - col("__min")) / col("__scale")) * col("__scale")))
          .otherwise(col("__x")).as("emb_q"))

  /** Quantization summary per vector: value range, the exact sum of
    * the integer codes, and the worst-case reconstruction error. The
    * codes are round((x - min) / scale) with scale = (max - min)/levels
    * — `code_sum` is integer-exact, and `max_abs_err` is
    * order-independent (a max, not a float sum), so both survive a
    * bit-exact oracle comparison; the error bound scale/2 is asserted
    * in spec.
    */
  def quantizeStats(df: DataFrame, idCol: String, embCol: String,
      levels: Int = 255): DataFrame =
    staged(df, idCol, embCol, levels)
      .withColumn("__codes", codesCol)
      .select(
        col(idCol),
        round(col("__min"), 6).as("vmin"),
        round(col("__max"), 6).as("vmax"),
        aggregate(col("__codes"), lit(0L), (a, c) => a + c).as("code_sum"),
        round(array_max(zip_with(col("__codes"), col("__x"), (c, e) =>
          abs(col("__min") + c * col("__scale") - e))), 6).as("max_abs_err"))
}
