package graft.core

/** Driver-side rounding helpers shared by every operator that emits a
  * scalar computed on the driver (CUSUM levels, describe moments,
  * survival curves, …).
  *
  * `r6` rounds half-AWAY-FROM-ZERO on the 1e-6 grid — the same tie
  * rule as DuckDB/ANSI `round(x, 6)`, which every oracle uses. The
  * naive `floor(x·1e6 + 0.5)/1e6` form rounds half-cases toward
  * +infinity instead, which diverges from the oracle for NEGATIVE
  * values landing exactly on a half-micro boundary (e.g. a negative
  * CUSUM level or a negative median); the signum-corrected form below
  * agrees with `round()` for every sign. For provably non-negative
  * inputs the two forms are identical, so using `r6` everywhere is
  * safe and removes the per-file local definitions.
  */
object Round {
  def r6(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6

  /** Column form of [[r6]] — the same IEEE ops in the same order
    * (signum·floor first, divide once), so a value rounded in-plan is
    * bit-equal to the same value rounded on the driver. Spark's
    * `floor` returns LongType; the cast back to double is exact for
    * |x|·1e6 < 2^53, far beyond any 6-dp-grid column. */
  def r6c(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    signum(c) * floor(abs(c) * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
  }
}
