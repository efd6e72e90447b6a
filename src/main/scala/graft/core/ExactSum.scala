package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent value sums for money-grade columns (the q1-family
  * construction, generalized): quantize each value to signed
  * micro-units with the half-away-from-zero tie rule (`Round.r6`'s
  * column form — plain `floor(x·1e6 + 0.5)` would round negative
  * half-cases toward +∞ and diverge from SQL `round`), sum the
  * integers exactly in decimal(38,0), and divide back once.
  *
  * `round(sum(double), k)` is order-DEPENDENT: partial-aggregation
  * order perturbs the float sum by ~ULP(total)·√n, which crosses the
  * rounding grain once group sums reach ~1e10 (measured: 7/28 q1
  * values ±1 cent at 60M rows). The integer sum is bit-equal under ANY
  * partitioning, ANY engine — and IDENTICAL to the true sum whenever
  * inputs sit on the 1e-6 decimal grid (2-dp money, 6-dp rounded
  * scores; the driver's tables are grid-exact by construction).
  *
  * Oracle mirror (DuckDB):
  *   CAST(sum(CAST(sign(v)*floor(abs(v)*1000000 + 0.5) AS HUGEINT))
  *        AS DOUBLE) / 1000000
  */
object ExactSum {
  /** The signum-corrected micro-unit quantizer itself (pre-cast):
    * sign(v)·floor(|v|·1e6 + 0.5). Private — consumers take the typed
    * faces below so every quantize-then-sum site in the engine shares
    * ONE rounding rule (the engine-wide grep gate: a plain
    * `floor(x·1e6 + 0.5)` outside this file / [[Round]] is a review
    * flag). */
  private def quant(c: Column): Column = quant(c, 1e6)
  private def quant(c: Column, scale: Double): Column =
    signum(c) * floor(abs(c) * scale + 0.5)

  /** The quantizer as a LONG column, for operators that keep the
    * micro-unit integers as a working column (moment sums, window
    * sums, leading-digit extraction) rather than summing in place —
    * square/multiply in decimal(38,0) on the caller side when products
    * can leave the long range. Oracle mirror (DuckDB):
    *   CAST(sign(v) * floor(abs(v) * 1e6 + 0.5) AS BIGINT|HUGEINT) */
  def quantLong(c: Column): Column = quant(c).cast("long")

  /** [[quantLong]] at an explicit grain (`scale` = units per 1.0 —
    * e.g. 1.0 keeps integers as-is, 100 is cent grain). */
  def quantLong(c: Column, scale: Double): Column =
    quant(c, scale).cast("long")

  /** The quantizer as a decimal(38,0) column, for operators whose SUM
    * must itself run in decimal (corpus-scale totals past the long
    * range). */
  def quantDec(c: Column): Column = quant(c).cast("decimal(38,0)")

  /** [[quantDec]] at an explicit grain. */
  def quantDec(c: Column, scale: Double): Column =
    quant(c, scale).cast("decimal(38,0)")

  /** Exact micro-unit sum of `c`, returned as a double (callers wrap
    * in `round(_, k)` for rendering parity). Decimal(38,0) holds 1e38:
    * overflow needs 1e32 micro-units — unreachable from any corpus. */
  def micro(c: Column): Column =
    sum(quant(c).cast("decimal(38,0)")).cast("double") / 1e6

  /** [[micro]] over a distinct-value count frame: the exact micro-unit
    * sum of `w` copies of `c` is w·quant(c) because quantization is
    * per-VALUE — bit-identical to the row-expanded sum at a fraction
    * of the rows. The operators that aggregate off a (group, value,
    * count) CDF frame (winsorizedMeans) use this to stay one-pass. */
  def microWeighted(c: Column, w: Column): Column =
    sum(quant(c).cast("decimal(38,0)") * w.cast("decimal(38,0)"))
      .cast("double") / 1e6
}
