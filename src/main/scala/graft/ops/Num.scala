package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric determinism helpers.
  *
  * Double summation is order-dependent; Spark sums per-partition in parallel
  * while the DuckDB oracle sums sequentially, so `sum(double)` can hash-differ.
  * All money-like aggregates therefore go through exact integer cents:
  * `round(x*100)` is integral, its long cast is exact, and long sums are
  * associative. The reference keeps money-like fields as double throughout
  * (SURVEY.md §1.4), so presenting `cents/100.0` preserves its value domain.
  */
object Num {
  /** Exact cents: round(col*100) as long. DuckDB twin:
    * `CAST(round(x*100) AS BIGINT)` (cast is exact because round() made the
    * double integral; both engines round half away from zero for positives).
    */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Back to dollars after an exact integer aggregation. */
  def dollars(centsCol: Column): Column = centsCol / lit(100.0)

  /** Deterministic mean with 4-digit scale: sum exact cents, divide once. */
  def avgDollars(centsSum: Column, n: Column): Column =
    round(centsSum / lit(100.0) / n, 4)

  /** Round to 4 decimals as explicit ⌊x·10⁴+½⌋ — half-up on BOTH engines
    * regardless of their native `round` tie convention.
    */
  def round4(c: Column): Column =
    floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)
}
