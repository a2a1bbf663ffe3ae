package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared embedding arithmetic and the 3-decimal rounding used on every
  * oracle-checked cosine — ONE definition so the cross-engine contracts
  * (codegen dot = DuckDB `list_dot_product` fold order; explicit
  * ⌊x·10³+½⌋ ties, never native `round`) cannot drift between query
  * files. [[Num.round4]] is the 4-decimal sibling.
  */
object Vec {

  /** Codegen index-loop dot ([[graft.functions.DotProduct]]); same
    * sequential left fold as DuckDB's list functions.
    */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Explicit half-up 3-decimal rounding — native `round` ties (exact
    * binary .0005) are HALF_UP in Spark but engine-defined in DuckDB.
    */
  def round3(c: Column): Column =
    floor(c * lit(1000.0) + lit(0.5)) / lit(1000.0)
}
