package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-repair primitives mirroring the reference's aggressive null
  * coercion: empty string, literal "NULL", NaN and ±Infinity all collapse to
  * per-column defaults (reference: src/spark/training.py:68-95, duplicated at
  * :274-299). Expressed as pure Catalyst `when` chains — codegen-friendly,
  * no UDFs — so they run inside whole-stage codegen at any scale.
  */
object Clean {

  /** P3: repair a numeric column — null, NaN, ±Inf → default. */
  def repairNumeric(c: Column, default: Double): Column =
    when(
      c.isNull || isnan(c) ||
        c === lit(Double.PositiveInfinity) || c === lit(Double.NegativeInfinity),
      lit(default)
    ).otherwise(c)

  /** P3/P6: repair a string column — null, "", literal "NULL" → default. */
  def repairString(c: Column, default: String): Column =
    when(c.isNull || c === lit("") || c === lit("NULL"), lit(default)).otherwise(c)

  /** P4: conjunctive validity filter over numeric feature columns
    * (reference: src/spark/training.py:301-316).
    */
  def allValid(cols: Seq[Column]): Column =
    cols.map(c => c.isNotNull && !isnan(c)).reduce(_ && _)
}
