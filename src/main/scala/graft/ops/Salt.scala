package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY.md §4 / the 100 TB design rules).
  *
  * A `groupBy(hotKey)` shuffles every row of a hot key to ONE reducer; at
  * scale a single pathological key (the empty document, a bot user, a null
  * bucket) stalls the stage. Salting splits each key into `salts`
  * sub-keys for the first (heavy, map-side-combined) aggregation, then
  * re-aggregates the tiny salted partials — two shuffles, but the first is
  * uniform and the second moves only `keys × salts` rows.
  *
  * AQE's skew-join handling covers JOIN skew at runtime; aggregation skew
  * still needs this rewrite, which is why it's a library primitive here.
  * The salt is `pmod(hash(whole row), salts)` — deterministic per row, no
  * rand(), so results are replayable and oracle-comparable.
  */
object Salt {

  /** Salted two-phase sum/count aggregation: equivalent to
    * `df.groupBy(key).agg(count(*), sum(valueCents))` but skew-immune.
    * `valueCents` must be an integer-typed column (exact re-aggregation).
    */
  def saltedCountSum(df: DataFrame, key: Column, valueCents: Column,
      salts: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(struct(df.columns.map(col): _*)), lit(salts)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(count(lit(1)).as("pc"), sum(valueCents).as("ps"))
      .groupBy(col("k"))
      .agg(sum("pc").as("cnt"), sum("ps").as("sum_cents"))
}
