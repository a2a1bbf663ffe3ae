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
    df.withColumn("__salt", pmod(hash(struct(df.columns.toIndexedSeq.map(col): _*)), lit(salts)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(count(lit(1)).as("pc"), sum(valueCents).as("ps"))
      .groupBy(col("k"))
      .agg(sum("pc").as("cnt"), sum("ps").as("sum_cents"))

  /** Salted INNER equi-join — the JOIN half of the skew story (the
    * aggregation half is [[saltedCountSum]]; the diagnostic that decides
    * is ◆ `q_skew_audit`). The big side tags each row with a
    * deterministic row-hash salt; the small side replicates each row
    * across all `salts` sub-keys, so a hot key's rows spread over
    * `salts` reducers instead of stalling one task. Row-for-row
    * equivalent to `big.join(small, key)`.
    *
    * Division of labor with AQE: `spark.sql.adaptive.skewJoin` splits an
    * oversized shuffle partition at RUNTIME from observed map sizes
    * (ScaleOpsSpec pins it firing — `skew=true` in the final plan) and
    * is the default answer for sort-merge join skew. The static salted
    * rewrite is for when the spread must be GUARANTEED up front: AQE
    * off, a skew threshold the hot key tiptoes under per-partition, or
    * a downstream stage that must inherit the salted partitioning — at
    * the cost of replicating the small side `salts`×.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    val tagged = big.withColumn("__salt",
      pmod(hash(struct(big.columns.toIndexedSeq.map(col): _*)), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    tagged.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
