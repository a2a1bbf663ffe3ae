package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global "first k rows with positions" without a whole-dataset window.
  *
  * `row_number() OVER (ORDER BY …)` with no PARTITION BY drags every row
  * into a single partition — fine at test scale, fatal at 100 TB. The
  * scale-safe plan for any bounded page / top-k is: sort+limit FIRST (Spark
  * compiles it to TakeOrderedAndProject — per-partition top-k, then only
  * k·partitions rows reach one reducer), and number the ≤ k surviving rows
  * afterwards. The window below therefore runs on a bounded prefix: its
  * single partition holds k rows by construction, not the dataset.
  * (The constant partition key keeps the intent explicit and silences
  * Spark's single-partition WindowExec warning.)
  */
object Rank {

  /** Rows 1..k of `df` under `order`, with their global positions in `rn`. */
  def firstK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)
      .withColumn("rn",
        row_number().over(Window.partitionBy(lit(0)).orderBy(order: _*)))
}
