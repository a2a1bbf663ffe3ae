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

  /** Adds `rankName` = the EXACT 1-based global rank of every row under
    * `(orderCol, tieCols…)` — ascending, or descending on `orderCol` with
    * ascending tiebreakers when `descending = true` — without a global
    * sort: the `q_pareto` distributed-selection template as a library
    * primitive (the rank/count-monoid sibling of
    * [[graft.ops.Prefix.withCumSum]]). Order-preserving ≤`buckets`-way
    * range bucket from broadcast bounds (width division — overflow-safe
    * for any long span; descending buckets on `hi − c` so rank-1 lands in
    * bucket 0), exclusive prefix COUNTS over the ≤`buckets` bucket rows
    * (the only unpartitioned window, constant-size by construction),
    * bucket-partitioned local `row_number`, broadcast offset added.
    * `orderCol` must be integral non-null with a long-representable span;
    * `df`'s columns must avoid the `__rnk_` scratch namespace.
    */
  def withGlobalRank(df: DataFrame, orderCol: String, tieCols: Seq[String],
      rankName: String, buckets: Long = 64L,
      descending: Boolean = false): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val bounds = df.agg(
      min(orderCol).cast("long").as("__rnk_lo"),
      max(orderCol).cast("long").as("__rnk_hi"))
    val width = call_function("div",
      col("__rnk_hi") - col("__rnk_lo"), lit(buckets)) + lit(1L)
    val pos =
      if (descending) col("__rnk_hi") - col(orderCol).cast("long")
      else col(orderCol).cast("long") - col("__rnk_lo")
    val bucketed = df.crossJoin(broadcast(bounds))
      .withColumn("__rnk_b", call_function("div", pos, width))
      .drop("__rnk_lo", "__rnk_hi")
    val offW = Window.orderBy(asc("__rnk_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("__rnk_b")
      .agg(count(lit(1)).as("__rnk_bn"))
      .select(col("__rnk_b"),
        coalesce(sum("__rnk_bn").over(offW), lit(0L)).as("__rnk_off"))
    val localOrder =
      (if (descending) desc(orderCol) else asc(orderCol)) +: tieCols.map(asc)
    val localW = Window.partitionBy("__rnk_b").orderBy(localOrder: _*)
    bucketed.join(broadcast(offsets), Seq("__rnk_b"))
      .withColumn(rankName, col("__rnk_off") + row_number().over(localW))
      .drop("__rnk_b", "__rnk_off")
  }

  /** ntile's fill rule applied to an exact global rank: with `n` total
    * rows, the first `n mod tiles` tiles hold `n div tiles + 1` rows.
    * Integer arithmetic only — bit-identical to the engine-native
    * `ntile(tiles) OVER (ORDER BY …)` on the same total order.
    */
  def ntileFromRank(rank: Column, n: Column, tiles: Long): Column = {
    val base = call_function("div", n, lit(tiles))
    val rem = n % lit(tiles)
    val head = (base + lit(1L)) * rem
    when(rank <= head,
      call_function("div", rank - 1, base + lit(1L)) + lit(1L))
      .otherwise(rem + call_function("div", rank - head - 1, base) + lit(1L))
      .cast("int")
  }
}
