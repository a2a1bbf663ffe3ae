package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Num
import graft.sources.Bucketed
import graft.tables.Tables
import Registry.{Entry, Q}

/** Warehouse-maintenance surface: the layout and refresh machinery a
  * 100 TB deployment runs BETWEEN queries so the queries themselves stay
  * cheap — co-bucketed join layouts (write the join shuffle once, reuse it
  * forever) and incremental aggregate maintenance (refresh materialized
  * state from the delta instead of rescanning history).
  *
  * The reference has neither: every run re-reads and re-joins the raw
  * CSVs (reference: src/spark/training.py:113-145) and every dashboard
  * refresh recomputes its aggregates from the full interaction history
  * (reference: src/streaming_service.py:336). Both patterns here are the
  * standing fix: pay the full-scan cost once, then amortize.
  */
object Warehouse {

  // ------------------------------------------------------------ bucketed join

  /** Revenue-by-nation through the CO-BUCKETED orders⋈customer layout
    * ([[graft.sources.Bucketed.coBucketedOrdersCustomer]]): both sides were
    * written pre-hashed into 8 buckets on the customer key, so the equi-join
    * needs no Exchange on either side — each task zips bucket i of orders
    * with bucket i of customer (BucketedSpec pins the exchange-free plan and
    * the `SelectedBucketsCount` bucket-pruned point probe; at sf the
    * optimizer may still choose broadcast for the small dim — the SPEC
    * disables broadcast to prove the bucketed path, the registry query lets
    * Catalyst pick). The result is byte-identical to the plain join — the
    * oracle reads the raw parquet — which is exactly the claim: bucketing
    * changes the PLAN, never the answer.
    *
    * Scale shape: the one-time bucketed write shuffles each side once;
    * after that, every o_custkey equi-join, GROUP BY, or point probe rides
    * the layout with zero exchanges. The post-join rollup to |nations| rows
    * is a partial+final hash aggregate.
    */
  private val bucketedJoin: Q = (s, d) => {
    val (o, c) = Bucketed.coBucketedOrdersCustomer(s, d)
    o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct("c_custkey").as("n_buyers"),
        sum(Num.cents(col("o_totalprice"))).as("revenue_cents"))
      .orderBy("c_nationkey")
  }

  private val bucketedJoinSql =
    """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_buyers,
      |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |         AS revenue_cents
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  // --------------------------------------------------- incremental aggregates

  /** Incremental aggregate maintenance — the materialized-view refresh
    * algebra: per-customer order metrics kept as a MERGEABLE state
    * (count, sum, min, max, last-day), refreshed by combining the standing
    * history state with a delta-only state instead of rescanning history.
    * The query splits orders at the 80% point of the day span (the
    * [[LlmQueries]] `q_split_temporal` boundary discipline — data-derived,
    * identical in both engines), builds the two partial states, merges
    * them, and derives the serving metrics (avg = sum div count in exact
    * integer cents) from the merged state. The ◆ oracle is the FULL
    * recompute over all orders — hash equality IS the proof that the merge
    * algebra loses nothing, the same claim the driver's own partial+final
    * hash aggregates rely on, here lifted to cross-refresh persistence.
    *
    * min/max merge: `least(coalesce(h, d), coalesce(d, h))` — null-safe on
    * both engines without relying on either's least/greatest null
    * convention (Spark skips nulls, DuckDB ignores them — the double
    * coalesce never feeds a null to either).
    *
    * Scale shape: the history side is |customers| STATE rows (at 100 TB:
    * read from the standing store, here recomputed for the oracle's sake);
    * the delta side scans only the refresh window; the merge is a
    * |customers|-row full-outer join on the state key — co-bucket the
    * state table on o_custkey ([[graft.sources.Bucketed]]) and the merge
    * too is exchange-free on the history side. Mergeable-sketch distincts
    * extend the same algebra ([[graft.sources.SketchStore]]).
    */
  private val incrAgg: Q = (s, d) => {
    val o = Tables.orders(s, d).select(col("o_custkey"),
      expr("unix_micros(o_orderdate) div 86400000000").as("day"),
      Num.cents(col("o_totalprice")).as("cents"))
    val bounds = o.agg(min("day").as("lo"), max("day").as("hi"))
    val tagged = o.crossJoin(broadcast(bounds))
      .withColumn("cut",
        col("lo") + call_function("div",
          (col("hi") - col("lo") + lit(1L)) * lit(8L), lit(10L)))
    def state(df: org.apache.spark.sql.DataFrame, tag: String) =
      df.groupBy("o_custkey").agg(
        count(lit(1)).as(s"n_$tag"),
        sum("cents").as(s"sum_$tag"),
        min("cents").as(s"min_$tag"),
        max("cents").as(s"max_$tag"),
        max("day").as(s"day_$tag"))
    val hist = state(tagged.filter(col("day") < col("cut")), "h")
    val delta = state(tagged.filter(col("day") >= col("cut")), "d")
    hist.join(delta, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        (coalesce(col("n_h"), lit(0L)) + coalesce(col("n_d"), lit(0L)))
          .as("n_orders"),
        (coalesce(col("sum_h"), lit(0L)) + coalesce(col("sum_d"), lit(0L)))
          .as("revenue_cents"),
        least(coalesce(col("min_h"), col("min_d")),
          coalesce(col("min_d"), col("min_h"))).as("min_cents"),
        greatest(coalesce(col("max_h"), col("max_d")),
          coalesce(col("max_d"), col("max_h"))).as("max_cents"),
        greatest(coalesce(col("day_h"), col("day_d")),
          coalesce(col("day_d"), col("day_h"))).as("last_day"))
      .withColumn("avg_cents",
        call_function("div", col("revenue_cents"), col("n_orders")))
      .orderBy("o_custkey")
  }

  private val incrAggSql =
    """WITH o AS (
      |  SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS day,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders)
      |SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(SUM(cents) AS BIGINT) AS revenue_cents,
      |       MIN(cents) AS min_cents, MAX(cents) AS max_cents,
      |       MAX(day) AS last_day,
      |       CAST(SUM(cents) AS BIGINT) // CAST(count(*) AS BIGINT)
      |         AS avg_cents
      |FROM o GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("q_bucketed_join", bucketedJoin, Some(bucketedJoinSql)),
    Entry("q_incr_agg", incrAgg, Some(incrAggSql)),
  )
}
