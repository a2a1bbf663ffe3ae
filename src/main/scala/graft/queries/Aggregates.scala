package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Num
import graft.tables.Tables
import Registry.{Entry, Q}

/** Aggregation analytics: SURVEY.md §2.4 (A1-A10) plus the cube extension.
  *
  * All double aggregates go through exact integer cents ([[graft.ops.Num]])
  * so results are independent of partition-level summation order — the
  * property that makes a distributed hash aggregate hash-match a
  * single-threaded DuckDB run, at any partition count. Every group-by here
  * is a Catalyst partial+final hash aggregate (map-side combine), which is
  * the scale path: the shuffle moves one row per group per partition, not
  * the data.
  */
object Aggregates {

  /** A1/A4/A5 + TPC-H Q1 shape — the reference's distribution/average batch
    * summaries (reference: src/streaming_service.py:329-338) generalized to
    * the classic pricing-summary aggregate.
    */
  private val q1Agg: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Num.dollars(sum(Num.cents(col("l_quantity")))).as("sum_qty"),
        Num.dollars(sum(Num.cents(col("l_extendedprice")))).as("sum_base"),
        Num.dollars(sum(Num.cents(col("l_extendedprice") * (lit(1) - col("l_discount")))))
          .as("sum_disc"),
        Num.roundAt(sum(Num.cents(col("l_quantity"))) / lit(100.0) / count(lit(1)), 4).as("avg_qty"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q1AggSql =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
      |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base,
      |       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_disc,
      |       floor((CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*)) * 10000 + 0.5) / 10000.0 AS avg_qty,
      |       count(*) AS cnt
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** A3 — exact count-distinct per group (reference `nunique` per batch,
    * src/streaming_service.py:336-337). countDistinct shuffles by
    * (group, value) for partial dedup — the exact-at-scale plan;
    * [[countDistinctApproxQ]] is the constant-memory HLL variant.
    */
  private val countDistinctQ: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
    o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"),
        Num.dollars(sum(Num.cents(col("o_totalprice")))).as("sum_total"))
      .orderBy("c_mktsegment")
  }

  /** HLL twin of [[countDistinctQ]] — `approx_count_distinct` keeps one
    * bounded HyperLogLog++ sketch per group instead of shuffling every
    * (group, value) pair for exact dedup: at extreme cardinality the exact
    * plan's shuffle is the bottleneck, the sketch's isn't. HLL registers
    * aren't cross-engine comparable, so no SQL oracle; the relative-error
    * property test vs the exact query is the gate (PropertiesSpec).
    */
  private val countDistinctApproxQ: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
    o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        approx_count_distinct(col("o_custkey"), 0.02).as("n_cust_approx"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")
  }

  private val countDistinctSql =
    """SELECT c_mktsegment,
      |       count(DISTINCT o_custkey) AS n_cust,
      |       count(*) AS n_orders,
      |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** A2 — group distribution with share-of-total, the reference's emotion /
    * action distributions (reference: src/streaming_service.py:329,338).
    */
  private val distribution: Q = (s, d) => {
    val counts = Tables.events(s, d).groupBy("event_type").agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("pct", Num.roundAt(col("cnt") * lit(100.0) / sum("cnt").over(Window.partitionBy()), 2))
      .orderBy("event_type")
  }

  private val distributionSql =
    """SELECT event_type, count(*) AS cnt,
      |       floor((count(*) * CAST(100.0 AS DOUBLE) / SUM(count(*)) OVER ()) * 100 + 0.5) / 100.0 AS pct
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** A6 — max-per-group keeping a payload: per-user best event by value,
    * ties broken by event id via struct ordering — the reference keeps the
    * full display struct of the best-rated interaction per track
    * (reference: src/streaming_service.py:358-368). Built-in `max_by`, no
    * shuffle beyond the hash aggregate.
    */
  private val maxBy: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(
        max_by(col("event_id"), struct(col("value"), col("event_id"))).as("best_event"),
        max(col("value")).as("best_value"))
      .orderBy("user_id")

  private val maxBySql =
    """SELECT user_id, event_id AS best_event, value AS best_value
      |FROM (SELECT user_id, event_id, value,
      |             row_number() OVER (PARTITION BY user_id
      |                                ORDER BY value DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** A7 — grouped count → top-k (popular artists top-3,
    * reference: src/streaming_service.py:373-382). Catalyst turns
    * sort+limit into TakeOrderedAndProject — no global sort at scale.
    */
  private val topkGroup: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("n_name"))
      .limit(3)
  }

  private val topkGroupSql =
    """SELECT n_name, count(*) AS cnt
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY cnt DESC, n_name LIMIT 3""".stripMargin

  /** Cube extension — multi-dimensional distribution (emotion×action in the
    * reference's domain, SURVEY.md §2.4 note). Nulls introduced by cube are
    * coalesced away so ordering semantics match across engines; grouping_id
    * disambiguates 'ALL' from a literal value.
    */
  private val cubeDist: Q = (s, d) =>
    Tables.documents(s, d)
      .cube("lang", "source")
      .agg(count(lit(1)).as("cnt"), grouping_id().as("gid"))
      .select(
        coalesce(col("lang"), lit("ALL")).as("lang_g"),
        coalesce(col("source"), lit("ALL")).as("source_g"),
        col("gid"), col("cnt"))
      .orderBy("gid", "lang_g", "source_g")

  private val cubeDistSql =
    """SELECT coalesce(lang, 'ALL') AS lang_g,
      |       coalesce(source, 'ALL') AS source_g,
      |       GROUPING(lang, source) AS gid,
      |       count(*) AS cnt
      |FROM documents
      |GROUP BY CUBE (lang, source)
      |ORDER BY gid, lang_g, source_g""".stripMargin

  /** GROUPING SETS — the explicit-sets member of the grouping family
    * (`q_cube_dist` covers cube, `q_rollup` covers rollup): exactly the
    * three marginal views a reporting layer asks for — (status, priority),
    * status-only, priority-only — WITHOUT cube's grand total, so the
    * engine computes 3 of the 4 cube groupings and skips the rest. Same
    * plan shape as cube (one Expand + one hash aggregate, each input row
    * expanded only 3×); money summed in exact integer cents ([[Num]]),
    * grouping_id disambiguates 'ALL' from a literal value.
    */
  private val groupingSetsDist: Q = (s, d) =>
    Tables.orders(s, d)
      .groupingSets(
        Seq(
          Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")),
          Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("cnt"),
        Num.dollars(sum(Num.cents(col("o_totalprice")))).as("sum_total"),
        grouping_id().as("gid"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status_g"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority_g"),
        col("gid"), col("cnt"), col("sum_total"))
      .orderBy("gid", "status_g", "priority_g")

  private val groupingSetsDistSql =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status_g,
      |       coalesce(o_orderpriority, 'ALL') AS priority_g,
      |       GROUPING(o_orderstatus, o_orderpriority) AS gid,
      |       count(*) AS cnt,
      |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
      |         / 100.0 AS sum_total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |                        (o_orderstatus), (o_orderpriority))
      |ORDER BY gid, status_g, priority_g""".stripMargin

  /** A1/A4/A5 in one scan — global scalar stats (the reference's logging
    * probes, src/spark/training.py:98,230,318). One partial+final aggregate,
    * no shuffle of raw rows.
    */
  private val globalStats: Q = (s, d) =>
    Tables.lineitem(s, d)
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_partkey")).as("n_parts"),
        Num.dollars(sum(Num.cents(col("l_quantity")))).as("sum_qty"),
        Num.roundAt(sum(Num.cents(col("l_extendedprice"))) / lit(100.0) / count(lit(1)), 4)
          .as("avg_price"),
        to_date(min(col("l_shipdate"))).as("min_ship"),
        to_date(max(col("l_shipdate"))).as("max_ship"))

  private val globalStatsSql =
    """SELECT count(*) AS n_rows,
      |       count(DISTINCT l_partkey) AS n_parts,
      |       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
      |       floor((CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*)) * 10000 + 0.5) / 10000.0 AS avg_price,
      |       CAST(min(l_shipdate) AS DATE) AS min_ship,
      |       CAST(max(l_shipdate) AS DATE) AS max_ship
      |FROM lineitem""".stripMargin

  /** A10/F10 — clamp-to-range scalar inside an aggregate: the reference's
    * rating clamp 1..5 (reference: src/streaming_service.py:244;
    * src/app_optimized.py:501).
    */
  private val clampAgg: Q = (s, d) => {
    val ratingCents = Num.cents(greatest(lit(1.0), least(lit(5.0), col("value") / lit(40.0))))
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        Num.roundAt(sum(ratingCents) / lit(100.0) / count(lit(1)), 4).as("avg_rating"),
        count(lit(1)).as("cnt"))
      .orderBy("event_type")
  }

  private val clampAggSql =
    """SELECT event_type,
      |       floor((CAST(SUM(CAST(round(greatest(CAST(1.0 AS DOUBLE), least(CAST(5.0 AS DOUBLE), value / 40.0)) * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*)) * 10000 + 0.5) / 10000.0 AS avg_rating,
      |       count(*) AS cnt
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** The skew-immune two-phase aggregation ([[graft.ops.Salt]]) as an
    * oracle-checked registry query: `events` grouped by its 3-value
    * `event_type` — exactly the few-distinct-hot-keys shape that stalls a
    * naive groupBy's reducers at scale. The salted first phase shuffles
    * uniformly; the second moves only keys × salts rows; integer cents make
    * the two-phase re-aggregation exact, which is why the result
    * hash-matches a single-threaded DuckDB GROUP BY bit-for-bit.
    */
  private val saltedAgg: Q = (s, d) =>
    graft.ops.Salt.saltedCountSum(
        Tables.events(s, d).select(col("event_type"), col("value")),
        col("event_type"), Num.cents(col("value")), 32)
      .select(col("k").as("event_type"), col("cnt"), col("sum_cents"))
      .orderBy("event_type")

  private val saltedAggSql =
    """SELECT event_type, count(*) AS cnt,
      |       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Equi-width numeric histogram of event values — the profiling
    * primitive behind data-quality dashboards and the binned-ECDF grid
    * the `q_drift_ks_binned` drift twin runs on. Bin index is exact
    * integer arithmetic on both engines (`floor(value/width)` — one IEEE
    * division + floor, then integer clamp into `[0, nbins-1]`, so the
    * top bin doubles as the overflow bin; the shared constants below
    * drive both engines). ONE partial+final hash aggregate on a key of
    * bounded cardinality; the pct window then runs over ≤ nbins rows —
    * constant-size state however large the input.
    */
  private[graft] val histWidth = 25.0
  private[graft] val histMaxBin = 19L // [0, 19]; bin 19 also catches overflow

  /** The bin grid as ONE shared builder per engine — `q_histogram` and the
    * binned-ECDF drift twin ([[Stats]] `q_drift_ks_binned`) both read these,
    * so the grid that profiles a column and the grid that tests it for
    * drift cannot diverge.
    */
  private[graft] def binCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    least(lit(histMaxBin), greatest(lit(0L), floor(c / lit(histWidth))))
  private[graft] def binSql(e: String): String =
    s"least($histMaxBin, greatest(0, CAST(floor($e / $histWidth) AS BIGINT)))"

  private val histogramQ: Q = (s, d) =>
    Tables.events(s, d)
      .select(binCol(col("value")).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("cnt"))
      .select(col("bin"), (col("bin") * lit(histWidth)).as("bin_lo"),
        ((col("bin") + lit(1L)) * lit(histWidth)).as("bin_hi"), col("cnt"),
        Num.roundAt(col("cnt") * lit(100.0) / sum("cnt").over(Window.partitionBy()), 2)
          .as("pct"))
      .orderBy("bin")

  private val histogramSql =
    s"""SELECT bin, bin * $histWidth AS bin_lo, (bin + 1) * $histWidth AS bin_hi,
       |       count(*) AS cnt,
       |       floor((count(*) * CAST(100.0 AS DOUBLE) / SUM(count(*)) OVER ()) * 100 + 0.5) / 100.0 AS pct
       |FROM (SELECT ${binSql("value")} AS bin
       |      FROM events)
       |GROUP BY bin ORDER BY bin""".stripMargin

  /** Key-skew audit — the diagnostic that decides whether a key needs
    * [[graft.ops.Salt]] before a groupBy/join ships to the cluster: the
    * per-key row-count distribution (key count, max, mean, p50/p99) and
    * the skew ratio max/mean. A ratio near 1 means uniform keys; a ratio
    * of 10³ means one reducer gets the hot key's entire mass and the
    * stage runs at the speed of that one task — the audit is cheap (one
    * partial+final count per key, then stats over |keys| rows, not data)
    * and is what a pipeline runs BEFORE the expensive job, per key
    * column it plans to shuffle on.
    */
  private val skewAuditQ: Q = (s, d) => {
    val sizes = Tables.events(s, d).groupBy("user_id")
      .agg(count(lit(1)).as("n"))
    sizes.agg(
        count(lit(1)).as("n_keys"),
        max("n").as("max_n"),
        sum("n").as("total"),
        Num.roundAt(expr("percentile(n, 0.5)"), 4).as("p50_n"),
        Num.roundAt(expr("percentile(n, 0.99)"), 4).as("p99_n"))
      .select(col("n_keys"), col("max_n"), col("p50_n"), col("p99_n"),
        Num.round4(col("max_n").cast("double") *
          col("n_keys").cast("double") / col("total").cast("double"))
          .as("skew_ratio"))
  }

  private val skewAuditSql =
    """WITH sizes AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY user_id),
      |a AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_keys, max(n) AS max_n,
      |         CAST(SUM(n) AS BIGINT) AS total,
      |         floor((quantile_cont(n, 0.5)) * 10000 + 0.5) / 10000.0 AS p50_n,
      |         floor((quantile_cont(n, 0.99)) * 10000 + 0.5) / 10000.0 AS p99_n
      |  FROM sizes)
      |SELECT n_keys, max_n, p50_n, p99_n,
      |       floor(CAST(max_n AS DOUBLE) * CAST(n_keys AS DOUBLE)
      |             / CAST(total AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS skew_ratio
      |FROM a""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("q_skew_audit", skewAuditQ, Some(skewAuditSql)),
    Entry("q_histogram", histogramQ, Some(histogramSql)),
    Entry("q1_agg", q1Agg, Some(q1AggSql)),
    Entry("q_salted_agg", saltedAgg, Some(saltedAggSql)),
    Entry("q_count_distinct", countDistinctQ, Some(countDistinctSql)),
    Entry("q_count_distinct_approx", countDistinctApproxQ, None),
    Entry("q_distribution", distribution, Some(distributionSql)),
    Entry("q_max_by", maxBy, Some(maxBySql)),
    Entry("q_topk_group", topkGroup, Some(topkGroupSql)),
    Entry("q_cube_dist", cubeDist, Some(cubeDistSql)),
    Entry("q_grouping_sets", groupingSetsDist, Some(groupingSetsDistSql)),
    Entry("q_global_stats", globalStats, Some(globalStatsSql)),
    Entry("q_clamp_agg", clampAgg, Some(clampAggSql)),
  )
}
