package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Num, Rank}
import graft.tables.Tables
import Registry.{Entry, Q}

/** Window functions, sorts, limits, top-k: SURVEY.md §2.5 (W1-W7) plus the
  * frame-spec and sessionization extensions the reference lacks.
  *
  * Scale notes: global sort+limit compiles to TakeOrderedAndProject (per-
  * partition top-k, then k·partitions rows to one reducer — never a full
  * sort); per-group rankings shuffle once on the partition key; every
  * ordering carries a unique tiebreaker so results are hash-stable
  * (the reference's `argsort` is stable on index, SURVEY.md §7.4).
  */
object Windows {

  /** W1/W2 — global top-k by score (featured tracks top-5,
    * reference: src/streaming_service.py:370).
    */
  private val topkGlobal: Q = (s, d) =>
    Tables.events(s, d)
      .select("event_id", "user_id", "event_type", "value")
      .orderBy(desc("value"), asc("event_id"))
      .limit(5)

  private val topkGlobalSql =
    """SELECT event_id, user_id, event_type, value
      |FROM events ORDER BY value DESC, event_id LIMIT 5""".stripMargin

  /** W5 — per-group top-N ranking, the relational twin of
    * `recommendForUserSubset` (reference: src/app.py:214-231).
    */
  private val topnPerGroup: Q = (s, d) =>
    Tables.events(s, d)
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(desc("value"), asc("event_id"))))
      .filter(col("rn") <= 3)
      .select("user_id", "rn", "event_id", "value")
      .orderBy("user_id", "rn")

  private val topnPerGroupSql =
    """SELECT user_id, rn, event_id, value
      |FROM (SELECT user_id, event_id, value,
      |             row_number() OVER (PARTITION BY user_id
      |                                ORDER BY value DESC, event_id) AS rn
      |      FROM events)
      |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin

  /** W4 — deterministic pagination via row_number over a total order
    * (reference `limit`/`offset` args: src/app.py:176-183;
    * src/app_optimized.py:747-753). Page = rows 51..70. Sort+limit runs
    * first ([[Num]]-style TakeOrderedAndProject via [[graft.ops.Rank]]), so
    * no full-dataset single-partition window ever materializes.
    */
  private val pagination: Q = (s, d) =>
    Rank.firstK(
        Tables.part(s, d).select("p_partkey", "p_name", "p_retailprice"),
        70, asc("p_partkey"))
      .filter(col("rn") > 50)
      .select("rn", "p_partkey", "p_name", "p_retailprice")
      .orderBy("rn")

  private val paginationSql =
    """SELECT rn, p_partkey, p_name, p_retailprice
      |FROM (SELECT p_partkey, p_name, p_retailprice,
      |             row_number() OVER (ORDER BY p_partkey) AS rn FROM part)
      |WHERE rn > 50 AND rn <= 70 ORDER BY rn""".stripMargin

  /** W6 — rank-decayed score synthesis: `base - i*0.1` by list position
    * (reference: src/app_optimized.py:496-501). Top-20 prefix first, then
    * position numbering — see [[graft.ops.Rank]].
    */
  private val rankDecay: Q = (s, d) =>
    Rank.firstK(
        Tables.part(s, d).select("p_partkey", "p_retailprice"),
        20, desc("p_retailprice"), asc("p_partkey"))
      .select(
        col("rn"), col("p_partkey"),
        Num.roundAt(lit(5.0) - (col("rn") - lit(1)) * lit(0.1), 1).as("score"))
      .orderBy("rn")

  private val rankDecaySql =
    """SELECT rn, p_partkey,
      |       floor((CAST(5.0 AS DOUBLE) - (rn - 1) * CAST(0.1 AS DOUBLE)) * 10 + 0.5) / 10.0 AS score
      |FROM (SELECT p_partkey,
      |             row_number() OVER (ORDER BY p_retailprice DESC, p_partkey) AS rn
      |      FROM part)
      |WHERE rn <= 20 ORDER BY rn""".stripMargin

  /** W7 extension — rolling average over a 3-row frame per user, the
    * frame-spec window API the reference's trend series implies
    * (reference: src/streamlit_app.py:644-655). Sums exact cents inside the
    * frame, divides once — partition-order independent.
    */
  private val rollingAvg: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
      .rowsBetween(-2, Window.currentRow)
    Tables.events(s, d)
      .withColumn("sum_c", sum(Num.cents(col("value"))).over(w))
      .withColumn("n_w", count(lit(1)).over(w))
      .select(
        col("user_id"), col("event_id"),
        Num.roundAt(col("sum_c") / lit(100.0) / col("n_w"), 4).as("avg3"))
      .orderBy("user_id", "event_id")
  }

  private val rollingAvgSql =
    """SELECT user_id, event_id,
      |       floor((CAST(sum_c AS DOUBLE) / 100.0 / n_w) * 10000 + 0.5) / 10000.0 AS avg3
      |FROM (SELECT user_id, event_id,
      |             SUM(CAST(round(value * 100) AS BIGINT))
      |               OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS sum_c,
      |             COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS n_w
      |      FROM events)
      |ORDER BY user_id, event_id""".stripMargin

  /** Event-time RANGE frame — the value-based sibling of [[rollingAvg]]'s
    * row-count frame and the missing member of the frame matrix: "activity
    * in MY trailing 2 hours" is a per-row sliding interval no row count or
    * tumbling window expresses (rows-frames count events, tumbling windows
    * share boundaries; this frame is anchored at each row's own time).
    * Ordering by epoch-µs LONGS keeps the frame arithmetic integral in
    * both engines, and RANGE frames include all ORDER-BY-value peers, so
    * same-microsecond ties cannot reorder results — deterministic without
    * an event_id tiebreak, which a RANGE frame would not allow anyway
    * (multi-column RANGE ordering is undefined).
    *
    * Scale: partitioned by user and evaluated with a sliding accumulator
    * over the sorted partition (Spark's bounded-range frame is
    * incremental, not O(frame) per row); the shuffle is the same
    * one-per-user exchange every per-user analytic here pays.
    */
  private val rangeWindow: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(asc("us"))
      .rangeBetween(-7200000000L, Window.currentRow)
    Tables.events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("n_2h", count(lit(1)).over(w))
      .withColumn("sum_2h_c", sum(Num.cents(col("value"))).over(w))
      .select(col("user_id"), col("event_id"), col("us"),
        col("n_2h"), Num.dollars(col("sum_2h_c")).as("sum_2h"))
      .orderBy("user_id", "event_id")
  }

  private val rangeWindowSql =
    """SELECT user_id, event_id, us, n_2h,
      |       CAST(sum_2h_c AS DOUBLE) / 100.0 AS sum_2h
      |FROM (SELECT user_id, event_id, epoch_us(ts) AS us,
      |             COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |                            RANGE BETWEEN 7200000000 PRECEDING
      |                            AND CURRENT ROW) AS n_2h,
      |             SUM(CAST(round(value * 100) AS BIGINT))
      |               OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |                     RANGE BETWEEN 7200000000 PRECEDING
      |                     AND CURRENT ROW) AS sum_2h_c
      |      FROM events)
      |ORDER BY user_id, event_id""".stripMargin

  /** Positional value functions — first/last/nth/lead over the per-user
    * time order, completing the window-function matrix (ranking in
    * `q_rank_funcs`, offsets in `q_lag_delta`, frames in `q_rolling_avg`/
    * `q_range_window`; these are the value-positional family). last_value
    * needs the explicit full-partition frame — the default frame stops at
    * CURRENT ROW, which silently returns the current row's value, a
    * classic window bug the oracle would catch but better to state.
    */
  private val valueFuncs: Q = (s, d) => {
    val ord = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, d)
      .withColumn("first_v", first(col("value")).over(ord))
      .withColumn("last_v", last(col("value")).over(full))
      .withColumn("second_v", nth_value(col("value"), 2).over(full))
      .withColumn("next_v", lead(col("value"), 1).over(ord))
      .select(col("user_id"), col("event_id"), col("first_v"), col("last_v"),
        coalesce(col("second_v"), lit(-1.0)).as("second_v"),
        coalesce(col("next_v"), lit(-1.0)).as("next_v"))
      .orderBy("user_id", "event_id")
  }

  private val valueFuncsSql =
    """SELECT user_id, event_id,
      |       first_value(value) OVER w1 AS first_v,
      |       last_value(value) OVER w2 AS last_v,
      |       coalesce(nth_value(value, 2) OVER w2, -1.0) AS second_v,
      |       coalesce(lead(value, 1) OVER w1, -1.0) AS next_v
      |FROM events
      |WINDOW w1 AS (PARTITION BY user_id ORDER BY ts, event_id),
      |       w2 AS (PARTITION BY user_id ORDER BY ts, event_id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY user_id, event_id""".stripMargin

  /** Lag extension — per-user successive-difference series (the analytic
    * twin of the reference's batch-size deltas over time,
    * src/streamlit_app.py:644-655).
    */
  private val lagDelta: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    Tables.events(s, d)
      .withColumn("delta", Num.roundAt(col("value") - lag(col("value"), 1).over(w), 2))
      .select(
        col("user_id"), col("event_id"),
        coalesce(col("delta"), lit(0.0)).as("delta"))
      .orderBy("user_id", "event_id")
  }

  private val lagDeltaSql =
    """SELECT user_id, event_id,
      |       coalesce(floor((value - lag(value, 1)
      |                OVER (PARTITION BY user_id ORDER BY ts, event_id))
      |                * 100 + 0.5) / 100.0, 0.0) AS delta
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** Sessionization (gaps-and-islands) — 30-minute-gap sessions per user,
    * the batch twin of event-time session windows (extension over the
    * reference's processing-time-only streaming, SURVEY.md §2.8 T10).
    */
  private val sessionGap: Q = (s, d) => {
    val byUs = Window.partitionBy("user_id").orderBy(asc("us"), asc("event_id"))
    val gapUs = 1800L * 1000000L
    Tables.events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .select("user_id", "event_id", "us")
      .withColumn(
        "new_s",
        when(
          lag(col("us"), 1).over(byUs).isNull ||
            col("us") - lag(col("us"), 1).over(byUs) > gapUs, lit(1))
          .otherwise(lit(0)))
      .withColumn(
        "session_id",
        sum(col("new_s")).over(
          Window.partitionBy("user_id").orderBy(asc("us"), asc("event_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        floor((max(col("us")) - min(col("us"))) / lit(1000000.0)).cast("long").as("span_s"))
      .orderBy("user_id", "session_id")
  }

  private val sessionGapSql =
    """WITH x AS (
      |  -- order by micro-TRUNCATED ts (epoch_ns // 1000), not native nano ts:
      |  -- Spark's parquet reader only sees micros, so events equal at micro
      |  -- precision must tie-break on event_id in BOTH engines identically.
      |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us,
      |         CASE WHEN lag(epoch_ns(ts) // 1000, 1)
      |                     OVER (PARTITION BY user_id
      |                           ORDER BY epoch_ns(ts) // 1000, event_id) IS NULL
      |                OR epoch_ns(ts) // 1000 - lag(epoch_ns(ts) // 1000, 1)
      |                     OVER (PARTITION BY user_id
      |                           ORDER BY epoch_ns(ts) // 1000, event_id) > 1800000000
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |y AS (
      |  -- CAST: DuckDB window SUM(BIGINT) yields HUGEINT, which lands as
      |  -- float64 in the driver's pandas compare while Spark writes int64 —
      |  -- numerically equal values then hash differently (the r03/r04 red
      |  -- cell). Force BIGINT so both sides carry identical dtypes.
      |  SELECT user_id, us,
      |         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM x)
      |SELECT user_id, session_id, count(*) AS n_events,
      |       CAST(floor((max(us) - min(us)) / 1000000.0) AS BIGINT) AS span_s
      |FROM y GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** W5 scale twin — grouped top-k via a bounded-heap typed
    * [[graft.functions.TopKByScore]] aggregator instead of a ranking
    * window. The window formulation ([[topnPerGroup]]) shuffles EVERY
    * row to its group and sorts it; this one keeps ≤ k rows of state per
    * group per map task, so the exchange carries k·groups·tasks rows no
    * matter how big the input — the shape that survives 100 TB when the
    * group count is small (here: 5 event types). Same answer as the
    * window (BloomSpec pins ObjectHashAggregate partial+final, no Window).
    */
  private val topkHeap: Q = (s, d) => {
    import s.implicits._
    val k = 5
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("value"), col("event_id"))
      .as[(String, Double, Long)]
    ev.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new graft.functions.TopKByScore(k).toColumn.name("top"))
      .flatMap { case (tpe, top) =>
        top.iterator.zipWithIndex.map { case ((v, eid), i) => (tpe, i + 1, eid, v) }
      }
      .toDF("event_type", "rn", "event_id", "value")
      .orderBy("event_type", "rn")
  }

  private val topkHeapSql =
    """SELECT event_type, rn, event_id, value
      |FROM (SELECT event_type, event_id, value,
      |             row_number() OVER (PARTITION BY event_type
      |                                ORDER BY value DESC, event_id) AS rn
      |      FROM events)
      |WHERE rn <= 5 ORDER BY event_type, rn""".stripMargin

  /** SCD2 history materialization from an event changelog — the warehouse
    * operation that turns "every observation of a user's tier" into
    * versioned validity intervals: consecutive observations of the SAME
    * tier are compressed away, each surviving change opens an interval
    * `[valid_from, valid_to)` that the NEXT change closes, and the open
    * row carries the conventional 9999-12-31 sentinel (no NULLs — a
    * nullable int64 column decays to float64 in pandas-side compares,
    * the r03/r04 dtype lesson). A training pipeline uses exactly this to
    * ask "which tier was this user in when the example was generated"
    * via an as-of/range join against `valid_from_us ≤ t < valid_to_us`
    * (the join itself is `q_asof_join`/`q_range_join`).
    *
    * Scale shape: ONE shuffle total. All three window passes (change
    * detection, versioning, interval close) share the same partitioning
    * and ordering, so Catalyst plans a single Exchange(user_id) + Sort
    * with the windows and the compression filter stacked on top — the
    * filter between them preserves partitioning. State per key is one
    * row of look-back (lag/lead), never the user's history.
    *
    * The tier formula and the open-end sentinel are shared constants
    * driving BOTH engines, so the change predicate cannot diverge.
    */
  private val scd2Lo = 20.0
  private val scd2Hi = 60.0
  private val scd2OpenEndUs = 253402300799000000L // 9999-12-31T23:59:59Z, micros

  private def scd2Tier = // Column twin of scd2TierSql
    when(col("value") < scd2Lo, lit("low"))
      .when(col("value") < scd2Hi, lit("mid"))
      .otherwise(lit("high"))

  private def scd2TierSql =
    s"CASE WHEN value < $scd2Lo THEN 'low' WHEN value < $scd2Hi THEN 'mid' ELSE 'high' END"

  /** The production history frame — ONE definition consumed by the
    * registry query below AND the point-in-time join ([[scd2AsofQ]]). */
  private[graft] def scd2History(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(asc("us"), asc("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), scd2Tier.as("tier"))
      .withColumn("prev", lag(col("tier"), 1).over(byUser))
      .filter(col("prev").isNull || col("prev") =!= col("tier"))
      .drop("prev")
      .withColumn("version", row_number().over(byUser))
      .withColumn("valid_to_us",
        coalesce(lead(col("us"), 1).over(byUser), lit(scd2OpenEndUs)))
      .select(col("user_id"), col("version"), col("tier"),
        col("us").as("valid_from_us"), col("valid_to_us"),
        (col("valid_to_us") === lit(scd2OpenEndUs)).cast("int").as("is_current"))
  }

  private val scd2Q: Q = (s, d) =>
    scd2History(s, d).orderBy("user_id", "version")

  /** The SQL twin of [[scd2History]] as a WITH-clause body (`scd2` is the
    * final relation) — shared by both oracles so the two engines' history
    * definitions cannot diverge from each other either. */
  private def scd2HistoryCteSql =
    s"""t AS (
       |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us,
       |         $scd2TierSql AS tier
       |  FROM events),
       |c AS (
       |  SELECT user_id, event_id, us, tier,
       |         lag(tier, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
       |  FROM t),
       |k AS (SELECT user_id, event_id, us, tier FROM c
       |      WHERE prev IS NULL OR prev <> tier),
       |scd2 AS (
       |  SELECT user_id,
       |         row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS version,
       |         tier, us AS valid_from_us,
       |         coalesce(lead(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id),
       |                  $scd2OpenEndUs) AS valid_to_us
       |  FROM k)""".stripMargin

  private def scd2Sql =
    s"""WITH $scd2HistoryCteSql
       |SELECT user_id, version, tier, valid_from_us, valid_to_us,
       |       CAST(valid_to_us = $scd2OpenEndUs AS INT) AS is_current
       |FROM scd2 ORDER BY user_id, version""".stripMargin

  /** Point-in-time (as-of) consumption of the SCD2 dimension: attribute
    * every event to the tier its user was in WHEN THE EVENT HAPPENED —
    * the lookup that makes training features leakage-free (using today's
    * tier for last month's example is temporal leakage; this join is how
    * a pipeline avoids it). Semantics: equi-join on user_id plus the
    * half-open interval predicate `valid_from ≤ t < valid_to`; because
    * the intervals tile each user's timeline from their first observation,
    * every event matches EXACTLY one version — asserted in the spec and
    * visible in the oracle (count equals the events table).
    *
    * Scale shape: the equi key carries the join (one shuffle of each side
    * on user_id — and the compressed history is orders of magnitude
    * smaller than the fact side at corpus scale, so it broadcasts when it
    * fits); the interval predicate rides along as a join residual, never
    * a range-only join. The per-(tier, event_type) rollup is the usual
    * partial+final hash aggregate with exact cent sums.
    */
  private val scd2AsofQ: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), Num.cents(col("value")).as("cents"))
    val h = scd2History(s, d)
      .select(col("user_id"), col("tier"), col("valid_from_us"), col("valid_to_us"))
    ev.join(h,
        ev("user_id") === h("user_id") &&
          h("valid_from_us") <= ev("us") && ev("us") < h("valid_to_us"))
      .groupBy("tier", "event_type")
      .agg(count(lit(1)).as("n"), Num.dollars(sum(col("cents"))).as("sum_value"))
      .orderBy("tier", "event_type")
  }

  private def scd2AsofSql =
    s"""WITH $scd2HistoryCteSql
       |SELECT h.tier, e.event_type, count(*) AS n,
       |       CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
       |FROM (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_type, value
       |      FROM events) e
       |JOIN scd2 h
       |  ON e.user_id = h.user_id
       | AND h.valid_from_us <= e.us AND e.us < h.valid_to_us
       |GROUP BY h.tier, e.event_type
       |ORDER BY h.tier, e.event_type""".stripMargin

  /** Calendar resampling with gap fill — the dense-grid builder behind
    * per-entity time-series features: a user×day spine spanning the
    * corpus's observed day range, daily activity left-joined onto it,
    * missing days ZERO-filled for additive measures (count, exact cent
    * sums → running totals stay exact), and the last observed categorical
    * FORWARD-filled (`last(…, ignoreNulls)` over the day order; 'none'
    * before first observation). Training pipelines need this shape
    * because models read fixed-length windows, not sparse logs.
    *
    * Scale shape: the spine is |entities| × |days| — generated, never
    * shuffled raw (day bounds arrive as a 1-row broadcast; `sequence`
    * explodes map-side). The join is keyed (user_id, day) against the
    * pre-aggregated daily rollup — the fact table collapses BEFORE the
    * spine join, so the spine join's big side is |entities|×|days| rows
    * of integers, not events. Fill windows partition per entity and
    * carry one value of state. The user_id < 10 subset keeps the
    * registry output bounded; the operator itself takes any entity set.
    *
    * The categorical rollup is DICTIONARY-CODED (the r8 plan audit's one
    * SortAggregate, closed): `max(event_type)` over a STRING carries an
    * immutable aggregation buffer that drops the rollup out of
    * HashAggregate, so the tiny type domain is first ranked into an
    * order-preserving integer code (code k ⇔ k-th smallest string — a
    * window over |types| rows), broadcast onto the fact rows, maxed as a
    * LONG inside the codegen hash aggregate, and decoded by a second
    * broadcast join against the same dictionary AFTER the collapse — the
    * exact `ml_string_indexer` move, applied where the plan needed it.
    * Result is bit-identical (max over an order-preserving code is the
    * max string); the oracle keeps the direct string max.
    */
  private val resampleFfillQ: Q = (s, d) => {
    val ev = Tables.events(s, d).select(
      col("user_id"),
      expr("unix_micros(ts) div 86400000000").as("day"),
      Num.cents(col("value")).as("cents"),
      col("event_type"))
    val dict = ev.select("event_type").distinct()
      .withColumn("code", row_number().over(Window.orderBy(asc("event_type"))))
    val daily = ev.filter(col("user_id") < 10)
      .join(broadcast(dict), Seq("event_type"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n"), sum("cents").as("day_cents"),
        max("code").as("seen_code"))
      .join(broadcast(dict.select(col("code").as("seen_code"),
        col("event_type").as("seen_type"))), Seq("seen_code"))
      .drop("seen_code")
    val bounds = ev.agg(min("day").as("lo"), max("day").as("hi"))
    val spine = ev.select("user_id").filter(col("user_id") < 10).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("user_id"), explode(sequence(col("lo"), col("hi"))).as("day"))
    val w = Window.partitionBy("user_id").orderBy(asc("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("day_cents"), lit(0L)).as("day_cents"),
        col("seen_type"))
      .withColumn("cum_cents", sum("day_cents").over(w))
      .withColumn("last_seen_type",
        coalesce(last(col("seen_type"), ignoreNulls = true).over(w), lit("none")))
      .select(col("user_id"), col("day"), col("n"),
        Num.dollars(col("day_cents")).as("day_value"),
        Num.dollars(col("cum_cents")).as("cum_value"),
        col("last_seen_type"))
      .orderBy("user_id", "day")
  }

  private val resampleFfillSql =
    """WITH ev AS (
      |  SELECT user_id, (epoch_ns(ts) // 1000) // 86400000000 AS day,
      |         CAST(round(value * 100) AS BIGINT) AS cents, event_type
      |  FROM events),
      |daily AS (
      |  SELECT user_id, day, CAST(count(*) AS BIGINT) AS n,
      |         CAST(SUM(cents) AS BIGINT) AS day_cents,
      |         max(event_type) AS seen_type
      |  FROM ev WHERE user_id < 10 GROUP BY user_id, day),
      |days AS (SELECT unnest(generate_series((SELECT min(day) FROM ev),
      |                                       (SELECT max(day) FROM ev))) AS day),
      |u AS (SELECT DISTINCT user_id FROM ev WHERE user_id < 10),
      |j AS (
      |  SELECT s.user_id, s.day,
      |         CAST(coalesce(d.n, 0) AS BIGINT) AS n,
      |         CAST(coalesce(d.day_cents, 0) AS BIGINT) AS day_cents,
      |         d.seen_type
      |  FROM (SELECT user_id, day FROM u, days) s
      |  LEFT JOIN daily d USING (user_id, day)),
      |f AS (
      |  SELECT user_id, day, n, day_cents,
      |         CAST(SUM(day_cents) OVER (PARTITION BY user_id ORDER BY day
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents,
      |         coalesce(last_value(seen_type IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY day
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 'none') AS last_seen_type
      |  FROM j)
      |SELECT user_id, day, n, CAST(day_cents AS DOUBLE) / 100.0 AS day_value,
      |       CAST(cum_cents AS DOUBLE) / 100.0 AS cum_value, last_seen_type
      |FROM f ORDER BY user_id, day""".stripMargin

  /** Strictly-ordered conversion funnel — signup → click → purchase where
    * each step must happen AFTER the previous one (an out-of-order click
    * does not count), the semantics product-analytics "funnel" tools
    * implement and a naive per-type min-timestamp join gets wrong.
    * Steps are chained conditional window minima over ONE user partition:
    * t1 = min(signup time), t2 = min(click time > t1), t3 = min(purchase
    * time > t2) — each references the previous column, so Catalyst stacks
    * all three Window operators on a single Exchange(user_id), and per-user
    * state is three longs. The output is the funnel report: users entering
    * each stage plus floor-rounded conversion fractions.
    */
  /** TIMED funnel — the product-analytics standard the strict-order
    * funnel (◆ `q_funnel_steps`) doesn't ask: each step must land
    * within [[funnelWindowUs]] of the previous one ("click within 48 h of
    * signup, purchase within 48 h of that click"), so a conversion that
    * straggles past the window stops counting — the funnel measures the
    * FLOW, not eventual reachability. Same plan discipline as the
    * untimed form: chained conditional window minima on ONE
    * user-keyed exchange, the deadline as an extra integral conjunct
    * (us ≤ t_prev + W) in each step's CASE — no extra pass, no join.
    * Reported next to the untimed counts so the gap IS the
    * slow-conversion mass (spec pins timed ≤ untimed per step).
    */
  private val funnelWindowUs = 48L * 3600L * 1000000L

  private val funnelWindowQ: Q = (s, d) => {
    val w = Window.partitionBy("user_id")
    val W = funnelWindowUs
    val stepped = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("t1", min(when(col("event_type") === "signup", col("us"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" &&
        col("us") > col("t1") && col("us") <= col("t1") + W,
        col("us"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" &&
        col("us") > col("t2") && col("us") <= col("t2") + W,
        col("us"))).over(w))
      .withColumn("a2", min(when(col("event_type") === "click" && col("us") > col("t1"),
        col("us"))).over(w))
      .groupBy("user_id")
      .agg(min("t1").as("t1"), min("t2").as("t2"), min("t3").as("t3"),
        min("a2").as("a2"))
    stepped.agg(
        sum(col("t1").isNotNull.cast("long")).as("n_signup"),
        sum(col("t2").isNotNull.cast("long")).as("n_click_w"),
        sum(col("t3").isNotNull.cast("long")).as("n_purchase_w"),
        sum(col("a2").isNotNull.cast("long")).as("n_click_any"))
      .select(col("n_signup"), col("n_click_w"), col("n_purchase_w"),
        col("n_click_any"),
        (col("n_click_any") - col("n_click_w")).as("n_click_slow"),
        Num.round4(col("n_click_w").cast("double") / col("n_signup"))
          .as("conv_click_w"),
        Num.round4(col("n_purchase_w").cast("double") / col("n_click_w"))
          .as("conv_purchase_w"))
  }

  private val funnelWindowSql = {
    val W = funnelWindowUs
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events),
       |s1 AS (
       |  SELECT *, min(CASE WHEN event_type = 'signup' THEN us END)
       |              OVER (PARTITION BY user_id) AS t1 FROM e),
       |s2 AS (
       |  SELECT *, min(CASE WHEN event_type = 'click' AND us > t1
       |                      AND us <= t1 + $W THEN us END)
       |              OVER (PARTITION BY user_id) AS t2,
       |            min(CASE WHEN event_type = 'click' AND us > t1 THEN us END)
       |              OVER (PARTITION BY user_id) AS a2 FROM s1),
       |s3 AS (
       |  SELECT *, min(CASE WHEN event_type = 'purchase' AND us > t2
       |                      AND us <= t2 + $W THEN us END)
       |              OVER (PARTITION BY user_id) AS t3 FROM s2),
       |u AS (SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3,
       |             min(a2) AS a2
       |      FROM s3 GROUP BY user_id),
       |f AS (
       |  SELECT CAST(SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       |         CAST(SUM(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_click_w,
       |         CAST(SUM(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_w,
       |         CAST(SUM(CASE WHEN a2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_click_any
       |  FROM u)
       |SELECT n_signup, n_click_w, n_purchase_w, n_click_any,
       |       n_click_any - n_click_w AS n_click_slow,
       |       floor(CAST(n_click_w AS DOUBLE) / n_signup * 10000.0 + 0.5) / 10000.0
       |         AS conv_click_w,
       |       floor(CAST(n_purchase_w AS DOUBLE) / n_click_w * 10000.0 + 0.5) / 10000.0
       |         AS conv_purchase_w
       |FROM f""".stripMargin
  }

  private val funnelStepsQ: Q = (s, d) => {
    val w = Window.partitionBy("user_id")
    val stepped = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("t1", min(when(col("event_type") === "signup", col("us"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" && col("us") > col("t1"),
        col("us"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" && col("us") > col("t2"),
        col("us"))).over(w))
      .groupBy("user_id")
      .agg(min("t1").as("t1"), min("t2").as("t2"), min("t3").as("t3"))
    stepped.agg(
        sum(col("t1").isNotNull.cast("long")).as("n_signup"),
        sum(col("t2").isNotNull.cast("long")).as("n_click_after"),
        sum(col("t3").isNotNull.cast("long")).as("n_purchase_after"))
      .select(col("n_signup"), col("n_click_after"), col("n_purchase_after"),
        Num.round4(col("n_click_after").cast("double") / col("n_signup"))
          .as("conv_click"),
        Num.round4(col("n_purchase_after").cast("double") / col("n_click_after"))
          .as("conv_purchase"))
  }

  private val funnelStepsSql =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events),
      |s1 AS (
      |  SELECT *, min(CASE WHEN event_type = 'signup' THEN us END)
      |              OVER (PARTITION BY user_id) AS t1 FROM e),
      |s2 AS (
      |  SELECT *, min(CASE WHEN event_type = 'click' AND us > t1 THEN us END)
      |              OVER (PARTITION BY user_id) AS t2 FROM s1),
      |s3 AS (
      |  SELECT *, min(CASE WHEN event_type = 'purchase' AND us > t2 THEN us END)
      |              OVER (PARTITION BY user_id) AS t3 FROM s2),
      |u AS (SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
      |      FROM s3 GROUP BY user_id),
      |f AS (
      |  SELECT CAST(SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
      |         CAST(SUM(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_click_after,
      |         CAST(SUM(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_after
      |  FROM u)
      |SELECT n_signup, n_click_after, n_purchase_after,
      |       floor(CAST(n_click_after AS DOUBLE) / n_signup * 10000.0 + 0.5) / 10000.0
      |         AS conv_click,
      |       floor(CAST(n_purchase_after AS DOUBLE) / n_click_after * 10000.0 + 0.5) / 10000.0
      |         AS conv_purchase
      |FROM f""".stripMargin

  /** Event-transition (Markov) matrix — counts of consecutive event-type
    * pairs per user timeline, with row-normalized probabilities: the
    * first-order behavior model (and, over token streams, exactly the
    * bigram transition table a corpus language model starts from).
    * `lag` over the per-user time order rides the SAME single
    * Exchange(user_id) shape as the other sequence operators; the pair
    * aggregate then runs on |types|² keys.
    */
  private val transitionsQ: Q = (s, d) => {
    val byUser = Window.partitionBy("user_id").orderBy(asc("us"), asc("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        Num.round4(col("n").cast("double") /
          sum("n").over(Window.partitionBy("from_type"))))
      .orderBy("from_type", "to_type")
  }

  private val transitionsSql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS us
      |  FROM events),
      |p AS (
      |  SELECT event_type AS to_type,
      |         lag(event_type, 1) OVER (PARTITION BY user_id
      |                                  ORDER BY us, event_id) AS from_type
      |  FROM e),
      |m AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |      FROM p WHERE from_type IS NOT NULL GROUP BY from_type, to_type)
      |SELECT from_type, to_type, n,
      |       floor(CAST(n AS DOUBLE)
      |             / CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
      |             * 10000.0 + 0.5) / 10000.0 AS p
      |FROM m ORDER BY from_type, to_type""".stripMargin

  /** First/last-touch conversion attribution — which entry event and
    * which final nudge precede a user's FIRST purchase. The reference's
    * domain (interaction logs feeding a recommender) asks exactly this
    * of its playlists/sessions; the pattern completes the behavioral
    * suite (funnel = does the path complete; transitions = local
    * dynamics; attribution = credit assignment at the endpoints).
    *
    * Deterministic by total tiebreak: "first purchase" and both touches
    * order by (event-time, event_id), so same-microsecond events
    * resolve identically in both engines. Users whose first purchase
    * has no prior events attribute to ('none', 'none') — the LEFT join
    * keeps them, the (first, last) grid cannot silently drop converts.
    *
    * Scale shape: every pass keys on user_id, so over the STANDING
    * LAYOUT — events bucketed on user_id ([[graft.sources.Bucketed]]) —
    * the whole composition runs with ZERO data exchanges
    * (WarehouseSpec pins exactly that, running [[attributionFrom]] over
    * a user-bucketed table); over raw fixture parquet each filtered
    * pass shuffles its own pruned subset, which AQE then broadcasts at
    * aggregate-output sizes. Every argmin/argmax runs as a CODEGEN
    * HASH aggregate — `min(struct(us, eid, type))` would be the obvious
    * one-liner, but struct buffers are immutable and force
    * SortAggregate (the exact shape `ml_cluster_serve` converted away);
    * its packed-long trick doesn't apply either, because (epoch-micros,
    * event-id) exceeds 63 bits at production spans. The struct-free
    * general form: CHAIN the tiebreak — min/max the time first, then
    * min/max the id among time-ties (conditional aggregate over the
    * same user-keyed exchange), then resolve the winning row's payload
    * with a co-partitioned self-join. Long-only buffers end to end; the
    * final (first, last) rollup is a |types|²-row grid. No windows at
    * all — attribution is pure aggregation, nothing is partition-bound.
    */
  /** The attribution composition over any (user_id, us, eid,
    * event_type) change set — shared by the registry query (fixture
    * parquet) and WarehouseSpec's zero-exchange run over a
    * user-bucketed table.
    */
  private[graft] def attributionFrom(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // first-purchase key: argmin over (us, eid) as two chained long aggs
    val fp = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min("us").as("pus"))
    val fpk = ev.filter(col("event_type") === "purchase")
      .join(fp, Seq("user_id")).filter(col("us") === col("pus"))
      .groupBy("user_id").agg(min("us").as("pus"), min("eid").as("peid"))
    val pre = ev.join(fpk, Seq("user_id"))
      .filter(col("us") < col("pus") ||
        (col("us") === col("pus") && col("eid") < col("peid")))
      .select("user_id", "us", "eid", "event_type")
    // touch keys: endpoint times, then ids among time-ties, one pass each
    val times = pre.groupBy("user_id")
      .agg(min("us").as("fus"), max("us").as("lus"))
    val keys = pre.join(times, Seq("user_id"))
      .groupBy("user_id").agg(
        min("fus").as("fus"), max("lus").as("lus"),
        min(when(col("us") === col("fus"), col("eid"))).as("feid"),
        max(when(col("us") === col("lus"), col("eid"))).as("leid"))
    // resolve payloads by key — co-partitioned equi-joins, no aggregate
    // ever buffers a string
    val ft = pre.join(keys.select(col("user_id"),
        col("fus").as("us"), col("feid").as("eid")),
      Seq("user_id", "us", "eid"))
      .select(col("user_id"), col("event_type").as("first_touch"))
    val lt = pre.join(keys.select(col("user_id"),
        col("lus").as("us"), col("leid").as("eid")),
      Seq("user_id", "us", "eid"))
      .select(col("user_id"), col("event_type").as("last_touch"))
    fpk.join(ft, Seq("user_id"), "left").join(lt, Seq("user_id"), "left")
      .select(coalesce(col("first_touch"), lit("none")).as("first_touch"),
        coalesce(col("last_touch"), lit("none")).as("last_touch"))
      .groupBy("first_touch", "last_touch")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("first_touch", "last_touch")
  }

  private val attributionQ: Q = (s, d) =>
    attributionFrom(Tables.events(s, d).select(col("user_id"),
      unix_micros(col("ts")).as("us"), col("event_id").as("eid"),
      col("event_type")))

  private val attributionSql =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id AS eid, event_type
      |  FROM events),
      |fp AS (
      |  SELECT user_id, us AS pus, eid AS peid FROM (
      |    SELECT user_id, us, eid,
      |           row_number() OVER (PARTITION BY user_id
      |                              ORDER BY us, eid) AS rn
      |    FROM ev WHERE event_type = 'purchase') WHERE rn = 1),
      |pre AS (
      |  SELECT e.user_id, e.us, e.eid, e.event_type
      |  FROM ev e JOIN fp ON e.user_id = fp.user_id
      |  WHERE e.us < fp.pus OR (e.us = fp.pus AND e.eid < fp.peid)),
      |t AS (
      |  SELECT user_id, event_type,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY us, eid) AS rn_a,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY us DESC, eid DESC) AS rn_d
      |  FROM pre),
      |ft AS (SELECT user_id, event_type AS first_touch FROM t WHERE rn_a = 1),
      |lt AS (SELECT user_id, event_type AS last_touch FROM t WHERE rn_d = 1)
      |SELECT coalesce(first_touch, 'none') AS first_touch,
      |       coalesce(last_touch, 'none') AS last_touch,
      |       CAST(count(*) AS BIGINT) AS n_users
      |FROM fp LEFT JOIN ft USING (user_id) LEFT JOIN lt USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Calendar resample with LINEAR interpolation — the numeric
    * companion to ◆ `q_resample_ffill`'s categorical forward-fill: each
    * user's daily spend on missing spine days is interpolated between
    * the neighboring observed days. The interpolation is EXACT integer
    * arithmetic in the symmetric form
    * `(vp·(dn−d) + vn·(d−dp)) div (dn−dp)` — every term non-negative
    * (cents ≥ 0, dp < d < dn), so Spark's truncating `div` and the
    * oracle's flooring `//` agree; the naive `vp + Δv·…` form would put
    * a possibly-negative product under the division and the two
    * engines' rounding conventions apart. Rows outside a user's
    * observed range have no second anchor and stay null (`kind =
    * 'edge'`), distinguished from observed (`'obs'`) and interpolated
    * (`'interp'`) rows so the grid never silently invents data.
    *
    * Scale shape: the spine is |users|·|days| grid rows (never events);
    * both anchor passes are frame-bounded windows PARTITIONED BY the
    * user key — nothing here funnels through one task at any
    * cardinality, unlike a global as-of join against the observation
    * set.
    */
  private val resampleInterpQ: Q = (s, d) => {
    val evAll = Tables.events(s, d).select(
      expr("unix_micros(ts) div 86400000000").as("day"),
      col("user_id"), Num.cents(col("value")).as("cents"))
    val bounds = evAll.agg(min("day").as("lo"), max("day").as("hi"))
    val daily = evAll.filter(col("user_id") < 10)
      .groupBy("user_id", "day").agg(sum("cents").as("vc"))
    val spine = daily.select("user_id").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"))).as("day"))
    val wPrev = Window.partitionBy("user_id").orderBy(asc("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("user_id").orderBy(asc("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(daily, Seq("user_id", "day"), "left")
      .withColumn("dp",
        last(when(col("vc").isNotNull, col("day")), ignoreNulls = true)
          .over(wPrev))
      .withColumn("vp", last(col("vc"), ignoreNulls = true).over(wPrev))
      .withColumn("dn",
        first(when(col("vc").isNotNull, col("day")), ignoreNulls = true)
          .over(wNext))
      .withColumn("vn", first(col("vc"), ignoreNulls = true).over(wNext))
      .select(col("user_id"), col("day"),
        when(col("vc").isNotNull, lit("obs"))
          .when(col("dp").isNull || col("dn").isNull, lit("edge"))
          .otherwise(lit("interp")).as("kind"),
        coalesce(col("vc"),
          when(col("dp").isNotNull && col("dn").isNotNull,
            call_function("div",
              col("vp") * (col("dn") - col("day")) +
                col("vn") * (col("day") - col("dp")),
              col("dn") - col("dp")))).as("cents_filled"))
      .orderBy("user_id", "day")
  }

  private val resampleInterpSql =
    """WITH ev AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day, user_id,
      |         CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |b AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
      |daily AS (
      |  SELECT user_id, day, CAST(SUM(cents) AS BIGINT) AS vc
      |  FROM ev WHERE user_id < 10 GROUP BY user_id, day),
      |spine AS (
      |  SELECT u.user_id, d.day
      |  FROM (SELECT DISTINCT user_id FROM daily) u,
      |       (SELECT unnest(generate_series(lo, hi)) AS day FROM b) d),
      |j AS (
      |  SELECT s.user_id, s.day, vc
      |  FROM spine s LEFT JOIN daily USING (user_id, day)),
      |w AS (
      |  SELECT user_id, day, vc,
      |    last_value(CASE WHEN vc IS NOT NULL THEN day END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY day
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dp,
      |    last_value(vc IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY day
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vp,
      |    first_value(CASE WHEN vc IS NOT NULL THEN day END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY day
      |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS dn,
      |    first_value(vc IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY day
      |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vn
      |  FROM j)
      |SELECT user_id, day,
      |       CASE WHEN vc IS NOT NULL THEN 'obs'
      |            WHEN dp IS NULL OR dn IS NULL THEN 'edge'
      |            ELSE 'interp' END AS kind,
      |       coalesce(vc, CASE WHEN dp IS NOT NULL AND dn IS NOT NULL
      |         THEN (vp * (dn - day) + vn * (day - dp)) // (dn - dp)
      |         END) AS cents_filled
      |FROM w ORDER BY user_id, day""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("q_resample_interp", resampleInterpQ, Some(resampleInterpSql)),
    Entry("q_attribution", attributionQ, Some(attributionSql)),
    Entry("q_funnel_steps", funnelStepsQ, Some(funnelStepsSql)),
    Entry("q_funnel_window", funnelWindowQ, Some(funnelWindowSql)),
    Entry("q_transitions", transitionsQ, Some(transitionsSql)),
    Entry("q_scd2_history", scd2Q, Some(scd2Sql)),
    Entry("q_scd2_asof", scd2AsofQ, Some(scd2AsofSql)),
    Entry("q_resample_ffill", resampleFfillQ, Some(resampleFfillSql)),
    Entry("q_topk_global", topkGlobal, Some(topkGlobalSql)),
    Entry("q_topn_per_group", topnPerGroup, Some(topnPerGroupSql)),
    Entry("q_topk_heap", topkHeap, Some(topkHeapSql)),
    Entry("q_pagination", pagination, Some(paginationSql)),
    Entry("q_rank_decay", rankDecay, Some(rankDecaySql)),
    Entry("q_rolling_avg", rollingAvg, Some(rollingAvgSql)),
    Entry("q_range_window", rangeWindow, Some(rangeWindowSql)),
    Entry("q_value_funcs", valueFuncs, Some(valueFuncsSql)),
    Entry("q_lag_delta", lagDelta, Some(lagDeltaSql)),
    Entry("q_session_gap", sessionGap, Some(sessionGapSql)),
  )
}
