package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Num
import graft.tables.Tables
import Registry.{Entry, Q}

/** Batch-form twins of the streaming surface (SURVEY.md §2.8).
  *
  * The reference's streaming is processing-time only (count/timer-triggered
  * micro-batches, no watermarks, T10); the engine adds the event-time
  * generalization — tumbling/sliding/session windows — which is what
  * actually scales: event-time windows are shuffle-by-key aggregations
  * whose state is bounded by the watermark, not by wall-clock racing. The
  * live Structured Streaming path lives in `graft.stream`
  * ([[graft.stream.Interactions]] rate source → foreachBatch sink,
  * [[graft.stream.Retrain]] file control loop) and is exercised by
  * `StreamSpec`; the window queries here call the SAME definitions
  * ([[graft.stream.EventTimeWindows]]) in batch form so the driver's
  * DuckDB oracle can check them.
  */
object StreamingQueries {

  /** Event-time tumbling window (1 day) per event type — `window(ts, "1 day")`
    * aligns to epoch days, identical to DuckDB's date_trunc. Definition
    * shared with the live streaming path ([[graft.stream.EventTimeWindows]]);
    * the watermark is a no-op in batch mode.
    */
  private val tumblingWindow: Q = (s, d) =>
    graft.stream.EventTimeWindows.tumblingDaily(Tables.events(s, d))
      .orderBy("day", "event_type")

  private val tumblingWindowSql =
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
      |       count(*) AS cnt,
      |       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
      |FROM events GROUP BY day, event_type ORDER BY day, event_type""".stripMargin

  /** Event-time sliding window (2 days, sliding 1 day): every event lands in
    * exactly two windows — [d-1, d+1) and [d, d+2) for d = its day.
    */
  private val slidingWindow: Q = (s, d) =>
    graft.stream.EventTimeWindows.slidingTwoDay(Tables.events(s, d))
      .orderBy("wstart")

  private val slidingWindowSql =
    """SELECT CAST(t AS DATE) AS wstart, count(*) AS cnt
      |FROM (SELECT unnest([date_trunc('day', ts) - INTERVAL 1 DAY,
      |                     date_trunc('day', ts)]) AS t
      |      FROM events)
      |GROUP BY wstart ORDER BY wstart""".stripMargin

  /** Event-time session window (1-hour gap) per user via Spark's native
    * `session_window`; the DuckDB twin is the classic gaps-and-islands
    * rewrite. A new session starts when the gap is >= the timeout (Spark
    * merges only strictly-overlapping [ts, ts+gap) windows).
    */
  private val sessionWindow: Q = (s, d) =>
    graft.stream.EventTimeWindows.userSessions(Tables.events(s, d))
      .orderBy("user_id", "start_us")

  private val sessionWindowSql =
    """WITH x AS (
      |  SELECT user_id, epoch_us(ts) AS us,
      |         CASE WHEN lag(epoch_us(ts), 1)
      |                     OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |                OR epoch_us(ts) - lag(epoch_us(ts), 1)
      |                     OVER (PARTITION BY user_id ORDER BY ts, event_id) >= 3600000000
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |y AS (
      |  SELECT user_id, us,
      |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
      |                          ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM x)
      |SELECT user_id, min(us) AS start_us, count(*) AS n_events
      |FROM y GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin

  /** T4 — the per-micro-batch analytics summary (size, distinct users, avg
    * rating, top action) the reference computes for every 50-event batch
    * (reference: src/streaming_service.py:306-354, batch size at :24).
    * Batch id reproduces the count-trigger: floor(event_id / 50).
    */
  private val batchSummary: Q = (s, d) => {
    val ev = Tables.events(s, d).withColumn("batch_id", expr("event_id div 50"))
    val stats = ev.groupBy("batch_id").agg(
      count(lit(1)).as("size"),
      countDistinct(col("user_id")).as("unique_users"),
      Num.roundAt(sum(Num.cents(col("value"))) / lit(100.0) / count(lit(1)), 4).as("avg_value"))
    val top = ev.groupBy("batch_id", "event_type")
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("batch_id").orderBy(desc("c"), asc("event_type"))))
      .filter(col("rn") === 1)
      .select(col("batch_id"), col("event_type").as("top_action"))
    stats.join(top, Seq("batch_id")).orderBy("batch_id")
  }

  private val batchSummarySql =
    """WITH ev AS (SELECT *, event_id // 50 AS batch_id FROM events),
      |stats AS (
      |  SELECT batch_id, count(*) AS size,
      |         count(DISTINCT user_id) AS unique_users,
      |         floor((CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*)) * 10000 + 0.5) / 10000.0 AS avg_value
      |  FROM ev GROUP BY batch_id),
      |top AS (
      |  SELECT batch_id, event_type AS top_action
      |  FROM (SELECT batch_id, event_type, count(*) AS c,
      |               row_number() OVER (PARTITION BY batch_id
      |                                  ORDER BY count(*) DESC, event_type) AS rn
      |        FROM ev GROUP BY batch_id, event_type)
      |  WHERE rn = 1)
      |SELECT stats.batch_id, size, unique_users, avg_value, top_action
      |FROM stats JOIN top ON stats.batch_id = top.batch_id
      |ORDER BY stats.batch_id""".stripMargin

  /** Stream-stream interval join, batch twin: a purchase "responds to" a
    * view by the same user within 2 hours. Calls the SAME definition as the
    * live path ([[graft.stream.Joins.intervalJoin]] — the watermark node is
    * eliminated in batch), so the driver's DuckDB hash gate checks the join
    * semantics that StreamSpec proves under streaming state/watermarks.
    * Timestamps are emitted as epoch MICROS and the oracle compares in
    * epoch_us arithmetic: events.parquet carries sub-microsecond parts, so
    * a `ts + INTERVAL` comparison in DuckDB (ns) could admit/drop boundary
    * pairs differently than Spark (µs).
    */
  private val intervalJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val views = ev.filter(col("event_type") === lit("view"))
      .select(col("user_id"), col("event_id").as("trigger_id"), col("ts").as("lts"))
    val purchases = ev.filter(col("event_type") === lit("purchase"))
      .select(col("user_id"), col("event_id").as("response_id"), col("ts").as("rts"))
    graft.stream.Joins.intervalJoin(views, "lts", purchases, "rts",
        "user_id", "1 hour", "2 hours")
      .select(col("user_id"), col("trigger_id"), col("response_id"),
        unix_micros(col("lts")).as("trigger_us"),
        unix_micros(col("rts")).as("response_us"))
      .orderBy("trigger_id", "response_id")
  }

  private val intervalJoinSql =
    """SELECT l.user_id, l.event_id AS trigger_id, r.event_id AS response_id,
      |       epoch_us(l.ts) AS trigger_us, epoch_us(r.ts) AS response_us
      |FROM events l JOIN events r
      |  ON l.user_id = r.user_id
      | AND epoch_us(r.ts) >= epoch_us(l.ts)
      | AND epoch_us(r.ts) <= epoch_us(l.ts) + 7200000000
      |WHERE l.event_type = 'view' AND r.event_type = 'purchase'
      |ORDER BY trigger_id, response_id""".stripMargin

  /** Windowed trending top-k, batch twin of [[graft.stream.TopK.dailyTopK]]
    * (same definition object, like the T10 windows): per day per event
    * type, the top-3 events by value. The oracle states the SEMANTICS as a
    * ranking window; the engine computes it with the bounded-heap
    * aggregator so the same query is streamable with ≤ k rows of state per
    * open window×key — StreamSpec proves live ≡ this twin.
    */
  private val windowTopk: Q = (s, d) =>
    graft.stream.TopK.dailyTopK(Tables.events(s, d), 3)
      .orderBy("day", "event_type", "rn")

  private val windowTopkSql =
    """SELECT day, event_type, rn, event_id, value
      |FROM (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |             event_type, event_id, value,
      |             row_number() OVER (
      |               PARTITION BY CAST(date_trunc('day', ts) AS DATE), event_type
      |               ORDER BY value DESC, event_id) AS rn
      |      FROM events)
      |WHERE rn <= 3 ORDER BY day, event_type, rn""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("q_tumbling_window", tumblingWindow, Some(tumblingWindowSql)),
    Entry("q_window_topk", windowTopk, Some(windowTopkSql)),
    Entry("q_interval_join", intervalJoin, Some(intervalJoinSql)),
    Entry("q_sliding_window", slidingWindow, Some(slidingWindowSql)),
    Entry("q_session_window", sessionWindow, Some(sessionWindowSql)),
    Entry("q_stream_batch_summary", batchSummary, Some(batchSummarySql)),
  )
}
