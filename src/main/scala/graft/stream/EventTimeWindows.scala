package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Num

/** T10 — event-time windowed aggregations, shared by the batch oracle
  * queries ([[graft.queries.StreamingQueries]]) and the live streaming path.
  *
  * The reference has NO event-time semantics — its "windows" are wall-clock
  * count/timer flushes (SURVEY.md §2.8 T10) — so this is the engine's
  * scale-ready generalization: `window`/`session_window` aggregations whose
  * state is bounded by the watermark, not by racing the clock. Each
  * function takes a DataFrame with an event-time `ts` column and works
  * identically in batch mode (watermark is a no-op) and streaming mode
  * (watermark bounds state and admits append output) — one definition,
  * oracle-checked in batch, watermark-checked in [[graft.StreamSpec]].
  *
  * Scale notes: all three are hash aggregations shuffled by (window, key);
  * partial aggregation happens map-side, and streaming state per key is one
  * window row — the watermark evicts closed windows, so state size tracks
  * the number of OPEN windows × keys, independent of stream length.
  */
object EventTimeWindows {

  val Watermark = "2 days"

  /** Tumbling 1-day windows per event type: count + cent-exact value sum. */
  def tumblingDaily(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", Watermark)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        Num.dollars(sum(Num.cents(col("value")))).as("sum_value"))
      .select(
        to_date(col("w.start")).as("day"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Sliding 2-day windows advancing daily: every event lands in exactly
    * two windows.
    */
  def slidingTwoDay(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", Watermark)
      .groupBy(window(col("ts"), "2 days", "1 day").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(to_date(col("w.start")).as("wstart"), col("cnt"))

  /** Per-user session windows with a 1-hour inactivity gap. */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", Watermark)
      .groupBy(session_window(col("ts"), "1 hour").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        col("n_events"))
}
