package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed trending top-k — ONE definition for the live stream and its
  * batch oracle twin (`q_window_topk`), following the
  * [[EventTimeWindows]] pattern.
  *
  * The ranking-window formulation of "top events per day per type" cannot
  * run on a stream at all (no `row_number` over unbounded input), and its
  * batch form shuffles every row. This composes the event-time window with
  * the bounded-heap [[graft.functions.TopKByScore]] aggregator instead:
  * partial aggregation keeps ≤ k (score, id) pairs per (window, key) per
  * map task, so the exchange — and in streaming, the STATE per open
  * window×key — is bounded at k entries regardless of stream length; the
  * watermark evicts closed windows. That pair of bounds is what makes a
  * trending query a permanent resident on an unbounded stream.
  */
object TopK {

  /** Per-day, per-event-type top-k (event_id, value) by value desc,
    * event_id asc. Works identically in batch (watermark is a no-op) and
    * streaming (append after watermark or complete) modes.
    */
  def dailyTopK(events: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new graft.functions.TopKByScore(k))
    events
      .withWatermark("ts", EventTimeWindows.Watermark)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(topk(col("value"), col("event_id")).as("top"))
      .select(to_date(col("w.start")).as("day"), col("event_type"),
        posexplode(col("top")))
      .select(col("day"), col("event_type"), (col("pos") + 1).as("rn"),
        col("col._2").as("event_id"), col("col._1").as("value"))
  }
}
