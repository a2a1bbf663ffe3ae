package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — correlating two live streams (the reference's
  * interaction topics against its control/feedback topics,
  * kafka_consumer.py:9-28) without unbounded state.
  *
  * The load-bearing constraint: a streaming equi-join with no event-time
  * bound must buffer EVERY past row of both sides forever — state grows
  * with stream lifetime and the job eventually dies. Structured Streaming
  * only frees join state when (a) both inputs carry a watermark and
  * (b) the join condition bounds how far apart matching event times can
  * be. With both, each side's buffer holds at most
  * event-rate × (watermark horizon + interval width) rows — constant for
  * a steady stream, independent of how long the query has run.
  */
object Joins {

  /** Watermarked interval join: `left` rows match `right` rows with the
    * same `key` whose event time lands in
    * `[left.ts, left.ts + within]` — "a response follows its trigger
    * within the interval". Inner join, so late rows (beyond `horizon`)
    * are dropped by the watermark on either side.
    *
    * Column names must be disjoint apart from `key` (the caller picks the
    * projection); both timestamp columns survive in the output for
    * downstream windowing.
    */
  def intervalJoin(left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String,
      key: String, horizon: String, within: String): DataFrame = {
    val l = left.withWatermark(leftTs, horizon).alias("l")
    val r = right.withWatermark(rightTs, horizon).alias("r")
    l.join(r,
      expr(s"l.$key = r.$key AND " +
        s"r.$rightTs >= l.$leftTs AND " +
        s"r.$rightTs <= l.$leftTs + interval $within"))
      .drop(r(key))
  }
}
