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

  /** LEFT OUTER interval join — the "did a response EVER follow the
    * trigger" form the inner join cannot answer: a trigger with no
    * response inside its interval must still come out, null-completed.
    * Structured Streaming can only emit that null row once it is SURE no
    * match can still arrive — i.e. when the watermark passes the END of
    * the trigger's interval — so unmatched rows surface with watermark
    * latency, not batch latency (the spec pins exactly this: no null
    * row before the closing watermark, the null row after). Same state
    * bound as [[intervalJoin]]: both sides watermarked, the time-range
    * conjunct lets Spark evict buffered rows as the watermark advances.
    * The match semantics on admitted events equal the BATCH left-outer
    * join with the same predicate (spec-proven), which is what makes
    * the live no-response alert trustworthy.
    */
  def leftOuterIntervalJoin(left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String,
      key: String, horizon: String, within: String): DataFrame = {
    val l = left.withWatermark(leftTs, horizon).alias("l")
    val r = right.withWatermark(rightTs, horizon).alias("r")
    l.join(r,
      expr(s"l.$key = r.$key AND " +
        s"r.$rightTs >= l.$leftTs AND " +
        s"r.$rightTs <= l.$leftTs + interval $within"),
      "left_outer")
      .drop(r(key))
  }
}
