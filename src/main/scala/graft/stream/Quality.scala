package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Live outlier flagging against a batch-trained robust fence — the
  * streaming half of ◆ `q_outlier_mad`: order statistics cannot be
  * maintained incrementally on an unbounded stream (a median is a global
  * sort property), so the production pattern is train-offline /
  * apply-in-flight. The fence is the SAME `Stats.madFence` definition the
  * oracle-checked batch audit uses; per micro-batch it is a broadcast
  * hash join (stream-static, no watermark, no state — the `StreamSpec`
  * "stream-static" shape) and the flag predicate is the identical
  * 4.4478·MAD arithmetic, so a row is flagged live iff the batch audit
  * would count it.
  */
object Quality {

  /** Trained fence (event_type, med, mad) from a batch snapshot. */
  def trainFence(events: DataFrame): DataFrame =
    graft.queries.Stats.madFence(
      events.select(col("event_type"), col("value")))

  /** Flag each in-flight event against the fence. Works identically on a
    * streaming or batch frame — the join is stateless either way. LEFT
    * join: an event_type the snapshot never saw has no fence yet, and
    * dropping those rows (an inner join) would silently censor exactly
    * the novel traffic an audit wants to see — they pass through with
    * is_outlier = 0 until a retrained fence covers them.
    */
  def flagOutliers(stream: DataFrame, fence: DataFrame): DataFrame =
    stream.join(broadcast(fence), Seq("event_type"), "left")
      .withColumn("is_outlier",
        coalesce(
          (abs(col("value") - col("med")) > lit(4.4478) * col("mad")).cast("int"),
          lit(0)))
      .drop("med", "mad")
}
