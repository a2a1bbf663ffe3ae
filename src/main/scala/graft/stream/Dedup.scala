package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming dedup — the ingest twin of the batch dedup family
  * (`q_dedup_exact`): at-least-once sources (the reference's Kafka topics,
  * kafka_consumer.py:9-28) re-deliver, so the stream must drop replays
  * BEFORE anything downstream aggregates them twice.
  *
  * The load-bearing choice is `dropDuplicatesWithinWatermark`, not
  * `dropDuplicates`: plain streaming dropDuplicates keeps EVERY key it has
  * ever seen in the state store — unbounded state, the thing that falls
  * over first at production event rates. Bounding retention by the
  * watermark horizon matches the delivery guarantee actually needed
  * (re-deliveries arrive within transit time, not days later) and makes
  * state size ∝ event-rate × horizon, independent of stream lifetime.
  */
object Dedup {

  /** Drop re-deliveries of the same `idCols` key arriving within the
    * `horizon` watermark; state for a key is freed once the watermark
    * passes it.
    */
  def exactWithinWatermark(events: DataFrame, idCols: Seq[String],
      tsCol: String, horizon: String): DataFrame =
    events.withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Content-keyed variant: dedup on an md5 fingerprint of `textCol`
    * (identical payloads from different producers collapse — the streaming
    * analogue of q_dedup_exact's content fingerprint).
    */
  def byContentWithinWatermark(events: DataFrame, textCol: String,
      tsCol: String, horizon: String): DataFrame =
    events.withColumn("fp", md5(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fp")
}
