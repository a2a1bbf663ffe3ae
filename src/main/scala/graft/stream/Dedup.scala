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

  /** Streaming delta-ingest vs a STANDING catalog — the live twin of the
    * batch `q_dedup_delta` composition's exact stage, with the same scale
    * shape per micro-batch:
    *
    *   1. the catalog's Bloom sketch (built ONCE, batch-side) gates each
    *      arriving row map-side inside codegen — BF-negative rows never
    *      reach the catalog join;
    *   2. BF-positive rows stream-static join the catalog fingerprints
    *      (broadcast; at 100 TB a bucketed table on `fp`) to resolve
    *      `catalog_id`;
    *   3. within-stream re-deliveries drop via watermark-bounded state
    *      BEFORE the verdict, so an at-least-once source can't emit the
    *      same delta doc twice.
    *
    * The pos/neg branch split is exhaustive for null fingerprints (same
    * `!coalesce(probe, false)` discipline, and BloomSpec proof, as the
    * batch query). Output: the input columns + `fp`, `catalog_id`,
    * `is_dup` — one verdict row per distinct arriving document.
    */
  def againstCatalog(delta: DataFrame, catalogFps: DataFrame,
      bf: org.apache.spark.util.sketch.BloomFilter,
      textCol: String, tsCol: String, horizon: String): DataFrame = {
    val deduped = byContentWithinWatermark(delta, textCol, tsCol, horizon)
    val probe = graft.functions.BloomMightContain(col("fp"), bf)
    val pos = deduped.where(probe)
      .join(broadcast(catalogFps.groupBy("fp")
        .agg(min("catalog_id").as("catalog_id"))), Seq("fp"), "left")
    val neg = deduped.where(!coalesce(probe, lit(false)))
      .withColumn("catalog_id", lit(null).cast("long"))
    pos.unionByName(neg)
      .withColumn("is_dup", col("catalog_id").isNotNull.cast("int"))
  }
}
