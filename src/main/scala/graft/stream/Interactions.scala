package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Num
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.Hashing

/** The live interaction-stream path (SURVEY.md §2.8 T1-T7).
  *
  * The reference generates synthetic user interactions in a driver-side
  * Python loop (reference: src/streaming_service.py:233-300,408-430),
  * buffers them, and flushes a JSON batch file every 50 events or 60 s
  * (:24-25,302-354,384-398). The Spark-native shape is a streaming source →
  * pure-expression map → `foreachBatch` sink:
  *
  *   - source: `rate` (production) or `MemoryStream` (tests) supplies
  *     monotonically increasing `value` + event-time `timestamp`; the
  *     synthetic record is a DETERMINISTIC md5 function of `value`, so any
  *     replay of the same offsets reproduces identical interactions —
  *     which is what makes checkpoint recovery exactly-once end-to-end
  *     (the reference's unseeded `random.*` cannot replay).
  *   - map: nested interaction record (track_display / context structs —
  *     the reference's JSON shape, §1.2) built from codegen'd expressions;
  *     no UDFs, no driver loop, partition-parallel at any rate.
  *   - sink: one JSON file tree per micro-batch (`batch_%06d` — T5 batch-id
  *     sequencing) plus the per-batch analytics summary (T4) the reference
  *     embeds in each batch file.
  *
  * Scale note: each micro-batch is a distributed write (`df.write.json`),
  * so batch size is bounded by cluster throughput, not driver memory; the
  * reference's 50-event Python buffer is the degenerate single-node case.
  */
object Interactions {

  /** Streaming (or batch — expressions are mode-agnostic) map from a rate
    * source's `(timestamp, value)` to the reference's interaction record.
    * Mirrors src/streaming_service.py: 500-user pool (:227), popularity-
    * scaled rating `(pop/100)*4+1 ± U(-.5,.5)` clamped to [1,5] (:242-244),
    * rating-dependent action weights (:246-257), nested display/context
    * structs (:268-298).
    */
  def synthesize(src: DataFrame): DataFrame = {
    val v = col("value").cast("string")
    val pop = pmod(Hashing.md5Long(concat(v, lit("p"))), lit(101L))
    val base = pop / lit(100.0) * lit(4.0) + lit(1.0)
    val jit = Hashing.md5Frac(concat(v, lit("j"))) - lit(0.5)
    val rating = Num.roundAt(greatest(lit(1.0), least(lit(5.0), base + jit)), 3)
    val u = Hashing.md5Frac(concat(v, lit("a")))
    val hi = rating >= 4.0
    val action = when(hi && u < 0.7, lit("play"))
      .when(hi && u < 0.9, lit("like"))
      .when(hi, lit("skip"))
      .when(!hi && u < 0.4, lit("play"))
      .when(!hi && u < 0.6, lit("like"))
      .otherwise(lit("skip"))
    val trackId = concat(lit("T"), lpad(
      pmod(Hashing.md5Long(concat(v, lit("t"))), lit(2000L)).cast("string"), 5, "0"))
    val emotion = element_at(
      array(lit("happy"), lit("sad"), lit("energetic"), lit("calm")),
      (pmod(Hashing.md5Long(concat(v, lit("e"))), lit(4L)) + lit(1)).cast("int"))
    src.select(
      col("value").as("seq"),
      pmod(Hashing.md5Long(concat(v, lit("u"))), lit(500L)).as("user_id"),
      trackId.as("track_id"),
      rating.as("rating"),
      action.as("action"),
      pmod(Hashing.md5Long(concat(v, lit("d"))), lit(300000L)).as("play_duration_ms"),
      col("timestamp").as("ts"),
      struct(
        concat(lit("Track "), trackId).as("name"),
        concat(lit("Artist "), pmod(Hashing.md5Long(concat(v, lit("r"))), lit(50L)).cast("string")).as("artist_name"),
        emotion.as("emotion"),
        pop.as("popularity")).as("track_display"),
      struct(
        element_at(array(lit("mobile"), lit("desktop"), lit("tablet")),
          (pmod(Hashing.md5Long(concat(v, lit("v"))), lit(3L)) + lit(1)).cast("int")).as("device"),
        hour(col("timestamp")).as("time_of_day"),
        dayofweek(col("timestamp")).as("day_of_week")).as("context"))
  }

  /** Production source: rate stream → interactions. */
  def fromRate(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    synthesize(
      spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond.toLong).load())

  /** T4 — per-batch analytics summary (one row): size, distinct users /
    * tracks, avg rating, action and emotion distributions, top-5 featured
    * tracks by best rating, top-3 artists by interaction count — the exact
    * summary the reference computes per 50-event batch
    * (src/streaming_service.py:306-354,356-382).
    *
    * All sub-aggregations are map-side-combinable hash aggs; the maps/arrays
    * here are sink-facing JSON payload, not driver-gate query output.
    */
  def batchSummary(batch: DataFrame): DataFrame = {
    val dist = batch.groupBy("action").agg(count(lit(1)).as("n"))
      .agg(map_from_entries(sort_array(collect_list(struct(col("action"), col("n")))))
        .as("action_distribution"))
    val emo = batch.select(col("track_display.emotion").as("emotion"))
      .groupBy("emotion").agg(count(lit(1)).as("n"))
      .agg(map_from_entries(sort_array(collect_list(struct(col("emotion"), col("n")))))
        .as("emotion_distribution"))
    val featured = batch
      .groupBy("track_id")
      .agg(max_by(struct(col("track_display.name"), col("rating")), col("rating")).as("best"))
      .select(col("track_id"), col("best.name").as("name"), col("best.rating").as("rating"))
      .orderBy(desc("rating"), asc("track_id")).limit(5)
      .agg(collect_list(struct(col("track_id"), col("name"), col("rating"))).as("featured_tracks"))
    val artists = batch
      .groupBy(col("track_display.artist_name").as("artist"))
      .agg(count(lit(1)).as("interactions"))
      .orderBy(desc("interactions"), asc("artist")).limit(3)
      .agg(collect_list(struct(col("artist"), col("interactions"))).as("popular_artists"))
    val stats = batch.agg(
      count(lit(1)).as("size"),
      countDistinct(col("user_id")).as("unique_users"),
      countDistinct(col("track_id")).as("unique_tracks"),
      Num.roundAt(avg(col("rating")), 4).as("avg_rating"))
    stats.crossJoin(dist).crossJoin(emo).crossJoin(featured).crossJoin(artists)
  }

  /** T7 — topic-multiplexed routing, Spark-native form: instead of the
    * reference's four consumer buffers with four sinks
    * (src/streaming/kafka_consumer.py:33-56), ONE stream partitions each
    * micro-batch by the routing column (`partitionBy` on write), producing
    * `<outDir>/batch_%06d/<col>=<topic>/` — a single checkpointed query,
    * no per-topic state, and downstream readers get partition pruning on
    * the topic for free.
    */
  def writeBatchesByTopic(
      interactions: DataFrame,
      topicCol: String,
      outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery =
    interactions.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty)
          batch.write.mode("overwrite").partitionBy(topicCol)
            .json(f"$outDir/batch_$id%06d")
        ()
      }
      .start()

  /** S8/T5 — batch-file sink: every micro-batch lands as
    * `<outDir>/batch_%06d/` (distributed JSON write) with its T4 summary at
    * `<outDir>/summary_%06d/`. Restart-safe via the checkpoint: a replayed
    * batch id overwrites its own directories (idempotent), never duplicates.
    */
  def writeBatches(
      interactions: DataFrame,
      outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery =
    interactions.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          batch.write.mode("overwrite").json(f"$outDir/batch_$id%06d")
          batchSummary(batch).write.mode("overwrite").json(f"$outDir/summary_$id%06d")
        }
        ()
      }
      .start()
}
