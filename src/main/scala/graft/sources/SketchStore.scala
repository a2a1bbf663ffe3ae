package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted mergeable-sketch state — distinct-count analytics that never
  * rescan history.
  *
  * The reference recomputes its "unique users" metric from raw
  * accumulated interactions on every batch and dashboard refresh
  * (streaming_service.py:336 `len(set(i['user_id'] ...))`,
  * streamlit_app.py:551); at 100 TB that rescan is the cost this store
  * removes. The pattern behind ◆ `q_rolling_dau_approx`, made durable:
  * per-day HLL sketches are small (≈ 2^lgK registers), MERGEABLE
  * (register-wise max — at equal lgK the union of sketches IS the sketch
  * of the union, exactly), and so can be written once per ingested batch
  * and answer every later question — daily uniques, rolling windows,
  * arbitrary-range totals — from the sketch table alone. A new batch
  * appends only its own day rows; history is never re-read.
  *
  * Layout: a parquet table `(day: long, sk: binary)` under `rootUri`
  * (any Hadoop-FileSystem-addressable URI — the [[ModelRegistry]] IO
  * convention). `append` is blind (merge-on-read: readers union
  * duplicate day rows), so concurrent/replayed batches never need
  * read-modify-write; [[compact]] folds to one row per day when the
  * accumulated appends are worth collapsing — estimates are unchanged
  * either way because union is associative, commutative and idempotent
  * ONLY across distinct inputs; replayed identical batches re-union the
  * same registers and stay correct (max is idempotent), which is what
  * makes blind append safe under at-least-once delivery.
  *
  * Scale shape: each append is one partial+final `hll_sketch_agg` over
  * the batch (map-side combined, |days-in-batch| output rows); every
  * read aggregates |stored rows| ≈ |days| × |appends-per-day| sketch
  * rows, never events. All operators are Spark-native codegen'd
  * DataSketches functions — no UDFs, no driver-side sketch math.
  */
class SketchStore(spark: SparkSession, rootUri: String, lgK: Int = 12) {

  private val path = rootUri.stripSuffix("/") + "/day_sketches"

  /** Sketch one batch of events into per-day rows and append them.
    * `events` needs (`user_id`, `ts` epoch-micros) — the
    * [[graft.tables.Tables.events]] shape.
    */
  def append(events: DataFrame): Unit =
    events
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("day")
      .agg(expr(s"hll_sketch_agg(user_id, $lgK)").as("sk"))
      .write.mode("append").parquet(path)

  private def stored: DataFrame = spark.read.parquet(path)

  /** One sketch row per day (merge-on-read across appends). */
  def daySketches: DataFrame =
    stored.groupBy("day")
      .agg(expr("hll_union_agg(sk)").as("sk"))

  /** Per-day distinct-user estimates. */
  def estimateDaily(): DataFrame =
    daySketches
      .select(col("day"), expr("hll_sketch_estimate(sk)").as("dau"))
      .orderBy("day")

  /** Distinct users over the inclusive day range — one union over the
    * range's stored rows, no event scan.
    */
  def estimateRange(loDay: Long, hiDay: Long): DataFrame =
    stored.filter(col("day").between(loDay, hiDay))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("users"))

  /** Rolling w-day distinct actives from the store — the persisted twin
    * of ◆ `q_rolling_dau_approx`'s in-query plan: |days|×w sketch rows
    * through one union aggregate.
    */
  def estimateRolling(w: Int): DataFrame = {
    require(w > 0, s"window must be positive, got $w")
    daySketches
      .select(explode(sequence(col("day"), col("day") + lit(w - 1)))
        .as("day"), col("sk"))
      .groupBy("day")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as(s"dau$w"))
      .orderBy("day")
  }

  /** Continuous ingestion — one blind [[append]] per micro-batch.
    * At-least-once delivery is SUFFICIENT here, no exactly-once staging:
    * a redelivered batch re-unions identical registers and changes no
    * estimate (max is idempotent — SketchStoreSpec proves it by full
    * replay), unlike [[Export]] where duplicate FILES are the artifact
    * and batchId-keyed staging is required. The checkpoint only bounds
    * redundant recomputation, not correctness.
    */
  def appendStream(events: DataFrame, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch((batch: DataFrame, _: Long) => append(batch))
      .start()

  /** Fold accumulated appends to one row per day. Estimates are
    * identical before and after; only the stored row count changes.
    */
  def compact(): Unit = {
    val folded = daySketches.collect() // |days| rows — bounded by design
    val schema = daySketches.schema
    spark.createDataFrame(
        java.util.Arrays.asList(folded: _*), schema)
      .write.mode("overwrite").parquet(path)
  }
}
