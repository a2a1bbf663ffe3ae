package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.LatestStore

/** Live enrichment against a CDC-REFRESHED dimension — the stream-static
  * join trap, solved the honest way: a plain `stream.join(staticDf)`
  * captures the static side's plan (and often its file listing) when the
  * query STARTS, so dimension updates arriving mid-stream may never be
  * seen — the classic silently-stale-dim bug. This operator routes each
  * micro-batch through `foreachBatch` and re-resolves the dimension
  * snapshot INSIDE the batch function, so every batch joins against the
  * [[LatestStore]] state as of that moment: CDC updates land in the very
  * next micro-batch (StreamSpec proves it by updating the store between
  * batches and watching the enrichment flip).
  *
  * Scale: the per-batch snapshot is the store's |keys| + |changes|
  * merge-on-read aggregate — at 100 TB the store is compacted and
  * co-bucketed on the key, so the per-batch join is a bucketed equi-join
  * of batch-sized against |keys|-sized, and the re-resolution cost is
  * metadata, not a rescan of history.
  */
object Enrich {

  /** Start a stream that left-joins each micro-batch against the store's
    * CURRENT snapshot on `user_id` and appends the enriched rows to
    * `sink` parquet (batchId-keyed file names would make this
    * exactly-once — see `Export.appendShardedStreamExactlyOnce`; plain
    * append keeps this demonstration focused on the refresh semantics).
    */
  def withLatestDim(stream: DataFrame, store: LatestStore,
      sink: String, checkpoint: String): StreamingQuery = {
    require(!stream.columns.contains("dim_type"),
      "the enrichment output column 'dim_type' collides with a stream " +
        "column — rename the stream column before enriching")
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val dim = store.snapshot()
          .select("user_id", "event_type")
          .withColumnRenamed("event_type", "dim_type")
        batch.join(dim, Seq("user_id"), "left")
          .write.mode("append").parquet(sink)
      }
      .start()
  }
}
