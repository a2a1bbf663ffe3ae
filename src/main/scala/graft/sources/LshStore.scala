package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH bucket index — incremental NEAR-dup discovery
  * against a standing corpus without rescanning it. The exact-fingerprint
  * counterpart is `q_dedup_incremental`'s md5 catalog (collisions = byte
  * dups); this index catches the near-dups a fingerprint join cannot see:
  * each indexed doc stores its three (band, bkey) LSH bucket rows
  * ([[graft.queries.LlmQueries.bandRows]] — the SAME construction the batch
  * `q_minhash_dedup` path uses, so incremental and rebuilt indexes bucket
  * identically by construction), and a new crawl's docs probe the bucket
  * table with one equi-join on (band, bkey).
  *
  * Delivery contract (the [[SketchStore]] idempotent corner): bucket rows
  * are a SET — blind append converges under at-least-once replay because
  * probes read through `.distinct()`. No batchId bookkeeping needed
  * (contrast [[AggStateStore]]'s non-idempotent sums); compaction
  * (`distinct` rewrite) changes bytes, never answers.
  *
  * Scale shape: the index holds 3 rows × 32-byte keys per doc — ~100 bytes
  * per document regardless of document size, so a billion-doc corpus
  * indexes in ~100 GB, bucketable on `bkey`. A probe shuffles only the
  * DELTA's bucket rows against it; candidates then verify exactly
  * (exact shingle-Jaccard on the candidate pairs, the standard
  * discover→verify split). The standing corpus's text is never re-read
  * for discovery — only candidate survivors fetch text for verification.
  */
object LshStore {

  /** LSH bucket rows of `corpus` (doc_id, text). */
  private def rows(corpus: DataFrame): DataFrame =
    graft.queries.LlmQueries.bandRows(
      graft.queries.LlmQueries.shingleDocs(corpus))

  /** Create/overwrite the index from the standing corpus. */
  def build(corpus: DataFrame, path: String): Unit =
    rows(corpus).write.mode("overwrite").parquet(path)

  /** Blind-append a delta's bucket rows. Idempotent under replay: rows are
    * a set, probes read distinct — appending the same delta twice changes
    * bytes on disk, never any probe's answer.
    */
  def append(delta: DataFrame, path: String): Unit =
    rows(delta).write.mode("append").parquet(path)

  /** Candidate (indexed_doc, probe_doc) pairs for a probe corpus: probe
    * docs banded with the same construction, equi-joined against the
    * stored buckets on (band, bkey). Self-hits (a doc probing an index
    * that already contains it) are dropped. Distinct because a pair can
    * collide in several bands and the store may carry replayed rows.
    */
  def candidates(s: SparkSession, probe: DataFrame, path: String): DataFrame = {
    val stored = s.read.parquet(path)
      .select(col("doc_id").as("doc_a"), col("band"), col("bkey")).distinct()
    rows(probe).select(col("doc_id").as("doc_b"), col("band"), col("bkey"))
      .join(stored, Seq("band", "bkey"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Continuous index ingest: each micro-batch of (doc_id, text) docs
    * blind-appends its bucket rows — the at-least-once delivery the
    * foreachBatch sink provides is sufficient because appends are
    * idempotent under the distinct-read contract (same argument as
    * [[SketchStore.appendStream]]; contrast [[Export]]'s staged renames,
    * which exist because file output is NOT idempotent).
    */
  def appendStream(docs: DataFrame, path: String, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch((batch: DataFrame, _: Long) => append(batch, path))
      .start()

  /** Rewrite the index as its distinct row set — answer-invariant
    * compaction for a store that only ever grows by blind appends.
    */
  def compact(s: SparkSession, path: String): Unit = {
    val tmp = path + ".compact"
    s.read.parquet(path).distinct().write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(path))
  }
}
