package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Num

/** Streaming curation — the ingest twin of the batch funnel
  * (`q_curate_funnel`): the same row-local quality filters applied as
  * documents ARRIVE, composed with watermark-bounded exact dedup, so a live
  * feed lands already curated instead of requiring a nightly re-scan.
  *
  * The composition works at scale precisely because of what each stage is:
  * the filters are pure per-row expressions (no state, full codegen, run at
  * source parallelism), and the dedup stage keys its state on the md5
  * fingerprint with retention bounded by the watermark horizon
  * ([[Dedup.byContentWithinWatermark]]) — state ∝ ingest-rate × horizon,
  * independent of stream lifetime. StreamSpec proves batch ≡ stream: the
  * curated stream's output count equals the batch funnel's final
  * (04_exact_dedup) stage over the same documents, and re-deliveries add
  * nothing.
  */
object Curate {

  /** The row-local curation flags, shared VERBATIM with the batch funnel
    * (`q_curate_funnel` unpivots their conditional sums; this file filters
    * on them): f1 = lang allowlist, f2 = minimum word count, f3 =
    * duplicate-bigram repetition bound. One definition keeps the batch
    * oracle and the streaming path from drifting.
    */
  def flags(docs: DataFrame): DataFrame =
    docs
      .withColumn("f1", col("lang").isin("en", "de", "fr", "es"))
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n", size(col("ws")))
      .withColumn("f2", col("f1") && col("n") >= 20)
      .withColumn("d2", when(col("f2"), expr(
        "size(array_distinct(transform(sequence(0, size(ws) - 2), i -> concat(ws[i], ' ', ws[i+1]))))")))
      .withColumn("f3", col("f2") &&
        Num.round4((col("n") - 1 - col("d2")).cast("double") / (col("n") - 1)) <= 0.6)

  /** Full streaming curation: quality-filter, then drop content
    * re-deliveries within the watermark horizon. Output rows carry the
    * original document columns plus the `fp` fingerprint.
    */
  def stream(docs: DataFrame, tsCol: String, horizon: String): DataFrame =
    Dedup.byContentWithinWatermark(
      flags(docs).filter(col("f3"))
        .drop("f1", "ws", "n", "f2", "d2", "f3"),
      "text", tsCol, horizon)
}
