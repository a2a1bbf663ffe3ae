package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The family's exactly-once delta staging, extracted (r11) from
  * [[PostingsStore.StreamingPostings]] so every bucketed standing index
  * (postings, IVF vectors) shares ONE proven implementation instead of
  * re-growing its own:
  *
  *  - each micro-batch lands in its own `batch=N` directory with an
  *    OVERWRITE write, so a checkpoint-replayed batch REWRITES its own
  *    directory instead of duplicating rows (the [[AggStateStore]]
  *    batchId-keying — the base index's blind `append` must never be
  *    called from foreachBatch);
  *  - readers union the bucketed base with the staged deltas;
  *  - [[fold]] is the nightly compaction that moves accumulated deltas
  *    into the bucketed base in ONE exactly-once batch append
  *    (delete-after-append — a crash in between leaves duplicate rows
  *    VISIBLE, so the fold records a `_folding` marker first and both
  *    [[read]] and [[fold]] refuse to run while one is pending, failing
  *    loudly rather than serving double-counted state).
  *
  * `cols` fixes the staged schema AND the insert column order (Spark's
  * `insertInto` is position-based); `appendToBase` lands a fold's rows
  * in the base (honoring its bucket spec); `baseRead` is the base scan.
  */
final class StagedDeltas(
    s: SparkSession,
    deltaRoot: String,
    cols: Seq[String],
    appendToBase: DataFrame => Unit,
    baseRead: () => DataFrame) {

  private val markerPath = new org.apache.hadoop.fs.Path(
    deltaRoot, "_folding")
  private def fs = markerPath.getFileSystem(
    s.sparkContext.hadoopConfiguration)

  /** Land one micro-batch's (already transformed) rows exactly-once. */
  def stage(rows: DataFrame, batchId: Long): Unit =
    rows.select(cols.map(col): _*)
      .write.mode("overwrite").parquet(s"$deltaRoot/batch=$batchId")

  /** Base ∪ deltas — the serving view between folds. */
  def read: DataFrame = {
    require(!fs.exists(markerPath),
      s"a delta fold is pending at $deltaRoot — reads would " +
        "double-count; finish or clean up the fold first")
    val deltaDirs =
      if (fs.exists(new org.apache.hadoop.fs.Path(deltaRoot)))
        fs.listStatus(new org.apache.hadoop.fs.Path(deltaRoot)).toSeq
          .map(_.getPath.toString).filter(_.contains("batch="))
      else Seq.empty
    if (deltaDirs.isEmpty) baseRead()
    else baseRead().unionByName(
      s.read.parquet(deltaDirs: _*).select(cols.map(col): _*))
  }

  /** Fold accumulated deltas into the bucketed base (the nightly
    * compaction): marker → one batch append → delete deltas → marker
    * off. Answers invariant; only the read path's delta union empties.
    *
    * `guard` runs AFTER the delta listing proves there is work but
    * BEFORE the `_folding` marker is laid down — the one spot where a
    * caller precondition (e.g. "this refresh cycle already consumed
    * its target cut") can refuse without leaving crashed-fold state:
    * checking before fold() races a concurrently staging micro-batch,
    * and throwing inside `appendToBase` strands the marker.
    */
  def fold(guard: () => Unit = () => ()): Unit = {
    require(!fs.exists(markerPath),
      s"a previous fold at $deltaRoot crashed between its append and " +
        "its delta cleanup — the deltas may or may not be in the " +
        "base; resolve manually rather than risking double-counted " +
        "rows")
    val root = new org.apache.hadoop.fs.Path(deltaRoot)
    if (!fs.exists(root)) return
    val deltaDirs = fs.listStatus(root).toSeq
      .map(_.getPath).filter(_.getName.startsWith("batch="))
    if (deltaDirs.isEmpty) return
    guard()
    fs.create(markerPath, true).close()
    val rows = s.read.parquet(deltaDirs.map(_.toString): _*)
      .select(cols.map(col): _*)
    appendToBase(rows)
    deltaDirs.foreach(p => fs.delete(p, true))
    fs.delete(markerPath, false)
  }
}
