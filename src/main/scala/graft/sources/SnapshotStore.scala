package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Version-addressable upsert store — TIME TRAVEL for key state, the
  * fourth corner of the store family. [[LatestStore]] answers "what is
  * the state NOW"; this store answers "what was the state AS OF commit
  * v" for every v inside the retention horizon — the reproducibility
  * primitive a training pipeline needs to re-materialize the exact
  * feature snapshot a model was trained against (the reference keeps no
  * history at all: src/streaming_service.py:322-340 folds updates into
  * a mutable dict, so yesterday's state is unrecoverable).
  *
  * Mechanics — modeled on the public Delta/Iceberg contract but in
  * plain parquet + directories, like the rest of the store family:
  *
  *  - each [[commit]] writes its change batch (one upsert row per key)
  *    under a hive-style `v=N` directory — the commit IS the version;
  *  - [[readAsOf]] unions the `v ≤ N` directories (directory pruning:
  *    later commits are never listed, let alone read) and resolves
  *    latest-wins per key with one `max(struct(v, payload))` hash
  *    aggregate — merge-on-read, no rewrite at commit time;
  *  - [[compactTo]] folds every directory `≤ v` into a single base
  *    snapshot AT `v` and advances the `_horizon` marker: reads at or
  *    after the horizon are byte-identical before and after (the spec
  *    proves it), reads BEFORE it fail loudly — the retention contract
  *    every production time-travel table has, stated instead of
  *    implied.
  *
  * Delivery contract: a commit is assigned the next version by listing
  * the directory (single-writer, like [[ModelRegistry]]'s version
  * counter); re-running a FAILED commit before its directory landed is
  * safe (same data, next number), but this store intentionally does NOT
  * absorb at-least-once REDELIVERY of an already-landed batch — version
  * assignment is not idempotent. Streaming ingestion therefore routes
  * through batchId-keyed [[commitAs]] (redelivered micro-batch
  * overwrites its own version directory — the [[AggStateStore]]
  * discipline, proven in the spec by double-committing a batch).
  *
  * Scale shape: commits are O(batch) appends; `readAsOf` aggregates
  * |keys| + |changes since compaction| rows, and the version column it
  * maxes over is the DIRECTORY name (partition pruning serves the
  * time-travel predicate — no file content is touched for excluded
  * versions); at 100 TB each version directory is itself bucketed on
  * the key ([[Bucketed]]) so the merge aggregate rides the layout.
  */
class SnapshotStore(spark: SparkSession, rootUri: String) {

  private val root = rootUri.stripSuffix("/") + "/snapshots"
  private val rootPath = new Path(root)
  private def fs = rootPath.getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def readString(p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private def writeString(p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8"))
    finally out.close()
  }

  /** Landed commit versions, ascending (directory listing is the log). */
  def versions: Seq[Long] =
    if (!fs.exists(rootPath)) Seq.empty
    else fs.listStatus(rootPath).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong).sorted

  /** Newest readable version (0 when the store is empty). */
  def latestVersion: Long = versions.lastOption.getOrElse(0L)

  /** The commit directory for version `v` (diagnostics / spec hooks). */
  def dirForVersion(v: Long): String = s"$root/v=$v"

  /** Oldest readable version — advanced by [[compactTo]]. */
  def horizon: Long = {
    val p = new Path(rootPath, "_horizon")
    if (fs.exists(p)) readString(p).trim.toLong
    else versions.headOption.getOrElse(1L)
  }

  /** Commit one upsert batch (user_id key, event_type payload, one row
    * per key) as the next version; returns the assigned version.
    */
  def commit(changes: DataFrame): Long = {
    val v = latestVersion + 1
    commitAs(changes, v)
    v
  }

  /** Commit under an EXPLICIT version — the streaming entry point:
    * keyed by batchId, a redelivered micro-batch replaces its own
    * directory instead of appending a duplicate version.
    */
  def commitAs(changes: DataFrame, v: Long): Unit = {
    require(v >= 1, s"versions start at 1, got $v")
    changes.select("user_id", "event_type")
      .write.mode("overwrite").parquet(s"$root/v=$v")
  }

  /** Continuous versioned ingestion: micro-batch N commits as version
    * N+1 via [[commitAs]], so a redelivered micro-batch REPLACES its own
    * version directory instead of appending a duplicate (the
    * exactly-once-by-overwrite discipline; the spec forces a redelivery
    * and proves version history + every readAsOf unchanged). A store has
    * ONE writer — the batchId IS the version counter, so mixing stream
    * and ad-hoc [[commit]] writers on the same root is a caller error.
    */
  def appendStream(changes: DataFrame, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .foreachBatch((batch: DataFrame, id: Long) => commitAs(batch, id + 1L))
      .start()

  /** The key state as of commit `v`: latest-wins per key across every
    * commit `≤ v`. Fails loudly outside [horizon, latestVersion].
    */
  def readAsOf(v: Long): DataFrame = {
    require(v >= horizon,
      s"version $v is before the compaction horizon ${horizon} — " +
        "history below the horizon has been folded and cannot be read")
    require(v <= latestVersion,
      s"version $v has not been committed (latest: $latestVersion)")
    val dirs = versions.filter(_ <= v).map(n => s"$root/v=$n")
    spark.read.option("basePath", root).parquet(dirs: _*)
      .groupBy("user_id")
      .agg(max(struct(col("v"), col("event_type"))).as("__last"))
      .select(col("user_id"), col("__last.event_type").as("event_type"))
      .orderBy("user_id")
  }

  /** The current snapshot. */
  def readLatest(): DataFrame = readAsOf(latestVersion)

  /** Fold all commits `≤ v` into a single base snapshot at `v` and
    * advance the horizon: `readAsOf(w)` for any `w ≥ v` is invariant
    * (latest-wins is associative — folding a prefix changes nothing a
    * later delta could not overwrite), versions below `v` become
    * unreadable.
    *
    * Crash-safety — there is NO unreadable window, by ordering alone:
    *
    *  1. the fold APPENDS into the existing `v=N` directory (Spark's
    *     job commit makes the append all-or-nothing; in-flight
    *     `_temporary` files are invisible to readers). Coexistence with
    *     the original delta files is sound because for every key in the
    *     v-delta the fold row is IDENTICAL to the delta row (the fold at
    *     v already has that delta applied), and [[readAsOf]]'s
    *     `max(struct(v, payload))` collapses duplicates — proven by the
    *     spec's byte-identical pre/post reads;
    *  2. only then does `_horizon` advance (a read below the horizon now
    *     fails loudly instead of returning folded-away history);
    *  3. only then do the superseded `v < N` directories drop — they are
    *     redundant from step 1 on (the fold dominates every older row
    *     under latest-wins), so a crash mid-delete leaves extra rows
    *     that change no answer.
    *
    * A crash before step 2 leaves the OLD state fully readable (plus
    * harmless duplicate fold rows); after step 2, the NEW state. A
    * re-run with `horizon == v` skips the fold (step 2 proves it
    * landed) and resumes the deletes — compaction is idempotent.
    */
  def compactTo(v: Long): Unit = {
    require(v >= horizon && v <= latestVersion,
      s"compaction point $v outside [$horizon, $latestVersion]")
    if (horizon < v) {
      readAsOf(v).write.mode("append").parquet(s"$root/v=$v")
      writeString(new Path(rootPath, "_horizon"), v.toString)
    }
    versions.filter(_ < v).foreach(n =>
      fs.delete(new Path(s"$root/v=$n"), true))
  }
}
