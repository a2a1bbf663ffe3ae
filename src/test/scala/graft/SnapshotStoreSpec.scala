package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.SnapshotStore
import graft.tables.Tables

/** Gates for the time-travel store: every readable version equals the
  * sequential replay of its commit prefix; compaction leaves reads at or
  * after the fold point byte-identical and rejects reads below the
  * horizon; an explicitly-versioned (batchId-keyed) re-commit replaces
  * rather than duplicates.
  */
class SnapshotStoreSpec extends SparkSpec {

  /** Four deterministic upsert batches from the events fixture: batch i
    * holds the per-user LATEST event among events with event_id ≡ i
    * (mod 4) — one row per key per commit, overlapping key sets.
    */
  private def batch(i: Int): DataFrame =
    Tables.events(spark, sfDir)
      .filter(pmod(col("event_id"), lit(4)) === i)
      .groupBy("user_id")
      .agg(max(struct(unix_micros(col("ts")), col("event_id"),
        col("event_type"))).as("m"))
      .select(col("user_id"), col("m.event_type").as("event_type"))

  private def freshStore(): SnapshotStore =
    new SnapshotStore(spark, "file://" + java.nio.file.Files
      .createTempDirectory("graft-snap").toString)

  private def rows(df: DataFrame): Seq[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  /** Sequential upsert replay of batches 0..k. */
  private def replay(k: Int): Seq[(Long, String)] =
    (0 to k).foldLeft(Map.empty[Long, String]) { (m, i) =>
      m ++ rows(batch(i)).toMap
    }.toSeq.sortBy(_._1)

  test("readAsOf(v) equals the sequential replay of the first v commits") {
    val store = freshStore()
    assert(store.versions.isEmpty && store.latestVersion === 0L)
    (0 to 3).foreach(i => assert(store.commit(batch(i)) === i + 1L))
    assert(store.versions === Seq(1L, 2L, 3L, 4L))
    (1 to 4).foreach { v =>
      assert(rows(store.readAsOf(v)) === replay(v - 1), s"asOf $v")
    }
    assert(rows(store.readLatest()) === replay(3))
    // history is real: at least one key's payload differs across versions
    assert(rows(store.readAsOf(1)) !== rows(store.readAsOf(4)))
  }

  test("reads outside [horizon, latest] fail loudly") {
    val store = freshStore()
    store.commit(batch(0))
    intercept[IllegalArgumentException](store.readAsOf(2))
    intercept[IllegalArgumentException](store.readAsOf(0))
  }

  test("compactTo folds history: reads >= horizon invariant, < horizon rejected") {
    val store = freshStore()
    (0 to 3).foreach(i => store.commit(batch(i)))
    val before = (2 to 4).map(v => rows(store.readAsOf(v)))
    store.compactTo(2)
    assert(store.horizon === 2L)
    assert(store.versions === Seq(2L, 3L, 4L))
    assert((2 to 4).map(v => rows(store.readAsOf(v))) === before)
    intercept[IllegalArgumentException](store.readAsOf(1))
    // compaction is re-entrant up the chain
    store.compactTo(4)
    assert(rows(store.readAsOf(4)) === before.last)
    assert(store.versions === Seq(4L))
  }

  test("compaction crash windows leave every read answerable") {
    // The compactTo ordering is fold-append → horizon → deletes; this
    // test walks the two crash states in between and proves reads are
    // correct in BOTH (the r9 ADVICE scenario: the old sequence could
    // lose all folded history between its deletes and its rename).
    val store = freshStore()
    (0 to 3).foreach(i => store.commit(batch(i)))
    val expect = (1 to 4).map(v => replay(v - 1))
    // crash state 1: the fold landed inside v=2 but the horizon never
    // advanced and nothing was deleted — fold rows coexist with the
    // delta rows and every version is still the OLD fully-readable
    // state (for keys in the v=2 delta the fold row is identical, so
    // latest-wins collapses the duplicates).
    store.readAsOf(2).write.mode("append")
      .parquet(store.dirForVersion(2))
    (1 to 4).foreach { v =>
      assert(rows(store.readAsOf(v)) === expect(v - 1),
        s"asOf $v with orphaned fold rows")
    }
    // crash state 2: re-running compaction converges (fold + horizon +
    // deletes all complete; a second run is a pure no-op).
    store.compactTo(2)
    store.compactTo(2)
    assert(store.horizon === 2L && store.versions === Seq(2L, 3L, 4L))
    (2 to 4).foreach { v =>
      assert(rows(store.readAsOf(v)) === expect(v - 1),
        s"asOf $v after re-entrant compaction")
    }
  }

  test("commitAs replaces its own version on redelivery (batchId keying)") {
    val store = freshStore()
    store.commit(batch(0))
    store.commitAs(batch(1), 2L)
    store.commitAs(batch(1), 2L) // redelivered micro-batch
    assert(store.versions === Seq(1L, 2L))
    assert(rows(store.readAsOf(2)) === replay(1))
  }

  test("commits continue normally after compaction; the horizon keeps holding") {
    val store = freshStore()
    (0 to 2).foreach(i => store.commit(batch(i)))
    store.compactTo(2)
    // life goes on above the horizon: version numbering continues, new
    // reads see old folded state + the new delta
    assert(store.commit(batch(3)) === 4L)
    assert(store.versions === Seq(2L, 3L, 4L))
    assert(rows(store.readAsOf(4)) === replay(3))
    assert(rows(store.readAsOf(2)) === replay(1))
    intercept[IllegalArgumentException](store.readAsOf(1))
    // and a second compaction over the post-compaction history still holds
    store.compactTo(4)
    assert(rows(store.readLatest()) === replay(3))
  }

  test("a live versioned stream builds the same readAsOf history as batch commits") {
    import spark.implicits._
    import org.apache.spark.sql.Encoder
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val store = freshStore()
    val batches = (0 to 2).map(i => rows(batch(i)))
    val ms = MemoryStream[(Long, String)](
      implicitly[Encoder[(Long, String)]], spark.sqlContext)
    val q = store.appendStream(
      ms.toDF().toDF("user_id", "event_type"),
      "file://" + java.nio.file.Files
        .createTempDirectory("graft-snap-ckpt"))
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    assert(store.versions === Seq(1L, 2L, 3L))
    (1 to 3).foreach { v =>
      assert(rows(store.readAsOf(v)) === replay(v - 1), s"stream asOf $v")
    }
  }

  test("a crash-window redelivery replaces its own version — history byte-identical") {
    import spark.implicits._
    import org.apache.spark.sql.Encoder
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.hadoop.fs.Path
    val store = freshStore()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-snap-eo")
      .toString
    val ms = MemoryStream[(Long, String)](
      implicitly[Encoder[(Long, String)]], spark.sqlContext)
    def start() = store.appendStream(
      ms.toDF().toDF("user_id", "event_type"), "file://" + ckpt)
    val q1 = start()
    try { ms.addData(rows(batch(0))); q1.processAllAvailable() }
    finally q1.stop()
    val before = rows(store.readAsOf(1))
    // the version directory landed but the commit record "never made
    // it" — restart REDELIVERS micro-batch 0 with the same batchId
    val fs = new Path(ckpt).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new Path(ckpt, "commits/0"), false),
      "batch-0 commit record must exist before the simulated crash")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(store.versions === Seq(1L),
      "the redelivered batch must replace v=1, never append v=2")
    assert(rows(store.readAsOf(1)) === before)
    // and the stream continues normally afterwards
    val q3 = start()
    try { ms.addData(rows(batch(1))); q3.processAllAvailable() }
    finally q3.stop()
    assert(store.versions === Seq(1L, 2L))
    assert(rows(store.readAsOf(2)) === replay(1))
  }
}
