package graft

import org.apache.spark.sql.functions._
import graft.sources.SketchStore
import graft.tables.Tables

/** Persisted mergeable-sketch state: the property that makes the store
  * a store — arbitrary batch boundaries, replays and compactions change
  * NO answer — plus the usual accuracy gate vs exact distinct counts.
  */
class SketchStoreSpec extends SparkSpec {

  private def freshStore(): SketchStore = new SketchStore(spark,
    "file://" + java.nio.file.Files.createTempDirectory("graft-sketch-store"))

  private def daily(st: SketchStore): Seq[(Long, Long)] =
    st.estimateDaily().collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))

  test("incremental appends answer exactly like a single full build") {
    val ev = Tables.events(spark, sfDir)
    // Adversarial split: every day appears in BOTH batches, so the
    // merge-on-read union inside each day is actually exercised.
    val incremental = freshStore()
    incremental.append(ev.filter(col("user_id") % 2 === 0))
    incremental.append(ev.filter(col("user_id") % 2 =!= 0))
    val full = freshStore()
    full.append(ev)
    assert(daily(incremental) === daily(full),
      "register-wise max is lossless: batch boundaries must not change estimates")
    val loHi = ev.select(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(min("day"), max("day")).head()
    val (lo, hi) = (loHi.getLong(0), loHi.getLong(1))
    assert(incremental.estimateRange(lo, hi).head().getLong(0) ===
      full.estimateRange(lo, hi).head().getLong(0))
    assert(incremental.estimateRolling(7).collect().toSeq ===
      full.estimateRolling(7).collect().toSeq)
  }

  test("a replayed batch (at-least-once delivery) changes no estimate") {
    val ev = Tables.events(spark, sfDir)
    val once = freshStore()
    once.append(ev)
    val replayed = freshStore()
    replayed.append(ev)
    replayed.append(ev) // redelivered in full
    assert(daily(replayed) === daily(once),
      "max-register union is idempotent — blind append must survive replay")
  }

  test("estimates track exact distinct counts within the HLL gate") {
    val ev = Tables.events(spark, sfDir)
    val st = freshStore()
    st.append(ev)
    val exact = ev
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("day").agg(countDistinct("user_id").as("exact"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = daily(st)
    assert(est.map(_._1).toSet === exact.keySet, "every day must be present")
    for ((day, dau) <- est) {
      val e = exact(day)
      assert(math.abs(dau - e).toDouble / e <= 0.10,
        s"day $day: estimate $dau vs exact $e exceeds the 10% gate")
    }
  }

  test("a live stream builds the same store as the batch path") {
    import java.sql.Timestamp
    import org.apache.spark.sql.Encoder
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val ev = Tables.events(spark, sfDir).select("ts", "user_id")
    val rows = ev.collect().map(r =>
      (r.getTimestamp(0), r.getLong(1))).toSeq
    val ms = MemoryStream[(Timestamp, Long)](
      implicitly[Encoder[(Timestamp, Long)]], spark.sqlContext)
    val live = freshStore()
    val q = live.appendStream(
      ms.toDF().toDF("ts", "user_id"),
      "file://" + java.nio.file.Files.createTempDirectory("graft-sketch-ckpt"))
    try {
      val (a, b) = rows.splitAt(rows.size / 2) // mid-day batch boundary
      ms.addData(a); q.processAllAvailable()
      ms.addData(b); q.processAllAvailable()
    } finally q.stop()
    val batch = freshStore()
    batch.append(ev)
    assert(daily(live) === daily(batch),
      "streamed micro-batches must estimate exactly like one batch build")
  }

  test("compact folds to one row per day and changes no answer") {
    val ev = Tables.events(spark, sfDir)
    val st = freshStore()
    st.append(ev.filter(col("user_id") % 3 === 0))
    st.append(ev.filter(col("user_id") % 3 === 1))
    st.append(ev.filter(col("user_id") % 3 === 2))
    val before = daily(st)
    val days = before.size
    st.compact()
    assert(daily(st) === before, "compaction must be invisible to readers")
    assert(st.daySketches.count() === days)
    val rolling = st.estimateRolling(7).collect()
    assert(rolling.nonEmpty)
  }
}
