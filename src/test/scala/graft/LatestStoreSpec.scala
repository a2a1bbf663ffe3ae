package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sources.LatestStore
import graft.tables.Tables

/** Gates for the latest-wins CDC store: snapshot equals a sequential
  * latest-wins replay; blind append converges under replay AND
  * reordering (the idempotent+commutative delivery contract the
  * scaladoc claims); live stream equals batch; compaction is
  * answer-invariant.
  */
class LatestStoreSpec extends SparkSpec {

  private def changes: DataFrame =
    Tables.events(spark, sfDir).select(col("user_id"),
      unix_micros(col("ts")).as("us"), col("event_id").as("seq"),
      col("event_type"))

  private def freshStore(): LatestStore =
    new LatestStore(spark, "file://" + java.nio.file.Files
      .createTempDirectory("graft-latest").toString)

  private def snapRows(s: LatestStore): Seq[Seq[Any]] =
    s.snapshot().collect().map(_.toSeq).toSeq

  private lazy val replay: Seq[Seq[Any]] =
    changes.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).view
      .mapValues(_.maxBy(c => (c._2, c._3))).toMap
      .values.toSeq.sortBy(_._1)
      .map(c => Seq[Any](c._1, c._2, c._3, c._4))

  test("snapshot equals the sequential latest-wins replay") {
    val store = freshStore()
    store.append(changes)
    assert(snapRows(store) === replay)
  }

  test("replayed and reordered change batches converge to the same snapshot") {
    val store = freshStore()
    // apply thirds in a scrambled order, replaying one of them twice
    val (a, b, c) = (changes.filter(pmod(col("seq"), lit(3)) === 0),
      changes.filter(pmod(col("seq"), lit(3)) === 1),
      changes.filter(pmod(col("seq"), lit(3)) === 2))
    store.append(c); store.append(a); store.append(b); store.append(a)
    assert(snapRows(store) === replay)
  }

  test("a live CDC stream builds the same snapshot as the batch path") {
    import spark.implicits._
    val store = freshStore()
    val rows = changes.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    val ms = MemoryStream[(Long, Long, Long, String)](
      implicitly[Encoder[(Long, Long, Long, String)]], spark.sqlContext)
    val q = store.appendStream(
      ms.toDF().toDF("user_id", "us", "seq", "event_type"),
      "file://" + java.nio.file.Files
        .createTempDirectory("graft-latest-ckpt"))
    try {
      val (x, y) = rows.splitAt(rows.size / 2)
      ms.addData(x); q.processAllAvailable()
      ms.addData(y); q.processAllAvailable()
    } finally q.stop()
    assert(snapRows(store) === replay)
  }

  test("compact folds the change log to the snapshot without changing it") {
    val store = freshStore()
    store.append(changes.filter(pmod(col("seq"), lit(2)) === 0))
    store.append(changes.filter(pmod(col("seq"), lit(2)) === 1))
    val before = snapRows(store)
    store.compact()
    assert(snapRows(store) === before)
    assert(before === replay)
  }
}
