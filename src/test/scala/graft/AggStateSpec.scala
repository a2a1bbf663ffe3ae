package graft

import java.sql.Timestamp

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sources.AggStateStore
import graft.tables.Tables

/** Gates for the persisted exact-aggregate state store: serving rows
  * equal the ◆ q_incr_agg query (and so, transitively, the DuckDB full
  * recompute); batchId-keyed appends make redelivery idempotent even
  * though count/sum merges are not; the live stream builds the same
  * state as the batch path; compaction changes bytes, never answers.
  */
class AggStateSpec extends SparkSpec {

  private def freshStore(): AggStateStore =
    new AggStateStore(spark, "file://" + java.nio.file.Files
      .createTempDirectory("graft-aggstate").toString)

  private def serveRows(s: AggStateStore): Seq[Seq[Any]] =
    s.serve().collect().map(_.toSeq).toSeq

  private lazy val oracleRows: Seq[Seq[Any]] =
    SparkEntry.queries("q_incr_agg")(spark, sfDir)
      .collect().map(_.toSeq).toSeq

  test("three ingested slices serve exactly the q_incr_agg rows") {
    val store = freshStore()
    val orders = Tables.orders(spark, sfDir)
    for (i <- 0 until 3)
      store.appendBatch(orders.filter(pmod(col("o_orderkey"), lit(3)) === i), i)
    assert(serveRows(store) === oracleRows)
  }

  test("a redelivered batch rewrites its directory and changes nothing") {
    val store = freshStore()
    val orders = Tables.orders(spark, sfDir)
    for (i <- 0 until 3)
      store.appendBatch(orders.filter(pmod(col("o_orderkey"), lit(3)) === i), i)
    val before = serveRows(store)
    store.appendBatch(orders.filter(pmod(col("o_orderkey"), lit(3)) === 1), 1)
    assert(serveRows(store) === before)
    assert(before === oracleRows)
  }

  test("a live stream builds the same state as the batch path") {
    import spark.implicits._
    val store = freshStore()
    val rows = Tables.orders(spark, sfDir)
      .select("o_custkey", "o_totalprice", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getTimestamp(2))).toSeq
    val ms = MemoryStream[(Long, Double, Timestamp)](
      implicitly[Encoder[(Long, Double, Timestamp)]], spark.sqlContext)
    val q = store.appendStream(
      ms.toDF().toDF("o_custkey", "o_totalprice", "o_orderdate"),
      "file://" + java.nio.file.Files
        .createTempDirectory("graft-aggstate-ckpt"))
    try {
      val (a, rest) = rows.splitAt(rows.size / 3)
      val (b, c) = rest.splitAt(rest.size / 2)
      ms.addData(a); q.processAllAvailable()
      ms.addData(b); q.processAllAvailable()
      ms.addData(c); q.processAllAvailable()
    } finally q.stop()
    assert(serveRows(store) === oracleRows)
  }

  test("compact folds to one row per key and changes no answer") {
    val store = freshStore()
    val orders = Tables.orders(spark, sfDir)
    for (i <- 0 until 4)
      store.appendBatch(orders.filter(pmod(col("o_orderkey"), lit(4)) === i), i)
    val before = serveRows(store)
    store.compact()
    assert(serveRows(store) === before)
    assert(store.mergedState.count() === before.size.toLong)
  }
}
