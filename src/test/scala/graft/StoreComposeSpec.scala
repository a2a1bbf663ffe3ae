package graft

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sources.{AggStateStore, SketchStore}
import graft.tables.Tables

/** The cross-store composition contract (AggStateStore scaladoc),
  * proven under a REAL injected crash: one foreachBatch commits each
  * micro-batch to a SketchStore (blind append, idempotent register-max)
  * AND an AggStateStore (batchId-keyed overwrite); the fault fires
  * between the two writes, the checkpoint commit is never written, the
  * restart redelivers the batch to both — and both stores converge to
  * the clean run's answers (the sketch store absorbs its duplicate
  * rows at the estimate level, the agg store rewrites its own
  * directory byte-for-byte).
  */
class StoreComposeSpec extends SparkSpec {

  /** Orders reshaped to feed BOTH stores: the agg store's native order
    * columns plus (user_id, ts) for the sketch store's per-day
    * distinct-actives.
    */
  private def feed(): Seq[(Long, java.sql.Timestamp, Double)] =
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp"),
        col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
      .toSeq

  private def asOrders(df: DataFrame): DataFrame =
    df.toDF("o_custkey", "o_orderdate", "o_totalprice")

  private def asEvents(df: DataFrame): DataFrame =
    asOrders(df).select(col("o_custkey").as("user_id"),
      col("o_orderdate").as("ts"))

  private def freshRoot(tag: String): String =
    "file://" + java.nio.file.Files.createTempDirectory(tag).toString

  private def sketchRows(st: SketchStore): Seq[Seq[Any]] =
    st.estimateDaily().collect().map(_.toSeq.toSeq).toSeq

  private def aggRows(st: AggStateStore): Seq[Seq[Any]] =
    st.serve().collect().map(_.toSeq.toSeq).toSeq

  test("a crash between two stores' commits converges both on redelivery") {
    import spark.implicits._
    val rows = feed()
    val thirds = rows.grouped((rows.size + 2) / 3).toSeq
    assert(thirds.size === 3)

    // clean reference run
    val (cleanSk, cleanAgg) =
      (new SketchStore(spark, freshRoot("graft-cmp-sk0")),
        new AggStateStore(spark, freshRoot("graft-cmp-ag0")))
    thirds.zipWithIndex.foreach { case (b, i) =>
      cleanSk.append(asEvents(b.toDF()))
      cleanAgg.appendBatch(asOrders(b.toDF()), i.toLong)
    }
    val (wantSk, wantAgg) = (sketchRows(cleanSk), aggRows(cleanAgg))

    // crashy run: the fault fires AFTER the sketch write of batch 1,
    // BEFORE the agg write — the exact window the contract is about
    val sk = new SketchStore(spark, freshRoot("graft-cmp-sk1"))
    val ag = new AggStateStore(spark, freshRoot("graft-cmp-ag1"))
    val ckpt = freshRoot("graft-cmp-ckpt")
    @volatile var armed = true
    val ms = MemoryStream[(Long, java.sql.Timestamp, Double)](
      implicitly[Encoder[(Long, java.sql.Timestamp, Double)]],
      spark.sqlContext)
    def start() = ms.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sk.append(asEvents(batch))
        if (armed && id == 1L) {
          armed = false
          throw new RuntimeException("injected crash between store commits")
        }
        ag.appendBatch(asOrders(batch), id)
      }
      .start()

    val q1 = start()
    ms.addData(thirds(0)); q1.processAllAvailable()
    ms.addData(thirds(1))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination()
    }
    assert(!armed, "the injected fault must actually have fired")
    val q2 = start() // redelivers batch 1 to BOTH, then continues
    try {
      q2.processAllAvailable()
      ms.addData(thirds(2)); q2.processAllAvailable()
    } finally q2.stop()

    assert(sketchRows(sk) === wantSk,
      "sketch estimates must absorb the duplicate batch-1 rows")
    assert(aggRows(ag) === wantAgg,
      "agg state must hold batch 1 exactly once after redelivery")
  }
}
