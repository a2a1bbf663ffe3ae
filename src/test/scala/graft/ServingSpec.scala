package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.api.Serving
import graft.queries.MLQueries
import graft.sources.ModelRegistry
import graft.tables.Tables

/** Serving surface (SURVEY.md §2.9): train-once/publish/serve-many over the
  * model registry — the reference's API lifecycle as library calls.
  */
class ServingSpec extends SparkSpec {

  private lazy val registry =
    new ModelRegistry(Files.createTempDirectory("graft-serving").toString)
  private lazy val serving = new Serving(spark, registry)
  private lazy val ratings = MLQueries.interactions(spark, sfDir)

  test("train publishes a registry version with metadata") {
    val v = serving.trainCollaborative(ratings)
    assert(v === "v000000")
    assert(registry.best("als") === Some(v))
    assert(registry.metadata("als", v).contains("\"algo\":\"als\""))
  }

  test("collaborative serves per-user top-k from the PERSISTED model") {
    serving.trainCollaborative(ratings)
    val recs = serving.collaborative(Seq(1, 2, 3), 5).collect()
    assert(recs.length === 15)
    assert(recs.map(_.getAs[Int]("user_id")).distinct.sorted.toSeq === Seq(1, 2, 3))
    recs.groupBy(_.getAs[Int]("user_id")).values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to 5))
      val scores = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score"))
      assert(scores.toSeq === scores.sortBy(-_).toSeq, "ranked by score desc")
    }
  }

  test("hybrid blends ceil(0.7k) collaborative with content rows") {
    serving.trainCollaborative(ratings)
    val content = Tables.part(spark, sfDir)
      .select(col("p_partkey").as("item_id"),
        (col("p_retailprice") / 1000.0).as("score"))
    val out = serving.hybrid(1, content, 10).collect()
    assert(out.length === 10)
    assert(out.count(_.getAs[String]("source") == "collab") === 7)
    assert(out.count(_.getAs[String]("source") == "content") === 3)
  }

  test("catalog pagination pages partition the sorted scan") {
    val catalog = Tables.part(spark, sfDir)
      .select("p_partkey", "p_name", "p_retailprice")
    val p1 = serving.catalogPage(catalog, "p_partkey", 10, 0)
      .select("p_partkey").collect().map(_.getLong(0))
    val p2 = serving.catalogPage(catalog, "p_partkey", 10, 10)
      .select("p_partkey").collect().map(_.getLong(0))
    val full = catalog.orderBy("p_partkey").limit(20)
      .select("p_partkey").collect().map(_.getLong(0))
    assert((p1 ++ p2).toSeq === full.toSeq,
      "concat of pages == prefix of the full sorted scan")
  }

  test("models info reflects best and latest versions") {
    serving.trainCollaborative(ratings) // publish at least one
    serving.trainCollaborative(ratings, markBest = false)
    val info = serving.modelsInfo().collect().head
    assert(info.getAs[String]("best_version") < info.getAs[String]("latest_version"))
  }

  test("tiered serving: each fallback tier engages when the better one is absent") {
    // reference: src/app_optimized.py:516-540 — trained model preferred,
    // hash-synthesized fallback when none is loaded.
    val catalog = Tables.part(spark, sfDir)
      .select(col("p_partkey").cast("int").as("item_id")).limit(100)

    // Tier 3: empty registry → synthetic, deterministic per user.
    val reg = new ModelRegistry(
      "file://" + Files.createTempDirectory("graft-tiers").toString)
    val sv = new Serving(spark, reg)
    val t3 = sv.collaborativeTiered(Seq(7, 8), 5, catalog).collect()
    assert(t3.length === 10)
    assert(t3.forall(_.getAs[String]("tier") == "synthetic"))
    assert(t3.forall { r =>
      val s = r.getAs[Double]("score"); s >= 1.0 && s <= 5.0
    })
    val t3again = sv.collaborativeTiered(Seq(7, 8), 5, catalog).collect()
    assert(t3.map(_.toString).toSeq === t3again.map(_.toString).toSeq,
      "synthetic tier is deterministic per user (seeded-shuffle contract)")

    // Tier 4: empty registry AND empty catalog → the hardcoded builtin
    // catalog serves (the reference's SAMPLE_SONGS bottom tier).
    val t4 = sv.collaborativeTiered(Seq(3), 4, catalog.limit(0)).collect()
    assert(t4.length === 4)
    assert(t4.forall(_.getAs[String]("tier") == "builtin"))
    assert(t4.forall(r => (1L to 10L).contains(r.getAs[Long]("item_id"))))

    // Tier 2: a published version but no BEST pointer → trained-latest.
    sv.trainCollaborative(ratings, markBest = false)
    val t2 = sv.collaborativeTiered(Seq(1, 2), 3, catalog).collect()
    assert(t2.nonEmpty && t2.forall(_.getAs[String]("tier") == "trained-latest"))

    // Tier 1: BEST present → trained-best wins.
    sv.trainCollaborative(ratings, markBest = true)
    val t1 = sv.collaborativeTiered(Seq(1, 2), 3, catalog).collect()
    assert(t1.nonEmpty && t1.forall(_.getAs[String]("tier") == "trained-best"))
  }

  test("end-to-end: streaming retrain loop publishes servable model versions") {
    // the reference's full lifecycle: interaction batches land on disk →
    // the control loop crosses the pending threshold → a retrain publishes
    // a new registry version → serving answers from the persisted model.
    import graft.stream.{Interactions, Retrain}
    val batchDir = Files.createTempDirectory("graft-e2e-batches").toString
    val reg = new ModelRegistry(Files.createTempDirectory("graft-e2e-models").toString)
    val sv = new Serving(spark, reg)
    (0 until 3).foreach { i =>
      Interactions.synthesize(
          spark.range(200).select(
            expr(s"timestamp_micros(1704067200000000 + id * 1000000)").as("timestamp"),
            (col("id") + lit(i * 10000L)).as("value")))
        .write.mode("overwrite").json(f"$batchDir/batch_$i%06d")
    }
    val c = Retrain.control(spark, batchDir,
      Files.createTempDirectory("graft-e2e-ckpt").toString,
      minPendingBatches = 3,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)) { df =>
      val r = df.select(
        col("user_id").cast("int").as("user_id"),
        substring(col("track_id"), 2, 5).cast("int").as("item_id"),
        col("rating"))
      sv.trainCollaborative(r)
      ()
    }
    try c.query.processAllAvailable() finally c.query.stop()
    assert(c.totals._1 === 1L && c.totals._2 === 600L)
    assert(reg.best("als").isDefined, "retrain must publish a BEST version")
    // serve users that exist in the trained interaction set (cold-start
    // users are dropped by design, reference coldStartStrategy="drop")
    val present = spark.read.schema(Retrain.interactionSchema)
      .json(s"$batchDir/batch_*")
      .select(col("user_id").cast("int")).distinct()
      .limit(2).collect().map(_.getInt(0)).toSeq
    val recs = sv.collaborative(present, 3).collect()
    assert(recs.length === 6, "persisted model must serve recommendations")
  }
}
