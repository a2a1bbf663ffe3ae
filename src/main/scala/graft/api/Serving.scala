package graft.api

import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Num
import graft.ops.{Hashing, Rank}
import graft.sources.ModelRegistry

/** The serving surface (SURVEY.md §2.9): the reference's Flask endpoints
  * re-expressed as library calls over PERSISTED models — train once,
  * publish to the [[graft.sources.ModelRegistry]], serve many, exactly the
  * reference's lifecycle (train_models.py fits and saves; app.py loads and
  * serves — reference: src/app.py:25-27,207-299, src/app_optimized.py:
  * 68-123). No query here refits anything: serving reads the registry's
  * BEST version.
  *
  * Scale notes: recommendations come from `recommendForUserSubset`
  * (distributed block top-k over the factor matrices, never a full
  * user×item score materialization); catalog pagination bounds the sort
  * with [[graft.ops.Rank.firstK]] (TakeOrderedAndProject); the hybrid
  * blend is a union of two bounded result sets — all driver-light.
  */
final class Serving(spark: SparkSession, registry: ModelRegistry) {

  /** Train the collaborative model on explicit ratings
    * (`user_id, item_id, rating`) and publish it as a new registry version
    * (reference hyperparameters: src/spark/training.py:473-483 scaled to
    * the corpus; seed fixed for reproducibility). Returns the version id.
    */
  def trainCollaborative(ratings: DataFrame, rank: Int = 10,
      markBest: Boolean = true): String = {
    val n = ratings.count()
    val blocks = math.max(2L, math.min(
      spark.sparkContext.defaultParallelism.toLong, n / 50000L)).toInt
    val model = new ALS()
      .setRank(rank).setMaxIter(10).setRegParam(0.1).setSeed(42)
      .setUserCol("user_id").setItemCol("item_id").setRatingCol("rating")
      .setColdStartStrategy("drop")
      .setNumUserBlocks(blocks).setNumItemBlocks(blocks)
      .fit(ratings)
    registry.publish("als", model,
      s"""{"algo":"als","rank":$rank,"n_ratings":$n}""", markBest)
  }

  private def bestAls(): ALSModel = {
    val v = registry.best("als").getOrElse(
      throw new IllegalStateException("no published collaborative model"))
    ALSModel.load(registry.modelPath("als", v))
  }

  private def alsAt(version: String): ALSModel =
    ALSModel.load(registry.modelPath("als", version))

  private def fromModel(model: ALSModel, userIds: Seq[Int], k: Int): DataFrame = {
    import spark.implicits._
    model.recommendForUserSubset(userIds.toDF("user_id"), k)
      .select(col("user_id"), posexplode(col("recommendations")).as(Seq("pos", "rec")))
      .select(col("user_id"), (col("pos") + 1).as("rank"),
        col("rec.item_id").as("item_id"),
        Num.roundAt(col("rec.rating").cast("double"), 4).as("score"))
  }

  /** Hash-synthesized fallback recommendations — the bottom serving tier
    * (reference: src/app_optimized.py:481-513 `get_simulated_recommendations`:
    * per-user seeded shuffle of the catalog, `rating = 4.0 - i*0.1 +
    * (user_hash%100)/100`, clamped to [1,5]). The Spark twin replaces the
    * driver-side `np.random.shuffle` with a deterministic per-(user,item)
    * md5 ordering — same "consistent per user" contract, but distributed:
    * one window top-k per user, no driver loop, any catalog size.
    */
  def synthetic(userIds: Seq[Int], catalog: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    val shuffleKey = Hashing.md5Long(
      concat(col("user_id").cast("string"), lit("#"), col("item_id").cast("string")))
    val w = Window.partitionBy("user_id").orderBy(asc("hk"), asc("item_id"))
    userIds.toDF("user_id")
      .crossJoin(broadcast(catalog.select("item_id")))
      .withColumn("hk", shuffleKey)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("user_id"), col("rank"), col("item_id"),
        graft.ops.Num.roundAt(greatest(lit(1.0), least(lit(5.0),
          lit(4.0) - (col("rank") - 1) * lit(0.1)
            + pmod(col("user_id"), lit(100)) / lit(100.0))), 2).as("score"))
  }

  /** The reference's bottom tier: a hardcoded 10-track catalog served when
    * even file data is unavailable (src/app_optimized.py:24-35
    * SAMPLE_SONGS; ids re-keyed to ints for the relational surface).
    */
  def builtinCatalog: DataFrame = {
    import spark.implicits._
    (1 to 10).map(_.toLong).toDF("item_id")
  }

  /** GET /recommend/collaborative with the reference's full source-
    * preference chain (src/app_optimized.py:516-540,594-633): serve the
    * registry's BEST trained model; fall back to the latest published
    * version; with an empty registry serve hash-synthesized
    * recommendations over the caller's `catalog` (the reference's
    * file-data tier); and when even that is empty, over the hardcoded
    * [[builtinCatalog]] — the coalesce-style tiering SURVEY §2.9 promises.
    * The `tier` column names the source that actually served.
    */
  def collaborativeTiered(userIds: Seq[Int], k: Int,
      catalog: DataFrame): DataFrame = {
    val (df, tier) = registry.best("als") match {
      case Some(v) => (fromModel(alsAt(v), userIds, k), "trained-best")
      case None => registry.latest("als") match {
        case Some(v) => (fromModel(alsAt(v), userIds, k), "trained-latest")
        case None =>
          if (catalog.isEmpty)
            (synthetic(userIds, builtinCatalog, k), "builtin")
          else (synthetic(userIds, catalog, k), "synthetic")
      }
    }
    df.withColumn("tier", lit(tier)).orderBy("user_id", "rank")
  }

  /** GET /recommend/collaborative/&lt;user&gt;?num=k — per-user top-k from the
    * published model, exploded to relational rows.
    */
  def collaborative(userIds: Seq[Int], k: Int): DataFrame = {
    import spark.implicits._
    bestAls().recommendForUserSubset(userIds.toDF("user_id"), k)
      .select(col("user_id"), posexplode(col("recommendations")).as(Seq("pos", "rec")))
      .select(col("user_id"), (col("pos") + 1).as("rank"),
        col("rec.item_id").as("item_id"),
        Num.roundAt(col("rec.rating").cast("double"), 4).as("score"))
      .orderBy("user_id", "rank")
  }

  /** GET /recommend/content/&lt;item&gt;?num=k — same-cluster / similar items by
    * a caller-supplied similarity column source; here: top-k rows of
    * `scored` excluding the seed (reference: src/app.py:267-299 shape).
    */
  def contentSimilar(scored: DataFrame, seedItem: Long, k: Int): DataFrame =
    Rank.firstK(
        scored.filter(col("item_id") =!= seedItem),
        k, desc("score"), asc("item_id"))
      .select(col("rn").as("rank"), col("item_id"), col("score"))

  /** GET /recommend/hybrid/&lt;user&gt;?num=k — the reference's 0.7/0.3
    * collaborative/content blend (src/app_optimized.py:687-745): ceil(0.7k)
    * collaborative rows + remaining content rows, concatenated in source
    * order.
    */
  def hybrid(userId: Int, contentScored: DataFrame, k: Int): DataFrame = {
    val nCollab = math.ceil(k * 0.7).toInt
    val collab = collaborative(Seq(userId), nCollab)
      .select(col("item_id"), col("score"), lit("collab").as("source"), col("rank"))
    val content = contentSimilar(contentScored, -1L, k - nCollab)
      .select(col("item_id"), col("score"), lit("content").as("source"), col("rank"))
    collab.unionByName(content).orderBy("source", "rank")
  }

  /** GET /songs?limit&offset — deterministic pagination
    * (reference: src/app.py:171-204).
    */
  def catalogPage(catalog: DataFrame, orderCol: String, limit: Int,
      offset: Int): DataFrame =
    Rank.firstK(catalog, offset + limit, asc(orderCol))
      .filter(col("rn") > offset)

  /** GET /models/info — registry introspection as a DataFrame
    * (reference: src/app.py:301-319).
    */
  def modelsInfo(): DataFrame = {
    import spark.implicits._
    val rows = registry.best("als").map { v =>
      ("als", v, registry.latest("als").getOrElse(v), registry.metadata("als", v))
    }.toSeq
    rows.toDF("model", "best_version", "latest_version", "metadata")
  }
}
