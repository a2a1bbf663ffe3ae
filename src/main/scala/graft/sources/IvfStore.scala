package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF vector index — the similarity-search counterpart of
  * [[PostingsStore]]: the embedding corpus is coarse-quantized ONCE
  * (the deterministic sign quantizer ◆ `q_ann_ivf` uses: sign bits of
  * the first 4 dimensions → 16 inverted lists) and written hash-
  * bucketed on the LIST ID, so a query vector's probe reads exactly its
  * list's bucket (bucket pruning — IvfSpec pins `SelectedBucketsCount:
  * 1 out of 16`) instead of re-quantizing the corpus per query. This is
  * the serving shape of every IVF system (FAISS's `IndexIVF` on disk):
  * index build is the one-off cost, a query touches |corpus|/nlists
  * vectors.
  *
  * At 100 TB the nightly index job writes this layout to the object
  * store (optionally with the trained k-means codebook of
  * `ml_ann_trained` replacing the sign quantizer — the layout contract
  * is identical: assignments bucketed on the list id); the
  * per-(session, dataset) cache here stands in for "the index already
  * exists". New vectors append with the same bucketing.
  */
object IvfStore {

  /** The shared coarse quantizer (must match `q_ann_ivf`'s oracle). */
  def bucketOf(v: Column): Column =
    (when(element_at(v, 1) >= 0, 8).otherwise(0) +
      when(element_at(v, 2) >= 0, 4).otherwise(0) +
      when(element_at(v, 3) >= 0, 2).otherwise(0) +
      when(element_at(v, 4) >= 0, 1).otherwise(0)).cast("int")

  val nLists = 16

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      DataFrame]()

  /** The standing inverted lists for `sfDir` (columns: vec_id, v
    * `array<double>`, label, bucket), built and bucketed once per
    * (session, dataset).
    */
  def lists(s: SparkSession, sfDir: String): DataFrame =
    LayoutCache.getOrBuild(cache, (s, sfDir)) {
      val tag = java.lang.Integer.toHexString(sfDir.hashCode)
      val root = LayoutCache.tempRoot(s"graft-ivf-$tag")
      val e = graft.tables.Tables.embeddings(s, sfDir)
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"), col("label"))
        .withColumn("bucket", bucketOf(col("v")))
      val table = s"graft_ivf_$tag"
      Bucketed.writeBucketed(e, table, s"$root/lists", "bucket", nLists)
      s.table(table)
    }
}
