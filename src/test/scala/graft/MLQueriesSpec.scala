package graft

import graft.queries.Registry
import graft.tables.Tables

/** Quality gates the reference declares (but never enforces) plus the
  * dedup-correctness property of the banded MinHash:
  *   - ALS RMSE ≤ 0.8 (reference: data/models/config/als_config.json
  *     `performance_thresholds.min_rmse`; evaluated as in
  *     src/spark/training.py:485-493),
  *   - KMeans k-clamp k = clamp(rows/1000, 10, 50)
  *     (reference: src/spark/training.py:385-393),
  *   - StringIndexer frequencyDesc ordering (reference uses the default at
  *     src/spark/training.py:468-469),
  *   - MinHash LSH recall on planted exact duplicates.
  */
class MLQueriesSpec extends SparkSpec {

  private def run(name: String) = Registry.queries(name)(spark, sfDir)

  test("ALS RMSE meets the reference's declared quality gate (<= 0.8)") {
    val row = run("ml_als_rmse").collect().head
    val rmse = row.getAs[Double]("rmse")
    assert(rmse <= 0.8, s"rmse $rmse exceeds als_config.json min_rmse 0.8")
  }

  test("KMeans honors the reference k-clamp rule k = clamp(n/1000, 10, 50)") {
    val n = Tables.part(spark, sfDir).count()
    val k = math.min(math.max(n / 1000, 10), 50).toInt
    val clusters = run("ml_kmeans_clusters").collect()
    assert(clusters.length <= k, s"${clusters.length} clusters > k=$k")
    assert(clusters.map(_.getAs[Int]("cluster")).forall(c => c >= 0 && c < k))
    assert(clusters.map(_.getAs[Long]("n_parts")).sum === n)
  }

  test("StringIndexer assigns indices by frequency desc, ties alphabetical") {
    val rows = run("ml_string_indexer").collect()
    assert(rows.map(_.getAs[Int]("idx")).toSeq === rows.indices.toSeq)
    val pairs = rows.map(r =>
      (r.getAs[Long]("cnt"), r.getAs[String]("c_mktsegment"))).toSeq
    assert(pairs === pairs.sortBy { case (c, seg) => (-c, seg) },
      s"indexer order not (freq desc, name asc): $pairs")
  }

  test("banded MinHash finds every planted duplicate pair at Jaccard 1.0") {
    val rows = run("q_minhash_dedup").collect()
    val planted = rows.filter(r =>
      r.getAs[Long]("doc_b") === r.getAs[Long]("doc_a") + 10000L)
    assert(planted.length === 25, s"found ${planted.length}/25 planted dups")
    assert(planted.forall(_.getAs[Double]("jac") === 1.0))
  }
}
