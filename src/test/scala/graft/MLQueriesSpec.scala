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

  private def assertRankedPerGroup(name: String, group: String, k: Int,
      scoreDesc: Option[String] = None): Unit = {
    val rows = run(name).collect()
    rows.groupBy(_.getAs[Any](group)).foreach { case (g, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted.toSeq
      assert(ranks === (1 to ranks.size), s"$name group $g ranks: $ranks")
      assert(ranks.size <= k, s"$name group $g exceeds top-$k")
      scoreDesc.foreach { sc =>
        val scores = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double](sc))
        assert(scores.toSeq === scores.sortBy(-_).toSeq,
          s"$name group $g not ranked by $sc desc")
      }
    }
  }

  test("ALS recommendations are dense ranked top-5 per requested user") {
    assertRankedPerGroup("ml_als_recommend", "user_id", 5)
    assert(run("ml_als_recommend").select("user_id").distinct().count() === 10)
  }

  test("implicit NMF-equivalent recommendations share the ranked shape") {
    assertRankedPerGroup("ml_nmf_implicit", "user_id", 5)
  }

  test("TF-IDF similar excludes the seed and ranks by cosine desc in [-1,1]") {
    assertRankedPerGroup("ml_tfidf_similar", "seed_id", 5, Some("cos"))
    val rows = run("ml_tfidf_similar").collect()
    assert(rows.forall(r => r.getAs[Long]("doc_id") != r.getAs[Long]("seed_id")),
      "W3: seed must be excluded from its own similar list")
    assert(rows.forall(r => math.abs(r.getAs[Double]("cos")) <= 1.0001))
  }

  test("cluster recs keep <=3 per cluster ranked by popularity desc") {
    val rows = run("ml_cluster_recs").collect()
    rows.groupBy(_.getAs[Int]("cluster")).foreach { case (c, rs) =>
      assert(rs.length <= 3, s"cluster $c has ${rs.length} recs")
      val pops = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("pop"))
      assert(pops.toSeq === pops.sortBy(-_).toSeq, s"cluster $c not pop-desc")
    }
  }

  test("model metadata reports the declared metrics with consistent values") {
    val m = run("ml_model_metadata").collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Double]("value")).toMap
    assert(m.keySet === Set("n_interactions", "n_users", "n_items", "sparsity"))
    assert(m("n_interactions") === Tables.part(spark, sfDir).count() * 8.0)
    val expectSparsity = 1.0 - m("n_interactions") / (m("n_users") * m("n_items"))
    assert(math.abs(m("sparsity") - expectSparsity) < 1e-3)
  }
}
