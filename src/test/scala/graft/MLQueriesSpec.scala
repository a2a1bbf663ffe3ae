package graft

import org.apache.spark.sql.functions.{abs, avg, col, lit}
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

  test("ml_kmeans_assign is the exact argmin assignment under the pinned centroids") {
    // Driver-independent reference: the same (x-cx)²+(y-cy)² argmin with
    // cid tie-break, computed in plain Scala (identical JVM IEEE ops to the
    // codegen'd expressions) — pins the assignment-step semantics the
    // DuckDB oracle hashes.
    val feats = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_retailprice"),
        col("p_size").cast("double"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val cents = feats.filter(_._1 <= 8).sortBy(_._1)
    assert(cents.length === 9, "fixture must contain the pinned centroids (p_partkey 0..8)")
    val expect = feats.map { case (k, x, y) =>
      k -> cents.minBy { case (cid, cx, cy) =>
        ((x - cx) * (x - cx) + (y - cy) * (y - cy), cid)
      }._1
    }.toMap
    val got = run("ml_kmeans_assign").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === feats.length, "every part must receive a cluster")
    val diff = got.collect { case (k, c) if expect(k) != c => (k, c, expect(k)) }
    assert(diff.isEmpty, s"argmin disagreements (key, got, want): ${diff.take(5)}")
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

  /** The cluster-rec family's deterministic popularity, recomputed
    * independently of both engines (first 8 md5 hex chars mod 1000).
    */
  private def md5Pop(id: Long): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString, 16) % 1000L

  test("ml_cluster_serve assignment matches the plain-Scala argmin; top-3 pop-desc per cluster") {
    // Same driver-independent pinning as ml_kmeans_assign: argmin of
    // squared Euclidean distance (micro-unit floored, cid tie-break)
    // against the vec_id<8 centroids, recomputed in plain Scala.
    val all = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val cents = all.filter(_._1 < 8).sortBy(_._1)
    assert(cents.length === 8, "fixture must contain centroids vec_id 0..7")
    def d2u(a: Array[Double], b: Array[Double]): Long = {
      var aa, ab, bb = 0.0
      var i = 0
      while (i < a.length) { aa += a(i)*a(i); ab += a(i)*b(i); bb += b(i)*b(i); i += 1 }
      math.floor((aa - 2 * ab + bb) * 1e6 + 0.5).toLong
    }
    val expectCluster = all.map { case (id, v) =>
      id -> cents.minBy { case (cid, cv) => (d2u(v, cv), cid) }._1.toInt
    }.toMap
    val rows = run("ml_cluster_serve").collect()
    // not vacuous: every non-empty expected cluster must be served (the
    // per-group checks below iterate only over RETURNED rows)
    assert(rows.nonEmpty, "serving query returned no rows")
    assert(rows.map(_.getAs[Int]("cluster")).toSet === expectCluster.values.toSet,
      "served cluster set must equal the clusters that exist under the pinned centroids")
    rows.groupBy(_.getAs[Int]("cluster")).foreach { case (c, rs) =>
      assert(rs.length <= 3, s"cluster $c has ${rs.length} recs")
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      val pops = byRank.map(_.getAs[Long]("pop"))
      assert(pops.toSeq === pops.sortBy(-_).toSeq, s"cluster $c not pop-desc")
      byRank.foreach { r =>
        val id = r.getAs[Long]("vec_id")
        assert(expectCluster(id) === c, s"vec $id served from wrong cluster")
        assert(md5Pop(id) === r.getAs[Long]("pop"), s"vec $id pop mismatch")
      }
    }
    // each served doc really is the max-pop representative set of its cluster
    val topByCluster = all.groupBy { case (id, _) => expectCluster(id) }
      .view.mapValues(_.map { case (id, _) => (md5Pop(id), id) }
        .sortBy { case (p, id) => (-p, id) }.take(3).map(_._2).toSeq).toMap
    rows.groupBy(_.getAs[Int]("cluster")).foreach { case (c, rs) =>
      assert(rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("vec_id")).toSeq
        === topByCluster(c), s"cluster $c top-3 set mismatch")
    }
  }

  test("q_cluster_recs_trained serves each trained cluster's true top-3 by pop (r14)") {
    // The trained-ASSIGNMENT side is IvfSpec's standing claim (every
    // stored vector sits in the list of its nearest stored centroid; the
    // driver oracle replays the whole quantized-Lloyd training). What
    // this gate pins is the serving-side RANKING the r13 verdict's
    // stretch item named: the top-3-by-md5-pop per trained cluster,
    // recomputed independently in plain Scala from the store's
    // assignment table — plus non-vacuity (every non-empty trained
    // cluster served, and more than one cluster exists, so the ranking
    // measures a real partition of the corpus).
    val lists = graft.sources.IvfStore.trainedDet(spark, sfDir,
      graft.sources.IvfStore.DetK, graft.sources.IvfStore.DetIters, 1)
      .lists.select("vec_id", "bucket").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("bucket")))
    val topByCluster = lists.groupBy(_._2).view.mapValues(
      _.map { case (id, _) => (md5Pop(id), id) }
        .sortBy { case (p, id) => (-p, id) }.take(3).map(_._2).toSeq).toMap
    val rows = run("q_cluster_recs_trained").collect()
    assert(rows.nonEmpty, "trained cluster recs returned no rows")
    val served = rows.groupBy(_.getAs[Int]("cluster"))
    assert(served.keySet === topByCluster.keySet,
      "every non-empty trained cluster must be served")
    assert(served.size > 1,
      "discrimination: the trained codebook must partition the corpus " +
        "into more than one cluster")
    served.foreach { case (c, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq === (1 to rs.length),
        s"cluster $c ranks not contiguous from 1")
      assert(byRank.map(_.getAs[Long]("vec_id")).toSeq === topByCluster(c),
        s"cluster $c served set differs from the independent top-3")
      byRank.foreach(r =>
        assert(md5Pop(r.getAs[Long]("vec_id")) === r.getAs[Long]("pop"),
          s"pop mismatch for vec ${r.getAs[Long]("vec_id")}"))
    }
  }

  test("ml_tfidf_counts: exact integer df/tf intermediates, stopwords absent, total order") {
    val rows = run("ml_tfidf_counts").collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    val stops = org.apache.spark.ml.feature.StopWordsRemover
      .loadDefaultStopWords("english").toSet
    assert(rows.length <= 30)
    rows.foreach { r =>
      val (w, df, tf) = (r.getAs[String]("word"), r.getAs[Long]("df"),
        r.getAs[Long]("tf_total"))
      assert(!stops.contains(w), s"stopword '$w' survived the filter")
      assert(df >= 1 && df <= nDocs, s"'$w' df=$df out of range")
      assert(tf >= df, s"'$w' tf_total=$tf < df=$df")
      assert(w === w.toLowerCase, s"'$w' not lowercased by the tokenizer")
    }
    val keys = rows.map(r => (-r.getAs[Long]("df"), -r.getAs[Long]("tf_total"),
      r.getAs[String]("word"))).toSeq
    assert(keys === keys.sorted, "not ordered by (df desc, tf desc, word)")
  }

  test("ml_tfidf_counts expression tokenization equals the transformer stages ml_tfidf_similar runs") {
    // The counts query tokenizes with codegen expressions (no UDF in the
    // plan, nothing inferred into the scan filter); this pins that they
    // compute the SAME df/tf as the RegexTokenizer→StopWordsRemover
    // transform the MLlib path uses.
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.feature.{RegexTokenizer, StopWordsRemover}
    import org.apache.spark.sql.functions.explode
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val pipe = new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol("text").setOutputCol("toks").setPattern("\\s+"),
      new StopWordsRemover().setInputCol("toks").setOutputCol("words")))
    val expect = pipe.fit(docs).transform(docs)
      .select(col("doc_id"), explode(col("words")).as("word"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2)
      .map { case (w, occ) => (w, occ.map(_._1).distinct.size.toLong, occ.size.toLong) }
      .toSeq
      .sortBy { case (w, df, tf) => (-df, -tf, w) }.take(30)
    val got = run("ml_tfidf_counts").collect()
      .map(r => (r.getAs[String]("word"), r.getAs[Long]("df"),
        r.getAs[Long]("tf_total"))).toSeq
    assert(got === expect, "expression tokenization diverged from the transformer stages")
  }

  test("trained-IVF ANN reaches recall@5 >= 0.9 at nprobe 2 on clustered data") {
    // IVF's contract presumes locality, so the recall gate runs on a corpus
    // that HAS it: 20 deterministic well-separated centers × 15 members
    // with small perturbations. (The synthetic embeddings table is
    // uniform-random 64-dim — no quantizer can localize cosine neighbors
    // there; it gets the structural gates in the next test instead.)
    import spark.implicits._
    import graft.queries.LlmQueries
    // orthogonal basis centers (dim > #centers) + small deterministic noise:
    // within-cluster cosine ≈ 0.98, cross-cluster ≈ 0.05 — clean locality
    val dim = 32
    def vec(center: Int, member: Int): Array[Double] =
      Array.tabulate(dim) { j =>
        (if (j == center) 1.0 else 0.0) +
          0.05 * math.sin(center + member * 13 + j * 7)
      }
    val corpus = (for (c <- 0 until 20; m <- 0 until 15)
      yield (c * 15L + m, vec(c, m).toSeq)).toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r =>
        (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    // brute-force ground truth over the normalized corpus (the metric ANN
    // uses), computed in-Scala: 300 vectors
    val all = corpus.collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getSeq[Double](1).toArray)).sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d, na, nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val truth = (for ((qid, qv) <- all.filter(_._1 < 10)) yield {
      all.filter(_._1 != qid).map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(p => (qid, p._1))
    }).flatten.toSet
    val ann = pairs(LlmQueries.annTrainedOn(corpus, numQueries = 10,
      k = 20, nprobe = 2, topK = 5))
    val recall = (ann & truth).size.toDouble / truth.size
    assert(truth.size === 50)
    assert(recall >= 0.9, s"recall@5 = $recall at nprobe=2 on clustered corpus")
  }

  test("trained-IVF ANN on the random corpus: nprobe-monotone, full-probe ≡ brute force") {
    import graft.queries.LlmQueries
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r =>
        (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val truth = pairs(run("q_embed_cosine_topk"))
    assert(truth.size === 50)
    val r2 = (pairs(LlmQueries.annTrained(spark, sfDir, nprobe = 2)) & truth).size
    val r4 = (pairs(LlmQueries.annTrained(spark, sfDir, nprobe = 4)) & truth).size
    assert(r4 >= r2, s"recall must be monotone in nprobe ($r4 < $r2)")
    // probing every cell makes IVF exhaustive — it must recover brute force
    // (tolerance 1: cos is rounded to 3 decimals before ranking, and the
    // normalized dot in ANN can flip a rounding boundary vs the raw cosine)
    val rAll = (pairs(LlmQueries.annTrained(spark, sfDir, nprobe = 16)) & truth).size
    assert(rAll >= truth.size - 1, s"full probe recovered only $rAll/${truth.size}")
  }

  test("target encoding is leakage-free: each fold's encoding excludes its own rows") {
    // Sequential replay over the raw fixture: fold = key % 5, encoding for
    // (cat, fold) = mean cents of cat's rows in the OTHER folds.
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_orderkey"),
        graft.ops.Num.cents(col("o_totalprice")).as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1) % 5, r.getAs[Long]("cents")))
    val byCat = rows.groupBy(_._1)
    val byFold = rows.groupBy(_._2)
    val (nAll, sumAll) = (rows.length.toLong, rows.map(_._3).sum)
    val got = run("ml_target_encode").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (cat, fold) = (r.getAs[String]("cat"), r.getAs[Long]("fold"))
      val catRows = byCat(cat)
      val oof = catRows.filter(_._2 != fold)
      assert(r.getAs[Long]("n_oof") === oof.length.toLong)
      val enc = if (oof.nonEmpty) oof.map(_._3).sum / oof.length else -1L
      if (oof.nonEmpty) assert(r.getAs[Long]("enc_cents") === enc)
      val foldRows = byFold.getOrElse(fold, Array.empty[(String, Long, Long)])
      val prior = (sumAll - foldRows.map(_._3).sum) /
        (nAll - foldRows.length)
      assert(r.getAs[Long]("prior_cents") === prior)
      assert(r.getAs[Long]("enc_smooth_cents") ===
        (oof.map(_._3).sum + 20L * prior) / (oof.length + 20L))
    }
    // The exclusion is real: at least one cell's encoding differs from the
    // full-data category mean (otherwise the fold split did nothing).
    val leaky = byCat.view.mapValues(rs => rs.map(_._3).sum / rs.length).toMap
    assert(got.exists(r => r.getAs[Any]("enc_cents") != null &&
      r.getAs[Long]("enc_cents") != leaky(r.getAs[String]("cat"))))
  }

  test("model metadata reports the declared metrics with consistent values") {
    val m = run("ml_model_metadata").collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Double]("value")).toMap
    assert(m.keySet === Set("n_interactions", "n_users", "n_items", "sparsity"))
    assert(m("n_interactions") === Tables.part(spark, sfDir).count() * 8.0)
    val expectSparsity = 1.0 - m("n_interactions") / (m("n_users") * m("n_items"))
    assert(math.abs(m("sparsity") - expectSparsity) < 1e-3)
  }

  test("q_mf_trained: the det-ALS user solve IS the regularized least-squares solution (residual bound)") {
    // x = floor(S²·adj(A)·b / det(A)) with ε ∈ [0,1)² of floor error, so
    // A·x must sit within one row-abs-sum of A from S²·b — an exactness
    // pin on the SOLVER, independent of fit quality. BigInt throughout
    // (A entries exceed Long in products).
    import graft.queries.MLQueries
    val (x, _, ratings) = MLQueries.mfFactors(spark, sfDir)
    val S = BigInt(1000); val lam = S * S
    val xs = x.collect().map(r => r.getLong(0) -> (BigInt(r.getLong(1)), BigInt(r.getLong(2)))).toMap
    val rows = ratings.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = rows.groupBy(_._1)
    var checked = 0
    byUser.foreach { case (u, rs) =>
      var a, b, c, d1, d2 = BigInt(0)
      rs.foreach { case (_, item, rr) =>
        val y1 = S; val y2 = BigInt(item % 3) * S
        a += y1 * y1; b += y1 * y2; c += y2 * y2
        d1 += BigInt(rr) * y1; d2 += BigInt(rr) * y2
      }
      val (a11, a22) = (a + lam, c + lam)
      val (x1, x2) = xs(u)
      val r1 = (a11 * x1 + b * x2 - S * S * d1).abs
      val r2 = (b * x1 + a22 * x2 - S * S * d2).abs
      assert(r1 <= a11 + b && r2 <= b + a22,
        s"user $u solve residual out of floor-error bound: $r1 / $r2")
      checked += 1
    }
    assert(checked > 50, s"vacuous fixture: only $checked users")
  }

  test("q_mf_trained: the fit LEARNS the additive structure (in-sample MAE gate)") {
    // ratings are r = 1 + (u mod 3) + (i mod 3) = exactly rank-2; after
    // one alternation the factorization must beat the constant-3
    // baseline by a wide margin, not just reproduce itself — this gate
    // caught a real S¹-vs-S² scaling bug the cross-engine hash gate
    // replays identically on both sides and can never see.
    import graft.queries.MLQueries
    val (x, y, ratings) = MLQueries.mfFactors(spark, sfDir)
    val row = ratings.join(x, Seq("user_id")).join(y, Seq("item_id"))
      .select(avg(abs((col("x1") * col("ny1") + col("x2") * col("ny2"))
          .cast("double") / 1e6 - col("r"))).as("mae"),
        avg(abs(lit(3.0) - col("r"))).as("baseline"))
      .collect()(0)
    val (mae, baseline) = (row.getDouble(0), row.getDouble(1))
    assert(mae <= 0.15, s"det-ALS in-sample MAE $mae above gate 0.15")
    assert(mae < baseline / 4,
      s"det-ALS MAE $mae not clearly better than constant baseline $baseline")
  }

  test("q_mf_implicit_trained: gram-corrected solve is exact; observed pairs outscore unobserved") {
    import graft.queries.MLQueries
    val (x, y, ratings) = MLQueries.mfImplicitFactors(spark, sfDir)
    // (a) solver pin: A_u = G + Σ r·y yᵀ + λI, b_u = Σ (1+r)·y, and the
    // stored x must satisfy |A·x − S·Sx·b| within the floor-error bound
    // (one row-abs-sum of A) — BigInt, gram recomputed independently
    val S = BigInt(1000); val Sx = BigInt(1000000); val lam = S * S
    val rows = ratings.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val items = rows.map(_._2).distinct
    var ga, gb, gc = BigInt(0)
    items.foreach { i =>
      val y1 = S; val y2 = BigInt(i % 3) * S
      ga += y1 * y1; gb += y1 * y2; gc += y2 * y2
    }
    val xs = x.collect().map(r => r.getLong(0) -> (BigInt(r.getLong(1)), BigInt(r.getLong(2)))).toMap
    var checked = 0
    rows.groupBy(_._1).foreach { case (u, rs) =>
      var sa, sb, sc, d1, d2 = BigInt(0)
      rs.foreach { case (_, item, rr) =>
        val y1 = S; val y2 = BigInt(item % 3) * S
        sa += BigInt(rr) * y1 * y1; sb += BigInt(rr) * y1 * y2
        sc += BigInt(rr) * y2 * y2
        d1 += BigInt(rr + 1) * y1; d2 += BigInt(rr + 1) * y2
      }
      val (a11, bb, a22) = (sa + ga + lam, sb + gb, sc + gc + lam)
      val (x1, x2) = xs(u)
      val r1 = (a11 * x1 + bb * x2 - S * Sx * d1).abs
      val r2 = (bb * x1 + a22 * x2 - S * Sx * d2).abs
      assert(r1 <= a11 + bb && r2 <= bb + a22,
        s"user $u implicit solve residual out of bound: $r1 / $r2")
      checked += 1
    }
    assert(checked > 50, s"vacuous fixture: only $checked users")
    // (b) the model DISCRIMINATES: mean score of observed pairs must
    // exceed unobserved by a clear margin (p = 1 vs 0 is what implicit
    // MF fits; measured 14–18% at spec/driver SFs, gate at 5%)
    val all = x.crossJoin(org.apache.spark.sql.functions.broadcast(y))
      .join(ratings.withColumn("obs", lit(1)),
        Seq("user_id", "item_id"), "left_outer")
      .withColumn("s",
        (col("x1") * col("ny1") + col("x2") * col("ny2")).cast("double") / 1e9)
    val m = all.groupBy(org.apache.spark.sql.functions
        .coalesce(col("obs"), lit(0)).as("o"))
      .agg(avg(col("s")).as("m")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(m(1) > m(0) * 1.05,
      s"implicit fit does not discriminate: obs=${m(1)} unobs=${m(0)}")
  }

  test("q_tfidf_topk_trained: full ranking per seed, positive ordered scores (r13)") {
    // the det retrieval twin's structural contract (the hash gate pins
    // the values; this pins the SHAPE a refactor could silently break):
    // all 5 seeds present, ranks dense 1..5, scores strictly positive
    // and non-increasing within each seed, tie-break total order
    val out = SparkEntry.queries("q_tfidf_topk_trained")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val bySeed = out.groupBy(_._1)
    assert(bySeed.keySet === Set(0L, 1L, 2L, 3L, 4L), s"seeds: ${bySeed.keySet}")
    bySeed.foreach { case (seed, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to 5), s"seed $seed ranks")
      assert(sorted.forall(_._4 > 0L), s"seed $seed non-positive score")
      assert(sorted.map(_._4).toSeq ==
        sorted.map(_._4).sortBy(x => -x).toSeq, s"seed $seed not ordered")
      assert(!sorted.exists(_._3 == seed), s"seed $seed returned itself")
    }
  }

  test("q_cv_popularity: folds partition the interactions; item-mean beats the constant baseline in EVERY fold (r13)") {
    // The hash gate pins the values; this pins the PROTOCOL and the
    // MODEL: (a) the 5 md5-derived folds cover every interaction
    // exactly once (their n_test sums to |ratings|), and (b) the
    // cross-validated item-mean model beats the constant global-mean
    // baseline in every fold — on the additive synthetic ratings the
    // constant predictor's expected absolute error is 8/9 ≈ 889 milli
    // (|u%3 + i%3 − 2| over uniform residues), while conditioning on
    // the item removes the i%3 term (~667 milli) — so a fold whose
    // MAE reaches 800 means the evaluation learned nothing and the
    // gate fails loudly.
    val out = SparkEntry.queries("q_cv_popularity")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.map(_._1).toSet === (0L to 4L).toSet, "all 5 folds present")
    val nTotal = graft.queries.MLQueries.mfRatings(spark, sfDir).count()
    assert(out.map(_._2).sum === nTotal,
      s"fold sizes must partition the ${nTotal} interactions")
    out.foreach { case (fold, n, sumAbs, mae) =>
      assert(n > 0L, s"fold $fold empty")
      assert(mae === sumAbs / n, s"fold $fold mae not floor(sum/n)")
      assert(mae < 800L,
        s"fold $fold MAE $mae does not beat the 889-milli constant baseline")
    }
  }

  test("q_learning_curve: training prefixes grow, the fixed test set holds, and the curve actually descends (r13)") {
    // The hash gate pins the values; this pins the SHAPE the op exists
    // for: 10 prefixes, a test set that never changes across them,
    // strictly growing training pools, and a curve where the full pool
    // beats the tenth pool AND the 889-milli constant baseline — a
    // flat or rising curve means the sample-efficiency measurement
    // measured nothing.
    val out = SparkEntry.queries("q_learning_curve")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.map(_._1).toSeq === (1L to 10L), "prefixes 1..10 in order")
    assert(out.map(_._3).toSet.size === 1, "test set fixed across prefixes")
    assert(out.sliding(2).forall { case Array(a, b) => b._2 > a._2 },
      "training pool must strictly grow with the prefix")
    val mae = out.map(_._5)
    assert(mae.last < mae.head,
      s"full-pool MAE ${mae.last} must beat tenth-pool ${mae.head}")
    assert(mae.last < 800L,
      s"full-pool MAE ${mae.last} must beat the 889-milli constant baseline")
  }

  test("q_hyperparam_sweep: the selection discriminates — best lambda beats over-shrinkage and the baseline (r13)") {
    // The hash gate pins the values; this pins what selection MEANS:
    // the grid is evaluated on one fixed fold, the best lambda's MAE
    // beats both lambda = 1000 (which collapses the model toward the
    // 889-milli constant predictor) and the baseline itself, and the
    // fold never changes across the grid. A sweep where every lambda
    // ties has measured nothing and fails here.
    val out = SparkEntry.queries("q_hyperparam_sweep")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.map(_._1).toSeq ===
      Seq(0L, 1L, 2L, 5L, 10L, 20L, 100L, 1000L), "the declared grid")
    assert(out.map(_._2).toSet.size === 1, "one fixed evaluation fold")
    val byLambda = out.map(t => t._1 -> t._4).toMap
    val best = out.map(_._4).min
    assert(best < byLambda(1000L),
      s"best $best must beat over-shrinkage ${byLambda(1000L)}")
    assert(best < 800L,
      s"best $best must beat the 889-milli constant baseline")
  }

  test("q_cv_popularity: the global-minus-fold plan equals a literal per-fold recompute (r13)") {
    // The query's one clever step is the identity train(item, ¬f) =
    // tot(item) − fold(item, f); this gate recomputes every fold the
    // LITERAL way — five separate train/predict passes in plain Scala
    // on the collected interactions, md5 folds re-derived with
    // java.security.MessageDigest — and demands exact equality with
    // the query's output, independently of BOTH engines' SQL.
    val rows = graft.queries.MLQueries.mfRatings(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def fold(u: Long, i: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${u}_$i".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"$b%02x").mkString, 16) % 5
    }
    val folded = rows.map { case (u, i, r) => (fold(u, i), u, i, r) }
    val expected = (0L to 4L).map { f =>
      val train = folded.filter(_._1 != f)
      val test = folded.filter(_._1 == f)
      val byItem = train.groupBy(_._3)
        .map { case (i, rs) => i -> (rs.map(_._4).sum, rs.size.toLong) }
      val (gs, gc) = (train.map(_._4).sum, train.size.toLong)
      val errs = test.map { case (_, _, i, r) =>
        val pred = byItem.get(i) match {
          case Some((s, c)) if c > 0 => 1000L * s / c
          case _ if gc > 0 => 1000L * gs / gc
          case _ => 3000L
        }
        math.abs(1000L * r - pred)
      }
      (f, test.size.toLong, errs.sum, errs.sum / test.size)
    }
    val got = SparkEntry.queries("q_cv_popularity")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === expected,
      "global-minus-fold plan diverged from the literal per-fold recompute")
  }

  test("q_learning_curve: the prefix-partial plan equals a literal per-prefix recompute (r13)") {
    // Same discipline as the CV gate: ten separate train/predict passes
    // in plain Scala (test split and buckets re-derived from md5 with
    // their salts), exact equality with the query output — the
    // partials-join-prefix-table trick is proven against the definition,
    // independent of both engines.
    val rows = graft.queries.MLQueries.mfRatings(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def h(u: Long, i: Long, salt: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${u}_$i$salt".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"$b%02x").mkString, 16) % 10
    }
    val tagged = rows.map { case (u, i, r) =>
      (h(u, i, "lt"), h(u, i, "lb"), u, i, r) }
    val test = tagged.filter(_._1 == 9L)
    val pool = tagged.filter(_._1 != 9L)
    val expected = (1L to 10L).map { p =>
      val train = pool.filter(_._2 < p)
      val byItem = train.groupBy(_._4)
        .map { case (i, rs) => i -> (rs.map(_._5).sum, rs.size.toLong) }
      val (gs, gc) = (train.map(_._5).sum, train.size.toLong)
      val errs = test.map { case (_, _, _, i, r) =>
        val pred = byItem.get(i) match {
          case Some((s, c)) if c > 0 => 1000L * s / c
          case _ if gc > 0 => 1000L * gs / gc
          case _ => 3000L
        }
        math.abs(1000L * r - pred)
      }
      (p, train.size.toLong, test.size.toLong, errs.sum,
        errs.sum / test.size)
    }
    val got = SparkEntry.queries("q_learning_curve")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected,
      "prefix-partial plan diverged from the literal per-prefix recompute")
  }

  test("q_hyperparam_sweep: the broadcast-grid plan equals a literal per-lambda recompute (r13)") {
    // Completes the triad's definitional symmetry: eight separate
    // shrinkage evaluations in plain Scala, exact equality.
    val rows = graft.queries.MLQueries.mfRatings(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def fold(u: Long, i: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${u}_$i".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"$b%02x").mkString, 16) % 5
    }
    val folded = rows.map { case (u, i, r) => (fold(u, i), u, i, r) }
    val test = folded.filter(_._1 == 0L)
    val train = folded.filter(_._1 != 0L)
    val byItem = train.groupBy(_._3)
      .map { case (i, rs) => i -> (rs.map(_._4).sum, rs.size.toLong) }
    val mu = 1000L * train.map(_._4).sum / train.size
    val expected = Seq(0L, 1L, 2L, 5L, 10L, 20L, 100L, 1000L).map { lam =>
      val errs = test.map { case (_, _, i, r) =>
        val (s, c) = byItem.getOrElse(i, (0L, 0L))
        val pred = if (c + lam > 0) (1000L * s + lam * mu) / (c + lam)
                   else mu
        math.abs(1000L * r - pred)
      }
      (lam, test.size.toLong, errs.sum, errs.sum / test.size)
    }
    val got = SparkEntry.queries("q_hyperparam_sweep")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === expected,
      "broadcast-grid plan diverged from the literal per-lambda recompute")
  }

  test("the r16 staged fits (parts-KMeans, embed-KMeans, TF-IDF) build once per session and serve reloaded models") {
    import graft.queries.MLQueries
    // session-cache identity: a second access must return the SAME
    // loaded-model handle, never refit (the alsFits discipline — the
    // three queries these stage for time transform/serving only)
    assert(MLQueries.kmPartsFit(spark, sfDir) eq
      MLQueries.kmPartsFit(spark, sfDir), "kmPartsFit refit")
    assert(MLQueries.kmEmbedFit(spark, sfDir) eq
      MLQueries.kmEmbedFit(spark, sfDir), "kmEmbedFit refit")
    assert(MLQueries.tfidfFit(spark, sfDir) eq
      MLQueries.tfidfFit(spark, sfDir), "tfidfFit refit")
    // and the handles ARE reloaded saved models, not the in-memory fit:
    // the ML writer round-trip drops the parent estimator reference
    // (hasParent == false is the load fingerprint). ALL THREE, so a
    // refactor that drops one fit's save/load round-trip — serving the
    // block-manager-resident in-memory fit the sweep can evict — can't
    // slip past the gate (review r16).
    assert(!MLQueries.kmPartsFit(spark, sfDir).hasParent,
      "kmPartsFit is serving the in-memory fit, not the reloaded model")
    assert(!MLQueries.kmEmbedFit(spark, sfDir).hasParent,
      "kmEmbedFit is serving the in-memory fit, not the reloaded model")
    assert(!MLQueries.tfidfFit(spark, sfDir).hasParent,
      "tfidfFit is serving the in-memory fit, not the reloaded model")
  }
}
