package graft

import org.apache.spark.sql.functions._
import graft.sources.IvfStore
import graft.tables.Tables

/** Gates for the persisted IVF index: list contents equal a direct
  * quantization, and a single-list probe bucket-prunes to one bucket —
  * the |corpus|/nlists serving-cost claim.
  */
class IvfSpec extends SparkSpec {

  test("stored inverted lists equal a direct quantization of the corpus") {
    val got = IvfStore.lists(spark, sfDir)
      .select("vec_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    val expect = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), IvfStore.bucketOf(
        col("embedding").cast("array<double>")).as("bucket"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(got === expect)
    assert(got.map(_._2).distinct.length > 1,
      "the quantizer must spread the fixture across lists")
  }

  test("multi-probe dominates single-probe at every rank") {
    // nprobe=5 sees a candidate superset of nprobe=1, so at each
    // (query, rank) the multi-probe cosine must be >= the single-probe
    // cosine — and on the fixture at least one query must genuinely
    // improve, or the probe expansion is vacuous.
    val single = SparkEntry.queries("q_ann_ivf")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(4)).toMap
    val multi = SparkEntry.queries("q_ann_ivf_probe")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(4))
      .toMap
    assert(multi.keySet === single.keySet)
    single.foreach { case (k, cosS) =>
      assert(multi(k) >= cosS, s"rank $k regressed: ${multi(k)} < $cosS")
    }
    assert(single.exists { case (k, cosS) => multi(k) > cosS },
      "the extra lists must improve at least one result on the fixture")
  }

  test("trained layout: every vector sits in its nearest stored centroid's list") {
    // The definitional invariant that survives any KMeans fit detail:
    // for each stored (vn, bucket), no OTHER stored centroid is
    // strictly closer than bucket's own. Also the serving path:
    // ml_ann_trained reads this layout and must produce 5 ranked
    // neighbors for each of the 10 queries with sane cosines.
    val st = graft.sources.IvfStore.trained(spark, sfDir, 16)
    val cents = st.centroids.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    st.lists.collect().foreach { r =>
      val vn = r.getSeq[Double](1).toArray
      val own = d2(vn, cents(r.getInt(2)))
      cents.foreach { case (b, cv) =>
        assert(d2(vn, cv) >= own - 1e-9,
          s"vec ${r.getLong(0)} in list ${r.getInt(2)} but list $b is closer")
      }
    }
    val served = SparkEntry.queries("ml_ann_trained")(spark, sfDir)
      .collect()
    assert(served.length === 50)
    assert(served.map(_.getLong(0)).distinct.length === 10)
    assert(served.forall(r => math.abs(r.getDouble(3)) <= 1.0001))
  }

  test("the trained store's SERVED ranking equals the library path row for row") {
    // r10 ADVICE: the registry's ml_ann_trained switched to the standing
    // IvfStore.trained layout while the recall gates stayed on the
    // library path — gate the SERVED rows directly. Same data, same
    // seed, same session ⇒ the store's fit and annTrained's fit are the
    // same deterministic KMeans, so the served (q_id, rank, vec_id, cos)
    // table must match exactly; a regression in the store's probe or
    // layout shows up here, not just in shape checks.
    val served = SparkEntry.queries("ml_ann_trained")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val lib = graft.queries.LlmQueries.annTrained(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(served === lib)
  }

  test("deterministic quantized-Lloyd layout: assignment invariant + recall sanity") {
    // q_ann_recall_trained's store. The codebook a vector was assigned
    // against is the PREVIOUS round's (Lloyd semantics), so a
    // nearest-final-centroid check would be wrong by design; the
    // externally checkable invariants are (a) buckets cover the corpus
    // exactly once, (b) k lists and centroids line up, (c) the recall
    // table behaves: nprobe=2 dominates nprobe=1 and truth is 5 per
    // query. (The full value-level proof is the DuckDB hash gate, which
    // replays the training step for step.)
    val st = IvfStore.trainedDet(spark, sfDir, IvfStore.DetK, IvfStore.DetIters)
    val n = Tables.embeddings(spark, sfDir).count()
    assert(st.lists.count() === n)
    assert(st.lists.select("vec_id").distinct().count() === n)
    assert(st.centroids.count() === 8)
    val buckets = st.lists.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(buckets.subsetOf((0 until 8).toSet))
    val rec = SparkEntry.queries("q_ann_recall_trained")(spark, sfDir)
      .collect()
    assert(rec.length === 10)
    rec.foreach { r =>
      assert(r.getLong(1) === 5L, "truth must be top-5 per query")
      assert(r.getLong(3) >= r.getLong(2),
        s"nprobe=2 must dominate nprobe=1 for q_id ${r.getLong(0)}")
    }
  }

  test("trainedPq: full and sampled fits encode the FULL corpus exactly once per subspace (r14)") {
    // The sampled variant's defining invariant — Lloyd on the
    // vec_id % SampleEvery = 0 subset, encode EVERYTHING — has to be
    // pinned here (review r14): a regression that encoded only the fit
    // subset would keep ~1/SampleEvery of truth reachable and could
    // still clear the serving spec's recall floor. The coverage checks
    // are the trainedDet discipline; the value-level proof stays the
    // DuckDB hash gate, which replays the (sampled) training.
    val n = Tables.embeddings(spark, sfDir).count()
    for (fitEvery <- Seq(1, IvfStore.SampleEvery)) {
      val tp = IvfStore.trainedPq(spark, sfDir, fitEvery = fitEvery)
      assert(tp.codebook.count() === IvfStore.PqM.toLong * IvfStore.PqKsub,
        s"fitEvery=$fitEvery: codebook must hold m×ksub rows")
      assert(tp.codes.count() === n * IvfStore.PqM,
        s"fitEvery=$fitEvery: every vector must be encoded in every subspace")
      assert(tp.codes.select("vec_id").distinct().count() === n,
        s"fitEvery=$fitEvery: codes must cover the FULL corpus, not the fit subset")
      val cells = tp.codes.select("cell").distinct()
        .collect().map(_.getInt(0)).toSet
      assert(cells.subsetOf((0 until IvfStore.PqKsub).toSet))
    }
  }

  test("owned IVF index: append equals rebuild, probes prune across base + delta files") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sfDir)
    val ids = e.select("vec_id").orderBy("vec_id")
      .collect().map(_.getLong(0))
    val cut1 = ids(ids.length / 2)
    val cut2 = ids(3 * ids.length / 4)
    val root = java.nio.file.Files
      .createTempDirectory("graft-ivfincr").toString
    val idx = new IvfStore.IvfIndex(spark, "graft_ivf_incr_t",
      s"$root/lists")
    idx.build(e.filter(col("vec_id") < cut1))
    idx.append(e.filter(col("vec_id") >= cut1 && col("vec_id") < cut2))
    idx.append(e.filter(col("vec_id") >= cut2))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    val want = e.select(col("vec_id"), IvfStore.bucketOf(
        col("embedding").cast("array<double>")).as("bucket"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(rows(idx.read) === want,
      "incremental index must equal the full quantization")
    // pruning survives the multi-file buckets appends create
    withConf("spark.sql.sources.bucketing.autoBucketedScan.enabled",
      "false") {
      val plan = idx.read.filter(col("bucket") === 5)
        .queryExecution.executedPlan.toString
      assert(plan.contains(
        s"SelectedBucketsCount: 1 out of ${IvfStore.nLists}"),
        s"append must not break bucket pruning:\n$plan")
    }
    spark.sql("DROP TABLE IF EXISTS graft_ivf_incr_t")
    deleteRecursively(root)
  }

  test("streaming IVF: redelivery rewrites, fold is answer-invariant, marker fails loudly") {
    import spark.implicits._
    import org.apache.spark.sql.Encoder
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import org.apache.hadoop.fs.Path
    val all = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<float>"),
        col("label"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2))).toSeq
    val (baseE, deltas) = all.splitAt(all.size / 2)
    val (d1, d2) = deltas.splitAt(deltas.size / 2)
    val root = java.nio.file.Files
      .createTempDirectory("graft-ivfstream").toString
    def toDf(rows: Seq[(Long, Seq[Float], Int)]) =
      spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
    val idx = new IvfStore.IvfIndex(spark, "graft_ivf_stream_t",
      s"$root/base")
    idx.build(toDf(baseE))
    val sv = new IvfStore.StreamingIvf(spark, idx, s"$root/deltas")
    val ckpt = s"$root/ckpt"
    val ms = MemoryStream[(Long, Seq[Float], Int)](
      implicitly[Encoder[(Long, Seq[Float], Int)]], spark.sqlContext)
    def start() = sv.appendStream(
      ms.toDF().toDF("vec_id", "embedding", "label"), ckpt)
    val q1 = start()
    try {
      ms.addData(d1); q1.processAllAvailable()
      ms.addData(d2); q1.processAllAvailable()
    } finally q1.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    val want = rows(Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), IvfStore.bucketOf(
        col("embedding").cast("array<double>")).as("bucket")))
    assert(rows(sv.read) === want, "base + streamed deltas = full corpus")
    // force redelivery of batch 1 (the family's crash-window move)
    val fs = new Path(ckpt).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new Path(ckpt, "commits/1"), false))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(rows(sv.read) === want,
      "a redelivered batch must rewrite its own delta, never duplicate")
    sv.foldDeltas()
    assert(rows(sv.read) === want && rows(idx.read) === want)
    assert(!fs.exists(new Path(s"$root/deltas/batch=0")))
    fs.create(new Path(s"$root/deltas/_folding"), true).close()
    intercept[IllegalArgumentException](sv.read)
    intercept[IllegalArgumentException](sv.foldDeltas())
    spark.sql("DROP TABLE IF EXISTS graft_ivf_stream_t")
    deleteRecursively(root)
  }

  test("q_ivf_probe_sweep: hits provably non-decreasing; the DetK-probe anchor is exact (r15)") {
    val n = Tables.embeddings(spark, sfDir).count()
    val rows = SparkEntry.queries("q_ivf_probe_sweep")(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq === IvfStore.ProbeSweepRates,
      "sweep rows must cover ProbeSweepRates exactly, in order")
    rows.foreach { r =>
      assert(r.getLong(2) === 50L, s"nprobe ${r.getInt(0)}: truth = 10×5")
      assert(r.getLong(4) === 10000L * r.getLong(3) / r.getLong(2))
    }
    // THEOREM gates (not just measurements): candidate sets nest in
    // nprobe and anything closer than a global-top-5 member is itself
    // one, so per-rate hits can never decrease...
    val hits = rows.map(_.getLong(3))
    assert(hits.zip(hits.tail).forall { case (a, b) => a <= b },
      s"hits must be non-decreasing in nprobe: ${hits.toSeq}")
    // non-decreasing IS the theorem (nesting); STRICT growth is not —
    // a valid layout can leave a probed bucket empty (duplicate
    // centroids tie-break to the lowest bucket), so adjacent points
    // may scan identical sets (review r15 III)
    val cands = rows.map(_.getLong(1))
    assert(cands.zip(cands.tail).forall { case (a, b) => a <= b },
      s"scanned candidates must be non-decreasing in nprobe: ${cands.toSeq}")
    // measured discrimination (this fixture fills every list): the
    // cheapest probe scans a strict subset of the full scan
    assert(cands.head < cands.last,
      s"nprobe=1 must scan fewer candidates than the full probe: ${cands.toSeq}")
    // ...and the DetK-probe row scans everything: recall is exactly
    // 100% and the candidate count exactly |queries|·(|V|−1)
    assert(rows.last.getLong(4) === 10000L,
      "full-probe recall must be exactly 10000 bp")
    assert(rows.last.getLong(1) === 10L * (n - 1),
      s"full-probe candidates must be 10·(|V|−1) = ${10 * (n - 1)}")
    // the curve discriminates: the cheapest probe must not already be
    // at the anchor (a degenerate routing would gate nothing)
    assert(hits.head < hits.last,
      s"nprobe=1 must trade recall for scan (hits ${hits.toSeq})")
  }

  test("q_ivfpq_grid: nesting + full-probe ≡ unrestricted sweep + the composed point sits on the grid (r16)") {
    val n = Tables.embeddings(spark, sfDir).count()
    val nq = IvfStore.NQueries
    val grid = SparkEntry.queries("q_ivfpq_grid")(spark, sfDir).collect()
    // rows ≡ ProbeSweepRates × PqSweepRates, ordered
    assert(grid.map(r => (r.getInt(0), r.getInt(1))).toSeq ===
      (for { p <- IvfStore.ProbeSweepRates; f <- IvfStore.PqSweepRates }
        yield (p, f)),
      "grid rows must cover ProbeSweepRates × PqSweepRates exactly")
    grid.foreach { r =>
      assert(r.getLong(3) === nq * 5L,
        s"cell (${r.getInt(0)}, ${r.getInt(1)}): truth = $nq×5")
      // THEOREM: a truth member in the 32-shortlist always survives the
      // exact rerank (at most 4 closer vectors exist), so rerank hits
      // dominate raw-ADC hits cell for cell
      assert(r.getLong(5) >= r.getLong(4),
        s"cell (${r.getInt(0)}, ${r.getInt(1)}): rerank < ADC")
      assert(r.getLong(6) === 10000L * r.getLong(4) / r.getLong(3))
      assert(r.getLong(7) === 10000L * r.getLong(5) / r.getLong(3))
    }
    // THEOREM: routing is rate-independent — the 4 rates of one probe
    // count scan the SAME candidate set — and candidate sets nest in
    // nprobe; the full probe scans all |queries|·(|V|−1) pairs
    val candsByProbe = grid.groupBy(_.getInt(0)).view
      .mapValues(_.map(_.getLong(2)).distinct).toMap
    candsByProbe.foreach { case (p, cs) =>
      assert(cs.size === 1, s"nprobe $p: n_cand differs across rates $cs")
    }
    val cands = IvfStore.ProbeSweepRates.map(candsByProbe(_).head)
    assert(cands.zip(cands.tail).forall { case (a, b) => a <= b },
      s"n_cand must be non-decreasing in nprobe: $cands")
    assert(cands.last === nq * (n - 1),
      s"full-probe candidates must be ${nq}·(|V|−1) = ${nq * (n - 1)}")
    // THEOREM: at the full probe the candidate set is ALL pairs, so the
    // restricted ADC ≡ the unrestricted one — the grid's nprobe = DetK
    // rows must equal ◆ q_pq_sample_sweep's rows rate for rate
    val sweep = SparkEntry.queries("q_pq_sample_sweep")(spark, sfDir)
      .collect().map(r => r.getInt(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    grid.filter(_.getInt(0) === IvfStore.DetK).foreach { r =>
      assert((r.getLong(4), r.getLong(5)) === sweep(r.getInt(1)),
        s"full-probe cell rate ${r.getInt(1)} ≠ unrestricted sweep row")
    }
    // and the composed single point ◆ q_ann_ivfpq aggregates onto its
    // grid cell (ComposedNProbe, fitEvery = 1) — hits AND total scan
    val pt = SparkEntry.queries("q_ann_ivfpq")(spark, sfDir).collect()
    val cell = grid.find(r =>
      r.getInt(0) === IvfStore.ComposedNProbe && r.getInt(1) === 1).get
    assert((pt.map(_.getLong(1)).sum, pt.map(_.getLong(3)).sum,
        pt.map(_.getLong(4)).sum) ===
      ((cell.getLong(2), cell.getLong(4), cell.getLong(5))),
      "q_ann_ivfpq's aggregated rows must BE the grid's composed cell")
  }

  test("streaming PQ codes: append+serve ≡ rebuild+serve, redelivery rewrites, fold compacts (r15)") {
    import spark.implicits._
    import org.apache.spark.sql.Encoder
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import org.apache.hadoop.fs.Path
    // the published codebook is the staged trained layout's; the
    // REBUILD oracle is that layout's own full-corpus code table, so
    // this gate literally proves append+serve ≡ rebuild+serve (the ADC
    // serving stack is a pure function of codebook + codes)
    val tp = IvfStore.trainedPq(spark, sfDir)
    val all = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<float>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val (baseE, deltas) = all.splitAt(all.size / 2)
    val (d1, d2) = deltas.splitAt(deltas.size / 2)
    assert(d1.nonEmpty && d2.nonEmpty, "fixture deltas empty — vacuous")
    val root = java.nio.file.Files
      .createTempDirectory("graft-pqstream").toString
    def toDf(rows: Seq[(Long, Seq[Float])]) =
      spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val idx = new IvfStore.PqIndex(spark, tp.codebook,
      "graft_pq_stream_t", s"$root/base")
    idx.build(toDf(baseE))
    val sv = new IvfStore.StreamingPqCodes(spark, idx, s"$root/deltas")
    val ckpt = s"$root/ckpt"
    val ms = MemoryStream[(Long, Seq[Float])](
      implicitly[Encoder[(Long, Seq[Float])]], spark.sqlContext)
    def start() = sv.appendStream(
      ms.toDF().toDF("vec_id", "embedding"), ckpt)
    val q1 = start()
    try {
      ms.addData(d1); q1.processAllAvailable()
      ms.addData(d2); q1.processAllAvailable()
    } finally q1.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "s", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    val want = rows(tp.codes)
    assert(rows(sv.read) === want,
      "base + streamed deltas must equal the trained layout's rebuild")
    // force redelivery of batch 1 (the family's crash-window move)
    val fs = new Path(ckpt).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new Path(ckpt, "commits/1"), false))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(rows(sv.read) === want,
      "a redelivered batch must rewrite its own delta, never duplicate")
    sv.foldDeltas()
    assert(rows(sv.read) === want && rows(idx.read) === want)
    assert(!fs.exists(new Path(s"$root/deltas/batch=0")))
    // the ADC aggregate's exchange-free contract survives the fold's
    // appended files: vec_id bucket pruning still selects one bucket
    withConf("spark.sql.sources.bucketing.autoBucketedScan.enabled",
      "false") {
      val plan = idx.read.filter(col("vec_id") === 5)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 16"),
        s"fold must not break vec_id bucket pruning:\n$plan")
    }
    fs.create(new Path(s"$root/deltas/_folding"), true).close()
    intercept[IllegalArgumentException](sv.read)
    intercept[IllegalArgumentException](sv.foldDeltas())
    spark.sql("DROP TABLE IF EXISTS graft_pq_stream_t")
    deleteRecursively(root)
  }

  test("a single-list probe bucket-prunes to one of the 16 lists") {
    val lists = IvfStore.lists(spark, sfDir)
    val probe = lists.filter(col("bucket") === 5)
    withConf("spark.sql.sources.bucketing.autoBucketedScan.enabled",
      "false") {
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains(
        s"SelectedBucketsCount: 1 out of ${IvfStore.nLists}"),
        s"the probe must open exactly one list's bucket:\n$plan")
    }
    // pruned read is complete: counts match an unpruned filter
    val full = Tables.embeddings(spark, sfDir)
      .select(IvfStore.bucketOf(col("embedding").cast("array<double>"))
        .as("b")).filter(col("b") === 5).count()
    assert(probe.count() === full)
  }
}
