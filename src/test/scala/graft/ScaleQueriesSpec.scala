package graft

import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Gates for the ScaleQueries additions: containment dedup, C4-style
  * chunk removal, PQ ANN (recall floor vs brute force), and the Z-order
  * skipping audit (the layout must actually win). The DuckDB oracle
  * checks exactness; these check the SEMANTIC claims the scaladocs make.
  */
class ScaleQueriesSpec extends SparkSpec {

  /** Quarter-of-dimension query box — ONE definition for every layout
    * write-path test, so the box sizing cannot drift between the 2-D,
    * 3-D, and append/compact tests.
    */
  private def quarterBox(lo: Long, hi: Long): (Long, Long) =
    (lo + (hi - lo + 1) * 2 / 8, lo + (hi - lo + 1) * 4 / 8 - 1)

  /** File-envelope overlap scan of a written table:
    * (files, files scanned, rows scanned) for the given per-column box —
    * the shared hit predicate of the layout write-path tests.
    */
  private def envelopeScan(path: String,
      box: Seq[(String, (Long, Long))]): (Long, Long, Long) = {
    val env = graft.sources.Layout.fileEnvelopes(
      spark.read.parquet(path), box.map(_._1)).collect()
    val hit = env.filter(r => box.forall { case (c, (lo, hi)) =>
      r.getAs[Long](s"min_$c") <= hi && r.getAs[Long](s"max_$c") >= lo
    })
    (env.length.toLong, hit.length.toLong, hit.map(_.getAs[Long]("rows")).sum)
  }

  test("q_containment_dup: every quote contains itself in its source doc, all rows honor the threshold") {
    val rows = SparkEntry.queries("q_containment_dup")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val quotes = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 3).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    // A quote is a subset of its own source doc BY CONSTRUCTION — the
    // source pair must appear with containment exactly 1.0.
    val sourcePairs = rows.filter(_.getAs[Int]("is_source") == 1)
      .map(r => r.getAs[Long]("quote_id") - 20000L -> r.getAs[Double]("containment"))
      .toMap
    assert(sourcePairs.keySet == quotes,
      "every planted quote must rediscover its source doc")
    assert(sourcePairs.values.forall(_ == 1.0))
    rows.foreach { r =>
      assert(r.getAs[Double]("containment") >= 0.9)
      assert(r.getAs[Int]("n_inter") <= r.getAs[Int]("n_quote_toks"))
      val isSrc = r.getAs[Long]("doc_id") == r.getAs[Long]("quote_id") - 20000L
      assert(r.getAs[Int]("is_source") == (if (isSrc) 1 else 0))
    }
    // The asymmetry claim: symmetric Jaccard would miss these — a 20-token
    // excerpt of a long doc is a tiny fraction of its union. Check that at
    // least one non-source hit exists (quotes are made of corpus-common
    // tokens) so the operator finds more than its own plant.
    assert(rows.exists(_.getAs[Int]("is_source") == 0))
  }

  test("q_fuzzy_match: every typo variant rediscovers its source at distance 1") {
    val rows = SparkEntry.queries("q_fuzzy_match")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val names = Tables.part(spark, sfDir).select("p_name").distinct().count()
    val sources = rows.filter(_.getAs[Int]("is_source") == 1)
    // One dropped character = edit distance exactly 1 back to the source,
    // for every dictionary entry.
    assert(sources.length.toLong == names)
    assert(sources.forall(_.getAs[Int]("dist") == 1))
    rows.foreach(r => assert(r.getAs[Int]("dist") <= 2))
  }

  test("q_chunk_dedup: planted copies gut both sides; short docs pass through untouched") {
    val byId = SparkEntry.queries("q_chunk_dedup")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val nTokens = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n")).toMap
    for (id <- 0L until 40L) {
      val (orig, copy) = (byId(id), byId(id + 30000L))
      // Copies mirror their originals chunk-for-chunk...
      assert(orig.getAs[Long]("n_chunks") == copy.getAs[Long]("n_chunks"))
      assert(orig.getAs[Long]("n_dropped") == copy.getAs[Long]("n_dropped"))
      if (nTokens(id) >= 16) {
        // ...and every full chunk of a duplicated doc occurs ≥2 times, so
        // BOTH sides retain 0.0 — C4's original-guts-too edge, on purpose.
        assert(orig.getAs[Long]("n_chunks") > 0)
        assert(orig.getAs[Double]("retained_frac") == 0.0)
        assert(copy.getAs[Double]("retained_frac") == 0.0)
      }
    }
    byId.values.foreach { r =>
      val (nc, nd) = (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dropped"))
      assert(nd <= nc)
      if (nc == 0) assert(r.getAs[Double]("retained_frac") == 1.0)
    }
    // Docs under 16 tokens produce no full chunk and are never touched.
    nTokens.filter(_._2 < 16).keys.foreach { id =>
      assert(byId(id).getAs[Long]("n_chunks") == 0L)
    }
  }

  /** Plain-Scala brute-force top-3 ground truth + recall of a PQ result. */
  private def recallAt3(rows: Array[org.apache.spark.sql.Row]): Double = {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (ab, aa, bb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1 }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val truth = (0L until 10L).map { q =>
      q -> vecs.filter(_._1 != q)
        .map { case (id, v) => id -> cos(vecs(q), v) }.toSeq
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSet
    }.toMap
    val hits = rows.groupBy(_.getAs[Long]("q_id")).map { case (q, rs) =>
      rs.map(_.getAs[Long]("vec_id")).toSet.intersect(truth(q)).size
    }.sum
    hits.toDouble / 30
  }

  test("q_ann_pq: recall@3 vs brute-force cosine stays above the measured floor") {
    val pq = SparkEntry.queries("q_ann_pq")(spark, sfDir).collect()
    assert(pq.length == 30, "10 queries x top-3")
    // Measured ~0.57-0.60 on this fixture (32-candidate shortlist = 6.4%
    // of sf0.001); uniform-random vectors bound what ANY quantizer can
    // do, so the floor is a regression tripwire, not an aspiration.
    val recall = recallAt3(pq)
    assert(recall >= 0.4, s"recall@3 $recall under the 0.4 floor")
  }

  test("ml_ann_pq_trained: trained codebooks hold the higher recall floor") {
    val pq = SparkEntry.queries("ml_ann_pq_trained")(spark, sfDir).collect()
    assert(pq.length == 30, "10 queries x top-3")
    // Measured 0.60 here and 0.70 at sf0.01 (vs 0.43 pinned — training
    // pays off once the shortlist is a small corpus fraction; at this sf
    // coverage dominates, hence the floor sits at 0.5, above the pinned
    // path's 0.4).
    val recall = recallAt3(pq)
    assert(recall >= 0.5, s"trained recall@3 $recall under the 0.5 floor")
  }

  test("q_pq_recall_trained/_sampled: rerank beats raw ADC; identities hold; recall above floor (r13/r14)") {
    // Both fit variants under one gate (r14: the sampled fit — Lloyd on
    // the vec_id % 3 = 0 third, full corpus encoded — is the 100 TB
    // path and must hold the SAME serving contract as the full fit).
    for (q <- Seq("q_pq_recall_trained", "q_pq_recall_sampled")) {
      val rows = SparkEntry.queries(q)(spark, sfDir).collect()
      assert(rows.length === 10, s"$q returned ${rows.length} rows")
      rows.foreach { r =>
        val (nT, hA, hR) = (r.getLong(1), r.getLong(2), r.getLong(3))
        assert(nT === 5L)
        assert(hA <= hR,
          s"$q q ${r.getLong(0)}: exact rerank of a superset shortlist " +
            s"can never hit fewer truth rows than its ADC-top-5 subset " +
            s"($hA > $hR)")
        assert(r.getLong(4) === 10000L * hA / nT)
        assert(r.getLong(5) === 10000L * hR / nT)
      }
      // the measured result IS the deployment rule: ADC orders a
      // shortlist, exact distance reranks it — the rerank must
      // DISCRIMINATE (strictly more truth hits in aggregate) and hold a
      // conservative floor, under the sampled codebooks too
      val sumA = rows.map(_.getLong(2)).sum
      val sumR = rows.map(_.getLong(3)).sum
      assert(sumR > sumA, s"$q rerank did not discriminate: adc=$sumA rr=$sumR")
      assert(sumR * 10 >= rows.length * 5 * 3,
        s"$q reranked recall@5 ${sumR.toDouble / (rows.length * 5)} " +
          "under the 0.3 floor")
    }
  }

  test("q_pq_sample_sweep: one row per rate; rerank recovers at every point; the curve coarsens at the sparse end (r15)") {
    import graft.sources.IvfStore
    val rows = SparkEntry.queries("q_pq_sample_sweep")(spark, sfDir).collect()
    // one row per operating point, in rate order, each over the same
    // 10-query × top-5 truth set — a missing rate would make the curve
    // silently measure less than the constant list promises
    assert(rows.map(_.getInt(0)).toSeq === IvfStore.PqSweepRates,
      "sweep rows must cover PqSweepRates exactly, in order")
    rows.foreach { r =>
      val (nT, hA, hR) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nT === 50L, s"rate ${r.getInt(0)}: truth set must be 10×5")
      // exact rerank of a superset shortlist can never hit fewer truth
      // rows than its ADC-top-5 subset — at EVERY operating point
      assert(hA <= hR, s"rate ${r.getInt(0)}: adc=$hA > rerank=$hR")
      assert(r.getLong(4) === 10000L * hA / nT)
      assert(r.getLong(5) === 10000L * hR / nT)
    }
    val byRate = rows.map(r => r.getInt(0) -> r.getLong(3)).toMap
    // the measured deployment claims (NOT monotonicity — raw ADC recall
    // is non-monotone in the fit rate on this fixture, measured
    // r15: sampled codebooks are coarser exactly where ADC ranks):
    // (a) the rerank discriminates in aggregate at every rate —
    //     measured rr > adc on every row at every SF;
    val (sumA, sumR) = (rows.map(_.getLong(2)).sum, rows.map(_.getLong(3)).sum)
    assert(sumR > sumA, s"rerank did not discriminate: adc=$sumA rr=$sumR")
    // (b) fitting on 1/30th of the corpus costs reranked recall vs the
    //     full fit (measured 30→19 hits at sf0.001, 32→19 at sf0.01,
    //     27→18 at sf0.1) — the curve's reason to exist;
    assert(byRate(1) > byRate(IvfStore.PqSweepRates.last),
      s"full-fit rerank ${byRate(1)} must beat the sparsest fit " +
        s"${byRate(IvfStore.PqSweepRates.last)}")
    // (c) every point still clears the family's conservative 0.3 floor
    rows.foreach { r =>
      assert(r.getLong(3) * 10 >= 50L * 3,
        s"rate ${r.getInt(0)}: reranked recall@5 " +
          s"${r.getLong(3) / 50.0} under the 0.3 floor")
    }
  }

  test("q_ann_ivfpq: composed routing compresses the scored set; rerank recovers; recall above floor (r15)") {
    val n = Tables.embeddings(spark, sfDir).count()
    val rows = SparkEntry.queries("q_ann_ivfpq")(spark, sfDir).collect()
    assert(rows.length === 10, "10 query rows")
    rows.foreach { r =>
      val (nC, nT, hA, hR) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nT === 5L)
      // the composition's reason to exist: the ADC pass scores the
      // probed lists' members (nprobe 2 of DetK 8 ≈ a quarter of the
      // corpus on this fixture), never everything — and never nothing
      assert(nC > 0 && nC < n / 2,
        s"q ${r.getLong(0)}: scored $nC of $n — not a compressed probe")
      // exact rerank of a superset shortlist can never hit fewer truth
      // rows than its ADC-top-5 subset
      assert(hA <= hR, s"q ${r.getLong(0)}: adc=$hA > rerank=$hR")
      assert(r.getLong(5) === 10000L * hA / nT)
      assert(r.getLong(6) === 10000L * hR / nT)
    }
    val (sumA, sumR) = (rows.map(_.getLong(3)).sum, rows.map(_.getLong(4)).sum)
    assert(sumR > sumA, s"rerank did not discriminate: adc=$sumA rr=$sumR")
    // measured 0.70 at sf0.001/sf0.01 and 0.50 at sf0.1 — bounded by
    // the 2-probe IVF coverage, which q_ann_recall_trained prices
    // separately; 0.4 is the regression tripwire
    assert(sumR * 10 >= rows.length * 5 * 4,
      s"composed reranked recall@5 ${sumR.toDouble / (rows.length * 5)} " +
        "under the 0.4 floor")
  }

  test("Layout.writeZOrdered: real files carry tighter 2-D envelopes than a 1-D sort") {
    import graft.sources.Layout
    // sf0.1, not the usual sf0.001: repartitionByRange SAMPLES its
    // boundaries (per-run seed), so at small row counts the two layouts'
    // scan totals sit within quantile noise of each other and the
    // comparison flakes — observed once at sf0.01 (2820 vs 2578). At 100k
    // rows each file holds ~3k rows and the layout signal (measured ~3×)
    // dominates any boundary wobble. Same reasoning as PlanSpec's
    // bench-scale broadcast pins.
    val ev = Tables.events(spark, "/root/testdata/sf0.1")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
    val b = ev.agg(min("user_id"), max("user_id"), min("day"), max("day")).first()
    val (uLo, uHi, dLo, dHi) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val hDir = java.nio.file.Files.createTempDirectory("hilbert").toString
    val lDir = java.nio.file.Files.createTempDirectory("linear").toString
    try {
    Layout.writeZOrdered(ev, "user_id", uLo, uHi, "day", dLo, dHi, 32, zDir)
    Layout.writeHilbertOrdered(ev, "user_id", uLo, uHi, "day", dLo, dHi, 32, hDir)
    Layout.writeRangeSorted(ev, "user_id", 32, lDir)
    // A quarter-of-each-dimension 2-D box. (An eighth-size box at sf0.001
    // is smaller than one file's share of the Z-curve, so pruning outcomes
    // there are quantile-boundary noise, not layout signal.) A file is
    // scanned iff its [min,max] envelope overlaps the box.
    val (loU, hiU) = quarterBox(uLo, uHi)
    val (loD, hiD) = quarterBox(dLo, dHi)
    val box = Seq("user_id" -> ((loU, hiU)), "day" -> ((loD, hiD)))
    def scanned(dir: String): (Long, Long) = {
      // range sampling may leave some of the 32 partitions empty at this
      // sf — empty partitions write no file
      val (nFiles, hitFiles, hitRows) = envelopeScan(dir, box)
      assert(nFiles >= 12 && nFiles <= 32, s"file count off in $dir")
      (hitFiles, hitRows)
    }
    val (zFiles, zRows) = scanned(zDir)
    val (hFiles, hRows) = scanned(hDir)
    val (lFiles, lRows) = scanned(lDir)
    // All layouts must cover every matching row (pruning is sound)...
    val matching = ev.filter(col("user_id").between(loU, hiU) &&
      col("day").between(loD, hiD)).count()
    assert(zRows >= matching && hRows >= matching && lRows >= matching)
    // ...and both curve writes must prune at least as hard as the 1-D
    // one. (Hilbert vs Z on QUANTILE-cut files can wobble either way —
    // the aligned-cell comparison is q_hilbert_skip's job.)
    assert(zRows <= lRows,
      s"zorder scans $zRows rows ($zFiles files) vs linear $lRows ($lFiles)")
    assert(hRows <= lRows,
      s"hilbert scans $hRows rows ($hFiles files) vs linear $lRows ($lFiles)")
    } finally Seq(zDir, hDir, lDir).foreach(deleteRecursively)
  }

  test("q_curve3_skip: 3-D curves prune the third dimension the 2-D layouts can't") {
    val byLayout = SparkEntry.queries("q_curve3_skip")(spark, sfDir).collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    val (h3, m3, z2, lin) = (byLayout("hilbert3"), byLayout("morton3"),
      byLayout("zorder2d"), byLayout("linear_user"))
    // soundness: every layout covers all matching rows
    assert(Seq(h3, m3, z2, lin).map(_.getAs[Long]("rows_matched")).distinct.size == 1)
    Seq(h3, m3, z2, lin).foreach { r =>
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matched"))
    }
    // the dimensional ladder: 3-D curves ≤ 2-D curve ≤ 1-D sort for a
    // 3-D-selective box (measured 0.019 / 0.019 / 0.067 / 0.139 at sf0.01)
    def rows(r: org.apache.spark.sql.Row) = r.getAs[Long]("rows_scanned")
    assert(rows(h3) <= rows(z2), s"hilbert3 ${rows(h3)} > zorder2d ${rows(z2)}")
    assert(rows(m3) <= rows(z2), s"morton3 ${rows(m3)} > zorder2d ${rows(z2)}")
    assert(rows(z2) <= rows(lin), s"zorder2d ${rows(z2)} > linear ${rows(lin)}")
  }

  test("q_curve3_lang_skip: a categorical curve dimension prunes language-selective reads") {
    val byLayout = SparkEntry.queries("q_curve3_lang_skip")(spark, sfDir).collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    val (h3, z2, lin) = (byLayout("hilbert3"), byLayout("zorder2d_tc"),
      byLayout("linear_time"))
    assert(Seq(h3, z2, lin).map(_.getAs[Long]("rows_matched")).distinct.size == 1)
    assert(h3.getAs[Long]("rows_matched") > 0,
      "quarter box must select at least one language's slice")
    Seq(h3, z2, lin).foreach { r =>
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matched"))
    }
    def rows(r: org.apache.spark.sql.Row) = r.getAs[Long]("rows_scanned")
    // the lang-aware curve beats the lang-blind 2-D layout, which beats
    // ingestion order (measured 0.024 / 0.052 / 0.250 at sf0.01)
    assert(rows(h3) <= rows(z2), s"hilbert3 ${rows(h3)} > zorder2d_tc ${rows(z2)}")
    assert(rows(z2) <= rows(lin), s"zorder2d_tc ${rows(z2)} > linear_time ${rows(lin)}")
  }

  test("Layout 3-D writers: real files prune a 3-D box harder than the 1-D sort") {
    import graft.sources.Layout
    // sf0.1 for the same boundary-sampling-noise reason as the 2-D test.
    val ev = Tables.events(spark, "/root/testdata/sf0.1")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * lit(1000.0)).cast("long").as("vmil"))
    val b = ev.agg(min("user_id"), max("user_id"), min("day"), max("day"),
      min("vmil"), max("vmil")).first()
    val (uLo, uHi, dLo, dHi, vLo, vHi) = (b.getLong(0), b.getLong(1),
      b.getLong(2), b.getLong(3), b.getLong(4), b.getLong(5))
    val h3Dir = java.nio.file.Files.createTempDirectory("hilbert3").toString
    val m3Dir = java.nio.file.Files.createTempDirectory("morton3").toString
    val lDir = java.nio.file.Files.createTempDirectory("linear3").toString
    try {
      Layout.writeHilbert3Ordered(ev, "user_id", uLo, uHi, "day", dLo, dHi,
        "vmil", vLo, vHi, 32, h3Dir)
      Layout.writeMorton3Ordered(ev, "user_id", uLo, uHi, "day", dLo, dHi,
        "vmil", vLo, vHi, 32, m3Dir)
      Layout.writeRangeSorted(ev, "user_id", 32, lDir)
      // quarter-of-each-dimension 3-D box (same sizing rationale as 2-D)
      val (loU, hiU) = quarterBox(uLo, uHi)
      val (loD, hiD) = quarterBox(dLo, dHi)
      val (loV, hiV) = quarterBox(vLo, vHi)
      val box = Seq("user_id" -> ((loU, hiU)), "day" -> ((loD, hiD)),
        "vmil" -> ((loV, hiV)))
      def scanned(dir: String): Long = {
        val (nFiles, _, hitRows) = envelopeScan(dir, box)
        assert(nFiles >= 12 && nFiles <= 32, s"file count off in $dir")
        hitRows
      }
      val (h3Rows, m3Rows, lRows) = (scanned(h3Dir), scanned(m3Dir), scanned(lDir))
      val matching = ev.filter(col("user_id").between(loU, hiU) &&
        col("day").between(loD, hiD) && col("vmil").between(loV, hiV)).count()
      assert(h3Rows >= matching && m3Rows >= matching && lRows >= matching)
      assert(h3Rows <= lRows, s"hilbert3 scans $h3Rows rows vs linear $lRows")
      assert(m3Rows <= lRows, s"morton3 scans $m3Rows rows vs linear $lRows")
    } finally Seq(h3Dir, m3Dir, lDir).foreach(deleteRecursively)
  }

  test("Layout append + compact: pinned-grid appends stay sound; compaction restores tightness") {
    import graft.sources.Layout
    val ev = Tables.events(spark, "/root/testdata/sf0.1")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
    val b = ev.agg(min("user_id"), max("user_id"), min("day"), max("day")).first()
    val (uLo, uHi, dLo, dHi) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val dir = java.nio.file.Files.createTempDirectory("zappend").toString
    val cDir = java.nio.file.Files.createTempDirectory("zcompact").toString
    try {
      // initial write covers the first half of users; the appended batch
      // carries the second half PLUS out-of-range users (grid stays
      // pinned to the initial bounds — the clamp contract under test)
      val mid = (uLo + uHi) / 2
      val first = ev.filter(col("user_id") <= mid)
      val later = ev.filter(col("user_id") > mid)
        .union(first.limit(500).select(col("user_id") + (uHi + 100), col("day")))
      Layout.writeZOrdered(first, "user_id", uLo, uHi, "day", dLo, dHi, 16, dir)
      Layout.appendZOrdered(later, "user_id", uLo, uHi, "day", dLo, dHi, 16, dir)
      val total = ev.count() + 500
      assert(spark.read.parquet(dir).count() === total, "append must lose nothing")
      // pruning on the fragmented table is still SOUND for an in-range box
      val (loU, hiU) = quarterBox(uLo, uHi)
      val (loD, hiD) = quarterBox(dLo, dHi)
      val box = Seq("user_id" -> ((loU, hiU)), "day" -> ((loD, hiD)))
      def scanned(path: String): (Long, Long) = {
        val (nFiles, _, hitRows) = envelopeScan(path, box)
        (nFiles, hitRows)
      }
      val matching = spark.read.parquet(dir)
        .filter(col("user_id").between(loU, hiU) && col("day").between(loD, hiD))
        .count()
      val (nFrag, scanFrag) = scanned(dir)
      assert(nFrag > 16, "append must create new files, not rewrite")
      assert(scanFrag >= matching, "fragmented pruning must stay sound")
      // compaction: same rows, the target file count restored, and the
      // curve-aware rewrite prunes better than a naive 1-D compaction at
      // the SAME file count (comparing against the fragmented table's
      // scan would be granularity-unfair: 2x fewer files means coarser
      // envelopes regardless of layout quality)
      Layout.compactZOrdered(spark, dir, "user_id", uLo, uHi,
        "day", dLo, dHi, 16, cDir)
      assert(spark.read.parquet(cDir).count() === total, "compact must lose nothing")
      val (nComp, scanComp) = scanned(cDir)
      assert(nComp <= 16, s"compaction left $nComp files")
      assert(scanComp >= matching, "compacted pruning must stay sound")
      val nDir = java.nio.file.Files.createTempDirectory("zcompact-naive").toString
      try {
        Layout.writeRangeSorted(spark.read.parquet(dir), "user_id", 16, nDir)
        // Beat-comparison on a DAY-ONLY box: a user-sorted 1-D layout must
        // scan every file for it (its day envelopes cover everything),
        // while the curve keeps day locality — a structural win. (A box
        // selective on BOTH dims sits near parity: the 1-D sort prunes
        // its prefix dimension perfectly, and repartitionByRange's
        // sampled boundaries make the residual margin run-dependent —
        // the r8 flake this comment is the autopsy of.)
        val dayBox = Seq("day" -> ((loD, hiD)))
        val (_, _, compDay) = envelopeScan(cDir, dayBox)
        val (_, _, naiveDay) = envelopeScan(nDir, dayBox)
        assert(compDay < naiveDay,
          s"curve compaction ($compDay rows) must beat 1-D compaction " +
            s"($naiveDay) on the non-prefix dimension")
      } finally deleteRecursively(nDir)
    } finally Seq(dir, cDir).foreach(deleteRecursively)
  }

  test("q_hilbert_skip: Hilbert prunes at least as hard as Z-order; both beat the 1-D sort") {
    val byLayout = SparkEntry.queries("q_hilbert_skip")(spark, sfDir).collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    val (h, z, lin) =
      (byLayout("hilbert"), byLayout("zorder"), byLayout("linear_user"))
    assert(Seq(h, z, lin).map(_.getAs[Long]("rows_matched")).distinct.size == 1)
    Seq(h, z, lin).foreach { r =>
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matched"))
    }
    // Adjacent-step locality (ZorderSpec proves the curve property) must
    // show up as envelopes at least as tight as the jumpier Z-curve's.
    assert(h.getAs[Long]("rows_scanned") <= z.getAs[Long]("rows_scanned"))
    assert(h.getAs[Long]("rows_scanned") <= lin.getAs[Long]("rows_scanned"))
  }

  test("q_zorder_skip: same answers, fewer rows scanned — the layout earns its keep") {
    val byLayout = SparkEntry.queries("q_zorder_skip")(spark, sfDir).collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    val (zo, lin) = (byLayout("zorder"), byLayout("linear_user"))
    // Pruning never changes the answer, only the IO.
    assert(zo.getAs[Long]("rows_matched") == lin.getAs[Long]("rows_matched"))
    assert(zo.getAs[Long]("rows_matched") > 0)
    Seq(zo, lin).foreach { r =>
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matched"),
        "scanned files must cover every matching row")
      assert(r.getAs[Long]("files_scanned") <= r.getAs[Long]("n_files"))
    }
    // The claim the operator exists for: on a 2-D box, interleaved bits
    // prune at least as well as the 1-D sort (strictly better on sf0.01+;
    // equality is allowed at tiny sf where the grid degenerates).
    assert(zo.getAs[Long]("rows_scanned") <= lin.getAs[Long]("rows_scanned"))
  }
}
