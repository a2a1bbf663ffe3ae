package graft

import org.apache.spark.sql.functions._
import graft.queries.{LlmQueries, Registry}

/** Guarantees behind the curation-split and drift-detection operators. */
class SplitDriftSpec extends SparkSpec {

  test("q_split_leakfree: no near-dup component straddles the split boundary") {
    // Assert against the PRODUCTION assignment (the same DataFrame the
    // registry query aggregates), not a spec-local re-derivation that
    // could silently stay correct while the query drifts.
    val assigned = LlmQueries.splitAssignments(spark, sfDir)
    val corpus = LlmQueries.minhashVerified(spark, sfDir)._1

    // The invariant the operator exists for: hashing the COMPONENT id means
    // a component can only ever map to one split.
    val straddlers = assigned.groupBy("component")
      .agg(countDistinct("split").as("ns")).filter(col("ns") > 1).count()
    assert(straddlers === 0L, "a near-dup component was split across train/val")

    // Every planted near-dup (doc i ↔ doc i+10000) must co-locate — the
    // end-to-end form of the same guarantee, through LSH discovery.
    val splits = assigned.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for (i <- 0L until 25L)
      assert(splits(i) === splits(i + 10000L),
        s"doc $i and its planted near-dup landed in different splits")

    // The registry summary accounts for every corpus doc exactly once.
    val summary = Registry.queries("q_split_leakfree")(spark, sfDir).collect()
    assert(summary.map(_.getAs[Long]("n_docs")).sum === corpus.count())
  }

  test("q_drift_ks: integer KS statistic matches a brute-force ECDF walk") {
    val ev = graft.tables.Tables.events(spark, sfDir)
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    def ks(a: String, b: String): (Long, Long, Long) = {
      val va = ev.collect { case (t, v) if t == a => v }
      val vb = ev.collect { case (t, v) if t == b => v }
      val n1 = va.length.toLong
      val n2 = vb.length.toLong
      val d = (va ++ vb).distinct
        .map(g => math.abs(va.count(_ <= g) * n2 - vb.count(_ <= g) * n1))
        .max
      (n1, n2, d)
    }
    val rows = Registry.queries("q_drift_ks")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n1"), r.getAs[Long]("n2"), r.getAs[Long]("ks_num"))).toMap
    assert(rows.keySet === Set("click" -> "view", "purchase" -> "error"))
    for (((a, b), got) <- rows)
      assert(got === ks(a, b), s"KS($a,$b) disagrees with the brute-force walk")
  }

  test("q_drift_ks_binned: exact at bin edges, off by at most one bin's mass") {
    // The documented error contract of the 100 TB swap-in: the binned
    // ECDF equals the exact ECDF at every bin edge, so (in exact integer
    // cross-multiplied units, no rounding anywhere)
    //   ks_binned ≤ ks_exact ≤ ks_binned + max_b max(c₁(b)·n₂, c₂(b)·n₁).
    def collectKs(q: String) = Registry.queries(q)(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n1"), r.getAs[Long]("n2"), r.getAs[Long]("ks_num"))).toMap
    val exact = collectKs("q_drift_ks")
    val binned = collectKs("q_drift_ks_binned")
    assert(binned.keySet === exact.keySet)
    val binCounts = graft.tables.Tables.events(spark, sfDir)
      .select(col("event_type"), graft.queries.Aggregates.binCol(col("value")).as("b"))
      .groupBy("event_type", "b").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Long]("n")).toMap
    for (((a, b), (n1e, n2e, kse)) <- exact) {
      val (n1b, n2b, ksb) = binned((a, b))
      assert((n1b, n2b) === ((n1e, n2e)), "binning must not change the mass totals")
      assert(ksb <= kse, s"KS($a,$b): coarsening cannot raise the supremum")
      val oneBin = (0L to graft.queries.Aggregates.histMaxBin).map { g =>
        math.max(binCounts.getOrElse((a, g), 0L) * n2e,
          binCounts.getOrElse((b, g), 0L) * n1e)
      }.max
      assert(kse <= ksb + oneBin,
        s"KS($a,$b): exact $kse exceeds binned $ksb + one-bin bound $oneBin")
    }
  }

  test("q_drift_chi2: the planted German re-crawl dominates the drift report") {
    val rows = Registry.queries("q_drift_chi2")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("chi2_c"), r.getAs[Double]("tv_c"))).toMap
    val (deChi2, deTv) = rows("de")
    for ((lang, (chi2, tv)) <- rows if lang != "de") {
      assert(deChi2 > chi2, s"de chi2 $deChi2 must exceed $lang's $chi2")
      assert(deTv >= tv, s"de tv $deTv must be >= $lang's $tv")
    }
    // Doubling every German doc is a gross shift: its contribution must
    // dwarf the parity-split noise of the undrifted languages at ANY sf
    // (chi-square grows linearly with corpus size, so no absolute floor).
    val runnerUp = rows.collect { case (l, (c, _)) if l != "de" => c }.max
    assert(deChi2 > 5 * runnerUp,
      s"planted shift $deChi2 not separated from noise floor $runnerUp")
  }

  test("q_split_temporal: train strictly precedes test with the full embargo between") {
    import org.apache.spark.sql.functions._
    val rows = graft.SparkEntry.queries("q_split_temporal")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows.keySet === Set("1_train", "2_embargo", "3_test"))
    val (_, _, _, trainHi) = rows("1_train")
    val (_, _, embLo, embHi) = rows("2_embargo")
    val (_, _, testLo, _) = rows("3_test")
    // The leakage contract: a strict gap of exactly embargoDays days.
    assert(trainHi < embLo && embHi < testLo, s"split ranges overlap: $rows")
    assert(testLo - trainHi > 2, "the embargo gap must separate train from test")
    // Conservation: every event lands in exactly one split.
    val ev = graft.tables.Tables.events(spark, sfDir)
    assert(rows.values.map(_._1).sum === ev.count())
    // The 80% day boundary is derived from the data, not hard-coded: the
    // train range must cover ~8/10 of the observed span.
    val b = ev.agg(min(expr("unix_micros(ts) div 86400000000")),
      max(expr("unix_micros(ts) div 86400000000"))).head()
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val expectedTrainEnd = lo + (hi - lo + 1) * 8 / 10 - 1
    assert(trainHi <= expectedTrainEnd, "train may not cross the 80% boundary")
    assert(testLo === expectedTrainEnd + 3,
      "test must start exactly embargoDays+1 after the boundary (dense days)")
  }
}
