package graft

/** The one-call lifecycle ([[graft.api.Lifecycle]], r12): the transcript
  * must show the reference's full docker-compose arc — cold serve from
  * the hash-synthesized fallback tier, a rate-source-driven retrain
  * publishing a version, the serving tier flipping to the trained BEST
  * model, a SECOND retrain on fresh batches advancing the version, and
  * running totals. Uses a single retrain round threshold of 2 so the
  * spec proves the loop CONTINUES, not just fires once.
  */
class LifecycleSpec extends SparkSpec {

  test("lifecycle transcript: cold fallback → train → serve → retrain") {
    // Decoupled from wall clock (r12 ADVICE): minPendingBatches=2 keeps
    // the trigger pressure low and the timeout sits far above worst-case
    // loaded-CI latency for two rate-source → batch → ALS cycles — a
    // slow first micro-batch must stall the transcript, not fail the
    // suite. The assertions check structure (tier names, version
    // monotonicity, rows > 0), not exact row counts.
    val t = graft.api.Lifecycle.run(spark,
      rowsPerSecond = 500, minPendingBatches = 2, retrainRounds = 2,
      timeoutMs = 480000L)
    t.foreach(l => info(l))
    // 1. cold serve hits the synthetic fallback tier (empty registry)
    assert(t.head.startsWith("serve[cold] tier=synthetic rows="),
      s"transcript: $t")
    assert(t.head.split("rows=").last.toInt > 0, s"transcript: $t")
    // 2. at least two retrains published monotonically sequenced versions
    val retrains = t.filter(_.startsWith("retrain published="))
    assert(retrains.size >= 2, s"expected >=2 retrains, transcript: $t")
    assert(retrains.head.contains("published=v000000"))
    assert(retrains(1).contains("published=v000001"))
    // 3. serving flipped to the trained BEST tier after the first publish
    val serves = t.filter(_.startsWith("serve[after"))
    assert(serves.nonEmpty && serves.forall(_.contains("tier=trained-best")),
      s"post-train serves must come from the registry BEST, transcript: $t")
    // 4. totals line: >=2 retrains, real rows, BEST == latest == last
    val totals = t.last
    assert(totals.startsWith("totals retrains="), s"transcript: $t")
    val m = "totals retrains=(\\d+) rows=(\\d+) best=(\\S+) latest=(\\S+)".r
      .findFirstMatchIn(totals).get
    assert(m.group(1).toLong >= 2L)
    assert(m.group(2).toLong > 0L)
    assert(m.group(3) === m.group(4), "BEST must track the latest publish")
  }
}
