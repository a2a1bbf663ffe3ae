package graft

/** Warm-up-only diagnostic main (r15): build the standing graph layout
  * and every staged-family artifact with the SAME session, fingerprint
  * warnings, warm-up, and `staged-build:` ledger lines as [[Bench]] —
  * all three are Bench's own shared helpers, so the two mains cannot
  * diverge (review r15 II) — then exit: the per-family (and, for the
  * graph family, per-artifact) build-cost breakdown without running
  * the full query board. This is the audit tool the r14 verdict's
  * ledger question needed: `staged-build: graph 29.31 s` was half the
  * refresh budget with no way to see which artifact grew.
  */
object Prewarm {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = Bench.openSession()
    Bench.warmUp(spark, sfDir)
    Bench.runStagedBuilds(spark, sfDir)
    spark.stop()
  }
}
