package graft
import org.apache.spark.sql.SparkSession

/** Warm-up-only diagnostic main (r15): build the standing graph layout
  * and every staged-family artifact with the SAME session config and
  * `staged-build:` ledger lines as [[Bench]]'s warm-up, then exit — the
  * per-family (and, for the graph family, per-artifact) build-cost
  * breakdown without running the full query board. This is the audit
  * tool the r14 verdict's ledger question needed: `staged-build: graph
  * 29.31 s` was half the refresh budget with no way to see which of the
  * five artifacts grew.
  */
object Prewarm {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.graft.graph.bucketedEdges", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ops.Logs.quietBoundedWindowWarning()
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // same per-table footer warm-up as Bench (review r15): without it
    // the first staged-build lines absorb sfDir's one-time parquet
    // footer/codegen costs that Bench's equivalent lines never include,
    // and the breakdown misattributes growth — the opposite of the
    // tool's purpose
    for (t <- graft.tables.Tables.names)
      try {
        if (t == "events") graft.tables.Tables.events(spark, sfDir).count()
        else graft.tables.Tables.read(spark, sfDir, t).count()
      } catch { case _: Throwable => () }
    Bench.runStagedBuilds(spark, sfDir)
    spark.stop()
  }
}
