package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.Registry
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in [[graft.queries.Registry]]; this object is the thin
  * adapter the Verify/Bench driver mains consume.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Registry.queries("q_join_enrich")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Lifecycle contract for long-lived sessions: queries materialize
    * intermediates via tracked local checkpoints ([[graft.ops.Ck]]);
    * after CONSUMING a result (count/collect/write), call
    * `Ck.drain(spark)` to release that query's blocks (and optionally
    * `Ck.sweep(spark)` between queries to evict third-party leftovers
    * such as MLlib fit caches). Bench and Verify do this; a caller that
    * never drains re-creates the r10 block-manager accumulation.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql

  /** The registry, after the optional SPARK_GRAFT_ONLY comma-separated
    * subset filter (local iteration aid; the driver leaves it unset).
    * Unknown names are an ERROR, not a silent no-op — a typo'd filter
    * would otherwise produce a partial run that still looks like success —
    * and an active subset announces itself on stderr.
    */
  private[graft] def selectedQueries(): Map[String, (SparkSession, String) => DataFrame] =
    sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet) match {
      case Some(names) =>
        val unknown = names.diff(queries.keySet)
        require(unknown.isEmpty,
          s"SPARK_GRAFT_ONLY names not in the registry: " +
            unknown.toSeq.sorted.mkString(", "))
        System.err.println(
          s"[graft] SPARK_GRAFT_ONLY active: ${names.size} of ${queries.size} queries")
        queries.filter { case (n, _) => names(n) }
      case None => queries
    }
}
