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
