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
