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
