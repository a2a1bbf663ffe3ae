package graft

import org.apache.spark.sql.functions._
import graft.ops.{Num, Salt}
import graft.tables.Tables

/** Scale-mitigation primitives: salted aggregation for key skew and
  * bucketed tables for shuffle-free co-located joins (the two techniques
  * SURVEY.md §4 reserves for when broadcast + AQE aren't enough).
  */
class ScaleOpsSpec extends SparkSpec {

  test("salted two-phase aggregation equals the direct groupBy exactly") {
    val ev = Tables.events(spark, sfDir)
    val direct = ev.groupBy(col("event_type").as("k"))
      .agg(count(lit(1)).as("cnt"), sum(Num.cents(col("value"))).as("sum_cents"))
      .orderBy("k").collect()
    val salted = Salt.saltedCountSum(
        ev, col("event_type"), Num.cents(col("value")), salts = 8)
      .orderBy("k").collect()
    assert(salted.toSeq === direct.toSeq,
      "salting must be a pure physical rewrite — identical results")
  }

  test("salted plan aggregates twice so no single reducer owns a hot key") {
    val ev = Tables.events(spark, sfDir)
    val plan = Salt.saltedCountSum(
        ev, col("event_type"), Num.cents(col("value")), salts = 8)
      .queryExecution.executedPlan.toString
    // two distinct shuffle keys: (k, __salt) then (k)
    assert("hashpartitioning\\(k".r.findAllMatchIn(plan).nonEmpty, plan)
    assert(plan.contains("__salt"), "first phase must shuffle by salted key")
  }

  test("bucketed tables join without a shuffle on either side") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    assert(wh.contains("graft-warehouse"), s"test warehouse misconfigured: $wh")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderstatus")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed").join(
        spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // and it still computes the same result as the plain join
      val expect = Tables.lineitem(spark, sfDir).join(
        Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
