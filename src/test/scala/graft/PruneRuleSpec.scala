package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gates for the JaccardLengthPrune optimizer rule: the implied
  * length-ratio guard is planted (once — fixed-point idempotent), results
  * are row-identical to the unguarded brute force INCLUDING pairs sitting
  * exactly on the threshold, and the round4-wrapped engine idiom is
  * covered. The fixture deliberately contains extreme length skew so the
  * guard has real pairs to prune.
  */
class PruneRuleSpec extends SparkSpec {

  /** Seeded corpus of sorted-distinct token arrays with planted
    * boundary pairs: doc 0/1 share 8 of 10 tokens (J = 8/10 = 0.8 — the
    * exact-threshold case a sloppy float guard drops), plus skewed sizes
    * from 1 to 60 tokens.
    */
  private lazy val docs: DataFrame = {
    val rnd = new scala.util.Random(42)
    def toks(n: Int, offset: Int): Seq[String] =
      (0 until n).map(i => f"t${i + offset}%04d")
    val planted = Seq(
      0L -> toks(8, 0), // subset of doc 1: J = 8/10 exactly
      1L -> toks(10, 0),
      2L -> toks(5, 0), // J(2, 3) = 5/6
      3L -> toks(6, 0))
    val random = (4L until 40L).map { id =>
      val n = 1 + rnd.nextInt(60)
      id -> toks(n, rnd.nextInt(8))
    }
    val all = planted ++ random
    spark.createDataFrame(all.map { case (id, ts) => (id, ts) })
      .toDF("doc_id", "toks")
  }

  private def bruteForce(threshold: Double): Set[(Long, Long)] = {
    val rows = docs.collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toSet))
    (for {
      (a, ta) <- rows; (b, tb) <- rows if a < b
      inter = ta.intersect(tb).size
      union = ta.union(tb).size
      j = if (union == 0) 1.0 else inter.toDouble / union
      if math.floor(j * 10000.0 + 0.5) / 10000.0 >= threshold
    } yield (a, b)).toSet
  }

  private def pairs(threshold: Double): DataFrame =
    docs.as("x").crossJoin(docs.as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .filter(round(graft.functions.JaccardSorted(
        col("x.toks"), col("y.toks")), 4) >= threshold)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))

  test("guard is planted once and matches results incl. the exact-threshold pair") {
    val df = pairs(0.8)
    val plan = df.queryExecution.optimizedPlan.toString
    // 2³² appears exactly twice: one guard per direction, never nested
    // (fixed-point idempotence).
    assert("4294967296".r.findAllMatchIn(plan).size === 2, plan)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = bruteForce(0.8)
    assert(got === expect)
    assert(got.contains((0L, 1L)), "the J = 0.8 boundary pair must survive")
  }

  test("raw (unrounded) SQL predicate gets the same guard and results") {
    docs.createOrReplaceTempView("prune_docs")
    val df = spark.sql(
      """SELECT x.doc_id a, y.doc_id b
        |FROM prune_docs x JOIN prune_docs y ON x.doc_id < y.doc_id
        |WHERE jaccard_sorted(x.toks, y.toks) >= 0.5d""".stripMargin)
    val plan = df.queryExecution.optimizedPlan.toString
    assert("4294967296".r.findAllMatchIn(plan).size === 2, plan)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // unrounded predicate: compare against the raw double jaccard
    val rows = docs.collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toSet))
    val expect = (for {
      (a, ta) <- rows; (b, tb) <- rows if a < b
      inter = ta.intersect(tb).size
      union = ta.union(tb).size
      if (if (union == 0) 1.0 else inter.toDouble / union) >= 0.5
    } yield (a, b)).toSet
    assert(got === expect)
  }

  test("thresholds at or below 0.05 are left alone (no useful prune, no rewrite)") {
    val df = pairs(0.05)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("4294967296"),
      s"a vacuous threshold must not grow guards:\n$plan")
  }

  test("generative: results equal brute force across a sweep of thresholds") {
    // The fixed-τ tests pin the planted boundary pair; this sweeps τ
    // (including awkward non-representable values and near-1 extremes)
    // and requires set equality against the driver-side brute force at
    // every one — the soundness claim quantified, not spot-checked.
    for (t <- Seq(0.1, 0.2, 0.3, 1.0 / 3.0, 0.5, 0.6, 2.0 / 3.0, 0.75,
        0.8, 0.9, 0.95, 0.99, 1.0)) {
      val got = pairs(t).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === bruteForce(t), s"mismatch at threshold $t")
    }
  }

  test("null token arrays behave as without the rule (conjunct null drops the row)") {
    val withNull = docs.union(
      spark.createDataFrame(Seq((99L, null: Seq[String])))
        .toDF("doc_id", "toks"))
    val got = withNull.as("x").crossJoin(withNull.as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .filter(graft.functions.JaccardSorted(
        col("x.toks"), col("y.toks")) >= 0.8)
      .select(col("x.doc_id"), col("y.doc_id")).collect()
    assert(!got.exists(r => r.getLong(0) == 99L || r.getLong(1) == 99L))
  }
}
