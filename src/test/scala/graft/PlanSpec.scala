package graft

import graft.queries.Registry

/** Physical-plan invariants — the scale properties the engine is designed
  * around, locked in as regressions (the prompt-level contract: "would this
  * plan survive a 100× scale-up?"). Each assertion names the Catalyst
  * behavior the query relies on; if a refactor breaks one, the bench will
  * regress long after this spec has already said why.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    Registry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("projection-only queries prune the parquet scan to selected columns") {
    val p = plan("q_scan_project")
    assert(p.contains(
      "ReadSchema: struct<p_partkey:bigint,p_name:string,p_retailprice:double>"),
      s"scan must read 3 of part's 9 columns:\n$p")
  }

  test("predicates reach the parquet scan as PushedFilters") {
    val p = plan("q_filter_pred")
    assert(p.contains("PushedFilters: [IsNotNull"), s"no pushdown in:\n$p")
    assert(p.contains("l_discount"), "discount predicate must be pushed")
  }

  test("fact-to-dim enrichment joins broadcast every dim (no sort-merge)") {
    val p = plan("q_join_enrich")
    assert("BroadcastHashJoin".r.findAllMatchIn(p).size === 3,
      s"lineitem⋈orders⋈customer⋈nation must broadcast all 3 dims:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "a sort-merge join here means a full fact-table shuffle at scale")
  }

  test("global top-k compiles to TakeOrderedAndProject, not sort-the-world") {
    assert(plan("q_topk_global").contains("TakeOrderedAndProject"))
    assert(plan("q_pagination").contains("TakeOrderedAndProject"),
      "pagination must bound the sort before any window numbering")
    assert(plan("q_rank_decay").contains("TakeOrderedAndProject"))
  }

  test("aggregations are partial+final (map-side combine before shuffle)") {
    val p = plan("q1_agg")
    assert("partial_sum".r.findAllMatchIn(p).nonEmpty,
      s"q1_agg must partial-aggregate before the exchange:\n$p")
    assert("HashAggregate".r.findAllMatchIn(p).size >= 2)
  }

  test("similarity joins never degrade to a cartesian product") {
    // q_containment_words is a deliberate broadcast-nested-loop theta join
    // (tiny build side, SURVEY §2.3 J5) and is excluded by design.
    for (q <- Seq("q_embed_cosine_topk", "q_dedup_jaccard", "q_minhash_dedup",
        "q_ann_ivf", "q_simhash")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q degraded to cartesian:\n$p")
    }
  }

  test("semi/anti membership use semi/anti joins, not distinct+inner") {
    assert(plan("q_semi_join").contains("LeftSemi"))
    assert(plan("q_anti_join").contains("LeftAnti"))
  }

  test("the containment theta-join broadcasts its tiny build side") {
    // J5 is inherently non-equi: acceptable ONLY as a broadcast nested
    // loop with the small side built (never a shuffled cartesian).
    val p = plan("q_containment_words")
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"), p)
    assert(!p.contains("CartesianProduct"))
  }
}
