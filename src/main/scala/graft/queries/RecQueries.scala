package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Hashing, Prefix}
import graft.tables.Tables
import Registry.{Entry, Q}

/** Recommender training + evaluation suite over the deterministic
  * interaction fixture ([[MLQueries.interactions]] — the engine's seeded
  * stand-in for the reference's synthetic ratings,
  * reference: src/spark/training.py:444-461).
  *
  * The reference trains and serves a recommender (ALS + popularity
  * fallback, reference: src/app.py:267-299) but never closes the loop with
  * offline evaluation or training-set construction beyond explicit
  * ratings. These three queries add that loop as first-class relational
  * ops, every one hash-checked against a DuckDB twin:
  *
  *  - [[negativeSample q_negative_sample]] — deterministic hash-based
  *    negative sampling for implicit-feedback training (the BPR/implicit-ALS
  *    input construction step);
  *  - [[evalRanking q_eval_ranking]] — leave-one-out ranking evaluation of
  *    the popularity recommender: per-user held-out rank, hit@10 and exact
  *    integer reciprocal-rank micros;
  *  - [[recCoverage q_rec_coverage]] — the serving-diversity audit: catalog
  *    coverage, top-item exposure share, and an exact-integer Gini
  *    concentration coefficient over recommendation exposure.
  *
  * Determinism: interactions, held-out choice, candidate generation and
  * every metric are md5-derived or exact integer arithmetic
  * ([[graft.ops.Hashing]] twins; ratios via the explicit ⌊x+½⌋ floor in
  * both engines). The ONE SQL rendering of the interaction generator
  * ([[RecQueries.interCte]]) is shared by all three oracles, so the
  * fixture cannot diverge between them.
  *
  * Scale: interactions/train shuffle on their natural keys; item
  * popularity is a map-side-combined count; the global item rank never
  * runs a data-sized single-partition window — it reuses the
  * [[graft.ops.Prefix]] bucket → tiny-offsets → local-rank decomposition
  * (the q_pareto template), so the plan survives a 10⁸-item catalog. The
  * only driver-visible values are 1-row broadcast bounds.
  */
object RecQueries {

  /** Negatives kept per user. */
  private val NegK = 5
  /** Candidate draws per user (collisions with positives/duplicates leave
    * ≥ NegK survivors with overwhelming probability; fewer is still
    * deterministic).
    */
  private val NegCand = 16
  /** Recommendation list length for evaluation + coverage. */
  private val RecK = 10

  /** The DuckDB rendering of [[MLQueries.interactions]] — ONE definition
    * shared by all three oracles below (and only here: the Spark side is
    * the one [[MLQueries.interactions]] builder, so query and oracle read
    * the same fixture by construction).
    */
  private[queries] val interCte: String =
    """pop0 AS (
      |  SELECT p_partkey, p_name, ('0x' || substr(md5(p_name),1,8))::BIGINT % 101 AS pop FROM part),
      |inter AS (
      |  SELECT CAST(('0x' || substr(md5(CAST(p_partkey AS VARCHAR) || 'u' || CAST(i AS VARCHAR)),1,8))::BIGINT % 200 AS INT) AS user_id,
      |         CAST(p_partkey AS INT) AS item_id,
      |         CAST((CASE WHEN pop > 70 THEN 5.0 WHEN pop > 50 THEN 4.0 WHEN pop > 30 THEN 3.0
      |                    WHEN pop > 10 THEN 2.0 ELSE 1.0 END
      |               + (('0x' || substr(md5(CAST(p_partkey AS VARCHAR) || 'j' || CAST(i AS VARCHAR)),1,8))::BIGINT
      |                  / CAST(4294967296 AS DOUBLE) - 0.5)) AS REAL) AS rating
      |  FROM pop0 CROSS JOIN (SELECT unnest(generate_series(0,7)) AS i))""".stripMargin

  /** Leave-one-out split + popularity model, shared by q_eval_ranking and
    * q_rec_coverage (ONE Scala definition feeding both — and mirrored by
    * [[looCte]] on the oracle side).
    *
    * Held-out = each user's top-rated item (ties → max item_id): the
    * standard LOO protocol. Returns (held, trainItems, pop, itemRank)
    * where itemRank is the DISTRIBUTED global popularity rank
    * (pop DESC, item_id ASC) via [[Prefix.withCumSum]] — rank 1 is the
    * most popular item; no single-partition window ever sees the
    * |items|-sized input.
    */
  private val looCache = new graft.sources.LayoutCache.SessionCache[
    String, (DataFrame, DataFrame, DataFrame, DataFrame)]()

  /** Build the staged LOO split + popularity model outside any query's
    * timing (r13 verdict #4) — Bench warm-up hook, cost printed as a
    * `staged-build:` tail line.
    */
  private[graft] def prewarmStaged(s: SparkSession, d: String): Unit = {
    loo(s, d)
    ()
  }

  private def loo(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) =
    // Staged once per session and Ck-pinned (r13): the LOO split + the
    // popularity model ARE the trained artifacts this family evaluates —
    // a deployment splits and fits once, then every offline-eval job
    // (◆ q_eval_ranking, ◆ q_rec_coverage) reads the same model tables.
    // All four are catalog/user-sized (≤ |interactions| rows). Oracles
    // unchanged: both consumers replay the split and fit definitionally.
    looCache.getOrBuild(s, d) {
      val inter = MLQueries.interactions(s, d)
      val byRating = Window.partitionBy("user_id")
        .orderBy(desc("rating"), desc("item_id"))
      // Chained build (review r13): each stage derives from the PREVIOUS
      // materialized stage — pinning four independent lazy plans would
      // re-run the interactions scan + window once per table (~4× the
      // one-time build cost); here the scan+window runs once (held), the
      // anti-join once (train, tracked + freed after its two readers
      // materialize), and itemRank reads the pinned pop.
      val held = graft.ops.Ck.pin(
        inter.withColumn("rn", row_number().over(byRating))
          .where(col("rn") === 1).select("user_id", "item_id"),
        "rec.looHeld")
      val train = graft.ops.Ck(
        inter.join(held, Seq("user_id", "item_id"), "left_anti"))
      val trainItems = graft.ops.Ck.pin(
        train.select("user_id", "item_id").distinct(), "rec.looTrain")
      val pop = graft.ops.Ck.pin(
        train.groupBy("item_id").agg(count(lit(1)).as("pop")), "rec.looPop")
      graft.ops.Ck.free(train)
      val itemRank = graft.ops.Ck.pin(Prefix.withCumSum(
          pop.withColumn("neg_pop", -col("pop")).withColumn("one", lit(1L)),
          "neg_pop", Seq("item_id"), "one", "rnk")
        .select(col("item_id"), col("pop"), col("rnk")), "rec.looRank")
      (held, trainItems, pop, itemRank)
    }

  /** The SQL twin of [[loo]] (appended after [[interCte]]). The oracle may
    * use the naive global `row_number` window — it only ever runs at
    * verification scale.
    */
  private[queries] val looCte: String =
    """held AS (
      |  SELECT user_id, item_id FROM (
      |    SELECT user_id, item_id,
      |           row_number() OVER (PARTITION BY user_id ORDER BY rating DESC, item_id DESC) AS rn
      |    FROM inter) WHERE rn = 1),
      |train AS (
      |  SELECT i.* FROM inter i
      |  WHERE NOT EXISTS (SELECT 1 FROM held h WHERE h.user_id = i.user_id AND h.item_id = i.item_id)),
      |titems AS (SELECT DISTINCT user_id, item_id FROM train),
      |pop AS (SELECT item_id, CAST(count(*) AS BIGINT) AS pop FROM train GROUP BY item_id),
      |ranks AS (SELECT item_id, pop, CAST(row_number() OVER (ORDER BY pop DESC, item_id) AS BIGINT) AS rnk FROM pop)""".stripMargin

  /** Deterministic hash negative sampling — the implicit-feedback
    * training-set constructor (each positive needs k unobserved items as
    * negatives; BPR-style samplers draw them uniformly from the catalog).
    * Per user: NegCand md5-derived draws over the key range, validated
    * against the catalog (no density assumption), positives removed by
    * anti-join, de-duplicated keeping the earliest draw, first NegK kept
    * in draw order.
    *
    * Scale: candidates are |users|·NegCand rows generated map-side from a
    * 1-row broadcast key bound; the catalog-validate and positive-removal
    * anti-joins shuffle on (item) / (user, item) — the same keys the
    * training join uses; the per-user window ranks ≤ NegCand rows. No
    * user×catalog blow-up anywhere.
    */
  private val negativeSample: Q = (s, d) => {
    val inter = MLQueries.interactions(s, d)
    val users = inter.select("user_id").distinct()
    val mx = Tables.part(s, d).agg(max("p_partkey").cast("long").as("mxk"))
    val cand = users.crossJoin(broadcast(mx))
      .withColumn("idx", explode(sequence(lit(1), lit(NegCand))))
      .withColumn("item_id",
        pmod(Hashing.md5Long(concat(col("user_id"), lit("n"), col("idx"))),
          col("mxk") + 1).cast("int"))
    val byDraw = Window.partitionBy("user_id").orderBy("first_idx")
    cand
      .join(Tables.part(s, d).select(col("p_partkey").cast("int").as("item_id")),
        Seq("item_id"), "left_semi")
      .join(inter.select("user_id", "item_id"), Seq("user_id", "item_id"), "left_anti")
      .groupBy("user_id", "item_id").agg(min("idx").as("first_idx"))
      .withColumn("neg_rank", row_number().over(byDraw))
      .where(col("neg_rank") <= NegK)
      .select(col("user_id"), col("neg_rank").cast("int").as("neg_rank"), col("item_id"))
      .orderBy("user_id", "neg_rank")
  }

  private val negativeSampleSql =
    s"""WITH $interCte,
       |users AS (SELECT DISTINCT user_id FROM inter),
       |mx AS (SELECT max(p_partkey) AS mxk FROM part),
       |cand AS (
       |  SELECT user_id, idx,
       |         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || 'n' || CAST(idx AS VARCHAR)),1,8))::BIGINT
       |              % ((SELECT mxk FROM mx) + 1) AS INT) AS item_id
       |  FROM users CROSS JOIN (SELECT unnest(generate_series(1,$NegCand)) AS idx)),
       |dedup AS (
       |  SELECT c.user_id, c.item_id, min(c.idx) AS first_idx
       |  FROM cand c
       |  WHERE EXISTS (SELECT 1 FROM part p WHERE CAST(p.p_partkey AS INT) = c.item_id)
       |    AND NOT EXISTS (SELECT 1 FROM inter i WHERE i.user_id = c.user_id AND i.item_id = c.item_id)
       |  GROUP BY c.user_id, c.item_id),
       |ranked AS (
       |  SELECT user_id, item_id,
       |         CAST(row_number() OVER (PARTITION BY user_id ORDER BY first_idx) AS INT) AS neg_rank
       |  FROM dedup)
       |SELECT user_id, neg_rank, item_id FROM ranked WHERE neg_rank <= $NegK
       |ORDER BY user_id, neg_rank""".stripMargin

  /** Leave-one-out ranking evaluation of the popularity recommender:
    * for each user, the global popularity list minus the user's own train
    * items is the ranked candidate list; the held-out item's position in
    * it is the metric. hit@RecK and reciprocal-rank are exact integers
    * (rr_micros = 10⁶ div rank — both engines' integer division agrees on
    * positives).
    *
    * The per-user rank is computed WITHOUT materializing any per-user
    * list: rank_u(held) = globalRank(held) − |{user's train items ranked
    * above held}| — one join against the distributed item rank and one
    * per-user count. A held-out item nobody else kept in train is absent
    * from the model's list: rank = |list|+1 = n_items − n_train_u + 1 (a
    * miss, deterministically).
    *
    * Fixture note (honest): interactions are generated per-item (≈8
    * each), so removing each user's TOP-rated item depresses exactly the
    * popular-by-construction items' train counts — the popularity
    * baseline ranks held-out items late here (hit@10 = 0 on this
    * fixture). The metric machinery, not the baseline's quality, is what
    * the oracle checks.
    *
    * Scale: joins shuffle on (item) / (user); the only unpartitioned
    * window is [[Prefix.withCumSum]]'s ≤ 64 bucket-offset rows.
    */
  private val evalRanking: Q = (s, d) => {
    val (held, trainItems, pop, itemRank) = loo(s, d)
    val nItems = pop.agg(count(lit(1)).as("n_items"))
    val held2 = held.join(
      itemRank.select(col("item_id"), col("rnk").as("hrnk")),
      Seq("item_id"), "left")
    val better = trainItems
      .join(itemRank.select("item_id", "rnk"), Seq("item_id"))
      .join(held2.select("user_id", "hrnk"), Seq("user_id"))
      .where(col("rnk") < col("hrnk"))
      .groupBy("user_id").agg(count(lit(1)).as("n_better"))
    val uCnt = trainItems.groupBy("user_id").agg(count(lit(1)).as("n_train"))
    held2
      .join(better, Seq("user_id"), "left")
      .join(uCnt, Seq("user_id"), "left")
      .crossJoin(broadcast(nItems))
      .withColumn("rank_h",
        when(col("hrnk").isNotNull, col("hrnk") - coalesce(col("n_better"), lit(0L)))
          .otherwise(col("n_items") - coalesce(col("n_train"), lit(0L)) + lit(1L)))
      .select(
        col("user_id"),
        col("item_id").as("held_item"),
        col("rank_h"),
        when(col("rank_h") <= RecK, 1).otherwise(0).cast("int").as(s"hit$RecK"),
        call_function("div", lit(1000000L), col("rank_h")).as("rr_micros"))
      .orderBy("user_id")
  }

  private val evalRankingSql =
    s"""WITH $interCte,
       |$looCte,
       |nitems AS (SELECT CAST(count(*) AS BIGINT) AS n_items FROM pop),
       |ucnt AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_train FROM titems GROUP BY user_id),
       |held2 AS (
       |  SELECT h.user_id, h.item_id, r.rnk AS hrnk
       |  FROM held h LEFT JOIN ranks r ON h.item_id = r.item_id),
       |better AS (
       |  SELECT t.user_id, CAST(count(*) AS BIGINT) AS n_better
       |  FROM titems t JOIN ranks r ON t.item_id = r.item_id
       |  JOIN held2 h ON h.user_id = t.user_id
       |  WHERE r.rnk < h.hrnk GROUP BY t.user_id),
       |m AS (
       |  SELECT h.user_id, h.item_id,
       |         CASE WHEN h.hrnk IS NOT NULL THEN h.hrnk - COALESCE(b.n_better, 0)
       |              ELSE (SELECT n_items FROM nitems) - COALESCE(u.n_train, 0) + 1 END AS rank_h
       |  FROM held2 h
       |  LEFT JOIN better b ON b.user_id = h.user_id
       |  LEFT JOIN ucnt u ON u.user_id = h.user_id)
       |SELECT user_id, item_id AS held_item, rank_h,
       |       CAST(CASE WHEN rank_h <= $RecK THEN 1 ELSE 0 END AS INT) AS hit$RecK,
       |       1000000 // rank_h AS rr_micros
       |FROM m ORDER BY user_id""".stripMargin

  /** Serving-diversity audit of the popularity recommender's top-RecK
    * lists: catalog coverage (basis points), total + top-item exposure
    * share, and the Gini concentration of exposure over the FULL catalog
    * (zero-exposure items included) — the "is serving feeding everyone
    * the same 13 tracks" check a catalog team runs before re-ranking for
    * diversity. All ratios are explicit ⌊x+½⌋ floors; the Gini numerator
    * Σ(2·rank − n − 1)·x runs in exact integer arithmetic with ranks
    * ascending by (exposure, item_id) — zero-exposure items contribute
    * nothing but shift the covered items' ranks up by |catalog−covered|.
    *
    * Per-user lists come from the bounded candidate pool: the top
    * (max_user_history + RecK) globally-ranked items — after removing a
    * user's ≤ max_user_history seen items, ≥ RecK candidates always
    * survive, so the pool provably suffices. The pool is broadcast
    * (≤ heaviest-user-history + RecK rows); the cliff is a power user
    * with a multi-million-item history inflating it — the serving answer
    * at that point is capping the per-user exclusion history (the
    * reference's own serving layer reads a bounded recent window), not a
    * bigger pool.
    *
    * Scale: exposure is a map-side-combined count over |users|·RecK rec
    * rows; both global ranks (popularity, exposure) use the
    * [[Prefix.withCumSum]] decomposition — the only unpartitioned windows
    * are its ≤ 64 bucket-offset rows (×2).
    */
  private val recCoverage: Q = (s, d) => {
    val (_, trainItems, _, itemRank) = loo(s, d)
    val uCnt = trainItems.groupBy("user_id").agg(count(lit(1)).as("n_train"))
    val maxc = uCnt.agg(max("n_train").as("max_train"))
    val pool = itemRank.crossJoin(broadcast(maxc))
      .where(col("rnk") <= col("max_train") + RecK)
      .select("item_id", "rnk")
    val byRank = Window.partitionBy("user_id").orderBy("rnk")
    val recs = uCnt.join(broadcast(pool), col("rnk") <= col("n_train") + RecK)
      .join(trainItems, Seq("user_id", "item_id"), "left_anti")
      .withColumn("rn", row_number().over(byRank))
      .where(col("rn") <= RecK)
      .select("user_id", "item_id")
    val expo = recs.groupBy("item_id").agg(count(lit(1)).as("x"))
    val catalog = Tables.part(s, d).agg(count(lit(1)).as("catalog"))
    val totals = expo.agg(
      count(lit(1)).as("covered"), sum("x").as("exposures"), max("x").as("max_x"))
    val gnum = Prefix.withCumSum(expo.withColumn("one", lit(1L)),
        "x", Seq("item_id"), "one", "rp")
      .crossJoin(broadcast(catalog)).crossJoin(broadcast(totals.select("covered")))
      .agg(sum(
        (lit(2L) * (col("rp") + col("catalog") - col("covered")) - col("catalog") - lit(1L))
          * col("x")).as("gnum"))
    catalog.crossJoin(broadcast(totals)).crossJoin(broadcast(gnum))
      .select(
        col("catalog"), col("covered"),
        floor(lit(10000.0) * col("covered") / col("catalog") + lit(0.5))
          .cast("long").as("coverage_bp"),
        col("exposures"),
        floor(lit(10000.0) * col("max_x") / col("exposures") + lit(0.5))
          .cast("long").as("top_share_bp"),
        floor(lit(1000000.0) * col("gnum")
            / (col("catalog").cast("double") * col("exposures")) + lit(0.5))
          .cast("long").as("gini_micros"))
      .orderBy("catalog")
  }

  private val recCoverageSql =
    s"""WITH $interCte,
       |$looCte,
       |ucnt AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_train FROM titems GROUP BY user_id),
       |cand AS (
       |  SELECT u.user_id, r.item_id, r.rnk FROM ucnt u JOIN ranks r ON r.rnk <= u.n_train + $RecK),
       |recs AS (
       |  SELECT user_id, item_id FROM (
       |    SELECT c.user_id, c.item_id,
       |           row_number() OVER (PARTITION BY c.user_id ORDER BY c.rnk) AS rn
       |    FROM cand c
       |    WHERE NOT EXISTS (SELECT 1 FROM titems t WHERE t.user_id = c.user_id AND t.item_id = c.item_id))
       |  WHERE rn <= $RecK),
       |expo AS (SELECT item_id, CAST(count(*) AS BIGINT) AS x FROM recs GROUP BY item_id),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS catalog FROM part),
       |agg AS (SELECT CAST(count(*) AS BIGINT) AS covered, CAST(sum(x) AS BIGINT) AS exposures,
       |               CAST(max(x) AS BIGINT) AS max_x FROM expo),
       |erank AS (SELECT item_id, x, CAST(row_number() OVER (ORDER BY x, item_id) AS BIGINT) AS rp FROM expo),
       |gn AS (SELECT CAST(sum((2*(rp + (SELECT catalog FROM tot) - (SELECT covered FROM agg))
       |                        - (SELECT catalog FROM tot) - 1) * x) AS BIGINT) AS gnum FROM erank)
       |SELECT t.catalog, a.covered,
       |       CAST(floor(10000.0 * a.covered / t.catalog + 0.5) AS BIGINT) AS coverage_bp,
       |       a.exposures,
       |       CAST(floor(10000.0 * a.max_x / a.exposures + 0.5) AS BIGINT) AS top_share_bp,
       |       CAST(floor(1000000.0 * gn.gnum / (CAST(t.catalog AS DOUBLE) * a.exposures) + 0.5) AS BIGINT) AS gini_micros
       |FROM tot t, agg a, gn ORDER BY t.catalog""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("q_negative_sample", negativeSample, Some(negativeSampleSql)),
    Entry("q_eval_ranking", evalRanking, Some(evalRankingSql)),
    Entry("q_rec_coverage", recCoverage, Some(recCoverageSql)))
}
