package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Num
import graft.tables.Tables
import Registry.{Entry, Q}

/** Exact-arithmetic statistical modelling over the warehouse: per-group
  * OLS trend fits, a single-scan moment/correlation matrix, series
  * autocorrelation, interval-union coverage, a-priori association rules,
  * and audience-overlap (exact + sketch) — the model-fitting analytics the
  * reference computes client-side on collected rows when at all
  * (reference: src/streamlit_app.py:640-670 trends the dashboard series in
  * pandas after `.collect()`; the engine keeps every sufficient statistic
  * distributed and exact).
  *
  * Numeric discipline (the PMI/Gini pattern): every statistic is derived
  * from integer sufficient statistics (counts, cents, dollar-rounded
  * units) aggregated exactly; ratios are formed ONCE at the end, from
  * identical int64 inputs in both engines, so `round4` is deterministic.
  * Where a final product exceeds int64 (the moment matrix's n·Σab at
  * large n), the widening happens on the already-aggregated single row —
  * Spark decimal(38,0) ↔ DuckDB HUGEINT — never on per-row data.
  *
  * Scale notes: each query is one or two hash-aggregate shuffles with
  * map-side partials over the fact; model algebra runs on aggregate rows
  * (|groups|, |days|, |pairs| — never data-sized). The OLS/Gram shape is
  * the normal-equations template: X^T X for p features is p² sums in ONE
  * scan, after which the solve is constant-size.
  */
object Analytics {

  // ---------------------------------------------------------------------
  // q_linreg_trend — per-nation OLS fit of monthly revenue
  // ---------------------------------------------------------------------

  /** Exact simple-regression trend of monthly order revenue per nation.
    *
    * x = month index since 1995-01 (fixture epoch), y = monthly revenue in
    * cents. The normal-equation solution is formed from four exact integer
    * sums per nation — slope_num = n·Σxy − Σx·Σy over den = n·Σx² − (Σx)²
    * — so the fitted slope/intercept are exact rationals; both numerators
    * and the shared denominator ship as hash-gated int64 alongside the
    * round4 dollar ratios. Plan: fact joins the customer dim once, two
    * hash aggregates (month cell → nation), nation names broadcast onto
    * the |nations| result rows.
    */
  private val linregTrendQ: Q = (s, d) => {
    val o = Tables.orders(s, d).select(
      col("o_custkey"),
      ((year(col("o_orderdate")) - lit(1995)) * lit(12) +
        month(col("o_orderdate")) - lit(1)).cast("long").as("mi"),
      Num.cents(col("o_totalprice")).as("cents"))
    val c = Tables.customer(s, d).select(
      col("c_custkey"), col("c_nationkey").cast("long").as("nk"))
    val monthly = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("nk", "mi").agg(sum("cents").as("y"))
    val fit = monthly.groupBy("nk").agg(
      count(lit(1)).as("n_months"),
      sum("mi").as("sx"),
      sum("y").as("sy"),
      sum(col("mi") * col("y")).as("sxy"),
      sum(col("mi") * col("mi")).as("sxx"))
      .select(
        col("nk"), col("n_months"),
        (col("n_months") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n_months") * col("sxx") - col("sx") * col("sx")).as("den"),
        (col("sy") * col("sxx") - col("sx") * col("sxy")).as("icept_num"))
    val n = Tables.nation(s, d)
      .select(col("n_nationkey").cast("long").as("nk"), col("n_name"))
    fit.join(broadcast(n), "nk")
      .select(
        col("n_name"), col("n_months"), col("slope_num"), col("den"),
        col("icept_num"),
        Num.round4(col("slope_num") / col("den") / lit(100.0)).as("slope_dpm"),
        Num.round4(col("icept_num") / col("den") / lit(100.0)).as("icept_d"))
      .orderBy("n_name")
  }

  private val linregTrendSql =
    """WITH monthly AS (
      |  SELECT c_nationkey AS nk,
      |         CAST((year(o_orderdate) - 1995) * 12
      |              + month(o_orderdate) - 1 AS BIGINT) AS mi,
      |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |fit AS (
      |  SELECT nk, CAST(count(*) AS BIGINT) AS n_months,
      |         CAST(SUM(mi) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |         CAST(SUM(mi * y) AS BIGINT) AS sxy,
      |         CAST(SUM(mi * mi) AS BIGINT) AS sxx
      |  FROM monthly GROUP BY 1)
      |SELECT n_name, n_months,
      |       n_months * sxy - sx * sy AS slope_num,
      |       n_months * sxx - sx * sx AS den,
      |       sy * sxx - sx * sxy AS icept_num,
      |       floor(CAST(n_months * sxy - sx * sy AS DOUBLE)
      |             / (n_months * sxx - sx * sx) / 100.0 * 10000.0 + 0.5)
      |         / 10000.0 AS slope_dpm,
      |       floor(CAST(sy * sxx - sx * sxy AS DOUBLE)
      |             / (n_months * sxx - sx * sx) / 100.0 * 10000.0 + 0.5)
      |         / 10000.0 AS icept_d
      |FROM fit JOIN nation ON nk = n_nationkey
      |ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------------
  // q_moment_matrix — single-scan pairwise correlation matrix
  // ---------------------------------------------------------------------

  /** Pairwise Pearson correlations among the four lineitem measures from
    * ONE scan: all 15 sufficient statistics (4 sums, 4 sums of squares,
    * 6 cross-products, count) aggregate in a single map-side-combined
    * pass, then the 6 off-diagonal pairs `inline()` out of the one result
    * row — the X^T X normal-equations/PCA input shape, where adding a
    * feature adds columns to the same scan, never a pass.
    *
    * Units are integers (quantity, whole dollars, pct points) so every
    * per-row product fits int64 at any tested SF; the final n·Σab − Σa·Σb
    * widening runs in decimal(38,0) ↔ HUGEINT on the single aggregate
    * row. Exact gates: n and the three sums per pair; the correlation is
    * one double division of identical exact integers.
    */
  private val momentMatrixQ: Q = (s, d) => {
    val li = Tables.lineitem(s, d).select(
      round(col("l_quantity")).cast("long").as("q"),
      round(col("l_extendedprice")).cast("long").as("p"),
      round(col("l_discount") * 100).cast("long").as("dc"),
      round(col("l_tax") * 100).cast("long").as("tx"))
    val g = li.agg(
      count(lit(1)).as("n"),
      sum("q").as("s_q"), sum("p").as("s_p"),
      sum("dc").as("s_d"), sum("tx").as("s_t"),
      sum(col("q") * col("q")).as("s_qq"),
      sum(col("p") * col("p")).as("s_pp"),
      sum(col("dc") * col("dc")).as("s_dd"),
      sum(col("tx") * col("tx")).as("s_tt"),
      sum(col("q") * col("p")).as("s_qp"),
      sum(col("q") * col("dc")).as("s_qd"),
      sum(col("q") * col("tx")).as("s_qt"),
      sum(col("p") * col("dc")).as("s_pd"),
      sum(col("p") * col("tx")).as("s_pt"),
      sum(col("dc") * col("tx")).as("s_dt"))
    def pairStruct(a: String, b: String, sa: String, sb: String,
        sab: String, saa: String, sbb: String) =
      struct(lit(a).as("col_a"), lit(b).as("col_b"), col("n").as("n"),
        col(sa).as("s_a"), col(sb).as("s_b"), col(sab).as("s_ab"),
        col(saa).as("s_aa"), col(sbb).as("s_bb"))
    val dec = "decimal(38,0)"
    def wide(c: Column) = c.cast(dec)
    val num = wide(col("n")) * wide(col("s_ab")) - wide(col("s_a")) * wide(col("s_b"))
    val denA = wide(col("n")) * wide(col("s_aa")) - wide(col("s_a")) * wide(col("s_a"))
    val denB = wide(col("n")) * wide(col("s_bb")) - wide(col("s_b")) * wide(col("s_b"))
    g.select(inline(array(
        pairStruct("disc", "tax", "s_d", "s_t", "s_dt", "s_dd", "s_tt"),
        pairStruct("price", "disc", "s_p", "s_d", "s_pd", "s_pp", "s_dd"),
        pairStruct("price", "tax", "s_p", "s_t", "s_pt", "s_pp", "s_tt"),
        pairStruct("qty", "disc", "s_q", "s_d", "s_qd", "s_qq", "s_dd"),
        pairStruct("qty", "price", "s_q", "s_p", "s_qp", "s_qq", "s_pp"),
        pairStruct("qty", "tax", "s_q", "s_t", "s_qt", "s_qq", "s_tt"))))
      .select(col("col_a"), col("col_b"), col("n"),
        col("s_a"), col("s_b"), col("s_ab"),
        Num.round4(num.cast("double") /
          (sqrt(denA.cast("double")) * sqrt(denB.cast("double")))).as("corr"))
      .orderBy("col_a", "col_b")
  }

  private val momentMatrixSql =
    """WITH m AS (
      |  SELECT CAST(round(l_quantity) AS BIGINT) AS q,
      |         CAST(round(l_extendedprice) AS BIGINT) AS p,
      |         CAST(round(l_discount * 100) AS BIGINT) AS dc,
      |         CAST(round(l_tax * 100) AS BIGINT) AS tx
      |  FROM lineitem),
      |g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(SUM(q) AS BIGINT) AS s_q, CAST(SUM(p) AS BIGINT) AS s_p,
      |         CAST(SUM(dc) AS BIGINT) AS s_d, CAST(SUM(tx) AS BIGINT) AS s_t,
      |         CAST(SUM(q*q) AS BIGINT) AS s_qq, CAST(SUM(p*p) AS BIGINT) AS s_pp,
      |         CAST(SUM(dc*dc) AS BIGINT) AS s_dd, CAST(SUM(tx*tx) AS BIGINT) AS s_tt,
      |         CAST(SUM(q*p) AS BIGINT) AS s_qp, CAST(SUM(q*dc) AS BIGINT) AS s_qd,
      |         CAST(SUM(q*tx) AS BIGINT) AS s_qt, CAST(SUM(p*dc) AS BIGINT) AS s_pd,
      |         CAST(SUM(p*tx) AS BIGINT) AS s_pt, CAST(SUM(dc*tx) AS BIGINT) AS s_dt
      |  FROM m),
      |pairs AS (
      |  SELECT 'disc' AS col_a, 'tax' AS col_b, n, s_d AS s_a, s_t AS s_b,
      |         s_dt AS s_ab, s_dd AS s_aa, s_tt AS s_bb FROM g
      |  UNION ALL SELECT 'price', 'disc', n, s_p, s_d, s_pd, s_pp, s_dd FROM g
      |  UNION ALL SELECT 'price', 'tax', n, s_p, s_t, s_pt, s_pp, s_tt FROM g
      |  UNION ALL SELECT 'qty', 'disc', n, s_q, s_d, s_qd, s_qq, s_dd FROM g
      |  UNION ALL SELECT 'qty', 'price', n, s_q, s_p, s_qp, s_qq, s_pp FROM g
      |  UNION ALL SELECT 'qty', 'tax', n, s_q, s_t, s_qt, s_qq, s_tt FROM g)
      |SELECT col_a, col_b, n, s_a, s_b, s_ab,
      |       floor(CAST(CAST(n AS HUGEINT) * s_ab - CAST(s_a AS HUGEINT) * s_b
      |                  AS DOUBLE)
      |             / (sqrt(CAST(CAST(n AS HUGEINT) * s_aa
      |                          - CAST(s_a AS HUGEINT) * s_a AS DOUBLE))
      |                * sqrt(CAST(CAST(n AS HUGEINT) * s_bb
      |                            - CAST(s_b AS HUGEINT) * s_b AS DOUBLE)))
      |             * 10000.0 + 0.5) / 10000.0 AS corr
      |FROM pairs ORDER BY col_a, col_b""".stripMargin

  // ---------------------------------------------------------------------
  // q_acf — autocorrelation of the daily event-count series
  // ---------------------------------------------------------------------

  /** Sample autocorrelation of daily event counts at lags 1..7, exact:
    * with S = Σy and n = |days|, the lag-k estimator
    * r_k = Σ_{t>k}(y_t−ȳ)(y_{t−k}−ȳ) / Σ_t(y_t−ȳ)² is multiplied
    * through by n², making numerator and denominator exact integers —
    * Σ(n·y_t − S)(n·y_{t−k} − S) and Σ(n·y_t − S)² — both hash-gated.
    * The data shuffles once into the per-day rollup; every later pass
    * (totals broadcast, the 7 lags in ONE unpartitioned window, the
    * final sum) runs over |days| calendar-bounded rows
    * (RegistrySpec-whitelisted, the q_resample_ffill argument).
    */
  private val acfQ: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    val tot = daily.agg(
      count(lit(1)).as("n"), sum("y").as("sy"))
    val dev = daily.crossJoin(broadcast(tot))
      .select(col("day"), (col("n") * col("y") - col("sy")).as("dv"))
    val w = Window.orderBy("day")
    val lagged = dev.select(
      col("dv") +: (1 to 7).map(k => lag("dv", k).over(w).as(s"l$k")): _*)
    val g = lagged.agg(
      sum(col("dv") * col("dv")).as("den"),
      (1 to 7).map(k => sum(col("dv") * col(s"l$k")).as(s"num$k")): _*)
    g.select(inline(array((1 to 7).map(k =>
        struct(lit(k).cast("long").as("lag_k"), col(s"num$k").as("num"),
          col("den").as("den"))): _*)))
      .select(col("lag_k"), col("num"), col("den"),
        Num.round4(col("num").cast("double") / col("den")).as("acf"))
      .orderBy("lag_k")
  }

  private val acfSql =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |               CAST(SUM(y) AS BIGINT) AS sy FROM daily),
      |dev AS (SELECT day, n * y - sy AS dv FROM daily, tot),
      |lagged AS (
      |  SELECT dv,
      |         lag(dv, 1) OVER (ORDER BY day) AS l1,
      |         lag(dv, 2) OVER (ORDER BY day) AS l2,
      |         lag(dv, 3) OVER (ORDER BY day) AS l3,
      |         lag(dv, 4) OVER (ORDER BY day) AS l4,
      |         lag(dv, 5) OVER (ORDER BY day) AS l5,
      |         lag(dv, 6) OVER (ORDER BY day) AS l6,
      |         lag(dv, 7) OVER (ORDER BY day) AS l7
      |  FROM dev),
      |g AS (
      |  SELECT CAST(SUM(dv*dv) AS BIGINT) AS den,
      |         CAST(SUM(dv*l1) AS BIGINT) AS num1,
      |         CAST(SUM(dv*l2) AS BIGINT) AS num2,
      |         CAST(SUM(dv*l3) AS BIGINT) AS num3,
      |         CAST(SUM(dv*l4) AS BIGINT) AS num4,
      |         CAST(SUM(dv*l5) AS BIGINT) AS num5,
      |         CAST(SUM(dv*l6) AS BIGINT) AS num6,
      |         CAST(SUM(dv*l7) AS BIGINT) AS num7
      |  FROM lagged),
      |rows_k AS (
      |  SELECT CAST(1 AS BIGINT) AS lag_k, num1 AS num, den FROM g
      |  UNION ALL SELECT 2, num2, den FROM g
      |  UNION ALL SELECT 3, num3, den FROM g
      |  UNION ALL SELECT 4, num4, den FROM g
      |  UNION ALL SELECT 5, num5, den FROM g
      |  UNION ALL SELECT 6, num6, den FROM g
      |  UNION ALL SELECT 7, num7, den FROM g)
      |SELECT lag_k, num, den,
      |       floor(CAST(num AS DOUBLE) / den * 10000.0 + 0.5) / 10000.0 AS acf
      |FROM rows_k ORDER BY lag_k""".stripMargin

  // ---------------------------------------------------------------------
  // q_interval_merge — per-customer interval-union coverage
  // ---------------------------------------------------------------------

  /** Coalesce each customer's 30-day order-activity intervals
    * [orderdate, orderdate+30) into maximal disjoint periods — the
    * interval-union/island operator (validity-window stitching, coverage
    * accounting). A row opens a new island iff its start exceeds the
    * running max end of every earlier interval (half-open: touching
    * intervals merge); island id = cumulative count of openings. Both
    * windows and the island rollup share ONE customer-keyed exchange —
    * no self-join, no data-sized global pass. Distinct from
    * [[Windows]]' gap sessionization: intervals carry duration, so the
    * cumulative-max-end test (not lag-gap) is what detects overlap.
    */
  private val intervalMergeQ: Q = (s, d) => {
    val o = Tables.orders(s, d).select(
      col("o_custkey").as("ck"),
      datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
        .cast("long").as("sd"),
      col("o_orderkey").as("ok"))
      .withColumn("ed", col("sd") + 30)
    val wOrd = Window.partitionBy("ck").orderBy("sd", "ok")
    val prevMax = max("ed").over(wOrd.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = o
      .withColumn("opens",
        when(prevMax.isNull || col("sd") > prevMax, 1L).otherwise(0L))
      .withColumn("island",
        sum("opens").over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
    val periods = flagged.groupBy("ck", "island")
      .agg(min("sd").as("ps"), max("ed").as("pe"))
    periods.groupBy("ck").agg(
        count(lit(1)).as("n_periods"),
        sum(col("pe") - col("ps")).as("active_days"),
        min("ps").as("first_day"),
        max("pe").as("last_day"))
      .orderBy("ck")
  }

  private val intervalMergeSql =
    """WITH o AS (
      |  SELECT o_custkey AS ck,
      |         CAST(date_diff('day', DATE '1995-01-01',
      |                        CAST(o_orderdate AS DATE)) AS BIGINT) AS sd,
      |         o_orderkey AS ok
      |  FROM orders),
      |iv AS (SELECT ck, sd, sd + 30 AS ed, ok FROM o),
      |flagged AS (
      |  SELECT ck, sd, ed, ok,
      |         CASE WHEN max(ed) OVER (PARTITION BY ck ORDER BY sd, ok
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |              IS NULL
      |              OR sd > max(ed) OVER (PARTITION BY ck ORDER BY sd, ok
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |         THEN 1 ELSE 0 END AS opens
      |  FROM iv),
      |islands AS (
      |  SELECT ck, sd, ed,
      |         CAST(SUM(opens) OVER (PARTITION BY ck ORDER BY sd, ok
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |              AS BIGINT) AS island
      |  FROM flagged),
      |periods AS (
      |  SELECT ck, island, MIN(sd) AS ps, MAX(ed) AS pe
      |  FROM islands GROUP BY 1, 2)
      |SELECT ck, CAST(count(*) AS BIGINT) AS n_periods,
      |       CAST(SUM(pe - ps) AS BIGINT) AS active_days,
      |       MIN(ps) AS first_day, MAX(pe) AS last_day
      |FROM periods GROUP BY ck ORDER BY ck""".stripMargin

  // ---------------------------------------------------------------------
  // q_assoc_rules — a-priori pair mining with exact support/confidence/lift
  // ---------------------------------------------------------------------

  /** Market-basket association rules over order baskets: top-20 part
    * pairs by co-occurrence with support counts, confidence and lift as
    * exact rationals (integer counts gated; round4 ratios derived once).
    *
    * The a-priori monotonicity prune runs BEFORE pairing: an item below
    * the pair-support floor cannot be in a qualifying pair, so the
    * basket self-join sees only frequent items — at 100 TB the frequent
    * dictionary (not the raw item table) bounds the quadratic stage, and
    * baskets are naturally small (≤ 17 lines here). Pairing is a
    * self-join on the basket key: one exchange, both sides the same
    * pruned scan.
    */
  private val assocRulesQ: Q = (s, d) => {
    val minSup = 2L
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("bk"), col("l_partkey").as("item"))
      .distinct()
    val itemCnt = items.groupBy("item").agg(count(lit(1)).as("c_item"))
    val freq = itemCnt.filter(col("c_item") >= minSup)
    val fi = items.join(freq, "item")
    val a = fi.select(col("bk"), col("item").as("pa"), col("c_item").as("c_a"))
    val b = fi.select(col("bk"), col("item").as("pb"), col("c_item").as("c_b"))
    val pairs = a.join(b, Seq("bk")).filter(col("pa") < col("pb"))
    val nOrders = items.select("bk").distinct().agg(count(lit(1)).as("n_orders"))
    pairs.groupBy("pa", "pb", "c_a", "c_b")
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minSup)
      .crossJoin(broadcast(nOrders))
      .select(col("pa"), col("pb"), col("c_ab"), col("c_a"), col("c_b"),
        col("n_orders"),
        Num.round4(col("c_ab").cast("double") / col("c_a")).as("conf_ab"),
        Num.round4((col("c_ab") * col("n_orders")).cast("double") /
          (col("c_a") * col("c_b"))).as("lift"))
      .orderBy(desc("c_ab"), asc("pa"), asc("pb"))
      .limit(20)
  }

  private val assocRulesSql =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS item FROM lineitem),
      |item_cnt AS (
      |  SELECT item, CAST(count(*) AS BIGINT) AS c_item
      |  FROM items GROUP BY 1 HAVING count(*) >= 2),
      |fi AS (SELECT i.bk, i.item, c.c_item
      |       FROM items i JOIN item_cnt c ON i.item = c.item),
      |pairs AS (
      |  SELECT a.item AS pa, b.item AS pb, a.c_item AS c_a, b.c_item AS c_b
      |  FROM fi a JOIN fi b ON a.bk = b.bk AND a.item < b.item),
      |n AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n_orders FROM items),
      |pc AS (
      |  SELECT pa, pb, c_a, c_b, CAST(count(*) AS BIGINT) AS c_ab
      |  FROM pairs GROUP BY 1, 2, 3, 4 HAVING count(*) >= 2)
      |SELECT pa, pb, c_ab, c_a, c_b, n_orders,
      |       floor(CAST(c_ab AS DOUBLE) / c_a * 10000.0 + 0.5) / 10000.0
      |         AS conf_ab,
      |       floor(CAST(c_ab * n_orders AS DOUBLE) / (c_a * c_b)
      |             * 10000.0 + 0.5) / 10000.0 AS lift
      |FROM pc, n
      |ORDER BY c_ab DESC, pa, pb LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // q_overlap_exact / q_overlap_approx — audience overlap matrix
  // ---------------------------------------------------------------------

  /** Exact audience overlap between event types: distinct users per type,
    * pairwise intersection via a self-join of the distinct (user, type)
    * table on the user key, union by inclusion-exclusion, Jaccard round4.
    * The distinct collapse (|users|·|types| rows) happens BEFORE the
    * quadratic stage, and the pair aggregate output is |types|² rows.
    * Sketch twin: [[overlapApproxQ]].
    */
  private val overlapExactQ: Q = (s, d) => {
    val ut = Tables.events(s, d)
      .select(col("user_id").as("u"), col("event_type").as("t"))
      .distinct()
    val perType = ut.groupBy("t").agg(count(lit(1)).as("n_users"))
    val a = ut.select(col("u"), col("t").as("ta"))
    val b = ut.select(col("u"), col("t").as("tb"))
    val both = a.join(b, Seq("u")).filter(col("ta") < col("tb"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("n_both"))
    both
      .join(broadcast(perType.select(col("t").as("ta"), col("n_users").as("n_a"))), "ta")
      .join(broadcast(perType.select(col("t").as("tb"), col("n_users").as("n_b"))), "tb")
      .select(col("ta"), col("tb"), col("n_a"), col("n_b"), col("n_both"),
        (col("n_a") + col("n_b") - col("n_both")).as("n_union"),
        Num.round4(col("n_both").cast("double") /
          (col("n_a") + col("n_b") - col("n_both"))).as("jaccard"))
      .orderBy("ta", "tb")
  }

  private val overlapExactSql =
    """WITH ut AS (
      |  SELECT DISTINCT user_id AS u, event_type AS t FROM events),
      |per_type AS (
      |  SELECT t, CAST(count(*) AS BIGINT) AS n_users FROM ut GROUP BY 1),
      |both_t AS (
      |  SELECT a.t AS ta, b.t AS tb, CAST(count(*) AS BIGINT) AS n_both
      |  FROM ut a JOIN ut b ON a.u = b.u AND a.t < b.t
      |  GROUP BY 1, 2)
      |SELECT ta, tb, pa.n_users AS n_a, pb.n_users AS n_b, n_both,
      |       pa.n_users + pb.n_users - n_both AS n_union,
      |       floor(CAST(n_both AS DOUBLE)
      |             / (pa.n_users + pb.n_users - n_both) * 10000.0 + 0.5)
      |         / 10000.0 AS jaccard
      |FROM both_t
      |JOIN per_type pa ON ta = pa.t
      |JOIN per_type pb ON tb = pb.t
      |ORDER BY ta, tb""".stripMargin

  /** Sketch twin of [[overlapExactQ]]: one HLL sketch per event type
    * (map-side combined — the user-level distinct never shuffles), pair
    * intersections by inclusion-exclusion over `hll_union`. |types|
    * sketch rows replace the |users|·|types| distinct table — at 100 TB
    * the self-join disappears entirely; the cost is the HLL relative
    * error, gated within 10% of the exact matrix in AnalyticsSpec.
    * Sketch estimates aren't cross-engine comparable → rows-only.
    */
  private val overlapApproxQ: Q = (s, d) => {
    val sk = Tables.events(s, d)
      .groupBy(col("event_type").as("t"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val a = sk.select(col("t").as("ta"), col("sk").as("sk_a"))
    val b = sk.select(col("t").as("tb"), col("sk").as("sk_b"))
    a.crossJoin(b).filter(col("ta") < col("tb"))
      .select(col("ta"), col("tb"),
        hll_sketch_estimate(col("sk_a")).as("est_a"),
        hll_sketch_estimate(col("sk_b")).as("est_b"),
        hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"))).as("est_union"))
      .select(col("ta"), col("tb"), col("est_a"), col("est_b"), col("est_union"),
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L))
          .as("est_both"))
      .orderBy("ta", "tb")
  }

  val entries: Seq[Entry] = Seq(
    Entry("q_linreg_trend", linregTrendQ, Some(linregTrendSql)),
    Entry("q_moment_matrix", momentMatrixQ, Some(momentMatrixSql)),
    Entry("q_acf", acfQ, Some(acfSql)),
    Entry("q_interval_merge", intervalMergeQ, Some(intervalMergeSql)),
    Entry("q_assoc_rules", assocRulesQ, Some(assocRulesSql)),
    Entry("q_overlap_exact", overlapExactQ, Some(overlapExactSql)),
    Entry("q_overlap_approx", overlapApproxQ, None),
  )
}
