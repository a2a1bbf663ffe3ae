package graft

import graft.queries.Registry

/** Sequential plain-Scala replays + plan pins for the exact-analytics
  * wave (Analytics.scala). Each query's statistic is recomputed from
  * collected raw rows with driver-side arithmetic and compared
  * row-for-row — the same discipline the DuckDB oracle applies at
  * sf0.01, here independent of any SQL engine.
  */
class AnalyticsSpec extends SparkSpec {

  private def q(name: String) = Registry.queries(name)(spark, sfDir)

  test("q_linreg_trend matches a sequential OLS replay per nation") {
    import org.apache.spark.sql.functions._
    import graft.tables.Tables
    val monthly = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long").as("nk"),
        ((year(col("o_orderdate")) - 1995) * 12 +
          month(col("o_orderdate")) - 1).cast("long").as("mi"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect()
      .groupBy(r => (r.getLong(0), r.getLong(1)))
      .map { case ((nk, mi), rs) => (nk, mi, rs.map(_.getLong(2)).sum) }
      .toSeq
    val expected = monthly.groupBy(_._1).map { case (nk, cells) =>
      val n = cells.size.toLong
      val sx = cells.map(_._2).sum
      val sy = cells.map(_._3).sum
      val sxy = cells.map(c => c._2 * c._3).sum
      val sxx = cells.map(c => c._2 * c._2).sum
      nk -> (n, n * sxy - sx * sy, n * sxx - sx * sx)
    }
    val names = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long"), col("n_name")).collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    val got = q("q_linreg_trend").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, num, den) = expected(names(r.getString(0)))
      assert(r.getLong(1) === n, s"n_months ${r.getString(0)}")
      assert(r.getLong(2) === num, s"slope_num ${r.getString(0)}")
      assert(r.getLong(3) === den, s"den ${r.getString(0)}")
    }
  }

  test("q_moment_matrix: one lineitem scan; corr replay for (qty, price)") {
    // Single-pass contract: the whole 15-statistic matrix reads the fact
    // exactly once (the inline() reshape runs over the one aggregate row,
    // never re-expands the scan).
    val plan = q("q_moment_matrix").queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans === 1, s"expected 1 lineitem scan, got $scans:\n$plan")

    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val rows = Tables.lineitem(spark, sfDir)
      .select(round(col("l_quantity")).cast("long"),
        round(col("l_extendedprice")).cast("long")).collect()
    val n = BigInt(rows.length)
    val sq = rows.map(r => BigInt(r.getLong(0))).sum
    val sp = rows.map(r => BigInt(r.getLong(1))).sum
    val sqp = rows.map(r => BigInt(r.getLong(0)) * r.getLong(1)).sum
    val sqq = rows.map(r => BigInt(r.getLong(0)) * r.getLong(0)).sum
    val spp = rows.map(r => BigInt(r.getLong(1)) * r.getLong(1)).sum
    val num = n * sqp - sq * sp
    val corr = num.toDouble /
      (math.sqrt((n * sqq - sq * sq).toDouble) *
        math.sqrt((n * spp - sp * sp).toDouble))
    val got = q("q_moment_matrix").collect()
      .find(r => r.getString(0) == "qty" && r.getString(1) == "price").get
    assert(got.getLong(5) === sqp.toLong)
    assert(got.getDouble(6) === math.floor(corr * 10000.0 + 0.5) / 10000.0)
  }

  test("q_acf matches a sequential replay at every lag") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("y"))
      .orderBy("day").collect().map(_.getLong(1))
    val n = daily.length.toLong
    val sTot = daily.sum
    val dv = daily.map(y => n * y - sTot)
    val den = dv.map(d => d * d).sum
    val got = q("q_acf").collect()
    assert(got.length === 7)
    got.foreach { r =>
      val k = r.getLong(0).toInt
      val num = (k until dv.length).map(t => dv(t) * dv(t - k)).sum
      assert(r.getLong(1) === num, s"num lag $k")
      assert(r.getLong(2) === den, s"den lag $k")
    }
  }

  test("q_interval_merge matches a sequential island merge") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val epoch = java.time.LocalDate.of(1995, 1, 1).toEpochDay
    val ivs = Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        to_date(col("o_orderdate")).cast("date"), col("o_orderkey"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay - epoch,
        r.getLong(2)))
      .groupBy(_._1)
    val expected = ivs.map { case (ck, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3)).map(r => (r._2, r._2 + 30))
      var periods = List.empty[(Long, Long)]
      sorted.foreach { case (sd, ed) =>
        periods match {
          case (ps, pe) :: tail if sd <= pe =>
            periods = (ps, math.max(pe, ed)) :: tail
          case _ => periods = (sd, ed) :: periods
        }
      }
      ck -> (periods.size.toLong, periods.map(p => p._2 - p._1).sum)
    }
    val got = q("q_interval_merge").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (np, days) = expected(r.getLong(0))
      assert(r.getLong(1) === np, s"n_periods ck=${r.getLong(0)}")
      assert(r.getLong(2) === days, s"active_days ck=${r.getLong(0)}")
    }
  }

  test("q_assoc_rules matches a brute-force basket replay") {
    import graft.tables.Tables
    val items = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val itemCnt = items.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val baskets = items.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val pairCnt = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.values.foreach { ps =>
      val f = ps.filter(itemCnt(_) >= 2L)
      for (i <- f.indices; j <- i + 1 until f.size)
        pairCnt((f(i), f(j))) = pairCnt.getOrElse((f(i), f(j)), 0L) + 1
    }
    val top = pairCnt.toSeq.filter(_._2 >= 2L)
      .sortBy { case ((a, b), c) => (-c, a, b) }.take(20)
    val got = q("q_assoc_rules").collect()
    assert(got.length === top.length.min(20))
    got.zip(top).foreach { case (r, ((pa, pb), c)) =>
      assert((r.getLong(0), r.getLong(1)) === ((pa, pb)))
      assert(r.getLong(2) === c)
      assert(r.getLong(3) === itemCnt(pa))
      assert(r.getLong(4) === itemCnt(pb))
    }
  }

  test("q_overlap_approx estimates within 10% of q_overlap_exact") {
    val exact = q("q_overlap_exact").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val approx = q("q_overlap_approx").collect()
    assert(approx.length === exact.size)
    approx.foreach { r =>
      val (na, nb, nBoth) = exact((r.getString(0), r.getString(1)))
      def within(est: Long, ex: Long, what: String): Unit =
        assert(math.abs(est - ex) <= math.max(1L, (ex * 0.10).toLong),
          s"$what est=$est exact=$ex for ${r.getString(0)}/${r.getString(1)}")
      within(r.getLong(2), na, "est_a")
      within(r.getLong(3), nb, "est_b")
      within(r.getLong(5), nBoth, "est_both")
    }
  }

  test("q_ols_fit solves the normal equations exactly (BigInt Cramer replay)") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val rows = Tables.lineitem(spark, sfDir)
      .select(round(col("l_quantity")).cast("long"),
        round(col("l_discount") * 100).cast("long"),
        round(col("l_extendedprice")).cast("long")).collect()
      .map(r => (BigInt(r.getLong(0)), BigInt(r.getLong(1)), BigInt(r.getLong(2))))
    val n = BigInt(rows.length)
    val s1 = rows.map(_._1).sum; val s2 = rows.map(_._2).sum
    val sy = rows.map(_._3).sum
    val s11 = rows.map(r => r._1 * r._1).sum
    val s12 = rows.map(r => r._1 * r._2).sum
    val s22 = rows.map(r => r._2 * r._2).sum
    val s1y = rows.map(r => r._1 * r._3).sum
    val s2y = rows.map(r => r._2 * r._3).sum
    def det3(m: Array[Array[BigInt]]): BigInt =
      m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
        m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
        m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
    val g = Array(Array(n, s1, s2), Array(s1, s11, s12), Array(s2, s12, s22))
    val det = det3(g)
    val det1 = det3(Array(Array(n, sy, s2), Array(s1, s1y, s12),
      Array(s2, s2y, s22)))
    val got = q("q_ols_fit").collect()
    assert(got.length === 3)
    val qtyRow = got.find(_.getString(0) == "qty").get
    assert(qtyRow.getString(2) === det.toString, "shared denominator det(G)")
    assert(qtyRow.getString(1) === det1.toString, "qty numerator det")
    assert(qtyRow.getDouble(3) ===
      math.floor(det1.toDouble / det.toDouble * 10000.0 + 0.5) / 10000.0)
    got.foreach(r => assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
  }

  test("q_forecast_eval matches a sequential seasonal-naive backtest") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.sortBy(_.getDate(1).toString).map(_.getLong(2)).toArray)
      .toMap
    val got = q("q_forecast_eval").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val ys = daily(r.getString(0))
      val sae = (7 until ys.length).map(t => math.abs(ys(t) - ys(t - 7))).sum
      val snd = (1 until ys.length).map(t => math.abs(ys(t) - ys(t - 1))).sum
      assert(r.getLong(1) === ys.length.toLong, s"n_days ${r.getString(0)}")
      assert(r.getLong(2) === (ys.length - 7).toLong, s"n_eval ${r.getString(0)}")
      assert(r.getLong(3) === sae.toLong, s"sae ${r.getString(0)}")
      assert(r.getLong(4) === snd.toLong, s"snd ${r.getString(0)}")
    }
  }

  test("q_ab_lift counts match a sequential replay; CI brackets the rate") {
    import graft.tables.Tables
    val convByUser = Tables.events(spark, sfDir)
      .select("user_id", "event_type", "value").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.exists(r =>
        r.getString(1) == "purchase" && r.getDouble(2) >= 145.0)).toMap
    val armOf = convByUser.keys.groupBy(_ % 2)
    val r = q("q_ab_lift").collect().head
    assert(r.getLong(0) === armOf(0L).size.toLong)
    assert(r.getLong(1) === armOf(0L).count(convByUser).toLong)
    assert(r.getLong(2) === armOf(1L).size.toLong)
    assert(r.getLong(3) === armOf(1L).count(convByUser).toLong)
    val rateB = r.getDouble(5)
    assert(r.getDouble(8) <= rateB && rateB <= r.getDouble(9),
      "Wilson interval must bracket the observed rate")
  }

  test("q_activity_bitmap mask reproduces per-user active-day sets") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val expected = Tables.events(spark, sfDir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).as("di"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getInt(1)).toSet).toMap
    val got = q("q_activity_bitmap").collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val days = expected(r.getLong(0))
      val mask = days.map(1L << _).foldLeft(0L)(_ | _)
      assert(r.getLong(1) === mask, s"mask u=${r.getLong(0)}")
      assert(r.getLong(2) === days.size.toLong)
    }
  }

  test("q_pca_axes matches a BigInt + closed-form eigen replay") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val rows = Tables.lineitem(spark, sfDir)
      .select(round(col("l_quantity")).cast("long"),
        round(col("l_extendedprice")).cast("long")).collect()
      .map(r => (BigInt(r.getLong(0)), BigInt(r.getLong(1))))
    val n = BigInt(rows.length)
    val sq = rows.map(_._1).sum; val sp = rows.map(_._2).sum
    val sqq = rows.map(r => r._1 * r._1).sum
    val spp = rows.map(r => r._2 * r._2).sum
    val sqp = rows.map(r => r._1 * r._2).sum
    val vaa = n * sqq - sq * sq
    val vab = n * sqp - sq * sp
    val vbb = n * spp - sp * sp
    val r = q("q_pca_axes").collect().find(_.getString(0) == "qty_price").get
    assert(r.getString(1) === vaa.toString)
    assert(r.getString(2) === vab.toString)
    assert(r.getString(3) === vbb.toString)
    val tr = vaa.toDouble + vbb.toDouble
    val disc = math.sqrt(math.pow(vaa.toDouble - vbb.toDouble, 2) +
      4.0 * vab.toDouble * vab.toDouble)
    val evr = (tr + disc) / (2.0 * tr)
    assert(r.getDouble(4) === math.floor(evr * 10000.0 + 0.5) / 10000.0)
    assert(r.getDouble(4) >= 0.5 && r.getDouble(4) <= 1.0,
      "leading eigenvalue carries at least half the variance")
  }

  test("q_diversity_profile matches exact Simpson arithmetic per column") {
    import graft.tables.Tables
    val types = Tables.events(spark, sfDir).select("event_type").collect()
      .map(_.getString(0))
    val counts = types.groupBy(identity).view.mapValues(_.length.toLong)
    val n = types.length.toLong
    val sumC2 = counts.values.map(c => c * c).sum
    val r = q("q_diversity_profile").collect()
      .find(_.getString(0) == "events.event_type").get
    assert(r.getLong(1) === n)
    assert(r.getLong(2) === counts.size.toLong)
    assert(r.getLong(3) === sumC2)
    assert(r.getDouble(4) ===
      math.floor((n * n - sumC2).toDouble / (n * n) * 10000.0 + 0.5) / 10000.0)
  }

  test("q_ewma matches a sequential exponentially-weighted replay") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y")).collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.sortBy(_.getDate(1).toString).map(_.getLong(2)).toArray)
      .toMap
    val got = q("q_ewma").collect().groupBy(_.getString(0))
    assert(got.keySet === daily.keySet)
    got.foreach { case (t, rows) =>
      val ys = daily(t)
      val sorted = rows.sortBy(_.getDate(1).toString)
      assert(sorted.length === ys.length)
      sorted.zipWithIndex.foreach { case (r, ti) =>
        val lags = (0 until 20).filter(_ <= ti)
        val num = lags.map(i => ys(ti - i) * (1L << (19 - i))).sum
        val den = lags.map(i => 1L << (19 - i)).sum
        assert(r.getLong(2) === num, s"num $t day#$ti")
        assert(r.getLong(3) === den, s"den $t day#$ti")
      }
    }
  }

  test("q_seasonal_effect effects sum to ~zero when day-weighted") {
    // Σ_w d_w·effect_w = Σ_w (c_w − d_w·n_t/d_t) = n_t − n_t = 0 exactly —
    // check the integer identity per type (the round4 effect is the
    // presentation layer; the gated integers carry the contract).
    q("q_seasonal_effect").collect().groupBy(_.getString(0)).foreach {
      case (t, rows) =>
        val nT = rows.head.getLong(4)
        val dT = rows.head.getLong(5)
        assert(rows.map(_.getLong(2)).sum === nT, s"Σc_w = n_t for $t")
        assert(rows.map(_.getLong(3)).sum === dT, s"Σd_w = d_t for $t")
        // weighted effect numerators cancel: Σ(c_w·d_t − d_w·n_t) = 0
        assert(rows.map(r => r.getLong(2) * dT - r.getLong(3) * nT).sum === 0L)
    }
  }

  test("q_rank_test matches a sequential midrank replay") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val pv = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select((col("user_id") % 2), round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byVal = pv.groupBy(_._2).view.mapValues { rs =>
      (rs.count(_._1 == 0L).toLong, rs.count(_._1 == 1L).toLong)
    }.toMap
    val sortedVals = byVal.keys.toSeq.sorted
    var cntLess = 0L
    var twoR1 = BigInt(0)
    var tieSum = 0L
    sortedVals.foreach { v =>
      val (c0, c1) = byVal(v)
      val ct = c0 + c1
      twoR1 += BigInt(c1) * (2 * cntLess + ct + 1)
      tieSum += ct * ct * ct - ct
      cntLess += ct
    }
    val r = q("q_rank_test").collect().head
    assert(r.getLong(0) === pv.count(_._1 == 0L).toLong)
    assert(r.getLong(1) === pv.count(_._1 == 1L).toLong)
    assert(r.getLong(2) === twoR1.toLong, "2·R1")
    assert(r.getLong(4) === tieSum, "tie term")
    // z should be modest: arms are a random split of the same population
    assert(math.abs(r.getDouble(5)) < 5.0)
  }

  test("q_cramers_v matches a sequential contingency replay") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val cells = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), dayofweek(to_date(col("ts"))))
      .agg(count(lit(1))).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val n = cells.map(_._3).sum
    val rowM = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val colM = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val chi2Micro = cells.map { case (t, dw, o) =>
      val num = math.pow((o * n - rowM(t) * colM(dw)).toDouble, 2)
      math.floor(num / (n.toDouble * rowM(t) * colM(dw)) * 1e6).toLong
    }.sum
    val r = q("q_cramers_v").collect().head
    assert(r.getLong(0) === n)
    assert(r.getLong(3) === chi2Micro, "chi2 micro-units")
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
  }

  test("q_growth_accounting conserves users and pins the churn identity") {
    val got = q("q_growth_accounting").collect().sortBy(_.getLong(0))
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) ===
        r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"active = new + retained + resurrected in wk ${r.getLong(0)}")
    }
    got.sliding(2).foreach {
      case Array(prev, cur) =>
        assert(cur.getLong(5) === prev.getLong(1) - cur.getLong(3),
          s"churned(w) = active(w−1) − retained(w) at wk ${cur.getLong(0)}")
      case _ =>
    }
    assert(got.head.getLong(2) === got.head.getLong(1),
      "everyone is new in the first observed week")
  }

  test("q_decile_lift matches a sequential ntile + lift replay") {
    import graft.tables.Tables
    val evs = Tables.events(spark, sfDir)
      .select("user_id", "event_type", "value").collect()
    val users = evs.groupBy(_.getLong(0)).map { case (u, rs) =>
      (u, rs.length.toLong,
        if (rs.exists(r => r.getString(1) == "purchase" &&
          r.getDouble(2) >= 145.0)) 1L else 0L)
    }.toSeq
    val n = users.size.toLong
    val k = users.map(_._3).sum
    val ranked = users.sortBy { case (u, a, _) => (-a, u) }.zipWithIndex
    def ntile(rank: Long): Long = {
      val base = n / 10; val rem = n % 10; val head = (base + 1) * rem
      if (rank <= head) (rank - 1) / (base + 1) + 1
      else rem + (rank - 1 - head) / base + 1
    }
    val byDecile = ranked.groupBy { case (_, i) => ntile(i + 1L) }
      .view.mapValues(rs => (rs.size.toLong, rs.map(_._1._3).sum)).toMap
    val got = q("q_decile_lift").collect()
    assert(got.length === byDecile.size)
    var cum = 0L
    got.sortBy(_.getLong(0)).foreach { r =>
      val (nu, ku) = byDecile(r.getLong(0))
      assert(r.getLong(1) === nu, s"n_u decile ${r.getLong(0)}")
      assert(r.getLong(2) === ku, s"k_u decile ${r.getLong(0)}")
      cum += ku
      assert(r.getLong(5) === cum * 10000L / k, "cumulative capture bp")
    }
  }

  test("q_funnel_time matches a sequential step-gap replay") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val gaps12 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val gaps23 = scala.collection.mutable.ArrayBuffer.empty[Long]
    evs.groupBy(_._1).values.foreach { rs =>
      val t1 = rs.filter(_._2 == "signup").map(_._3).minOption
      val t2 = t1.flatMap(a =>
        rs.filter(r => r._2 == "click" && r._3 > a).map(_._3).minOption)
      val t3 = t2.flatMap(b =>
        rs.filter(r => r._2 == "purchase" && r._3 > b).map(_._3).minOption)
      for (a <- t1; b <- t2) gaps12 += (b - a) / 1000000L
      for (b <- t2; c <- t3) gaps23 += (c - b) / 1000000L
    }
    val got = q("q_funnel_time").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("signup_click") === ((gaps12.size.toLong, gaps12.sum)))
    assert(got("click_purchase") === ((gaps23.size.toLong, gaps23.sum)))
  }

  test("q_cohort_ltv matches a sequential cohort replay") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts) div 604800000000"),
        col("event_type"), round(col("value") * 100).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.getString(2) == "purchase") r.getLong(3) else 0L))
    val firstWeek = rows.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cells = rows.groupBy(r => (firstWeek(r._1), r._2 - firstWeek(r._1)))
      .view.mapValues { rs =>
        (rs.map(_._3).sum, rs.map(r => (r._1, r._2)).distinct.size.toLong)
      }.toMap
    val got = q("q_cohort_ltv").collect()
    assert(got.length === cells.size)
    got.foreach { r =>
      val (cents, nActive) = cells((r.getLong(0), r.getLong(1)))
      assert(r.getLong(2) === nActive, s"n_active ${r.getLong(0)}/${r.getLong(1)}")
      assert(r.getLong(3) === cents, s"cents ${r.getLong(0)}/${r.getLong(1)}")
    }
    // cumulative consistency within one cohort
    val c0 = got.filter(_.getLong(0) == got.map(_.getLong(0)).min)
      .sortBy(_.getLong(1))
    assert(c0.map(_.getLong(3)).sum === c0.last.getLong(4),
      "cum_cents at max age = Σ cell cents")
  }

  test("q_rolling_corr matches a sequential 7-day window replay") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "purchase",
        round(col("value")).cast("long")).otherwise(0L)).as("x"),
        count(lit(1)).as("y"))
      .orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val got = q("q_rolling_corr").collect().sortBy(_.getDate(0).toString)
    assert(got.length === daily.length)
    got.zipWithIndex.foreach { case (r, i) =>
      val win = daily.slice(math.max(0, i - 6), i + 1)
      val n = win.length.toLong
      val sx = win.map(_._1).sum; val sy = win.map(_._2).sum
      val sxy = win.map(w => w._1 * w._2).sum
      assert(r.getLong(1) === n); assert(r.getLong(2) === sx)
      assert(r.getLong(3) === sy); assert(r.getLong(4) === sxy)
      if (!r.isNullAt(5))
        assert(r.getDouble(5) >= -1.0001 && r.getDouble(5) <= 1.0001)
    }
  }

  test("q_bm25_topk matches a sequential BM25 replay") {
    import graft.tables.Tables
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val post = docs.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, g) => (t, id, g.size.toLong) }
    }
    val dl = docs.map { case (id, ts) => id -> ts.size.toLong }.toMap
    val nDocs = docs.length.toLong
    val totdl = dl.values.sum
    val df = post.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val qterms = df.toSeq.sortBy { case (t, c) => (-c, t) }.take(3).map(_._1)
    val idf = qterms.map { t =>
      t -> math.floor(math.log((nDocs - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
        * 1e6).toLong
    }.toMap
    val scores = post.filter(p => qterms.contains(p._1))
      .groupBy(_._2).view.mapValues { ps =>
        ps.map { case (t, id, tf) =>
          idf(t) * (22L * tf * totdl) /
            (10L * tf * totdl + 3L * totdl + 9L * dl(id) * nDocs)
        }.sum
      }.toMap
    val expect = scores.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(10)
    val got = q("q_bm25_topk").collect()
    assert(got.length === expect.length)
    got.zip(expect).foreach { case (r, (id, sc)) =>
      assert(r.getLong(0) === id)
      assert(r.getLong(3) === sc, s"score_micro doc $id")
    }
  }

  test("q_embed_centroid matches an exact fixed-point replay") {
    import graft.tables.Tables
    val rows = Tables.embeddings(spark, sfDir)
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    val cells = rows.flatMap { case (l, vec) =>
      vec.zipWithIndex.map { case (v, p) =>
        ((l.toLong, p.toLong), math.round(v.toDouble * 1e6))
      }
    }.groupBy(_._1).view
      .mapValues(vs => (vs.length.toLong, vs.map(_._2).sum)).toMap
    val got = q("q_embed_centroid").collect()
    assert(got.length === cells.size)
    got.foreach { r =>
      val (n, sm) = cells((r.getLong(0), r.getLong(1)))
      assert(r.getLong(2) === n)
      assert(r.getLong(3) === sm, s"sum_micro ${r.getLong(0)}/${r.getLong(1)}")
    }
  }

  test("q_zscore_anomaly matches a sequential trailing-window replay") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("y"))
      .orderBy("day").collect().map(_.getLong(1))
    val got = q("q_zscore_anomaly").collect().sortBy(_.getDate(0).toString)
    assert(got.length === daily.length - 7)
    got.zipWithIndex.foreach { case (r, k) =>
      val i = k + 7
      val win = daily.slice(i - 7, i)
      val n = 7L
      val sy = win.sum; val syy = win.map(v => v * v).sum
      assert(r.getLong(1) === daily(i))
      assert(r.getLong(2) === sy); assert(r.getLong(3) === syy)
      val dev = n * daily(i) - sy
      val varN = n * syy - sy * sy
      assert(r.getLong(4) === (if (dev * dev * (n - 1) > 4 * n * varN) 1L else 0L))
    }
  }

  test("q_seq_pairs matches a sequential subsequence-support replay") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val types = Seq("click", "error", "purchase", "signup", "view")
    val perUser = evs.groupBy(_._1).view.mapValues { rs =>
      types.map { t =>
        val ts = rs.filter(_._2 == t).map(_._3)
        t -> (ts.minOption, ts.maxOption)
      }.toMap
    }.toMap
    val nUsers = perUser.size.toLong
    val got = q("q_seq_pairs").collect()
    assert(got.length === 20)
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val expect = perUser.values.count { m =>
        (m(a)._1, m(b)._2) match {
          case (Some(fa), Some(lb)) => fa < lb
          case _ => false
        }
      }.toLong
      assert(r.getLong(2) === expect, s"support $a->$b")
      assert(r.getLong(3) === nUsers)
      assert(r.getLong(4) === expect * 10000L / nUsers)
    }
  }

  test("q_overlap_exact pair counts are symmetric-consistent (n_both <= min)") {
    q("q_overlap_exact").collect().foreach { r =>
      assert(r.getLong(4) <= math.min(r.getLong(2), r.getLong(3)))
      assert(r.getLong(5) >= math.max(r.getLong(2), r.getLong(3)))
    }
  }

  test("q_trending matches a sequential two-half rank replay") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), expr("unix_micros(l_shipdate) div 86400000000"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val lo = rows.map(_._2).min
    val hi = rows.map(_._2).max
    val mid = Math.floorDiv(lo + hi, 2L)
    def ranks(half: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
      val counts = half.groupBy(_._1).view.mapValues(_.size.toLong).toSeq
      counts.sortBy { case (pid, n) => (-n, pid) }.zipWithIndex
        .map { case ((pid, n), i) => pid -> (n, i + 1L) }.toMap
    }
    val r1 = ranks(rows.filter(_._2 <= mid).toSeq)
    val r2 = ranks(rows.filter(_._2 > mid).toSeq)
    val expect = r1.keySet.intersect(r2.keySet).toSeq
      .map { pid =>
        (pid, r1(pid)._1, r2(pid)._1, r1(pid)._2, r2(pid)._2,
          r1(pid)._2 - r2(pid)._2)
      }
      .sortBy { case (pid, _, _, _, _, dl) => (-dl, pid) }.take(20)
    val got = q("q_trending").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expect)
  }

  test("q_churn_hazard matches a sequential life-table replay") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val wks = Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val h = wks.map(_._2).max
    val perUser = wks.groupBy(_._1).values.map { rs =>
      val ws = rs.map(_._2)
      (ws.max - ws.min, if (ws.max <= h - 2) 1L else 0L)
    }.toSeq
    val byT = perUser.groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val got = q("q_churn_hazard").collect()
    assert(got.map(_.getLong(0)).toSeq === byT.keySet.toSeq.sorted)
    got.foreach { r =>
      val t = r.getLong(0)
      val atRisk = byT.filter(_._1 >= t).values.map(_._1).sum
      assert(r.getLong(1) === atRisk, s"at_risk t=$t")
      assert(r.getLong(2) === byT(t)._2, s"churned t=$t")
      assert(r.getLong(3) === 10000L * byT(t)._2 / atRisk, s"hazard t=$t")
    }
    // censoring is real on the fixture: the terminal tenures carry
    // censored (non-churned) users, so hazard < 1 somewhere near the tail
    assert(got.exists(r => r.getLong(2) < r.getLong(1)))
  }

  test("q_streaks matches a sequential gaps-and-islands replay") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val days = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = days.groupBy(_._1).view.mapValues { rs =>
      val ds = rs.map(_._2).sorted
      // explicit run-length fold over the sorted distinct days
      val lens = scala.collection.mutable.ArrayBuffer.empty[Long]
      var run = 0L
      var prev = Long.MinValue
      ds.foreach { d =>
        if (prev != Long.MinValue && d == prev + 1) run += 1
        else { if (run > 0) lens += run; run = 1 }
        prev = d
      }
      if (run > 0) lens += run
      (lens.max, lens.size.toLong, ds.size.toLong)
    }.toMap
    val got = q("q_streaks").collect()
    assert(got.length === expect.size)
    got.foreach { r =>
      val (mx, ni, na) = expect(r.getLong(0))
      assert(r.getLong(1) === mx, s"longest user=${r.getLong(0)}")
      assert(r.getLong(2) === ni, s"islands user=${r.getLong(0)}")
      assert(r.getLong(3) === na, s"active user=${r.getLong(0)}")
    }
  }

  test("q_top_paths matches a sequential trigram replay") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expect = evs.groupBy(_._1).values.flatMap { rs =>
      val seq = rs.sortBy(r => (r._3, r._4)).map(_._2).toSeq
      seq.sliding(3).filter(_.size == 3).map(t => (t(0), t(1), t(2)))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(10)
      .map { case ((a, b, c), n) => (a, b, c, n) }
    val got = q("q_top_paths").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got === expect)
  }

  test("q_seasonal_adjust preserves each type's mass exactly (Σ adjusted = n_t)") {
    // de-seasonalizing must not invent or destroy events: summing the
    // exact rationals per type returns the raw total, an identity the
    // float 'adjusted' column can only approximate
    val rows = q("q_seasonal_adjust").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val nT = BigInt(rs.map(_._2).sum)
      var (num, den) = (BigInt(0), BigInt(1))
      rs.foreach { case (_, _, an, ad) =>
        num = num * ad + BigInt(an) * den
        den = den * ad
        val g = num.gcd(den); if (g > 1) { num /= g; den /= g }
      }
      assert(num === nT * den, s"mass must be preserved for type $t")
    }
    // the adjustment is non-trivial: some day moves by ≥ 1 whole event
    assert(rows.exists { case (_, y, an, ad) =>
      (BigInt(an) - BigInt(y) * ad).abs * 1 >= ad })
  }

  test("q_cuped matches a sequential exact-rational replay") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val rows = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000"),
        round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lo = rows.map(_._2).min
    val hi = rows.map(_._2).max
    val mid = Math.floorDiv(lo + hi, 2L)
    val perUser = rows.groupBy(_._1).map { case (u, rs) =>
      (u % 2, rs.filter(_._2 <= mid).map(_._3).sum,
        rs.filter(_._2 > mid).map(_._3).sum)
    }.toSeq
    val n = perUser.size.toLong
    val sx = perUser.map(_._2).sum
    val sy = perUser.map(_._3).sum
    val sxx = perUser.map(r => r._2 * r._2).sum
    val sxy = perUser.map(r => r._2 * r._3).sum
    val tNum = BigInt(n) * sxy - BigInt(sx) * sy
    val tDen = BigInt(n) * sxx - BigInt(sx) * sx
    def arm(a: Long) = perUser.filter(_._1 == a)
    val (n0, sx0, sy0) =
      (arm(0).size.toLong, arm(0).map(_._2).sum, arm(0).map(_._3).sum)
    val (n1, sx1, sy1) =
      (arm(1).size.toLong, arm(1).map(_._2).sum, arm(1).map(_._3).sum)
    val dy = BigInt(sy1) * n0 - BigInt(sy0) * n1
    val dx = BigInt(sx1) * n0 - BigInt(sx0) * n1
    val r = q("q_cuped").collect().head
    assert(r.getAs[Long]("n0") === n0 && r.getAs[Long]("n1") === n1)
    assert(r.getAs[String]("theta_num_s") === tNum.toString)
    assert(r.getAs[String]("theta_den_s") === tDen.toString)
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(r.getAs[Double]("raw_diff_dollars") ===
      r4(dy.toDouble / (n1.toDouble * n0) / 100.0))
    assert(r.getAs[Double]("cuped_diff_dollars") ===
      r4((dy * tDen - tNum * dx).toDouble /
        (BigInt(n1) * n0 * tDen).toDouble / 100.0))
    // the adjustment is real on the fixture: θ ≠ 0, adjusted ≠ raw
    assert(tNum != BigInt(0))
    assert(r.getAs[Double]("cuped_diff_dollars") !==
      r.getAs[Double]("raw_diff_dollars"))
  }

  test("q_did matches a sequential exact-rational replay") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val rows = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(pmod(col("user_id"), lit(2L)),
        expr("unix_micros(ts) div 86400000000"),
        round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lo = rows.map(_._2).min
    val hi = rows.map(_._2).max
    val mid = Math.floorDiv(lo + hi, 2L)
    def cellOf(arm: Long, post: Boolean) = {
      val c = rows.filter(r => r._1 == arm && ((r._2 > mid) == post))
      (c.size.toLong, c.map(_._3).sum)
    }
    val (n00, s00) = cellOf(0, post = false)
    val (n01, s01) = cellOf(0, post = true)
    val (n10, s10) = cellOf(1, post = false)
    val (n11, s11) = cellOf(1, post = true)
    val num = (BigInt(s11) * n10 - BigInt(s10) * n11) *
      (BigInt(n01) * n00) -
      (BigInt(s01) * n00 - BigInt(s00) * n01) * (BigInt(n11) * n10)
    val den = BigInt(n11) * n10 * n01 * n00
    val r = q("q_did").collect().head
    assert(Seq("n00", "s00", "n01", "s01", "n10", "s10", "n11", "s11")
      .map(r.getAs[Long]) === Seq(n00, s00, n01, s01, n10, s10, n11, s11))
    assert(r.getAs[String]("did_num_s") === num.toString)
    assert(r.getAs[String]("did_den_s") === den.toString)
    val did = num.toDouble / den.toDouble / 100.0
    assert(r.getAs[Double]("did_dollars") ===
      math.floor(did * 10000.0 + 0.5) / 10000.0)
  }

  test("variant semantics: typed access equals string-path parse; missing paths null; schema inferred") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val v = Tables.events(spark, sfDir)
      .select(col("event_id"), col("props"), parse_json(col("props")).as("v"))
    val rows = v.select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("str_k"),
        try_variant_get(col("v"), "$.k", "bigint").as("var_k"),
        try_variant_get(col("v"), "$.missing", "bigint").as("gone"),
        schema_of_variant(col("v")).as("sch"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"variant and string-path extraction must agree for ${r.getLong(0)}")
      assert(r.isNullAt(3), "a missing path must be null, not an error")
      assert(r.getString(4).contains("k"),
        s"inferred variant schema must mention the field: ${r.getString(4)}")
    }
  }

  test("q_funnel_window: timed conversions are a subset of untimed, and the gap is real") {
    val timed = q("q_funnel_window").collect().head
    val untimed = q("q_funnel_steps").collect().head
    assert(timed.getAs[Long]("n_signup") === untimed.getAs[Long]("n_signup"))
    assert(timed.getAs[Long]("n_click_w") <=
      untimed.getAs[Long]("n_click_after"))
    assert(timed.getAs[Long]("n_purchase_w") <=
      untimed.getAs[Long]("n_purchase_after"))
    // the deadline bites on the fixture — the timed funnel is not a
    // renamed copy of the untimed one
    assert(timed.getAs[Long]("n_click_slow") > 0L)
    assert(timed.getAs[Long]("n_click_any") ===
      untimed.getAs[Long]("n_click_after"))
  }

  test("q_mom_growth matches a sequential lag replay") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val monthly = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long"),
        round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expect = monthly.keys.groupBy(_._1).toSeq.flatMap { case (nk, ks) =>
      val mis = ks.map(_._2).toSeq.sorted
      mis.zip(None +: mis.init.map(Some(_))).map { case (mi, prevMi) =>
        val c = monthly((nk, mi))
        val prev = prevMi.map(p => monthly((nk, p)))
        (nk, mi, c, prev.map(c - _),
          // Spark `div` and DuckDB `//` both TRUNCATE toward zero on
          // negatives (probed) — Scala `/` matches; floorDiv would not
          prev.map(p => 10000L * (c - p) / p))
      }
    }.sortBy(t => (t._1, t._2))
    val got = q("q_mom_growth").collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }.toSeq
    assert(got === expect)
  }

  test("q_calibration matches a sequential reliability replay") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val users = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("a"),
        max(when(col("event_type") === "purchase" && col("value") >= 145.0,
          1L).otherwise(0L)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = users.length.toLong
    val ranked = users.sortBy { case (u, a, _) => (-a, u) }.zipWithIndex
      .map { case ((u, a, c), i) =>
        val rnk = i + 1L
        val scoreBp = 10000L * (n - rnk + 1L) / n
        // ntile's fill rule from the exact rank
        val q = n / 10L; val r = n % 10L
        val decile =
          if (rnk <= (q + 1) * r) (rnk - 1) / (q + 1) + 1
          else r + (rnk - 1 - (q + 1) * r) / q + 1
        (decile, scoreBp, c)
      }
    val bins = ranked.groupBy(_._1).toSeq.map { case (dec, xs) =>
      val nU = xs.length.toLong
      val kU = xs.map(_._3).sum
      val sBp = xs.map(_._2).sum
      val conf = sBp / nU
      val acc = 10000L * kU / nU
      (dec, nU, kU, conf, acc, math.abs(conf - acc))
    }.sortBy(_._1)
    val ece = bins.map(b => b._2 * b._6).sum / n
    val got = q("q_calibration").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === bins.map(b => (b._1, b._2, b._3, b._4, b._5, b._6, ece)))
    assert(got.map(_._7).distinct === Seq(ece) && ece > 0L,
      "the audited score must be measurably miscalibrated on the fixture")
  }

  test("q_mann_kendall matches a sequential pairwise-sign replay") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val daily = Tables.orders(spark, sfDir)
      .select(expr("unix_micros(o_orderdate) div 86400000000").as("day"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      .toSeq.sortBy(_._1).map(_._2)
    val n = daily.size.toLong
    val s = (for (i <- daily.indices; j <- i + 1 until daily.size)
      yield (daily(j) compare daily(i)).sign.toLong).sum
    val tie18 = daily.groupBy(identity).values
      .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
    val var18 = n * (n - 1) * (2 * n + 5) - tie18
    val zRaw =
      if (s > 0) (s - 1).toDouble / math.sqrt(var18.toDouble / 18.0)
      else if (s < 0) (s + 1).toDouble / math.sqrt(var18.toDouble / 18.0)
      else 0.0
    val z = math.floor(zRaw * 10000.0 + 0.5) / 10000.0
    val row = q("q_mann_kendall").collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))
      === ((n, s, var18, z)))
    assert(var18 > 0L && n > 10L, "the fixture series must be non-degenerate")
  }

  test("q_stratified_sample: exact per-stratum counts and deterministic membership") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byLang = docs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val k = byLang.values.map(_.length).min
    def md5Long(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString, 16)
    val expect = byLang.toSeq.map { case (lang, ids) =>
      val chosen = ids.sortBy(id => (md5Long(s"$id#strat"), id)).take(k)
      (lang, ids.length.toLong, k.toLong, chosen.length.toLong, chosen.sum)
    }.sortBy(_._1)
    val got = q("q_stratified_sample").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expect)
    // exactness: every stratum lands exactly k members
    assert(got.forall(_._4 == k.toLong))
    // the rank <= k plans as a group limit — no stratum buffers beyond k
    val plan = q("q_stratified_sample").queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-stratum rank must plan as a group limit:\n$plan")
  }

  test("q_subsample_stability matches a sequential md5 half-sample replay") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    def md5hex8(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").cast("string"),
        round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val means = (0 until 16).map { b =>
      val in = rows.filter { case (k, _) => md5hex8(s"$k#$b") % 2 == 0 }
      in.map(_._2).sum / in.size
    }.sorted
    val r = q("q_subsample_stability").collect().head
    assert(r.getAs[Long]("n") === rows.length.toLong)
    assert(r.getAs[Long]("full_mean_cents") ===
      rows.map(_._2).sum / rows.length)
    assert(r.getAs[Long]("sub_mean_lo") === means.head)
    assert(r.getAs[Long]("sub_mean_med") === means(7))
    assert(r.getAs[Long]("sub_mean_hi") === means.last)
    assert(r.getAs[Long]("sub_spread") === means.last - means.head)
    // the audit is non-degenerate: half-samples actually differ
    assert(means.distinct.size > 1)
  }

  test("q_weighted_quantile matches a sequential cumulative-weight pick") {
    import graft.tables.Tables
    import org.apache.spark.sql.functions._
    val vw = Tables.lineitem(spark, sfDir)
      .select(round(col("l_extendedprice") * 100).cast("long"),
        col("l_quantity").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val totW = vw.map(_._2).sum
    val sorted = vw.sortBy(_._1)
    val got = q("q_weighted_quantile").collect()
    assert(got.length === 4)
    got.foreach { r =>
      val pBp = r.getLong(0)
      val t = (pBp * totW + 9999L) / 10000L
      assert(r.getLong(1) === t, s"target p=$pBp")
      var cum = 0L
      var ans = Long.MinValue
      val it = sorted.iterator
      while (ans == Long.MinValue && it.hasNext) {
        val (c, w) = it.next()
        cum += w
        if (cum >= t) ans = c
      }
      assert(r.getLong(2) === ans, s"value p=$pBp")
    }
  }
}
