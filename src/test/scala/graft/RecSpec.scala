package graft

import org.apache.spark.sql.Row
import graft.queries.Registry

/** Independent plain-Scala replays of the recommender-evaluation suite
  * (RecQueries): the interaction generator, leave-one-out split,
  * popularity ranking, per-user held-out rank and the coverage/Gini audit
  * are recomputed from the raw part table with none of the query's Spark
  * machinery (no windows, no Prefix decomposition, no joins) and compared
  * row-for-row. The DuckDB oracle checks cross-engine agreement; this
  * spec checks both against the metric DEFINITIONS.
  */
class RecSpec extends SparkSpec {

  private def md5l(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  /** Plain-Scala replay of MLQueries.interactions. */
  private lazy val inter: Seq[(Int, Int, Float)] = {
    val parts = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    parts.toSeq.flatMap { case (pk, name) =>
      val pop = md5l(name) % 101
      val base =
        if (pop > 70) 5.0 else if (pop > 50) 4.0
        else if (pop > 30) 3.0 else if (pop > 10) 2.0 else 1.0
      (0 to 7).map { i =>
        val user = (md5l(s"${pk}u$i") % 200).toInt
        val jit = md5l(s"${pk}j$i") / 4294967296.0 - 0.5
        (user, pk.toInt, (base + jit).toFloat)
      }
    }
  }

  /** Replay of the LOO split + popularity rank. */
  private lazy val (held, trainItems, ranks) = {
    val h = inter.groupBy(_._1).map { case (u, rows) =>
      val best = rows.maxBy(r => (r._3, r._2))
      u -> best._2
    }
    val train = inter.filterNot(r => h(r._1) == r._2)
    val tItems = train.map(r => (r._1, r._2)).toSet
    val pop = train.groupBy(_._2).map { case (i, rs) => i -> rs.size.toLong }
    val rk = pop.toSeq.sortBy { case (i, p) => (-p, i) }
      .zipWithIndex.map { case ((i, p), idx) => i -> (idx + 1L) }.toMap
    (h, tItems, rk)
  }

  test("q_eval_ranking matches a plain-Scala LOO replay row-for-row") {
    val nItems = ranks.size.toLong
    val expected = held.toSeq.sortBy(_._1).map { case (u, hi) =>
      val mine = trainItems.filter(_._1 == u).map(_._2)
      val rankH = ranks.get(hi) match {
        case Some(hr) => hr - mine.count(i => ranks(i) < hr)
        case None     => nItems - mine.size + 1
      }
      Row(u, hi, rankH, if (rankH <= 10) 1 else 0, 1000000L / rankH)
    }
    val got = Registry.queries("q_eval_ranking")(spark, sfDir).collect().toSeq
    assert(got === expected)
  }

  test("q_negative_sample: catalog-valid, never a positive, ≤5 contiguous ranks per user, deterministic") {
    val catalog = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey").collect().map(_.getLong(0).toInt).toSet
    val positives = inter.map(r => (r._1, r._2)).toSet
    val run1 = Registry.queries("q_negative_sample")(spark, sfDir).collect()
    val run2 = Registry.queries("q_negative_sample")(spark, sfDir).collect()
    assert(run1.toSeq === run2.toSeq, "non-deterministic output")
    assert(run1.nonEmpty)
    run1.foreach { r =>
      val (u, rk, i) = (r.getInt(0), r.getInt(1), r.getInt(2))
      assert(catalog.contains(i), s"item $i not in catalog")
      assert(!positives.contains((u, i)), s"($u,$i) is a positive")
      assert(rk >= 1 && rk <= 5)
    }
    run1.groupBy(_.getInt(0)).foreach { case (u, rows) =>
      val rks = rows.map(_.getInt(1)).sorted.toSeq
      assert(rks === (1 to rks.size).toSeq, s"user $u ranks not contiguous: $rks")
    }
  }

  test("q_rec_coverage matches a plain-Scala coverage/Gini replay") {
    val catalog = spark.read.parquet(s"$sfDir/part.parquet").count()
    // naive replay: full ranked list per user minus seen, top 10.
    val ranked = ranks.toSeq.sortBy(_._2).map(_._1)
    val recs = held.keys.toSeq.flatMap { u =>
      val mine = trainItems.filter(_._1 == u).map(_._2)
      ranked.filterNot(mine.contains).take(10).map(i => (u, i))
    }
    val expo = recs.groupBy(_._2).map { case (i, rs) => i -> rs.size.toLong }
    val covered = expo.size.toLong
    val exposures = expo.values.sum
    val maxX = expo.values.max
    val sortedAsc = expo.toSeq.sortBy { case (i, x) => (x, i) }
    val zeros = catalog - covered
    val gnum = sortedAsc.zipWithIndex.map { case ((_, x), idx) =>
      (2L * (idx + 1 + zeros) - catalog - 1) * x
    }.sum
    def bp(num: Double, den: Double, scale: Double): Long =
      math.floor(scale * num / den + 0.5).toLong
    val expected = Row(catalog, covered, bp(covered.toDouble, catalog.toDouble, 10000.0),
      exposures, bp(maxX.toDouble, exposures.toDouble, 10000.0),
      bp(gnum.toDouble, catalog.toDouble * exposures, 1000000.0))
    val got = Registry.queries("q_rec_coverage")(spark, sfDir).collect()
    assert(got.length === 1)
    assert(got.head === expected)
  }
}
