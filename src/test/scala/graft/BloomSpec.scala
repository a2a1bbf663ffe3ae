package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.functions.{BloomMightContain, TopKByScore}
import graft.queries.Registry
import graft.tables.Tables

/** Guarantees behind the two shuffle-avoiding scale twins added this round:
  * the Bloom-prefiltered incremental dedup (`q_bloom_dedup`) and the
  * bounded-heap grouped top-k (`q_topk_heap`).
  */
class BloomSpec extends SparkSpec {

  test("bloom prefilter has zero false negatives over the full catalog") {
    // Every fingerprint that was PUT into the sketch must probe true via
    // the codegen expression — i.e. the expression's mightContainBinary
    // byte contract matches stat.bloomFilter's putBinary build path. A
    // single false negative would silently mark a dup as novel.
    val catalog = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(5L)) =!= 0)
      .select(md5(col("text")).as("fp"))
    val bf = catalog.stat.bloomFilter("fp", 10000L, 0.03)
    val misses = catalog.where(!BloomMightContain(col("fp"), bf)).count()
    assert(misses === 0L, s"$misses catalog fingerprints probed false")
  }

  test("q_bloom_dedup equals the exact fingerprint join, and the sketch prunes") {
    val got = Registry.queries("q_bloom_dedup")(spark, sfDir)
      .collect().map(_.toString).toSeq
    // Exact reference: same snapshot/catalog split, plain left join, no BF.
    val docs = Tables.documents(spark, sfDir)
    val catAgg = docs.filter(pmod(col("doc_id"), lit(5L)) =!= 0)
      .select(md5(col("text")).as("fp"), col("doc_id").as("catalog_id"))
      .groupBy("fp").agg(min("catalog_id").as("catalog_id"))
    val planted = docs.filter(pmod(col("doc_id"), lit(5L)) =!= 0)
      .filter(col("doc_id") < 50)
      .select((col("doc_id") + lit(50000L)).as("doc_id"), col("text"))
    val snap = docs.filter(pmod(col("doc_id"), lit(5L)) === 0)
      .select("doc_id", "text").unionByName(planted)
      .withColumn("fp", md5(col("text")))
    val exact = snap.join(catAgg, Seq("fp"), "left")
      .select(col("doc_id"), col("catalog_id"),
        col("catalog_id").isNotNull.cast("int").as("is_dup"))
      .orderBy("doc_id")
      .collect().map(_.toString).toSeq
    assert(got === exact, "BF-prefiltered result diverged from the exact join")

    // The point of the sketch: most novel rows must skip the join. At 3 %
    // fpp the BF-positive set should be close to the true-dup count, far
    // below the snapshot size.
    val bf = catAgg.stat.bloomFilter("fp", 10000L, 0.03)
    val nSnap = snap.count()
    val nPos = snap.where(BloomMightContain(col("fp"), bf)).count()
    val nDup = exact.count(_.endsWith(",1]"))
    assert(nPos < nSnap / 2,
      s"sketch pruned nothing: $nPos of $nSnap rows probed positive")
    assert(nPos >= nDup, "BF-positive set cannot be smaller than the true dups")
  }

  test("bloom pos/neg branch split is exhaustive, including null fingerprints") {
    // The q_bloom_dedup union must route EVERY row somewhere. A null
    // fingerprint probes null; `p` and `!p` both drop it — only
    // `!coalesce(p, false)` keeps the branch split total.
    import spark.implicits._
    val bf = Tables.documents(spark, sfDir)
      .select(md5(col("text")).as("fp")).stat.bloomFilter("fp", 1000L, 0.03)
    val probeSrc = Seq(Option("known"), Option("novel-xyzzy"), None)
      .toDF("fp")
    val probe = BloomMightContain(col("fp"), bf)
    val pos = probeSrc.where(probe).count()
    val neg = probeSrc.where(!coalesce(probe, lit(false))).count()
    assert(pos + neg === 3L,
      s"branch split lost rows: $pos positive + $neg negative of 3")
    // And the naive complement really does lose the null row — the trap
    // the coalesce exists for.
    assert(probeSrc.where(probe).count() + probeSrc.where(!probe).count() < 3L)
  }

  test("TopKByScore is insertion-order and merge-order invariant") {
    val agg = new TopKByScore(3)
    val plain = Seq.tabulate(40)(i => ((i * 7 % 11).toDouble, i.toLong))
    // NaN must rank GREATER than every score (Spark's desc order) and tie
    // with other NaNs on id — the case where a bare `>` comparison makes
    // the result depend on which partition the NaN arrives from.
    val withNaN = plain ++ Seq((Double.NaN, 100L), (Double.NaN, 41L))
    for (rows <- Seq(plain, withNaN)) {
      val expected = rows.sortWith { case ((va, ia), (vb, ib)) =>
        val (na, nb) = (va.isNaN, vb.isNaN)
        if (na != nb) na else if (va != vb && !na) va > vb else ia < ib
      }.take(3)
      val rnd = new Random(42)
      for (_ <- 1 to 20) {
        val shuffled = rnd.shuffle(rows)
        val cut = rnd.nextInt(rows.size)
        val (l, r) = shuffled.splitAt(cut)
        val bufL = l.foldLeft(agg.zero)(agg.reduce)
        val bufR = r.foldLeft(agg.zero)(agg.reduce)
        assert(agg.finish(agg.merge(bufL, bufR)).map(_.toString) ===
          expected.map(_.toString))
        assert(agg.finish(agg.merge(bufR, bufL)).map(_.toString) ===
          expected.map(_.toString))
      }
    }
  }

  test("q_dedup_delta composes bloom gate -> exact fp join -> LSH on survivors") {
    val got = Registry.queries("q_dedup_delta")(spark, sfDir)
    val rows = got.collect()
    val byStatus = rows.groupBy(_.getAs[String]("status"))
      .view.mapValues(_.length).toMap
    // planted exact dups: catalog ids < 50 with id % 5 != 0 -> 40 copies
    assert(byStatus.getOrElse("exact_dup", 0) === 40, s"statuses: $byStatus")
    // the 25 planted copies MUST be flagged; the corpus also contains
    // natural near-dup pairs (q_minhash_dedup finds them), so >= not ==
    assert(byStatus.getOrElse("near_dup", 0) >= 25, s"statuses: $byStatus")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      r.getAs[String]("status") match {
        case "exact_dup" =>
          // exact stage must resolve the copy to its catalog origin
          assert(r.getAs[Long]("catalog_id") === id - 50000L)
        case "near_dup" if id >= 60000L =>
          // a planted copy's canonical partner is its delta origin or a
          // natural near-dup of it — either way a smaller surviving id
          assert(r.getAs[Long]("near_dup_of") <= id - 60000L)
        case "novel" =>
          assert(r.isNullAt(r.fieldIndex("catalog_id")) &&
            r.isNullAt(r.fieldIndex("near_dup_of")))
        case _ => // natural near-dup among the base delta docs
      }
    }
    // every planted copy must be caught by the LSH stage (jac 1.0 pairs
    // share every band bucket, so discovery cannot miss them)
    val planted = rows.filter(_.getAs[Long]("doc_id") >= 60000L)
    assert(planted.length === 25)
    assert(planted.forall(_.getAs[String]("status") == "near_dup"),
      "all planted copies must be flagged near_dup")
    // plan: the probe must gate the delta SCANS inside codegen (the whole
    // point — BF-negatives skip the join shuffle), and nothing in the
    // composition may go cartesian.
    val p = got.queryExecution.executedPlan.toString
    val gatedScans = p.linesIterator.count(l =>
      l.contains("*(") && l.contains("Filter") && l.contains("bloommightcontain"))
    assert(gatedScans >= 3,
      s"bloom probe must gate the delta branches in codegen Filters:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_topk_heap matches the ranking-window answer without any Window node") {
    val got = Registry.queries("q_topk_heap")(spark, sfDir)
    val viaWindow = Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy(desc("value"), asc("event_id"))))
      .filter(col("rn") <= 5)
      .select("event_type", "rn", "event_id", "value")
      .orderBy("event_type", "rn")
      .collect().map(_.toString).toSeq
    assert(got.collect().map(_.toString).toSeq === viaWindow)

    val p = got.queryExecution.executedPlan.toString
    // "Window [" / "WindowGroupLimit" are the physical window nodes; a bare
    // "Window" substring also matches the enclosing graft.queries.Windows
    // object's lambda class names in AppendColumns.
    assert(!p.contains("Window [") && !p.contains("WindowGroupLimit"),
      s"heap top-k must not plan a window:\n$p")
    assert("ObjectHashAggregate".r.findAllMatchIn(p).size >= 2,
      s"typed top-k must partial-aggregate map-side before the exchange:\n$p")
  }

  test("MisraGries summary: bounded size, superset of true heavy hitters, partial-aggregated") {
    import org.apache.spark.sql.functions._
    import graft.tables.Tables
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val k = 63
    val mg = udaf(new graft.functions.MisraGries(k),
      org.apache.spark.sql.Encoders.STRING)
    val sketchDf = toks.repartition(7).agg(mg(col("w")).as("cands"))
    val p = sketchDf.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllMatchIn(p).size >= 2,
      s"the summary must partial-aggregate map-side:\n$p")
    val cands = sketchDf.collect().head.getSeq[String](0).toSet
    assert(cands.size <= k, s"summary holds at most $k items, got ${cands.size}")
    val counts = toks.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    val trueHH = counts.filter { case (_, c) => c * (k + 1) > n }.keySet
    assert(trueHH.nonEmpty, "the token corpus must have real heavy hitters")
    assert(trueHH.subsetOf(cands),
      s"every item above n/(k+1) must survive: missing ${trueHH -- cands}")
    // the registry composition returns EXACTLY the true heavy hitters
    val got = graft.queries.Registry.queries("q_heavy_hitters")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === counts.filter { case (_, c) => c * 64 > n })
  }
}
