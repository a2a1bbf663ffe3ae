package graft

import graft.tables.Tables

/** Direct-recomputation checks for the repetition / decontamination /
  * sharding / unigram-LM operators: each query's full sf0.001 output is
  * compared against a plain-Scala model of the same definition, so the
  * Spark plan can be rearranged freely without changing a single value.
  */
class LlmPipelineSpec extends SparkSpec {

  private lazy val docs: Map[Long, String] =
    Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000.0

  test("q_repetition matches a plain-Scala recomputation on every doc") {
    val expect = docs.map { case (id, text) =>
      val ws = text.split(" ", -1)
      val n = ws.length
      def dupFrac(k: Int): Double =
        if (n >= k) {
          val total = n - k + 1
          val distinct = ws.sliding(k).map(_.mkString(" ")).toSet.size
          r4((total - distinct).toDouble / total)
        } else 0.0
      val topF = r4(ws.groupBy(identity).values.map(_.length).max.toDouble / n)
      val flagged =
        if (dupFrac(2) > 0.2 || dupFrac(3) > 0.18 || topF > 0.3) 1 else 0
      id -> ((n, dupFrac(2), dupFrac(3), topF, flagged))
    }
    val got = SparkEntry.queries("q_repetition")(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getInt(5))))
      .toMap
    assert(got === expect)
  }

  test("q_contam_ngram recovers every planted 8-gram leak") {
    val out = SparkEntry.queries("q_contam_ngram")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // A planted doc embeds its eval source's first 8 words between
    // out-of-vocabulary sentinels; it can only match if the source itself
    // has >= 8 words (otherwise it contributes no 8-gram to the eval set).
    val planted = docs.collect {
      case (id, t) if id % 10 == 0 && id < 300 && t.split(" ", -1).length >= 8 =>
        id + 30000L
    }
    assert(planted.nonEmpty)
    planted.foreach(p => assert(out.contains(p), s"planted leak $p not flagged"))
    assert(out.values.forall(_ >= 1L))
  }

  test("q_shard_assign partitions the corpus exactly across 16 shards") {
    val rows = SparkEntry.queries("q_shard_assign")(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSet.subsetOf((0L until 16L).toSet))
    assert(rows.map(_.getLong(1)).sum === docs.size.toLong)
    val totTokens = docs.values.map(_.split(" ", -1).length.toLong).sum
    assert(rows.map(_.getLong(2)).sum === totTokens)
  }

  test("q_dup_spans matches a plain-Scala interval-merge recomputation") {
    val k = 16
    val gramsByDoc = docs.map { case (id, t) =>
      val ws = t.split(" ", -1)
      id -> ((ws.length,
        if (ws.length >= k) ws.sliding(k).map(_.mkString(" ")).toVector
        else Vector.empty[String]))
    }
    val gramDocs = gramsByDoc.toSeq
      .flatMap { case (id, (_, gs)) => gs.distinct.map(g => g -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
    val expect = gramsByDoc.map { case (id, (n, gs)) =>
      val dupPos = gs.zipWithIndex.collect {
        case (g, i) if gramDocs(g) >= 2 => i
      }
      val merged = dupPos.foldLeft(List.empty[(Int, Int)]) {
        case (Nil, p) => List((p, p + k))
        case ((s, e) :: rest, p) =>
          if (p > e) (p, p + k) :: (s, e) :: rest
          else (s, math.max(e, p + k)) :: rest
      }
      val covered = merged.map { case (s, e) => (e - s).toLong }.sum
      id -> ((n, covered, merged.size.toLong, r4(covered.toDouble / n)))
    }
    val got = SparkEntry.queries("q_dup_spans")(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got === expect)
  }

  test("q_unigram_lm matches an order-independent fixed-point recomputation") {
    val allWords = docs.values.toSeq.flatMap(_.split(" ", -1))
    val cnt = allWords.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val n = allWords.size.toLong
    val expect = docs.map { case (id, t) =>
      val ws = t.split(" ", -1)
      val sil = ws.map(w =>
        math.floor(math.log10(cnt(w).toDouble / n) * 1e6 + 0.5).toLong).sum
      id -> ((ws.length.toLong,
        math.floor(sil / (ws.length * 100.0) + 0.5) / 10000.0))
    }
    val got = SparkEntry.queries("q_unigram_lm")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === expect)
  }
}
