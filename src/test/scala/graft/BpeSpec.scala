package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._
import graft.llm.Bpe
import graft.queries.Registry
import graft.tables.Tables

/** The BPE trainer against an independent plain-Scala reference
  * implementation (no Spark machinery: in-memory pair counting + greedy
  * merge), plus the greedy-overlap rule, encoder round-trip, and the
  * q_bpe_pairs ↔ trainer first-argmax consistency.
  */
class BpeSpec extends SparkSpec {

  /** Independent reference trainer over a (word, freq) table. */
  private def refTrain(wordFreq: Seq[(String, Long)], n: Int)
      : Seq[(String, String, String, Long)] = {
    var vocab: Seq[(Vector[String], Long)] =
      wordFreq.map { case (w, f) => w.split("").filter(_.nonEmpty).toVector -> f }
    val out = mutable.ArrayBuffer.empty[(String, String, String, Long)]
    var exhausted = false
    while (out.size < n && !exhausted) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((syms, f) <- vocab; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) += f
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((l, r, l + r, c))
        vocab = vocab.map { case (syms, f) => mergeWord(syms, l, r) -> f }
      }
    }
    out.toSeq
  }

  private def mergeWord(s: Vector[String], l: String, r: String): Vector[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    for (x <- s)
      if (out.nonEmpty && out.last == l && x == r) out(out.size - 1) = l + r
      else out += x
    out.toVector
  }

  private def refWordFreq: Seq[(String, Long)] = {
    val re = "[a-z]+".r
    Tables.documents(spark, sfDir).select("text").collect()
      .flatMap(r => re.findAllIn(r.getString(0)))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }.toSeq
  }

  test("Bpe.train matches the plain-Scala reference trainer merge-for-merge") {
    val got = Bpe.train(Tables.documents(spark, sfDir), 25)
      .map(m => (m.lhs, m.rhs, m.merged, m.pairFreq))
    val want = refTrain(refWordFreq, 25)
    assert(got === want)
  }

  test("Bpe.trainBatched equals the sequential trainer merge-for-merge, with real batches") {
    val docs = Tables.documents(spark, sfDir)
    val want = refTrain(refWordFreq, 40)
    val got = Bpe.trainBatched(docs, 40, batchK = 8, fetchK = 256)
      .map(m => (m.lhs, m.rhs, m.merged, m.pairFreq))
    assert(got === want,
      "batched selection must reproduce sequential BPE exactly")
    // the batch rule genuinely fires: 40 merges in strictly fewer
    // fetch iterations than the sequential trainer's 40 — otherwise
    // the equality above is vacuous
    assert(Bpe.lastBatchedIterations < 40,
      s"expected real batching, got ${Bpe.lastBatchedIterations} " +
        "iterations for 40 merges")
    // ranks stay 1..n in order
    assert(got.size === 40 &&
      Bpe.trainBatched(docs, 10).map(_.rank) === (1 to 10))
  }

  test("trainBatched equals sequential on random adversarial corpora") {
    // Generative backstop for the 4-cap dominance rule: tiny alphabets
    // with repeated substrings maximize the chance of the rule's edge
    // cases (merged-symbol string collisions, tie cascades, pairs
    // sharing symbols at equal counts). 15 seeded corpora, full
    // merge-for-merge equality each.
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    (1 to 15).foreach { trial =>
      val alphabet = "ab" + ("cde".take(rnd.nextInt(3)))
      val words = (1 to 40).map { _ =>
        (1 to (1 + rnd.nextInt(8)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val text = words.mkString(" ")
      val docs = spark.createDataFrame(Seq((1L, text))).toDF("doc_id", "text")
      val wf = words.groupBy(identity).map { case (w, g) =>
        w -> g.size.toLong
      }.toSeq
      val want = refTrain(wf, 25)
      val got = Bpe.trainBatched(docs, 25, batchK = 8, fetchK = 64)
        .map(m => (m.lhs, m.rhs, m.merged, m.pairFreq))
      assert(got === want, s"trial $trial diverged (corpus: $text)")
    }
  }

  test("greedy left-to-right overlap rule: aaa + (a,a) merges once") {
    import spark.implicits._
    val docs = Seq("aaa bb aaa").toDF("text")
    val merges = Bpe.train(docs, 2)
    assert(merges.map(m => (m.lhs, m.rhs, m.merged, m.pairFreq)) ===
      Seq(("a", "a", "aa", 4L), ("aa", "a", "aaa", 2L)))
  }

  test("encode round-trips every word and emits only learned symbols") {
    val merges = Bpe.train(Tables.documents(spark, sfDir), 25)
    val words = Bpe.wordFreq(Tables.documents(spark, sfDir)).select("word").limit(500)
    val enc = Bpe.encode(words, merges)
    val rows = enc.select(col("word"), concat_ws("", col("syms")).as("joined"),
      col("syms")).collect()
    assert(rows.nonEmpty)
    val legal = ('a' to 'z').map(_.toString).toSet ++ merges.map(_.merged)
    rows.foreach { r =>
      assert(r.getString(1) === r.getString(0), "round-trip broke")
      r.getSeq[String](2).foreach(t => assert(legal.contains(t), s"illegal token $t"))
    }
  }

  test("ml_bpe_encode equals a sequential train+encode replay of the top-50 words") {
    val wf = refWordFreq
    val merges = refTrain(wf, 30)
    val encoded = wf.map { case (w, f) =>
      val syms = merges.foldLeft(w.split("").filter(_.nonEmpty).toVector) {
        case (s, (l, r, _, _)) => mergeWord(s, l, r)
      }
      (w, f, syms.length.toLong, syms.mkString(" "))
    }
    val expect = encoded.sortBy { case (w, f, _, _) => (-f, w) }.take(50)
    val got = Registry.queries("ml_bpe_encode")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2).toLong,
        r.getString(3))).toSeq
    assert(got === expect)
  }

  test("q_bpe_pairs rank 1 is the trainer's first argmax") {
    val first = Registry.queries("q_bpe_pairs")(spark, sfDir)
      .orderBy("rn").limit(1).collect()(0)
    val want = refTrain(refWordFreq, 1).head
    assert((first.getString(1), first.getString(2), first.getLong(3)) ===
      ((want._1, want._2, want._4)))
  }
}
