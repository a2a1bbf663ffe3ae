package graft.llm

import scala.collection.mutable.ArrayBuffer

import graft.ops.Ck
import graft.ops.Ck.CkOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding trainer — the tokenizer-construction
  * step of an LLM data pipeline (Sennrich et al. 2016's algorithm,
  * re-expressed as Spark aggregates; the reference tokenizes with a fixed
  * whitespace split, reference: src/spark/training.py:259-266 — BPE is
  * the scale-path generalization a training corpus needs).
  *
  * Algorithm: collapse the corpus to a (word, freq) vocabulary ONCE, then
  * iterate: count adjacent symbol pairs weighted by word frequency, take
  * the most frequent pair (ties: lexicographic (l, r) — deterministic),
  * merge its occurrences left-to-right in every word. The merge table, in
  * order, IS the tokenizer.
  *
  * Scale: the corpus scan happens once — training then touches only the
  * collapsed vocabulary (|distinct words|, orders of magnitude smaller
  * than the corpus, shuffled on the word key). Each iteration is one
  * map-side-combined pair count plus one narrow higher-order-function
  * rewrite of the symbol arrays (no shuffle); `localCheckpoint` truncates
  * the growing lineage each round, the same discipline MLlib's iterative
  * fits use. Driver state is ONE row per merge (the argmax pair) — a
  * bounded `limit(1).collect()` per iteration, ≤ numMerges rows total,
  * never data. Everything else is executor-side; no UDFs anywhere — the
  * merge rewrite is a codegen-planned fold over the symbol array.
  */
object Bpe {

  /** One learned merge: rank is 1-based application order. */
  final case class Merge(rank: Int, lhs: String, rhs: String, merged: String,
      pairFreq: Long)

  /** The corpus → (word, freq) collapse, on the engine's BPE-ish `[a-z]+`
    * token class (shared with q_token_count's `n_alpha` column).
    */
  def wordFreq(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(expr(s"regexp_extract_all($textCol, '[a-z]+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** (word, freq) → (syms, freq) with the initial character split.
    * ASCII-only by the `[a-z]+` token class, so `split(word, "")` (UTF-16
    * code units) and any per-character oracle agree.
    */
  def withSymbols(vocab: DataFrame): DataFrame =
    vocab.select(chars(col("word")).as("syms"), col("freq"))

  /** Character split guarding against `split`'s trailing empty match. */
  private def chars(word: Column): Column =
    filter(split(word, ""), x => x =!= lit(""))

  /** Adjacent-pair counts over the symbol arrays, weighted by word
    * frequency: one narrow explode + one map-side-combined sum. Words of
    * a single symbol contribute nothing (and `sequence(1, 0)` would step
    * DOWNWARD in Spark, so the size guard is load-bearing).
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.where(size(col("syms")) >= 2)
      .select(col("freq"),
        explode(transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(
            element_at(col("syms"), i).as("l"),
            element_at(col("syms"), i + 1).as("r")))).as("p"))
      .select(col("freq"), col("p.l").as("l"), col("p.r").as("r"))
      .groupBy("l", "r").agg(sum("freq").as("cnt"))

  /** Merge every left-to-right occurrence of (l, r) in each word's symbol
    * array — the standard greedy non-overlapping rule ("aaa" + (a,a) →
    * [aa, a]): a fold that appends each symbol unless the accumulator's
    * last element is `l` and the incoming one is `r`, in which case the
    * pair collapses to the merged symbol. Pure higher-order expression —
    * no UDF, no shuffle.
    */
  def applyMerge(vocab: DataFrame, l: String, r: String): DataFrame = {
    val folded = aggregate(
      col("syms"),
      typedLit(Seq.empty[String]),
      (acc: Column, x: Column) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))
    vocab.withColumn("syms", folded)
  }

  /** Train `numMerges` merges over `docs`. Stops early if the vocabulary
    * runs out of adjacent pairs. Returns the ordered merge table.
    */
  def train(docs: DataFrame, numMerges: Int, textCol: String = "text"): Seq[Merge] = {
    var vocab = withSymbols(wordFreq(docs, textCol)).ckpt()
    val merges = ArrayBuffer.empty[Merge]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      // bounded driver fetch: the single argmax row of this iteration.
      val top = pairCounts(vocab)
        .orderBy(desc("cnt"), asc("l"), asc("r")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(merges.size + 1, l, r, l + r, c)
        val next = applyMerge(vocab, l, r).ckpt()
        Ck.free(vocab)
        vocab = next
      }
    }
    Ck.free(vocab) // result is the driver-side merge table; last round's blocks are dead
    merges.toSeq
  }

  /** Batched trainer — the 100 TB fix for [[train]]'s one-driver-round-
    * trip-per-merge loop (a realistic 32k-merge vocabulary = 32k
    * sequential Spark jobs): each iteration fetches the top `fetchK`
    * pair counts ONCE and selects up to `batchK` merges from them under
    * a rule that makes the batch PROVABLY equal to running the
    * sequential trainer merge-for-merge:
    *
    *  - selected pairs are pairwise symbol-disjoint (no selected pair
    *    touches another's l, r, or merged string), so applying them in
    *    rank order is literally the sequential application and no
    *    selected pair's count moves before its turn;
    *  - a pair is selected only if its count is STRICTLY above the sum
    *    of the four largest counts among pairs that share a symbol with
    *    the batch (unfetched pairs enter that sum at the last fetched
    *    count — the horizon). Why four: batch merges never stack (a
    *    selected pair may not contain another's merged symbol), so any
    *    symbol at any point mid-batch is pre-batch or one merged
    *    symbol, and every occurrence of any pair (A, S) maps to the
    *    pre-batch pair at its span boundary — one of ≤ 4 candidates
    *    ((A|r_A), (S|l_S) with A, S each original-or-merged), each of
    *    which shares a symbol with the batch. A pair's count mid-batch
    *    therefore never exceeds that 4-term sum, so at each sequential
    *    step the next batch member still wins outright, ties included
    *    (strictness beats count ties; fetch order beats lexicographic
    *    ties).
    *
    * The first selection per iteration is the unconditional global
    * argmax, so progress is guaranteed; when the rule stops the batch
    * early the remaining merges land in later iterations. Driver state
    * stays ≤ `fetchK` rows per iteration; application is the same
    * chained fold (one localCheckpoint per BATCH, not per merge).
    * BpeSpec proves batched ≡ sequential merge-for-merge on the fixture
    * and that multi-merge batches genuinely occur there.
    */
  def trainBatched(docs: DataFrame, numMerges: Int,
      textCol: String = "text", batchK: Int = 16,
      fetchK: Int = 256): Seq[Merge] = {
    require(batchK >= 1 && fetchK >= batchK,
      s"need fetchK >= batchK >= 1, got ($fetchK, $batchK)")
    var vocab = withSymbols(wordFreq(docs, textCol)).ckpt()
    val merges = ArrayBuffer.empty[Merge]
    var exhausted = false
    var iterations = 0
    while (merges.size < numMerges && !exhausted) {
      iterations += 1
      val fetched = pairCounts(vocab)
        .orderBy(desc("cnt"), asc("l"), asc("r")).limit(fetchK).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (fetched.isEmpty) exhausted = true
      else {
        val horizon =
          if (fetched.length < fetchK) 0L else fetched.last._3
        val selected = ArrayBuffer.empty[(String, String, Long)]
        var symbols = Set.empty[String]
        // counts of fetched pairs sharing a symbol with the batch
        // (duplicates only tighten the sum); unfetched sharing pairs
        // are represented by four horizon entries
        val caps = ArrayBuffer.fill(4)(horizon)
        def cap4 = caps.sorted(Ordering[Long].reverse).take(4).sum
        var i = 0
        var stopped = false
        while (i < fetched.length && !stopped &&
            selected.size < batchK &&
            merges.size + selected.size < numMerges) {
          val (l, r, c) = fetched(i)
          val conflicts = symbols(l) || symbols(r) || symbols(l + r)
          if (conflicts) caps += c
          else if (selected.isEmpty || c > cap4) {
            // sharing pairs BELOW this row in the fetch also cap later
            // creations — fold those still ahead into the caps before
            // committing to the next member
            val newSyms = Set(l, r, l + r)
            fetched.iterator.drop(i + 1).foreach { case (l2, r2, c2) =>
              if (newSyms(l2) || newSyms(r2) || newSyms(l2 + r2))
                caps += c2
            }
            selected += ((l, r, c))
            symbols ++= newSyms
          } else stopped = true
          i += 1
        }
        selected.foreach { case (l, r, c) =>
          merges += Merge(merges.size + 1, l, r, l + r, c)
        }
        val next = selected.foldLeft(vocab) { case (v, (l, r, _)) =>
          applyMerge(v, l, r)
        }.ckpt()
        Ck.free(vocab)
        vocab = next
      }
    }
    lastBatchedIterations = iterations
    Ck.free(vocab) // driver-side result; last round's blocks are dead
    merges.toSeq
  }

  /** Driver round-trips (fetch iterations) of the most recent
    * [[trainBatched]] run — spec instrumentation: iterations strictly
    * below the merge count proves the batch rule fired for real.
    */
  @volatile var lastBatchedIterations: Int = 0

  /** Apply a trained merge table to a (word) column: the encoder. Chains
    * one fold per merge in rank order — plan depth ∝ |merges|, row work
    * ∝ word length, still UDF-free.
    */
  def encode(words: DataFrame, merges: Seq[Merge], wordCol: String = "word"): DataFrame =
    merges.foldLeft(
      words.withColumn("syms", chars(col(wordCol)))) { (df, m) =>
      applyMerge(df, m.lhs, m.rhs)
    }
}
