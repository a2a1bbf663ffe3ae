package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Ck.CkOps
import graft.ops.Hashing
import graft.queries.LlmQueries
import graft.sources.Export

/** The curation pipeline as ONE callable — the engine's operators
  * composed end-to-end into the artifact a training run actually
  * consumes: raw documents in, deduplicated / quality-gated /
  * decontaminated shards + manifest out, with a per-stage accounting
  * frame (the executable form of the ◆ `q_curate_funnel` report —
  * that query COUNTS the funnel, this one SHIPS it).
  *
  * Stages, each an existing engine discipline:
  *  1. exact dedup — md5 content fingerprint, min-doc_id canonical
  *     (◆ `q_dedup_exact`);
  *  2. quality gate — char-length band + minimum word count
  *     (◆ `q_quality_score`'s cheap row-local screens);
  *  3. near-dup dedup — blocked exact-Jaccard discovery → connected
  *     components → keep each component's canonical
  *     ([[LlmQueries.dupComponents]], the ◆ `q_dedup_pipeline` path;
  *     at 100 TB swap the discovery leg for the LSH index per its
  *     scaladoc — the closure and survivorship stay identical);
  *  4. decontamination — any shared hashed 8-gram with the EVAL corpus
  *     drops the document (◆ `q_contam_ngram`'s n-gram rule; eval-side
  *     grams are the broadcast side — eval sets are small by nature);
  *  5. sharded export — content-hashed shard assignment, one directory
  *     per shard, manifest audited from the WRITTEN files
  *     ([[Export.writeSharded]] / [[Export.manifest]]).
  *
  * Determinism: every gate is a pure function of content (md5 hashes,
  * exact counts), so two runs over the same corpus ship byte-identical
  * shard assignments — the property that makes a training run
  * reproducible from the manifest alone. The per-stage counts are the
  * driver-side scalars of one action per stage (bounded; the data never
  * collects).
  */
object CorpusPipeline {

  /** @param docs      corpus (doc_id, text, lang, n_chars …)
    * @param evalDocs  held-out eval corpus to decontaminate against
    * @param outDir    shard export root (overwritten)
    * @return (per-stage counts, written-file manifest)
    */
  def run(docs: DataFrame, evalDocs: DataFrame, outDir: String,
      shards: Int = 8, jaccard: Double = 0.5,
      minChars: Long = 40L, maxChars: Long = 100000L,
      minWords: Int = 5): (DataFrame, DataFrame) = {
    require(shards > 0, s"shards must be positive, got $shards")
    require(minChars <= maxChars,
      s"empty quality band: [$minChars, $maxChars]")
    val spark = docs.sparkSession
    import spark.implicits._

    // 1. exact dedup: canonical = min doc_id per content fingerprint
    val withFp = docs.withColumn("__fp", md5(col("text")))
    val canon = withFp.groupBy("__fp").agg(min("doc_id").as("doc_id"))
    val exact = withFp
      .join(canon, Seq("__fp", "doc_id"), "left_semi").drop("__fp")

    // 2. quality gate: row-local screens only — no shuffle
    val quality = exact.filter(
      col("n_chars").between(minChars, maxChars) &&
        size(split(col("text"), " ")) >= minWords)

    // 3. near-dup components; drop every non-canonical member
    val comp = LlmQueries.dupComponents(quality, Seq("lang"), jaccard)
    val dupDrop = comp.filter(col("doc_id") =!= col("component"))
      .select("doc_id")
    val deduped = quality.join(dupDrop, Seq("doc_id"), "left_anti")
      .ckpt()

    // 4. decontamination: hashed 8-gram overlap with the eval corpus.
    // The < 8-word guard is load-bearing: sequence(1, size-7) on a
    // shorter doc is sequence(1, 0), which steps DOWNWARD to [1, 0],
    // and slice(__ws, 0, 8) throws (array indices start at 1). The
    // quality gate admits 5–7-word docs and evalDocs are ungated, so
    // without the filter realistic corpora crash the pipeline here —
    // a doc with < 8 words HAS no 8-gram, so dropping it from the
    // gram table (not the corpus) is the exact semantics.
    def grams(df: DataFrame): DataFrame = df
      .select(col("doc_id"), split(col("text"), " ").as("__ws"))
      .filter(size(col("__ws")) >= 8)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(__ws) - 7)," +
          " i -> concat_ws(' ', slice(__ws, i, 8)))")).as("__g"))
      .select(col("doc_id"), Hashing.md5Long60(col("__g")).as("g"))
    val evalGrams = grams(evalDocs).select("g").distinct()
    val contaminated = grams(deduped)
      .join(broadcast(evalGrams), Seq("g"), "left_semi")
      .select("doc_id").distinct()
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
      .ckpt()

    // 5. content-hashed shard assignment + audited export
    val sharded = clean.withColumn("shard",
      pmod(Hashing.md5Long(col("doc_id").cast("string")), lit(shards)))
    Export.writeSharded(sharded, "shard", outDir)
    val manifest = Export.manifest(spark, outDir, "shard")

    val stages = Seq(
      "00_ingest" -> docs.count(),
      "10_exact_dedup" -> exact.count(),
      "20_quality" -> quality.count(),
      "30_near_dedup" -> deduped.count(),
      "40_decontaminated" -> clean.count())
      .toDF("stage", "n_docs")
    (stages, manifest)
  }
}
