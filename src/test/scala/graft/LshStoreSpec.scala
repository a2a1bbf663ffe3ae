package graft

import org.apache.spark.sql.functions._
import graft.queries.LlmQueries
import graft.sources.LshStore
import graft.tables.Tables

/** Gates for the persisted MinHash-LSH bucket index: incremental
  * build+probe must equal a from-scratch batch rebuild (same bucket
  * construction by code sharing, proven by set equality), blind append
  * must be replay-invariant, compaction answer-invisible, and exact
  * planted copies must always be discovered (identical shingle sets ⇒
  * identical signatures ⇒ all three bands collide).
  */
class LshStoreSpec extends SparkSpec {

  private val path =
    s"${System.getProperty("java.io.tmpdir")}/graft-lsh-store-test"

  private def docs = Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text"))

  private def candSet() =
    LshStore.candidates(spark, delta, path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val standing = docs.filter(col("doc_id") < 300)
  private lazy val delta = docs
    .filter(col("doc_id") >= 300 && col("doc_id") < 400)
    .unionByName(docs.filter(col("doc_id") < 15)
      .withColumn("doc_id", col("doc_id") + lit(20000L)))

  test("probe against the standing index finds every planted copy and equals a batch rebuild") {
    if (new java.io.File(path).exists()) deleteRecursively(path)
    LshStore.build(standing, path)
    val cand = candSet()
    // Exact copies of standing docs MUST be discovered — identical
    // signatures collide in all three bands, no probabilistic slack.
    (0L until 15L).foreach(i =>
      assert(cand.contains((i, i + 20000L)), s"planted copy of $i missed"))
    // Incremental probe ≡ batch: band-join the UNION from scratch and keep
    // the cross (standing, delta) pairs — same bucket construction, so the
    // candidate sets must be identical, not just similar.
    val bands = LlmQueries.bandRows(
      LlmQueries.shingleDocs(standing.unionByName(delta)).localCheckpoint())
    val batch = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .filter(col("doc_a") < 300 && col("doc_b") >= 300)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand === batch)
  }

  test("blind append is replay-invariant and extends discovery to the appended delta") {
    LshStore.append(delta, path)
    val once = candSet()
    LshStore.append(delta, path) // at-least-once redelivery
    assert(candSet() === once, "replayed append changed a probe's answer")
    // A second crawl that copies a DELTA doc must now hit the index — the
    // standing corpus was never rescanned to make that true.
    val probe2 = docs.filter(col("doc_id") === 350)
      .withColumn("doc_id", col("doc_id") + lit(30000L))
    val c2 = LshStore.candidates(spark, probe2, path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(c2.contains((350L, 30350L)))
  }

  test("compaction changes bytes, never answers") {
    val before = candSet()
    LshStore.compact(spark, path)
    assert(candSet() === before)
    deleteRecursively(path)
  }

  test("streamed index ingest equals one batch build") {
    import org.apache.spark.sql.Encoder
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val livePath = path + "-live"
    val batchPath = path + "-batch"
    Seq(livePath, batchPath).foreach(p =>
      if (new java.io.File(p).exists()) deleteRecursively(p))
    val corpus = standing.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val ms = MemoryStream[(Long, String)](
      implicitly[Encoder[(Long, String)]], spark.sqlContext)
    val q = LshStore.appendStream(ms.toDF().toDF("doc_id", "text"), livePath,
      "file://" + java.nio.file.Files.createTempDirectory("graft-lsh-ckpt"))
    try {
      val (a, b) = corpus.splitAt(corpus.size / 2)
      ms.addData(a); q.processAllAvailable()
      ms.addData(b); q.processAllAvailable()
    } finally q.stop()
    LshStore.build(standing, batchPath)
    def probeAll(p: String) =
      LshStore.candidates(spark, delta, p).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probeAll(livePath) === probeAll(batchPath),
      "a streamed index must answer every probe like the batch build")
    Seq(livePath, batchPath).foreach(deleteRecursively)
  }
}
