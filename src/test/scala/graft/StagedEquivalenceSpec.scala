package graft

import org.apache.spark.sql.functions._
import graft.sources.IvfStore
import graft.tables.Tables

/** Gates for the r16 optimization round's staging equivalences: each
  * session-pinned artifact must EQUAL the per-sample derivation it
  * replaced — the optimization moved work out of the timed samples, and
  * these pins prove it moved nothing else. (The DuckDB oracle gates the
  * end-to-end results; these gates localize a future drift to the
  * staged definition itself.)
  */
class StagedEquivalenceSpec extends SparkSpec {

  test("ivfPairPr filtered to pr <= n equals the per-probe route join it replaced") {
    // The old ivfRouteCands shape: rank the codebook per query, keep the
    // n nearest lists, read their members off the trained layout.
    val st = IvfStore.trainedDet(spark, sfDir,
      IvfStore.DetK, IvfStore.DetIters, 1)
    val pairPr = graft.queries.ScaleQueries.ivfPairPr(spark, sfDir)
    for (n <- Seq(1, IvfStore.ComposedNProbe, IvfStore.DetK)) {
      val probes = graft.queries.ScaleQueries.ivfProbeRank(spark, sfDir, st)
        .filter(col("pr") <= n)
        .select("q_id", "bucket")
      val expect = st.lists.select("vec_id", "bucket")
        .join(broadcast(probes), Seq("bucket"))
        .filter(col("vec_id") =!= col("q_id"))
        .select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val got = pairPr.filter(col("pr") <= n)
        .select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got === expect, s"routing diverged at nprobe=$n")
      assert(got.nonEmpty, s"vacuous routing gate at nprobe=$n")
    }
  }

  test("exactTruth pin equals top5Exact over exactPairs, and exactPairs covers NQueries x (|V|-1)") {
    val x = IvfStore.exactPairs(spark, sfDir)
    val nV = Tables.embeddings(spark, sfDir).count()
    assert(x.count() === IvfStore.NQueries * (nV - 1))
    val expect = IvfStore.top5Exact(x).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val got = IvfStore.exactTruth(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === expect)
    assert(got.size === IvfStore.NQueries * 5)
  }

  test("the staged tf index reproduces the explode-derived df and tf_total exactly") {
    // ml_tfidf_counts' rewrite rests on two identities over the pinned
    // (doc_id, word, tf) index: rows-per-word == countDistinct(doc_id)
    // and sum(tf) == count(*) of the raw explode. Recompute the explode
    // here and compare word by word.
    val tf = graft.queries.MLQueries.tfidfTf(spark, sfDir)
    val got = tf.groupBy("word")
      .agg(count(lit(1)).as("df"), sum("tf").as("tf_total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val stops = lit(org.apache.spark.ml.feature.StopWordsRemover
      .loadDefaultStopWords("english"))
    val words = filter(split(lower(col("text")), "[ \\t\\n\\x0B\\f\\r]+"),
      w => length(w) >= 1 && !array_contains(stops, w))
    val expect = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(words).as("word"))
      .groupBy("word")
      .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("tf_total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("the split manifest's fold/tb/b equal fresh md5 assignments over the ratings") {
    val keyStr = concat(col("user_id").cast("string"), lit("_"),
      col("item_id").cast("string"))
    val expect = graft.queries.MLQueries.mfRatings(spark, sfDir)
      .select(col("user_id"), col("item_id"),
        pmod(graft.ops.Hashing.md5Long(keyStr), lit(5L)).as("fold"),
        pmod(graft.ops.Hashing.md5Long(concat(keyStr, lit("lt"))),
          lit(10L)).as("tb"),
        pmod(graft.ops.Hashing.md5Long(concat(keyStr, lit("lb"))),
          lit(10L)).as("b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sorted.toSeq
    val got = graft.queries.MLQueries.mfSplits(spark, sfDir)
      .select("user_id", "item_id", "fold", "tb", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sorted.toSeq
    assert(got === expect)
    // every fold/bucket must be populated or the manifest is vacuous
    assert(got.map(_._3).distinct.length === 5)
    assert(got.map(_._4).distinct.length === 10)
  }

  test("the probe-rated pin is exactly the probe users' slice of the ratings") {
    val ratings = graft.queries.MLQueries.mfRatings(spark, sfDir)
    val expect = ratings.select("user_id", "item_id")
      .filter(pmod(col("user_id"), lit(200L)) === 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val got = graft.queries.MLQueries.mfProbeRated(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === expect)
    assert(got.nonEmpty, "no probe users on the fixture — gate vacuous")
  }
}
