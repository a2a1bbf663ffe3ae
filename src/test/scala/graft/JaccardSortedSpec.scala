package graft

import org.apache.spark.sql.functions._
import graft.functions.JaccardSorted
import graft.tables.Tables

/** [[graft.functions.JaccardSorted]] (custom codegen expression) must agree
  * exactly with the built-in `array_intersect`/`array_union` formulation it
  * replaced in the all-pairs dedup hot path — including on real corpus
  * pairs, empty arrays, and null propagation.
  */
class JaccardSortedSpec extends SparkSpec {

  test("merge-walk Jaccard equals the built-in intersect/union formulation") {
    val t = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        sort_array(array_distinct(split(col("text"), " "))).as("toks"))
    val a = t.select(col("doc_id").as("doc_a"), col("lang"), col("toks").as("ta"))
    val b = t.select(col("doc_id").as("doc_b"), col("lang"), col("toks").as("tb"))
    val pairs = a.join(b, Seq("lang")).filter(col("doc_a") < col("doc_b"))
      .withColumn("fast", JaccardSorted(col("ta"), col("tb")))
      .withColumn("ref",
        size(array_intersect(col("ta"), col("tb"))) /
          size(array_union(col("ta"), col("tb"))).cast("double"))
    assert(pairs.count() > 1000, "need a meaningful pair population")
    assert(pairs.filter(col("fast") =!= col("ref")).count() === 0,
      "codegen merge-walk must match built-ins bit-for-bit")
  }

  test("long-array variant matches the string variant on fingerprinted tokens") {
    import graft.ops.Hashing
    val t = Tables.documents(spark, sfDir).limit(100)
      .select(col("doc_id"),
        sort_array(array_distinct(split(col("text"), " "))).as("ts"),
        sort_array(array_distinct(
          transform(split(col("text"), " "), w => Hashing.md5Long60(w)))).as("tl"))
    val a = t.select(col("doc_id").as("da"), col("ts").as("tsa"), col("tl").as("tla"))
    val b = t.select(col("doc_id").as("db"), col("ts").as("tsb"), col("tl").as("tlb"))
    val pairs = a.crossJoin(b).filter(col("da") < col("db"))
      .select(
        JaccardSorted(col("tsa"), col("tsb")).as("js"),
        JaccardSorted(col("tla"), col("tlb")).as("jl"))
    assert(pairs.filter(col("js") =!= col("jl")).count() === 0,
      "primitive-long merge-walk must agree with the string merge-walk")
  }

  test("jaccard_sorted is SQL-callable via GraftExtensions") {
    val r = spark.sql(
      """SELECT jaccard_sorted(array('a','b','c'), array('b','c','d')) AS j"""
    ).collect().head.getDouble(0)
    assert(r === 0.5)
  }

  test("edge cases: empty arrays, disjoint, identical, null propagation") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array('a','b'), array('a','b')),
        |  (array('a','b'), array('c','d')),
        |  (CAST(array() AS array<string>), CAST(array() AS array<string>)),
        |  (CAST(array() AS array<string>), array('a')),
        |  (CAST(NULL AS array<string>), array('a'))
        |AS t(x, y)""".stripMargin)
      .select(JaccardSorted(col("x"), col("y")).as("j"))
    val out = df.collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(out(0) === 1.0)
    assert(out(1) === 0.0)
    assert(out(2) === 1.0, "both-empty defined as identical")
    assert(out(3) === 0.0)
    assert(out(4) === null, "null input propagates null")
  }

  test("jaccardPairs guard refuses blocks whose all-pairs space explodes") {
    import graft.queries.LlmQueries
    import graft.tables.Tables
    val docs = Tables.documents(spark, sfDir)
    // The sf0.001 lang blocks are tiny; with a cap below the largest block
    // the precondition must refuse rather than go quadratic.
    val e = intercept[IllegalArgumentException] {
      LlmQueries.jaccardPairs(docs, Seq("lang"), 0.5, maxBlockRows = 2L)
    }
    assert(e.getMessage.contains("jaccardVerify"),
      "guard message points to the LSH-candidates scale path")
    val unblocked = intercept[IllegalArgumentException] {
      LlmQueries.jaccardPairs(docs, Seq.empty, 0.5)
    }
    assert(unblocked.getMessage.contains("blocking key"))
  }

  test("dupComponents groups TRANSITIVE near-dups (chain without a direct pair)") {
    import spark.implicits._
    import graft.queries.LlmQueries
    // doc0~doc1 (jac .6) and doc1~doc2 (jac .6) but doc0~doc2 only .33:
    // the component must still merge all three; doc3 shares no pair.
    val docs = Seq(
      (0L, "en", "a b c d"),
      (1L, "en", "a b c e"),
      (2L, "en", "b c e f"),
      (3L, "en", "x y z w"))
      .toDF("doc_id", "lang", "text")
    val out = LlmQueries.dupComponents(docs, Seq("lang"), 0.5).collect()
    assert(out.map(_.getAs[Long]("doc_id")).sorted.toSeq === Seq(0L, 1L, 2L),
      "only docs with at least one near-dup edge appear")
    assert(out.forall(_.getAs[Long]("component") == 0L),
      "chain 0-1-2 collapses to the min-id component despite 0 and 2 not pairing")
    assert(out.forall(_.getAs[Long]("csize") == 3L))
  }

  test("scale composition: LSH discovery → exact verify → component closure") {
    // The documented 100 TB dedup pipeline end-to-end: q_minhash_dedup's
    // banded-LSH candidates (already exact-verified at shingle-Jaccard
    // ≥ 0.8) feed componentsFromPairs — sub-quadratic discovery, same
    // closure as the all-pairs oracle query. Every planted exact copy
    // (doc_id+10000 twins for id < 25) must land in its source's component.
    import graft.queries.LlmQueries
    val verified = SparkEntry.queries("q_minhash_dedup")(spark, sfDir)
    val comps = LlmQueries.componentsFromPairs(verified).collect()
    val byDoc = comps.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("component")).toMap
    (0L until 25L).foreach { id =>
      assert(byDoc.contains(id) && byDoc(id) == byDoc(id + 10000L),
        s"planted copy pair ($id, ${id + 10000L}) split across components")
    }
    assert(comps.forall(_.getAs[Long]("csize") >= 2L),
      "every doc in the closure output has at least one dup partner")
  }

  test("jaccardVerify on LSH-style candidates equals all-pairs exact scores") {
    import graft.queries.LlmQueries
    import graft.tables.Tables
    val docs = Tables.documents(spark, sfDir)
    val exact = LlmQueries.jaccardPairs(docs, Seq("lang"), 0.5)
    // feed the exact result's pair list back as "candidates": the verifier
    // must reproduce identical scores via its join-per-side plan
    val verified = LlmQueries.jaccardVerify(docs, exact.select("doc_a", "doc_b"))
      .orderBy("doc_a", "doc_b").collect()
    val expected = exact.orderBy("doc_a", "doc_b").collect()
    assert(verified.map(_.toString).toSeq === expected.map(_.toString).toSeq)
    assert(verified.nonEmpty, "sf0.001 corpus must yield at least one near-dup pair")
  }
}
