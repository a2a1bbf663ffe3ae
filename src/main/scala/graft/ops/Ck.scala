package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.SparkContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Tracked `localCheckpoint` discipline for the query surface.
  *
  * Round-10 left ~60 untracked `localCheckpoint()` call sites across the
  * query files with almost no `unpersist`: every graph/LLM query parked
  * its materialized intermediates in the block manager until JVM GC +
  * ContextCleaner happened to collect them, and across a 241-query bench
  * session the accumulated storage/heap pressure showed up as a
  * broad-based slowdown concentrated in checkpoint-heavy graph queries
  * and the GC-sensitive ALS fit (the r10 +27% driver-bench regression).
  *
  * The fix is engine-side, not bench-side: every per-query checkpoint
  * goes through [[Ck.apply]] (or the `.ckpt()` extension), which records
  * the backing RDD id, and the runner (Bench / Verify) calls
  * [[Ck.drain]] after CONSUMING each query's result. Intermediates a
  * query can already prove dead mid-flight (a superseded loop round) are
  * freed immediately with [[Ck.free]]. Checkpoints that must survive
  * across queries — the session-cached dup-closure fixture — register
  * through [[Ck.pin]] instead and are exempt from both [[Ck.drain]] and
  * the stronger [[Ck.sweep]] (which also evicts third-party leftovers
  * such as MLlib's cached factor RDDs between bench queries).
  *
  * Safety: draining only ever runs AFTER the query's result has been
  * counted/written, so freeing a lineage-truncated local checkpoint can
  * never lose data a later computation needs; pinned blocks are the one
  * cross-query exception and are never touched.
  */
object Ck {

  private def newSet() = ConcurrentHashMap.newKeySet[Int]()
  private val tracked = new ConcurrentHashMap[SparkContext, java.util.Set[Int]]()
  private val pinned = new ConcurrentHashMap[SparkContext, java.util.Set[Int]]()

  /** The checkpoint-backing RDD ids of a `localCheckpoint`-returned
    * DataFrame (its analyzed plan is exactly one [[LogicalRDD]] leaf).
    */
  private def rddIds(df: DataFrame): Seq[Int] =
    df.queryExecution.logical.collect { case l: LogicalRDD => l.rdd.id }.toSeq

  /** `df.localCheckpoint()` + track the blocks for [[drain]]. */
  def apply(df: DataFrame): DataFrame = apply(df, eager = true)

  /** Tracked checkpoint, optionally lazy (`eager = false` marks for
    * checkpointing without running a job — loop rounds that materialize
    * only when the final plan executes).
    */
  def apply(df: DataFrame, eager: Boolean): DataFrame = {
    val out = df.localCheckpoint(eager)
    val set = tracked.computeIfAbsent(df.sparkSession.sparkContext, _ => newSet())
    rddIds(out).foreach(set.add)
    out
  }

  /** Cross-query checkpoint: materialized once per session, exempt from
    * [[drain]] and [[sweep]] (the caller's cache owns its lifetime).
    */
  def pin(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint()
    val set = pinned.computeIfAbsent(df.sparkSession.sparkContext, _ => newSet())
    rddIds(out).foreach(set.add)
    out
  }

  /** Immediately release a [[Ck.apply]]-checkpointed DataFrame's blocks —
    * for loop rounds the caller can prove superseded (the next round is
    * already materialized and nothing downstream reads this one).
    */
  def free(df: DataFrame): Unit = {
    val sc = df.sparkSession.sparkContext
    val live = sc.getPersistentRDDs
    val set = tracked.get(sc)
    rddIds(df).foreach { id =>
      live.get(id).foreach(_.unpersist(blocking = false))
      if (set != null) set.remove(id)
    }
  }

  /** Unpersist every tracked (non-pinned) checkpoint of this session.
    * Call after consuming a query's result. Returns the number freed.
    *
    * Concurrency contract: drain assumes queries run SEQUENTIALLY in
    * the session (the Bench/Verify shape) — it frees every tracked
    * block, including those of a query another thread still has
    * mid-flight. A session running queries concurrently must drain
    * only at quiesce points (or [[free]] per-query frames it owns).
    */
  def drain(spark: SparkSession): Int = {
    val sc = spark.sparkContext
    val set = tracked.get(sc)
    if (set == null) 0
    else {
      val live = sc.getPersistentRDDs
      var n = 0
      set.forEach { id =>
        live.get(id).foreach { r => r.unpersist(blocking = false); n += 1 }
      }
      set.clear()
      n
    }
  }

  /** Stronger between-queries hygiene: unpersist EVERY persistent RDD of
    * the session except pinned ones — catches blocks the query surface
    * does not own (MLlib fits leave cached factor/intermediate RDDs
    * behind). Only safe between queries: nothing mid-flight may depend
    * on an evicted block that cannot be recomputed, and the only
    * non-recomputable persistent RDDs we create (local checkpoints) are
    * per-query by construction unless pinned. Returns the number swept.
    */
  def sweep(spark: SparkSession): Int = {
    val sc = spark.sparkContext
    val keep = Option(pinned.get(sc)).getOrElse(java.util.Set.of[Int]())
    val set = tracked.get(sc)
    var n = 0
    sc.getPersistentRDDs.foreach { case (id, r) =>
      if (!keep.contains(id)) {
        r.unpersist(blocking = false)
        if (set != null) set.remove(id)
        n += 1
      }
    }
    n
  }

  /** Postfix form so call sites read like the `.localCheckpoint()` they
    * replace: `df.ckpt()` tracks, `df.ckpt(eager = false)` tracks lazily.
    */
  implicit class CkOps(private val df: DataFrame) extends AnyVal {
    def ckpt(): DataFrame = Ck(df)
    def ckpt(eager: Boolean): DataFrame = Ck(df, eager)
  }
}
