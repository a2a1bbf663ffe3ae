package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-corpus export — the last mile after curation: the shard
  * assignment `q_shard_assign` computes becomes a physical partition-dir
  * layout a dataloader fleet can consume, plus the manifest that makes
  * the export auditable without re-reading it.
  *
  * Layout contract: `partitionBy(shardCol)` writes `shard=N/` directories,
  * so a reader training on shard N opens exactly one directory (partition
  * pruning, zero planning over the other shards) and the shard→worker map
  * is static across epochs because the assignment is content-hashed.
  * One file per shard directory (`repartition(shardCol)` first) keeps the
  * file count equal to the shard count instead of shards × tasks — at
  * 100 TB with 1024 shards that is 1024 files, not 1024 × 10k task files
  * choking the namenode; raise `filesPerShard` when single files would
  * exceed block-friendly sizes.
  *
  * The manifest is computed from the written FILES (FileSystem listing +
  * one count aggregate over the parquet footers' row groups), not from
  * the input frame — it audits what landed, not what was intended.
  */
object Export {

  def writeSharded(df: DataFrame, shardCol: String, path: String,
      filesPerShard: Int = 1): Unit = {
    // Distribution keys, not partition count: repartition(n, shardCol)
    // would hash every row of a shard into ONE task (and n=1 funnels the
    // whole dataset through a single task), so a shard can never split.
    // Hashing on (shard, row-hash salt) caps each shard at filesPerShard
    // files while keeping write parallelism at the shuffle default.
    val salt =
      if (filesPerShard <= 1) Nil
      else Seq(pmod(hash(df.columns.map(col).toIndexedSeq: _*),
        lit(filesPerShard)))
    df.repartition((col(shardCol) +: salt).toIndexedSeq: _*)
      .write.mode("overwrite").partitionBy(shardCol).parquet(path)
  }

  /** Continuous ingestion into the SAME sharded layout: each micro-batch
    * appends its rows under the shard directories, so the training-shard
    * table grows in place while readers keep their static shard→worker
    * map. Delivery is AT-LEAST-ONCE: the checkpoint prevents reprocessing
    * on clean restarts, but a crash between the parquet append and the
    * commit-log write replays the batch and a blind append would land it
    * twice — for exactly-once use [[appendShardedStreamExactlyOnce]].
    * Returns the DataStreamWriter so the caller owns trigger/checkpoint.
    */
  def appendShardedStream(stream: DataFrame, shardCol: String,
      path: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      batch.write.mode("append").partitionBy(shardCol).parquet(path)
    }

  /** EXACTLY-ONCE sharded streaming append — the idempotent layer
    * [[appendShardedStream]]'s scaladoc promises: every physical file a
    * micro-batch lands is keyed by its batchId, so a REPLAYED batch (crash
    * between the parquet write and the checkpoint commit, at-least-once
    * redelivery) replaces its own files instead of duplicating them.
    *
    * Protocol per batch `b`:
    *   1. write the batch to `_staging/b<b>/` (`overwrite` — a replay
    *      first discards any partial staging from the crashed attempt;
    *      the `_` prefix hides it from Spark/DuckDB/manifest readers),
    *   2. sweep every `b<b>-*.parquet` under the shard directories —
    *      files a crashed attempt of THIS batch already moved
    *      (different batches never collide),
    *   3. rename staged files to `shard=K/b<b>-<i>.parquet`.
    * Renames are per-file metadata ops; a crash inside step 3 is healed by
    * the next replay's steps 1-2. The final state after any number of
    * replays is byte-identical to one clean delivery, which is the
    * exactly-once contract (same idea as a commit-manifest table format,
    * with the file NAME carrying the transaction id). Same layout contract
    * as [[writeSharded]].
    *
    * `orderWithin`: optionally sort each landed file by these columns —
    * streamed shards then carry tight parquet row-group min/max on the
    * sort key, the same skippability [[Layout]]'s batch writes get from
    * the in-file curve sort. Like [[writeSharded]], `filesPerShard` > 1
    * salts the shard repartition — ordered or not — so a hot shard
    * splits across tasks instead of funneling one micro-batch's largest
    * shard through a single task (each file is still internally sorted
    * when ordering is requested — same-shard rows within one task land
    * in one file). The defaults (no ordering, one file per shard) keep
    * the upstream partitioning untouched.
    */
  def appendShardedStreamExactlyOnce(stream: DataFrame, shardCol: String,
      path: String, orderWithin: Seq[String] = Nil,
      filesPerShard: Int = 1): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val root = new Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val staging = new Path(root, s"_staging/b$batchId")
      prepare(batch, shardCol, orderWithin, filesPerShard)
        .write.mode("overwrite").partitionBy(shardCol)
        .parquet(staging.toString)
      def glob(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
        Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
      glob(new Path(root, s"$shardCol=*/b$batchId-*.parquet"))
        .foreach(st => fs.delete(st.getPath, false))
      glob(new Path(staging, s"$shardCol=*/*.parquet"))
        .sortBy(_.getPath.toString).zipWithIndex.foreach { case (st, i) =>
          val shardDir = new Path(root, st.getPath.getParent.getName)
          fs.mkdirs(shardDir)
          require(fs.rename(st.getPath,
            new Path(shardDir, s"b$batchId-$i.parquet")),
            s"rename failed for ${st.getPath} (batch $batchId)")
        }
      fs.delete(staging, true)
      ()
    }

  /** Micro-batch physical preparation for the exactly-once append — the
    * shard/salt/sort shape, extracted so its PLAN is spec-pinnable. The
    * hot-shard salt applies whenever `filesPerShard` asks for a split,
    * ordered or not — dropping it only in the unordered path would
    * silently funnel each shard through one task (ADVICE r8). Like
    * [[writeSharded]], `filesPerShard` is a CAP on files per shard per
    * batch: the salted keys spread across the shuffle's partitions, so
    * the split's effectiveness rises with `spark.sql.shuffle.partitions`
    * (at the test's 4 partitions some (shard, salt) pairs share a task;
    * at a production 200+ they essentially never do).
    */
  private[graft] def prepare(batch: DataFrame, shardCol: String,
      orderWithin: Seq[String], filesPerShard: Int): DataFrame = {
    val salt =
      if (filesPerShard <= 1) Nil
      else Seq(pmod(hash(batch.columns.map(col).toIndexedSeq: _*),
        lit(filesPerShard)))
    val split =
      if (salt.isEmpty && orderWithin.isEmpty) batch
      else batch.repartition((col(shardCol) +: salt).toIndexedSeq: _*)
    if (orderWithin.isEmpty) split
    else split.sortWithinPartitions((shardCol +: orderWithin).map(col): _*)
  }

  /** Per-shard manifest of a sharded export: files, bytes (from the
    * FileSystem, s3a-addressable like [[ModelRegistry]]), rows (zero data
    * columns projected — the count aggregate reads only parquet row-group
    * metadata per column chunk, not the shard payload columns).
    */
  def manifest(spark: SparkSession, path: String, shardCol: String): DataFrame = {
    import spark.implicits._
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // globStatus returns NULL (not an empty array) when nothing matches —
    // fail with the actual problem instead of an NPE deep in .toSeq.
    val statuses = Option(fs.globStatus(new Path(root, s"$shardCol=*/*.parquet")))
      .map(_.toSeq).getOrElse(Seq.empty)
    require(statuses.nonEmpty,
      s"no shard files under $path matching $shardCol=*/*.parquet — " +
        "nothing exported yet, or wrong shard column?")
    val files = statuses.map { st =>
        val shard = st.getPath.getParent.getName.stripPrefix(s"$shardCol=").toLong
        (shard, st.getLen)
      }
    val bytes = files.toDF("shard", "bytes")
      .groupBy("shard")
      .agg(count(lit(1)).as("n_files"), sum("bytes").as("bytes"))
    val rows = spark.read.parquet(path)
      .groupBy(col(shardCol).cast("long").as("shard"))
      .agg(count(lit(1)).as("rows"))
    bytes.join(rows, "shard").orderBy("shard")
  }
}
