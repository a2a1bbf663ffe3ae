package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.ml.util.MLWritable

/** S12/S13 — versioned ML-model registry.
  *
  * The reference persists pickled models under timestamped version names,
  * points a `best_model` symlink at the winner, stores a metadata JSON per
  * version, and garbage-collects all but the latest five (reference:
  * src/training_service.py:31-117,276-303). The engine twin wraps MLlib's
  * native `save`/`load` (reference Spark path: src/spark/training.py:399,
  * 495-496): each `publish` writes
  *
  *   `<root>/<name>/v<seq>%06d/model/`   — MLlib writer output (parquet+json)
  *   `<root>/<name>/v<seq>%06d/metadata.json` — caller-supplied metrics
  *   `<root>/<name>/BEST`                — version id of the current best
  *
  * Versions are monotonically sequenced (not wall-clock) so tests and
  * replays are deterministic; `keepLast` prunes old versions after each
  * publish. A "symlink" is a one-line pointer file — portable to object
  * stores (s3a://) where symlinks don't exist.
  *
  * All IO goes through `org.apache.hadoop.fs.FileSystem` resolved from the
  * root URI — the same abstraction MLlib's own writers use — so the registry
  * addresses `file://`, `hdfs://`, and `s3a://` roots identically (S11). On
  * object stores the pointer-file rewrite relies on put-overwrite, which S3
  * provides atomically per key.
  */
final class ModelRegistry(root: String, keepLast: Int = 5,
    conf: Configuration = new Configuration()) {

  private val rootPath = new Path(root)
  private val fs: FileSystem = rootPath.getFileSystem(conf)

  private def nameDir(name: String): Path = new Path(rootPath, name)

  private def readString(p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private def writeString(p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8"))
    finally out.close()
  }

  private def versions(name: String): Seq[String] = {
    val d = nameDir(name)
    if (!fs.exists(d) || !fs.getFileStatus(d).isDirectory) Seq.empty
    else fs.listStatus(d).toSeq
      .map(_.getPath.getName).filter(_.startsWith("v")).sorted
  }

  /** Latest version id for `name`, if any published. */
  def latest(name: String): Option[String] = versions(name).lastOption

  /** The version id the BEST pointer references, if set. */
  def best(name: String): Option[String] = {
    val p = new Path(nameDir(name), "BEST")
    if (fs.exists(p)) Some(readString(p).trim) else None
  }

  /** Path to a version's MLlib model dir (pass to `XxxModel.load`). */
  def modelPath(name: String, version: String): String =
    new Path(new Path(nameDir(name), version), "model").toString

  def metadata(name: String, version: String): String =
    readString(new Path(new Path(nameDir(name), version), "metadata.json"))

  /** Publish a new version: MLlib save + metadata, advance BEST when
    * `markBest`, prune to `keepLast`. Returns the new version id.
    */
  def publish(name: String, model: MLWritable, metadataJson: String,
      markBest: Boolean = true): String = {
    val seq = versions(name).lastOption
      .map(v => v.stripPrefix("v").toInt + 1).getOrElse(0)
    val version = f"v$seq%06d"
    val vdir = new Path(nameDir(name), version)
    fs.mkdirs(vdir)
    model.write.overwrite().save(new Path(vdir, "model").toString)
    writeString(new Path(vdir, "metadata.json"), metadataJson)
    if (markBest) writeString(new Path(nameDir(name), "BEST"), version)
    gc(name)
    version
  }

  /** Keep-last-N pruning; never prunes the BEST version. */
  private def gc(name: String): Unit = {
    val vs = versions(name)
    val keep = (vs.takeRight(keepLast) ++ best(name)).toSet
    vs.filterNot(keep).foreach { v =>
      fs.delete(new Path(nameDir(name), v), true)
    }
  }
}
