package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import scala.jdk.CollectionConverters._

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
  */
final class ModelRegistry(root: String, keepLast: Int = 5) {

  private def nameDir(name: String): Path = Paths.get(root, name)

  private def versions(name: String): Seq[String] = {
    val d = nameDir(name)
    if (!Files.isDirectory(d)) Seq.empty
    else Files.list(d).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("v")).toSeq.sorted
  }

  /** Latest version id for `name`, if any published. */
  def latest(name: String): Option[String] = versions(name).lastOption

  /** The version id the BEST pointer references, if set. */
  def best(name: String): Option[String] = {
    val p = nameDir(name).resolve("BEST")
    if (Files.exists(p)) Some(Files.readString(p).trim) else None
  }

  /** Path to a version's MLlib model dir (pass to `XxxModel.load`). */
  def modelPath(name: String, version: String): String =
    nameDir(name).resolve(version).resolve("model").toString

  def metadata(name: String, version: String): String =
    Files.readString(nameDir(name).resolve(version).resolve("metadata.json"))

  /** Publish a new version: MLlib save + metadata, advance BEST when
    * `markBest`, prune to `keepLast`. Returns the new version id.
    */
  def publish(name: String, model: MLWritable, metadataJson: String,
      markBest: Boolean = true): String = {
    val seq = versions(name).lastOption
      .map(v => v.stripPrefix("v").toInt + 1).getOrElse(0)
    val version = f"v$seq%06d"
    val vdir = nameDir(name).resolve(version)
    Files.createDirectories(vdir)
    model.write.overwrite().save(vdir.resolve("model").toString)
    Files.writeString(vdir.resolve("metadata.json"), metadataJson)
    if (markBest) Files.writeString(nameDir(name).resolve("BEST"), version)
    gc(name)
    version
  }

  /** Keep-last-N pruning; never prunes the BEST version. */
  private def gc(name: String): Unit = {
    val vs = versions(name)
    val keep = (vs.takeRight(keepLast) ++ best(name)).toSet
    vs.filterNot(keep).foreach { v =>
      val d = nameDir(name).resolve(v)
      Files.walk(d).sorted(Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.delete)
    }
  }
}
