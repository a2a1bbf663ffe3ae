package graft.sources

import java.util.concurrent.ConcurrentHashMap

/** Shared build-once machinery for the session-scoped standing layouts
  * ([[GraphStateStore]], [[PostingsStore]], [[IvfStore]], the
  * warehouse time-travel fixture): one cache keyed by the caller's
  * (session, dataset, …) tuple, one JVM shutdown hook that removes
  * every temp root the builders created. At 100 TB these layouts are
  * real object-store prefixes written by nightly jobs; locally the
  * cache stands in for "the table already exists" and the hook keeps
  * tripled bench runs and Verify sessions from leaking store copies
  * (the r9 ADVICE lesson, factored out instead of re-fixed per store).
  */
object LayoutCache {

  private val roots = ConcurrentHashMap.newKeySet[java.io.File]()
  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    roots.forEach { f =>
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(f)
    }))

  /** Collision-free tag for session-catalog table names and layout
    * directories: the FULL dataset path, sanitized — not its hashCode,
    * which two distinct paths can share — plus the owning session's
    * identity, so a second session (tests + bench in one JVM) never
    * DROPs or overwrites a table/dir an earlier session's cached
    * standing handle still lazily reads (r10 ADVICE).
    */
  def tag(s: org.apache.spark.sql.SparkSession, sfDir: String): String =
    sfDir.replaceAll("[^A-Za-z0-9]", "_") + "_s" +
      java.lang.Integer.toHexString(System.identityHashCode(s))

  /** Compute-once lookup in the caller's own cache map. */
  def getOrBuild[K, V](cache: ConcurrentHashMap[K, V], key: K)(
      build: => V): V =
    cache.computeIfAbsent(key, _ => build)

  /** A fresh temp directory registered for shutdown cleanup. */
  def tempRoot(prefix: String): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toFile
    roots.add(dir)
    dir
  }
}
