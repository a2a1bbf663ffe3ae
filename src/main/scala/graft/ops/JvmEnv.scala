package graft.ops

/** JVM environment fingerprint for the bench artifact (r12 verdict #1:
  * a 43% driver-vs-builder total swing was adjudicated by forensics —
  * heap-dependent G1 pauses and a missing `--add-opens` silently
  * degrading MLlib's Kryo path — that the artifact itself should have
  * carried). Bench prints this into its JSON line and the spread-file
  * header so the NEXT gap is adjudicated by reading the artifact:
  *
  *  - `heapGB` — `Runtime.maxMemory`: the controlling variable of the
  *    measured r12 heap experiment (8 g sbt fork: 187–212 s; raw
  *    `java -Xmx100g`, same binaries: 334–385 s with a stochastic
  *    inflated-query set);
  *  - `opens` — whether every `--add-opens` package Spark's
  *    `JavaModuleOptions` requires is actually open to the unnamed
  *    module. Without `java.base/java.nio`, MLlib KMeans' Kryo
  *    instrumentation path throws and three ML queries silently run
  *    ~3× degraded — the r12 verdict's one weak mark. Closed packages
  *    escalate to a LOUD stderr warning at bench startup;
  *  - `gcSec` / `gcN` — GC-bean total pause time and collection count
  *    over the timed window (start/end delta), the direct signature of
  *    the ambient-pause inflation class.
  */
object JvmEnv {

  /** The packages Spark 4.x needs opened on JDK 17+ (mirrors
    * build.sbt's jdk17AddOpens = Spark's `JavaModuleOptions`).
    */
  val requiredOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")

  /** Packages from [[requiredOpens]] NOT open to this (unnamed) module
    * — empty on a correctly-launched JVM. `Module.isOpen(pkg, unnamed)`
    * sees exactly what Spark's reflective accesses will see.
    */
  def closedOpens: Seq[String] = {
    val here = getClass.getModule
    requiredOpens.filter { p =>
      val Array(mod, pkg) = p.split("/", 2)
      val m = ModuleLayer.boot().findModule(mod)
      m.isPresent && !m.get.isOpen(pkg, here)
    }
  }

  def heapMaxBytes: Long = Runtime.getRuntime.maxMemory()

  /** Cumulative CPU nanoseconds consumed by THIS process (all threads),
    * from the platform OS bean; -1 if the platform bean is unavailable.
    * The bench prints the timed-window delta as `cpuSec` beside the wall
    * total: a wall-clock inflation with FLAT cpuSec is external
    * descheduling (host noisy-neighbor, IO stall — r13 measured
    * same-code totals swinging 172–264 s across one evening), while
    * wall and cpu inflating TOGETHER is real extra work (GC pressure,
    * spills, a plan change). The one adjudication axis heap/opens/gc
    * could not cover.
    */
  def processCpuNanos: Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => -1L
    }

  /** (total GC pause millis, total collection count) across all beans. */
  def gcTotals: (Long, Long) = {
    var ms = 0L; var n = 0L
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .forEach { b =>
        if (b.getCollectionTime > 0) ms += b.getCollectionTime
        if (b.getCollectionCount > 0) n += b.getCollectionCount
      }
    (ms, n)
  }
}
