package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench/verify environment fingerprint must itself be trustworthy:
  * a probe that silently returns "ok" on a defective JVM would
  * re-create exactly the silent-degrade class it exists to catch.
  */
class JvmEnvSpec extends AnyFunSuite {

  test("opens probe reads clean under the test JVM's --add-opens set") {
    // build.sbt forks tests with the full jdk17AddOpens list, so a
    // non-empty result here means the probe (or the fork options) broke
    assert(graft.ops.JvmEnv.closedOpens.isEmpty,
      s"closed: ${graft.ops.JvmEnv.closedOpens}")
  }

  test("opens probe is not vacuously open: an un-opened package reads closed") {
    // jdk.internal.misc is never in the add-opens list — if the probe
    // said it was open, Module.isOpen would be being misread
    val here = getClass.getModule
    val base = ModuleLayer.boot().findModule("java.base")
    assert(base.isPresent && !base.get.isOpen("jdk.internal.misc", here))
  }

  test("gc totals are non-negative and monotone across a forced GC") {
    val (ms0, n0) = graft.ops.JvmEnv.gcTotals
    assert(ms0 >= 0 && n0 >= 0)
    System.gc()
    Thread.sleep(50)
    val (ms1, n1) = graft.ops.JvmEnv.gcTotals
    assert(ms1 >= ms0 && n1 >= n0)
  }

  test("heap max matches the runtime") {
    assert(graft.ops.JvmEnv.heapMaxBytes === Runtime.getRuntime.maxMemory())
  }
}
