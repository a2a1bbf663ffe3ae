package graft.ops

import org.apache.logging.log4j.Level
import org.apache.logging.log4j.core.config.Configurator

/** Targeted log hygiene for known-false-positive warnings. */
object Logs {

  /** Silence WindowExec's "No Partition Defined" warning.
    *
    * [[Rank.firstK]] windows over a `lit(0)` partition key that Catalyst
    * constant-folds away, so WindowExec sees an empty partition spec and
    * warns about a whole-dataset single-partition sort — but the window's
    * input is a `TakeOrderedAndProject` of k rows by construction (see the
    * physical plan in Rank's Scaladoc), so the warning is spurious there.
    * Every remaining window in the engine is key-partitioned; suppressing
    * this one logger in the entry points keeps bench/verify logs honest
    * rather than crying wolf.
    */
  def quietBoundedWindowWarning(): Unit =
    Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec", Level.ERROR)
}
