package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Accessor for the `private[spark]` listener bus — the deterministic
  * way to wait for async SparkListener event delivery before reading
  * accumulated task metrics (SpillSpec's and PressureSmoke's spill
  * counters), replacing sleep-poll heuristics that can declare the bus
  * drained while events are still in flight. Same package-escape
  * pattern as the `org.apache.spark.sql.graft.bridge` expression shim. */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
