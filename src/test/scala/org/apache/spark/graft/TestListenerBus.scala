package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only accessor for the `private[spark]` listener bus — the
  * deterministic way to wait for async SparkListener event delivery
  * (SpillSpec's task-metrics collection), replacing sleep-poll
  * heuristics that can declare the bus drained while events are still
  * in flight. Same package-escape pattern as the main tree's
  * `org.apache.spark.sql.graft.bridge` expression shim. */
object TestListenerBus {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
