package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `LiveListenerBus.waitUntilEmpty` is `private[spark]`; this
  * sub-package shim exposes it to the graft tools so per-query
  * telemetry attribution can wait DETERMINISTICALLY for the async
  * listener bus to drain instead of sleeping a fixed 300 ms (ADVICE
  * r9: stage-completed events arriving after the sleep bled shuffle/
  * spill bytes into the NEXT query's counters in SCALE.md).
  *
  * Public-API-only otherwise; the same technique Spark's own
  * downstream test harnesses use. No Spark internals are modified.
  */
object ListenerBusHook {
  /** Block until every queued listener event has been dispatched, or
    * throw after `timeoutMs`.
    */
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
