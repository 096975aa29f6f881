package org.apache.spark

/** Test-only bridge into `private[spark]` members.
  *
  * `JobCountGateSpec` counts jobs via a `SparkListener`; the listener bus is
  * asynchronous, so the counter must be read only after the bus has drained.
  * A fixed `Thread.sleep` is race-prone (a slow bus can leak a prior query's
  * job-start events into the next query's counting window — ADVICE round 11);
  * `LiveListenerBus.waitUntilEmpty` is the deterministic drain, but it is
  * reachable only from the `org.apache.spark` package.
  */
object GraftSparkTestAccess {
  /** Block until every queued listener event has been dispatched. */
  def drainListenerBus(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
